"""Dataset-hygiene operators (functions/datasets.py): deterministic
splits and benchmark decontamination."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_split_deterministic_and_stable_under_growth(spark):
    from ner_spark.functions.datasets import split_assign_col

    small = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    big = spark.range(0, 2000).select(F.col("id").alias("doc_id"))

    def assign(df):
        return {
            r["doc_id"]: r["split"]
            for r in df.select(
                "doc_id", split_assign_col(F.col("doc_id")).alias("split")
            ).collect()
        }

    a1, a2, a_big = assign(small), assign(small), assign(big)
    assert a1 == a2, "split must be deterministic"
    # purity: growing the corpus never moves an existing example
    assert all(a_big[k] == v for k, v in a1.items())
    # ~90/10 (binomial tolerance at n=2000)
    frac = sum(1 for v in a_big.values() if v == "train") / len(a_big)
    assert 0.86 < frac < 0.94, frac


def test_contamination_flags_and_decontaminate_removes(spark):
    from ner_spark.functions.datasets import contaminated_docs, decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains the benchmark's full 8-gram span -> contaminated
            (0, "intro words the quick brown fox jumps over the lazy dog and more"),
            # shares only short fragments -> clean at n=8
            (1, "the quick brown fox sleeps all day long today"),
            # clean
            (2, "completely unrelated text about spark partitions and shuffles"),
            # shorter than 8 words: whole text is the gram; no match
            (3, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    flagged = {r["doc_id"]: r for r in contaminated_docs(corpus, bench, n=8).collect()}
    assert set(flagged) == {0}
    assert flagged[0]["n_hits"] >= 1 and 0 < flagged[0]["hit_ratio"] <= 1

    kept = sorted(r["doc_id"] for r in decontaminate(corpus, bench, n=8).collect())
    assert kept == [1, 2, 3]


def test_stratified_sample_deterministic_and_stable(spark):
    from ner_spark.functions.datasets import stratified_sample

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("lang")
    )

    def pick(d, k):
        return {
            (r["lang"], r["doc_id"])
            for r in stratified_sample(d, "lang", k=k).collect()
        }

    s1, s2 = pick(df, 10), pick(df, 10)
    assert s1 == s2 and len(s1) == 30  # 10 per stratum, deterministic
    # raising k only ADDS rows (hash order is a fixed total order)
    assert s1 <= pick(df, 20)
    # short stratum: returns all of it, no padding
    tiny = df.where(F.col("doc_id") < 5)
    assert len(pick(tiny, 10)) == 5


def test_repetition_ratio_flags_boilerplate(spark):
    from ner_spark.functions.text import repetition_ratio

    df = spark.createDataFrame(
        [
            (0, "buy now " * 30),            # heavy 3-gram repetition
            (1, " ".join(f"w{i}" for i in range(60))),  # all distinct
            (2, "too short"),                 # < n tokens -> 0
        ],
        "doc_id long, text string",
    )
    r = {
        row["doc_id"]: row["r"]
        for row in df.select(
            "doc_id", repetition_ratio(F.col("text")).alias("r")
        ).collect()
    }
    assert r[0] > 0.9 and r[1] == 0.0 and r[2] == 0.0


def test_contamination_short_doc_whole_text_gram(spark):
    from ner_spark.functions.datasets import contaminated_docs

    bench = spark.createDataFrame([(9, "tiny doc")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(0, "tiny doc"), (1, "tiny dog")], "doc_id long, text string"
    )
    # sub-n texts match as whole-text grams (exact short-doc duplication)
    flagged = [r["doc_id"] for r in contaminated_docs(corpus, bench, n=8).collect()]
    assert flagged == [0]


def test_kg_negative_samples_filtered_protocol(spark):
    from ner_spark.functions.datasets import kg_negative_samples

    edges = spark.createDataFrame(
        [
            ("brand|acme", "makes", "product|widget", 3),
            ("brand|acme", "makes", "product|gadget", 1),
            ("org|initech", "based_in", "place|dallas", 2),
        ],
        "src_entity string, pred string, dst_entity string, n_turns bigint",
    )
    nodes = spark.createDataFrame(
        [(e,) for e in [
            "brand|acme", "org|initech",
            "product|widget", "product|gadget", "product|doohickey",
            "place|dallas", "place|austin", "place|tulsa",
        ]],
        "entity_id string",
    )
    rows = kg_negative_samples(edges, nodes, k=3).collect()
    assert rows, "pools are big enough that some negatives must survive"
    positives = {("brand|acme", "makes", "product|widget"),
                 ("brand|acme", "makes", "product|gadget"),
                 ("org|initech", "based_in", "place|dallas")}
    for r in rows:
        # corrupted tail keeps the type, is never the true tail, and is
        # never a known positive
        assert r["neg_dst"].split("|")[0] == r["dst_entity"].split("|")[0]
        assert r["neg_dst"] != r["dst_entity"]
        assert (r["src_entity"], r["pred"], r["neg_dst"]) not in positives
        assert 1 <= r["j"] <= 3
    # deterministic: a second evaluation returns the identical multiset
    again = kg_negative_samples(edges, nodes, k=3).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_mention_contexts_window_and_clamping(spark):
    from ner_spark.functions.datasets import mention_contexts

    # tokens:        0   1    2     3     4    5    6
    text = "the quick brown fox jumps over dogs"
    mentions = spark.createDataFrame(
        [
            # interior mention: full +/-3 window
            ("c1", 0, 0, "animal", "fox", 3, 4),
            # at the start: left side clamps to token 0
            ("c1", 0, 1, "det", "the quick", 0, 2),
            # at the end: right side clamps to the last token
            ("c1", 0, 2, "animal", "dogs", 6, 7),
        ],
        "conv_id string, turn_idx long, mention_idx long, pred string, "
        "obj string, span_start long, span_end long",
    )
    transcripts = spark.createDataFrame(
        [("c1", 0, text)], "conv_id string, turn_idx long, text string"
    )
    got = {
        r["mention_idx"]: (r["mention_text"], r["context"])
        for r in mention_contexts(mentions, transcripts, window=3).collect()
    }
    assert got == {
        0: ("fox", "the quick brown fox jumps over dogs"),
        1: ("the quick", "the quick brown fox jumps"),
        2: ("dogs", "fox jumps over dogs"),
    }


def test_mention_contexts_skips_join_when_text_present(spark):
    from ner_spark.functions.datasets import mention_contexts

    with_text = spark.createDataFrame(
        [("c1", 0, 0, "animal", "fox", 1, 2, "a fox ran")],
        "conv_id string, turn_idx long, mention_idx long, pred string, "
        "obj string, span_start long, span_end long, text string",
    )
    out = mention_contexts(with_text, None, window=1)
    assert "Join" not in out._jdf.queryExecution().executedPlan().toString()
    r = out.collect()[0]
    assert (r["mention_text"], r["context"]) == ("fox", "a fox ran")
