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


# ---------------------------------------------------------------------------
# mixture_weights / filter_report / conv_dedup (round-3 curation wave)
# ---------------------------------------------------------------------------


def test_mixture_weights_two_groups(spark):
    """Hand-checked alpha=0.5 case: counts 90/10 -> p = 0.9/0.1,
    q ~ sqrt(p) normalized, tail weight > 1 > head weight."""
    from ner_spark.functions.datasets import mixture_weights

    rows = [("en", i) for i in range(90)] + [("de", i) for i in range(10)]
    df = spark.createDataFrame(rows, "lang string, doc_id long")
    got = {
        r["lang"]: r.asDict()
        for r in mixture_weights(df, alpha=0.5).collect()
    }
    assert got["en"]["n_docs"] == 90 and got["de"]["n_docs"] == 10
    assert got["en"]["p_micro"] == 900_000 and got["de"]["p_micro"] == 100_000
    # q = sqrt(p)/(sqrt(.9)+sqrt(.1)) -> en ~0.75, de ~0.25
    assert abs(got["en"]["q_micro"] - 750_000) < 2_000
    assert abs(got["de"]["q_micro"] - 250_000) < 2_000
    # head downsampled, tail upsampled, and weights invert the shares
    assert got["en"]["weight_micro"] < 1_000_000 < got["de"]["weight_micro"]
    assert abs(got["de"]["weight_micro"] - 2_500_000) < 20_000


def test_mixture_weights_uniform_is_identity(spark):
    from ner_spark.functions.datasets import mixture_weights

    rows = [(l, i) for l in ("a", "b") for i in range(5)]
    df = spark.createDataFrame(rows, "lang string, doc_id long")
    for r in mixture_weights(df, alpha=0.3).collect():
        assert r["p_micro"] == r["q_micro"] == 500_000
        assert r["weight_micro"] == 1_000_000


def test_filter_report_rule_priority_and_edges(spark):
    from ner_spark.functions.datasets import filter_report

    long_ok = " ".join(f"token{chr(97 + i)}" for i in range(26)) + " aa bb cc dd"
    # 30 tokens, high alpha ratio, but only 3 distinct trigrams
    repetitive = " ".join(["looping wording phrases"] * 10)
    digits = " ".join(f"12{i}" for i in range(30))  # long but digit-heavy
    short_and_digits = "123 456"  # fails two rules: too_short wins
    rows = [
        (1, long_ok),
        (2, repetitive),
        (3, digits),
        (4, short_and_digits),
        (5, ""),  # empty: too_short, and no div-by-zero under ANSI
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["verdict"] for r in filter_report(df).collect()}
    assert got == {
        1: "kept",
        2: "repetitive",
        3: "low_alpha",
        4: "too_short",
        5: "too_short",
    }


def test_conv_dedup_orders_and_survivor(spark):
    from ner_spark.functions.dedup import conv_dedup

    rows = [
        # c1 and c3 are the same conversation (c3 arrives with turns
        # out of row order — the hash must follow turn_idx order)
        ("c1", 0, "hello"), ("c1", 1, "world"),
        ("c3", 1, "world"), ("c3", 0, "hello"),
        # same texts in the OPPOSITE turn order: different conversation
        ("c2", 0, "world"), ("c2", 1, "hello"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx long, text string")
    got = {r["conv_id"]: r.asDict() for r in conv_dedup(df).collect()}
    assert got["c1"]["survivor_id"] == "c1" and got["c1"]["is_dup"] == 0
    assert got["c3"]["survivor_id"] == "c1" and got["c3"]["is_dup"] == 1
    assert got["c2"]["survivor_id"] == "c2" and got["c2"]["is_dup"] == 0
    # turn-boundary safety: ["ab", "c"] must not hash equal to ["a", "bc"]
    df2 = spark.createDataFrame(
        [("x", 0, "ab"), ("x", 1, "c"), ("y", 0, "a"), ("y", 1, "bc")],
        "conv_id string, turn_idx long, text string",
    )
    got2 = {r["conv_id"]: r["conv_hash"] for r in conv_dedup(df2).collect()}
    assert got2["x"] != got2["y"]


def test_curation_decisions_priority(spark):
    """Pipeline priority: exact_dup > contaminated > quality chain; the
    survivor of a dup group falls through to the later rules."""
    from ner_spark.functions.datasets import curation_decisions

    good = " ".join(
        f"wonderful{c} elephants{c} wandering{c} mountains{c}" for c in "abcdef"
    )
    contaminated = (
        "leaked benchmark question about the capital of atlantis "
        "plus twenty more distinctive padding tokens stretching the document "
        "comfortably past the minimum token threshold for quality"
    )
    rep = " ".join(["looping wording phrases"] * 10)
    corpus = spark.createDataFrame(
        [
            (1, good),          # kept
            (2, good),          # exact dup of 1 AND would be kept -> exact_dup
            (3, contaminated),  # contaminated (long enough, good alpha)
            (4, contaminated),  # dup of 3: exact_dup wins over contaminated
            (5, "tiny"),        # too_short
            (6, rep),           # repetitive
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [(100, "benchmark question about the capital of atlantis")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["decision"], r["keep"])
        for r in curation_decisions(corpus, benchmark, n=5).collect()
    }
    assert got == {
        1: ("kept", 1),
        2: ("exact_dup", 0),
        3: ("contaminated", 0),
        4: ("exact_dup", 0),
        5: ("too_short", 0),
        6: ("repetitive", 0),
    }


def test_token_percentiles_exact_ranks(spark):
    """Discrete percentile = value at ascending rank ceil(q*n); verify
    against a hand-sorted list including duplicates."""
    from ner_spark.functions.text import token_percentiles

    # lang a: token counts [1,2,2,3,10] -> n=5, p50 rank 3 -> 2,
    # p90 rank ceil(4.5)=5 -> 10
    texts_a = ["w", "w w", "w w", "w w w", " ".join(["w"] * 10)]
    # lang b: [4,4] -> n=2, p50 rank 1 -> 4, p90 rank 2 -> 4
    texts_b = ["a b c d", "e f g h"]
    rows = [(i, "a", t) for i, t in enumerate(texts_a)] + [
        (100 + i, "b", t) for i, t in enumerate(texts_b)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["lang"]: (r["n_docs"], r["p50_tokens"], r["p90_tokens"], r["max_tokens"])
        for r in token_percentiles(df).collect()
    }
    assert got == {"a": (5, 2, 10, 10), "b": (2, 4, 4, 4)}


def test_embedding_centroids_exact_integer_mean(spark):
    from ner_spark.functions.similarity import embedding_centroids

    rows = [
        (0, [1.0, -0.5], 0),
        (1, [2.0, 0.5], 0),
        (2, [0.25, 0.25], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        r["label"]: (r["n_vectors"], r["centroid"])
        for r in embedding_centroids(df, dim=2).collect()
    }
    # label 0: mean (1.5, 0.0) -> "1500000,0"; label 1: (0.25, 0.25)
    assert got[0] == (2, "1500000,0")
    assert got[1] == (1, "250000,250000")
    # dim probe (dim=None) agrees
    got2 = {
        r["label"]: r["centroid"]
        for r in embedding_centroids(df).collect()
    }
    assert got2[0] == "1500000,0"


def test_corpus_drift_l1_and_missing_groups(spark):
    from ner_spark.functions.datasets import corpus_drift

    old = spark.createDataFrame(
        [
            (0, "a", "w"),            # lang a: counts {1: 2, 2: 1}
            (1, "a", "x"),
            (2, "a", "y z"),
            (3, "b", "only old lang"),
        ],
        "doc_id long, lang string, text string",
    )
    new = spark.createDataFrame(
        [
            (0, "a", "w"),            # lang a: counts {1: 1, 2: 1}
            (2, "a", "y z"),
            (4, "c", "brand new lang"),
        ],
        "doc_id long, lang string, text string",
    )
    got = {
        r["lang"]: (r["old_n"], r["new_n"], r["l1_drift_micro"])
        for r in corpus_drift(old, new).collect()
    }
    # lang a: old freqs {1: 2/3, 2: 1/3}, new {1: 1/2, 2: 1/2}
    # |666667-500000| + |333333-500000| = 166667 + 166667
    assert got["a"] == (3, 2, 333334)
    # group only in old / only in new: full drift vs zero-filled side
    assert got["b"] == (1, 0, 1_000_000)
    assert got["c"] == (0, 1, 1_000_000)


def test_tool_ngrams_counts(spark):
    from ner_spark.operators.segments import tool_ngrams

    rows = []
    # conv A: search > db > calc > db  -> trigrams: s>d>c, d>c>d
    for i, tool in enumerate(["search", "db", "calc", "db"]):
        rows.append(("A", i, "tool", tool, "call", None))
    # conv B: search > db > calc      -> trigram: s>d>c
    for i, tool in enumerate(["search", "db", "calc"]):
        rows.append(("B", i, "tool", tool, "call", None))
    # conv C: too few tool calls
    rows.append(("C", 0, "tool", "search", "call", None))
    # non-tool turns never contribute
    rows.append(("A", 9, "user", None, "thanks", None))
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx long, role string, tool string, "
        "text string, ts timestamp",
    )
    got = {
        r["gram"]: (r["n_occurrences"], r["n_convs"])
        for r in tool_ngrams(df, n=3, k=10).collect()
    }
    assert got == {
        "search>db>calc": (2, 2),
        "db>calc>db": (1, 1),
    }


def test_mixture_resample_multiplicity(spark):
    """floor(w) copies always; the fractional coin is a pure function
    of the id; expected multiplicity matches the weight."""
    from ner_spark.functions.datasets import mixture_resample

    docs = spark.createDataFrame(
        [(i, "tail") for i in range(200)] + [(1000 + i, "head") for i in range(200)],
        "doc_id long, lang string",
    )
    weights = spark.createDataFrame(
        [("tail", 2_500_000), ("head", 400_000)],
        "lang string, weight_micro long",
    )
    out = mixture_resample(docs, weights).collect()
    per_doc = {}
    for r in out:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
        assert 1 <= r["copy_idx"] <= per_doc[r["doc_id"]]
    tail_counts = [per_doc.get(i, 0) for i in range(200)]
    head_counts = [per_doc.get(1000 + i, 0) for i in range(200)]
    # tail: every doc gets 2 or 3 copies; mean ~2.5
    assert set(tail_counts) <= {2, 3}
    assert 2.3 < sum(tail_counts) / 200 < 2.7
    # head: 0 or 1 copies, mean ~0.4
    assert set(head_counts) <= {0, 1}
    assert 0.3 < sum(head_counts) / 200 < 0.5
    # deterministic
    again = mixture_resample(docs, weights).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_weighted_sample_matches_python_reference(spark):
    """A-ES exponential race: engine top-k == a pure-Python
    restatement (hashlib md5 + math.log on IEEE doubles, same micro
    floor, same doc_id tie-break); heavier docs win more slots."""
    import hashlib
    import math

    from ner_spark.functions.datasets import weighted_sample

    rows = [(i, "en", "web", ((i * 37) % 500) + 1) for i in range(400)]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long"
    )

    def py_key(doc_id, n_chars):
        h = int(hashlib.md5(f"wsample|{doc_id}".encode()).hexdigest()[:15], 16)
        u = float(h + 1) / 1152921504606846976.0
        w = max(float(n_chars), 1.0)
        lnq = float(math.floor(math.log(u) * 1000000.0))
        return math.floor((lnq / w) * 1000000.0)

    want = sorted(
        ((py_key(i, n), i, n) for i, _l, _s, n in rows),
        key=lambda t: (-t[0], t[1]),
    )[:50]
    got = weighted_sample(docs, k=50).collect()
    assert [(r["sample_key"], r["doc_id"], r["wt"]) for r in got] == [
        (k, i, n) for k, i, n in want
    ]
    # weight-proportional: sampled docs skew heavy (mean weight of the
    # 50 winners well above the corpus mean of ~250)
    assert sum(r["wt"] for r in got) / 50 > 300


def test_weighted_sample_large_weights_keep_resolution(spark):
    """Regression for the single-grid collapse: at weights ~1e6 a
    one-shot floor(ln(u)/w·1e6) leaves ~42 key cells, so heavy docs
    tie en masse and the ascending doc_id tie-break (not the race)
    decides inclusion.  The two-stage key must (a) still match the
    pure-Python restatement and (b) keep the keys of million-char
    docs almost all distinct, so inclusion odds stay ∝ weight."""
    import hashlib
    import math

    from ner_spark.functions.datasets import weighted_sample

    rows = [
        (i, "en", "web", 1_000_000 + (i * 7919) % 500_000)
        for i in range(300)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long"
    )

    def py_key(doc_id, n_chars):
        h = int(hashlib.md5(f"wsample|{doc_id}".encode()).hexdigest()[:15], 16)
        u = float(h + 1) / 1152921504606846976.0
        w = max(float(n_chars), 1.0)
        lnq = float(math.floor(math.log(u) * 1000000.0))
        return math.floor((lnq / w) * 1000000.0)

    want = sorted(
        ((py_key(i, n), i, n) for i, _l, _s, n in rows),
        key=lambda t: (-t[0], t[1]),
    )[:100]
    got = weighted_sample(docs, k=100).collect()
    assert [(r["sample_key"], r["doc_id"], r["wt"]) for r in got] == [
        (k, i, n) for k, i, n in want
    ]
    # resolution: among 300 docs with weights ≥ 1e6 the two-stage keys
    # are essentially all distinct (the old grid admitted ≤ ~42 values)
    all_keys = {py_key(i, n) for i, _l, _s, n in rows}
    assert len(all_keys) > 280
    # the winners are decided by the race, not by low doc_id: the
    # sampled ids are spread across the id range
    ids = sorted(r["doc_id"] for r in got)
    assert ids[-1] > 250 and sum(1 for i in ids if i < 100) < 50


def test_dsir_weights_matches_python_reference(spark):
    """DSIR logw equals a pure-Python reference (hashed uni+bigram
    buckets, Laplace-smoothed log-ratio quantized to the 1e-6 grid
    before summing) and target-like docs outscore off-target docs."""
    import hashlib
    import math

    from ner_spark.functions.datasets import dsir_weights

    target = ["alpha beta gamma", "alpha beta delta", "beta gamma alpha"]
    raw = ["zeta eta theta", "eta theta iota", "theta zeta kappa", "alpha beta gamma zeta"]
    rows = [(i, t, "tgt") for i, t in enumerate(target)]
    rows += [(100 + i, t, "web") for i, t in enumerate(raw)]
    rows.append((200, None, "web"))
    rows.append((201, "", "web"))
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")

    B = 1024

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def feats(text):
        toks = [t for t in text.lower().split(" ") if t]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return [h60(g) % B for g in grams]

    ct, cr = {}, {}
    for i, t, s in rows:
        if t is None:
            continue
        for b in feats(t):
            (ct if s == "tgt" else cr)[b] = (ct if s == "tgt" else cr).get(b, 0) + 1
    tt, tr = sum(ct.values()), sum(cr.values())
    q = {
        b: round(
            (
                math.log((ct.get(b, 0) + 1.0) / (tt + B))
                - math.log((cr.get(b, 0) + 1.0) / (tr + B))
            )
            * 1e6
        )
        for b in set(ct) | set(cr)
    }
    expect = {}
    for i, t, s in rows:
        if t is None or not t.strip():
            continue
        fs = feats(t)
        expect[i] = (len(fs), sum(q[b] for b in fs) / 1e6)

    out = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in dsir_weights(d, target_source="tgt").collect()
    }
    assert out == expect
    assert 200 not in out and 201 not in out  # no-signal docs: no row
    # target-slice docs must outscore pure off-target docs
    assert min(out[i][1] for i in (0, 1, 2)) > max(out[i][1] for i in (100, 101, 102))
    # the mixed doc sits strictly between
    assert max(out[i][1] for i in (100, 101, 102)) < out[103][1] < min(out[i][1] for i in (0, 1, 2))

    # partitioning invariance
    out2 = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in dsir_weights(d.repartition(5), target_source="tgt").collect()
    }
    assert out2 == out
