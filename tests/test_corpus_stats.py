"""Corpus-global curation statistics (functions/corpus.py) and the
embedding outlier / RRF fusion operators (functions/similarity.py):
invariants beyond the DuckDB-oracle hash gate — degenerate inputs,
partitioning-invariance, and hand-computable fixtures.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _docs(spark, texts, n_parts=None):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return df.repartition(n_parts) if n_parts else df


def test_dup_span_fraction_hand_fixture(spark):
    """Two docs sharing one 8-gram window, one unique doc, one short
    doc: duplicated spans flagged exactly; short docs pinned to
    (0, 0, 0)."""
    from ner_spark.functions.corpus import dup_span_fraction

    shared = "a b c d e f g h"  # exactly one 8-gram, shared by docs 0/1
    texts = [
        shared + " x",        # 2 spans: shared + "b..x"
        shared + " y",        # 2 spans: shared + "b..y"
        "p q r s t u v w z",  # 2 spans, both unique
        "too short",          # < 8 tokens -> zero row
    ]
    rows = {
        r["doc_id"]: r
        for r in dup_span_fraction(_docs(spark, texts), n=8).collect()
    }
    assert rows[0]["n_spans"] == 2 and rows[0]["n_dup_spans"] == 1
    assert rows[0]["dup_fraction_micro"] == 500_000
    assert rows[1]["n_spans"] == 2 and rows[1]["n_dup_spans"] == 1
    assert rows[2]["n_dup_spans"] == 0 and rows[2]["dup_fraction_micro"] == 0
    assert (
        rows[3]["n_spans"] == 0
        and rows[3]["n_dup_spans"] == 0
        and rows[3]["dup_fraction_micro"] == 0
    )
    # within-doc repetition alone is NOT cross-doc duplication
    solo = ["one two three four five six seven eight " * 2]
    r = dup_span_fraction(_docs(spark, [s.strip() for s in solo]), n=8).collect()
    assert all(x["n_dup_spans"] == 0 for x in r)


def test_unigram_logprob_hand_fixture(spark):
    """3-token corpus: check the exact add-one-smoothed micro-NLL
    integers and the integer-division mean; empty doc pinned to
    (0, 0)."""
    from ner_spark.functions.corpus import unigram_logprob

    texts = ["a a b", ""]
    rows = {
        r["doc_id"]: r for r in unigram_logprob(_docs(spark, texts)).collect()
    }
    # counts: a=2, b=1; total=3, vocab=2 -> p(a)=3/5, p(b)=2/5
    nll_a = math.floor(-1e6 * math.log(3 / 5))
    nll_b = math.floor(-1e6 * math.log(2 / 5))
    assert rows[0]["n_tokens"] == 3
    assert rows[0]["mean_nll_micro"] == (2 * nll_a + nll_b) // 3
    assert rows[1]["n_tokens"] == 0 and rows[1]["mean_nll_micro"] == 0


def test_unigram_logprob_partitioning_invariant(spark):
    """Same corpus, 1 vs 13 partitions: identical result multiset."""
    from ner_spark.functions.corpus import unigram_logprob

    texts = [f"tok{i % 7} tok{i % 3} filler" for i in range(50)]
    a = sorted(
        map(tuple, unigram_logprob(_docs(spark, texts, 1)).collect())
    )
    b = sorted(
        map(tuple, unigram_logprob(_docs(spark, texts, 13)).collect())
    )
    assert a == b


def test_distinct_sketch_estimator(spark):
    """The kept set is exactly the distinct keys hashing under the
    threshold (cross-checked in Python md5), and est = n_kept * rate."""
    import hashlib

    from ner_spark.functions.corpus import distinct_sketch

    rate = 4
    rows = [(i, "grp") for i in range(400)] + [(7, "grp")] * 100
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = distinct_sketch(df, rate=rate).collect()
    assert len(out) == 1
    r = out[0]
    thr = (1 << 60) // rate
    kept = {
        k
        for k in range(400)
        if int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) < thr
    }
    assert r["n_kept"] == len(kept)
    assert r["est_distinct"] == len(kept) * rate
    assert r["exact_distinct"] == 400  # duplicates don't inflate the sketch


def test_embedding_outliers_finds_planted_outlier(spark):
    """A vector far from a tight cluster ranks first with the exact
    integer-grid distance."""
    from ner_spark.functions.similarity import embedding_outliers

    base = [0.1] * 4
    rows = [(i, [v + 0.001 * i for v in base], "a") for i in range(9)]
    rows.append((99, [5.0, 5.0, 5.0, 5.0], "b"))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    out = embedding_outliers(df, k=3, dim=4).collect()
    assert out[0]["vec_id"] == 99 and out[0]["rank"] == 1
    assert out[0]["dist_q"] > out[1]["dist_q"]
    assert [r["rank"] for r in out] == [1, 2, 3]


def test_rrf_fusion_hand_fixture(spark):
    """Doc in both arms outranks docs in one arm; contributions are the
    floored micro reciprocals."""
    from ner_spark.functions.similarity import rrf_fuse_topk

    # doc 1 matches the query terms AND is the dense neighbor of doc 0;
    # doc 2 lexical-only; doc 3 dense-only
    docs = spark.createDataFrame(
        [
            (0, "zzz"),
            (1, "query join filter query"),
            (2, "query filter"),
            (3, "nothing here"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.99, 0.14]),
            (2, [-1.0, 0.0]),
            (3, [0.9, 0.43]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = rrf_fuse_topk(
        docs, emb, ["query", "join", "filter"], query_vec_id=0, k_each=2, k=4
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert out[0]["doc_id"] == 1  # in both lists at rank 1
    assert by_id[1]["rrf_micro"] == 2 * (1_000_000 // 61)
    assert by_id[1]["lex_rank"] == 1 and by_id[1]["dense_rank"] == 1
    assert by_id[2]["dense_rank"] is None  # lexical-only
    assert by_id[3]["lex_rank"] is None  # dense-only
