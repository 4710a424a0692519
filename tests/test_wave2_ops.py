"""Conversation near-dup, cross-source overlap, PQ codes
(functions/dedup.py, corpus.py, similarity.py): invariants beyond the
DuckDB-oracle hash gate.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def test_conv_near_dup_finds_truncated_reexport(spark):
    """A conversation re-ingested with its last turn dropped pairs with
    the original; unrelated conversations don't pair."""
    from ner_spark.functions.dedup import conv_near_dup_pairs

    turns = []
    for i in range(12):
        turns.append(("c1", i, f"alpha beta gamma delta {i} epsilon zeta"))
        turns.append(
            ("zz9", i, f"totally different subject matter {i} talk here")
        )
    # truncated re-export of c1 (drop last turn)
    for i in range(11):
        turns.append(("c1~v2", i, f"alpha beta gamma delta {i} epsilon zeta"))
    df = spark.createDataFrame(
        turns, "conv_id string, turn_idx int, text string"
    )
    pairs = conv_near_dup_pairs(df, threshold=0.5).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p["id_a"], p["id_b"]) == ("c1", "c1~v2")
    assert p["jaccard"] >= 0.8


def test_conv_dedup_and_near_dup_on_pathological_long_conversation(spark):
    """SURVEY §7.4's bar, now structural: a conversation with tens of
    thousands of turns must flow through BOTH conversation-granularity
    dedup ops without any conv-sized aggregation buffer (exact dedup
    reduces to (count, xor, xor); near-dup keeps shingles as rows).
    The exact dup and the truncated re-export must still be caught."""
    from ner_spark.functions.dedup import conv_dedup, conv_near_dup_pairs

    n = 20_000
    turns = []
    for i in range(n):
        turns.append(("long", i, f"metric m{i % 503} crossed threshold t{i % 91}"))
        turns.append(("long~dup", i, f"metric m{i % 503} crossed threshold t{i % 91}"))
        if i < n - 1200:  # truncated re-export (~6% of turns dropped)
            turns.append(("long~v2", i, f"metric m{i % 503} crossed threshold t{i % 91}"))
    turns += [("tiny", 0, "hi"), ("tiny2", 0, "hi")]
    df = spark.createDataFrame(
        turns, "conv_id string, turn_idx int, text string"
    ).repartition(8)

    t0 = time.time()
    dd = {r["conv_id"]: r for r in conv_dedup(df).collect()}
    assert dd["long"]["is_dup"] == 0 and dd["long~dup"]["is_dup"] == 1
    assert dd["long~dup"]["survivor_id"] == "long"
    assert dd["long~v2"]["is_dup"] == 0  # truncation ⇒ different exact hash
    assert dd["tiny"]["conv_hash"] == dd["tiny2"]["conv_hash"]

    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in conv_near_dup_pairs(df, threshold=0.5).collect()
    }
    # the exact dup pairs at 1.0; the truncated re-export pairs high;
    # the two-token conversations (the <k fallback path) pair at 1.0
    assert pairs[("long", "long~dup")] == 1.0
    assert pairs[("long", "long~v2")] >= 0.9
    assert pairs[("tiny", "tiny2")] == 1.0
    assert time.time() - t0 < 120


def test_word_shingles_linear_on_long_doc(spark):
    """Regression guard for the inlined-split quadratic: shingling a
    ~50k-token document must complete in seconds, not minutes (was
    158 s before the let-binding fix)."""
    from ner_spark.functions.dedup import word_shingles_col

    text = " ".join(f"w{i % 997}" for i in range(50_000))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    t0 = time.time()
    n = df.select(F.size(word_shingles_col(F.col("text"), 3)).alias("n")).collect()[
        0
    ]["n"]
    assert n > 0
    assert time.time() - t0 < 30  # quadratic form took ~150 s


def test_source_overlap_matrix(spark):
    """Two sources sharing half their grams score the hand-computed
    Jaccard; disjoint sources produce no row."""
    from ner_spark.functions.corpus import source_overlap

    # n=5 grams; each text has exactly 5 tokens -> one gram per doc
    rows = [
        (0, "a b c d e", "s1"),
        (1, "f g h i j", "s1"),
        (2, "a b c d e", "s2"),  # shares gram 1 with s1
        (3, "k l m n o", "s2"),
        (4, "p q r s t", "s3"),  # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = source_overlap(df, n=5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"]) == ("s1", "s2")
    assert r["n_common"] == 1 and r["n_a"] == 2 and r["n_b"] == 2
    assert r["jaccard_micro"] == 1_000_000 // 3


def test_pq_codes_exact_on_codebook_vectors(spark):
    """A codebook vector reconstructs itself: codes = its own cell in
    every subspace, recon error 0; a near-copy lands in the same cells
    with a small positive error."""
    from ner_spark.functions.similarity import pq_codes

    import numpy as np

    rng = np.random.RandomState(7)
    vecs = [(i, [float(x) for x in rng.uniform(-1, 1, 8)]) for i in range(4)]
    near = [v + 0.001 for v in vecs[2][1]]
    vecs.append((100, near))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r
        for r in pq_codes(df, n_sub=2, n_cells=4, dim=8).collect()
    }
    assert out[2]["codes"] == "2,2" and out[2]["recon_err_q"] == 0
    assert out[100]["codes"] == "2,2" and out[100]["recon_err_q"] > 0
    assert len(out) == 5
