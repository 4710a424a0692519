"""SFT pair extraction, decayed edge weights, link-prediction eval
(functions/datasets.py, operators/graph.py): hand-computable fixtures.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def test_sft_pairs_adjacency_rules(spark):
    """user→assistant adjacency emits; tool interruptions, user→user
    repairs, and conversation boundaries don't."""
    from ner_spark.functions.datasets import sft_pairs

    rows = [
        ("c1", 0, "user", "q1"),
        ("c1", 1, "assistant", "a1"),      # pair
        ("c1", 2, "user", "q2"),
        ("c1", 3, "tool", "t"),            # tool breaks adjacency
        ("c1", 4, "assistant", "a2"),
        ("c2", 0, "user", "q3"),
        ("c2", 1, "user", "q3b"),          # repair: only q3b pairs
        ("c2", 2, "assistant", "a3"),
        ("c3", 0, "user", "dangling"),     # conv ends on user turn
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = sorted(
        (r["conv_id"], r["turn_idx"], r["prompt"], r["response"])
        for r in sft_pairs(df).collect()
    )
    assert out == [("c1", 0, "q1", "a1"), ("c2", 1, "q3b", "a3")]


def test_edge_decay_halflife_buckets(spark):
    """Assertions 0 / 1 / 2 half-lives old contribute 1e6, 5e5, 2.5e5;
    ancient assertions clamp to zero contribution."""
    from ner_spark.operators.graph import edge_decay_weights

    base = datetime.datetime(2026, 1, 31)
    day = datetime.timedelta(days=1)
    tr = spark.createDataFrame(
        [
            ("c", 0, base),
            ("c", 1, base - 7 * day),
            ("c", 2, base - 14 * day),
            ("c", 3, base - 7000 * day),
        ],
        "conv_id string, turn_idx int, ts timestamp",
    )
    ct = spark.createDataFrame(
        [("c", i, "s", "p", "o") for i in range(4)],
        "conv_id string, turn_idx int, subj string, pred string, obj string",
    )
    out = edge_decay_weights(ct, tr, halflife_days=7).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_turns"] == 4
    assert r["weight_decay_micro"] == 1_000_000 + 500_000 + 250_000 + 0


def test_linkpred_eval_hand_graph(spark):
    """Tiny graph where the AA candidate list and the holdout are
    hand-checkable: every metric column is internally consistent and
    the ranked count never exceeds the eval count."""
    from ner_spark.operators.graph import linkpred_eval

    # star around z plus a few chords: AA produces candidates among
    # z's neighbors; the hash split sends some edges to test
    names = [f"n{i:02d}" for i in range(20)]
    edges = [("hub", "related_to", x, 1) for x in names]
    edges += [(names[i], "related_to", names[i + 1], 1) for i in range(0, 18, 2)]
    df = spark.createDataFrame(
        edges, "src_entity string, pred string, dst_entity string, n_turns long"
    )
    r = linkpred_eval(df, k=10).collect()[0]
    assert r["n_eval"] == 2 * r["n_test_edges"]
    assert 0 <= r["n_ranked"] <= r["n_eval"]
    assert r["hits_at_1"] <= r["hits_at_10"] <= r["n_ranked"]
    assert 0 <= r["mrr_micro"] <= 1_000_000
    # determinism across partitionings
    r2 = linkpred_eval(df.repartition(13), k=10).collect()[0]
    assert r.asDict() == r2.asDict()
