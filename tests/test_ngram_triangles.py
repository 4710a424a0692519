"""Corpus n-gram heavy hitters (functions/text.py:ngram_topk) and
degree-oriented triangle counting (operators/graph.py:triangle_count)."""

import itertools

import pytest

from ner_spark.functions.text import ngram_topk
from ner_spark.operators.graph import triangle_count


def test_ngram_topk_counts_and_order(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c a b c"),      # 'a b c' x2, 'b c a' x1, 'c a b' x1
            (1, "a b c"),            # 'a b c' x1
            (2, "x y"),              # shorter than n -> contributes nothing
            (3, None),               # NULL text -> contributes nothing
        ],
        "doc_id bigint, text string",
    )
    rows = ngram_topk(docs, n=3, k=10).collect()
    got = {r["gram"]: (r["n_occurrences"], r["n_docs"]) for r in rows}
    assert got == {"a b c": (3, 2), "b c a": (1, 1), "c a b": (1, 1)}
    # rank order: count desc, gram asc
    assert [r["gram"] for r in rows] == ["a b c", "b c a", "c a b"]


def test_ngram_topk_limit_ties(spark):
    docs = spark.createDataFrame(
        [(0, "z z z"), (1, "a a a"), (2, "m m m")],
        "doc_id bigint, text string",
    )
    rows = ngram_topk(docs, n=3, k=2).collect()
    # all three grams tie at count 1; lexicographic ascending wins the cut
    assert [r["gram"] for r in rows] == ["a a a", "m m m"]


def _tri_reference(pairs):
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nodes = sorted({x for p in und for x in p})
    return sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in und and (b, c) in und and (a, c) in und
    )


@pytest.mark.parametrize(
    "pairs",
    [
        # one triangle + a pendant
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
        # K4: 4 triangles; duplicate + reversed + self-loop noise
        [("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"), ("b", "c"),
         ("b", "d"), ("c", "d"), ("a", "a"), ("c", "d")],
        # star (hub 'h'): zero triangles despite max degree
        [("h", x) for x in "abcdef"],
        # two disjoint triangles sharing no vertex
        [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z"), ("x", "z")],
    ],
)
def test_triangle_count(spark, pairs):
    edges = spark.createDataFrame(
        [(s, "p", d, 1) for s, d in pairs],
        "src_entity string, pred string, dst_entity string, n_turns bigint",
    )
    got = triangle_count(edges).collect()[0]["n_triangles"]
    assert got == _tri_reference(pairs)
