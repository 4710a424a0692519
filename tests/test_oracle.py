"""Oracle unit tests: corner-case semantics of the reference restatements
(SURVEY §5.2 #1 / FIXTURES.md F6 corner-case inventory)."""

import numpy as np

from ner_spark.oracle.reference import (
    extract_bio,
    extract_bioes,
    micro_prf,
    viterbi_decode,
)


def test_bio_basic_and_final_flush():
    # entity terminating at sequence end must flush (utils.py:576-577)
    assert extract_bio(["B-a", "I-a"], ["x", "y"]) == {("a", "x y")}
    assert extract_bio(["O", "B-a"], ["x", "y"]) == {("a", "y")}


def test_bio_orphan_i_dropped_then_reaccumulates():
    # I after O: orphan token dropped; the following same-type I tokens
    # accumulate from the run's 2nd token (utils.py:565-573)
    assert extract_bio(["O", "I-a", "I-a", "O"], ["w0", "w1", "w2", "w3"]) == {("a", "w2")}
    # I with a type switch: flush previous under the PREVIOUS type; orphan dropped
    assert extract_bio(["B-a", "I-b", "I-b"], ["x", "y", "z"]) == {("a", "x"), ("b", "z")}


def test_bio_b_flushes_previous():
    assert extract_bio(["B-a", "B-b"], ["x", "y"]) == {("a", "x"), ("b", "y")}


def test_bio_duplicate_pairs_collapse():
    # same-sentence duplicate mention collapses via set (utils.py:551)
    got = extract_bio(["B-a", "O", "B-a"], ["x", "y", "x"])
    assert got == {("a", "x")}


def test_bioes_semantics():
    # S singleton, attr at E position, unterminated run dropped (utils.py:581-605)
    assert extract_bioes(["S"], ["x"], ["a"]) == {("a", "x")}
    assert extract_bioes(["B", "I", "E"], ["x", "y", "z"], ["a", "a", "b"]) == {("b", "x y z")}
    assert extract_bioes(["B", "I"], ["x", "y"], ["a", "a"]) == set()  # no trailing flush
    assert extract_bioes(["I", "E"], ["x", "y"], ["a", "a"]) == set()  # never opened
    assert extract_bioes(["B", "O", "E"], ["x", "y", "z"], ["a", "a", "a"]) == set()


def test_viterbi_matches_bruteforce():
    rng = np.random.RandomState(0)
    for _ in range(25):
        S, T = rng.randint(1, 6), 4
        unary = rng.randn(S, T)
        trans = rng.randn(T, T)
        got = viterbi_decode(unary, trans)
        # brute force over all T^S paths
        best, best_score = None, -1e18
        import itertools

        for path in itertools.product(range(T), repeat=S):
            sc = sum(unary[i, p] for i, p in enumerate(path))
            sc += sum(trans[path[i - 1], path[i]] for i in range(1, S))
            if sc > best_score:
                best_score, best = sc, list(path)
        assert got == best


def test_micro_prf():
    p, r, f1 = micro_prf(
        [{("a", "x"), ("b", "y")}, {("a", "z")}],
        [{("a", "x")}, {("a", "z"), ("c", "w")}],
    )
    assert p == 2 / 3 and r == 2 / 3
    assert abs(f1 - 2 / 3) < 1e-12
    assert micro_prf([set()], [set()]) == (0.0, 0.0, 0.0)
