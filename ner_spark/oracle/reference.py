"""Plain-Python oracle: row-by-row restatement of the reference semantics.

These functions are the correctness gold standard (SURVEY §5.2): the Spark
pipeline's batched/vectorized outputs must match them row-for-row. Each is
a from-scratch restatement of the cited reference behavior — including the
corner cases the P/R≥0.95 gate hinges on — not a copy:

* ``extract_bio``   — semantics of extract_kvpairs_in_bio
  (/root/reference/utils.py:544-578): left-to-right scan with (previous tag,
  accumulator) state; flush on O/B; an I whose type differs from the running
  span (or follows O) flushes the span and DROPS the orphan I token, with a
  following same-type I run re-accumulating from its 2nd token; flush once
  more after the loop; result is a de-duplicated set of (type, text).
* ``extract_bioes`` — semantics of extract_kvpairs_in_bioes
  (/root/reference/utils.py:581-605): S emits a singleton; I appends only if
  a span is open; E appends, emits with the attribute AT the E position, and
  closes; an unterminated B..I run is dropped (no end-of-sequence flush).
* ``viterbi_decode`` — the NumPy max-plus DP of
  /root/reference/predict.py:31-60 (trellis + argmax backpointers,
  traceback from the last row's argmax; first-index tie-breaking).
* ``micro_prf`` — micro P/R/F1 of /root/reference/utils.py:613-634
  (per-row |pred|, |gold|, hits; zero-guarded ratios).

Token join convention: the reference concatenates character tokens directly
(`v += word`); our tokens are whitespace words, so the textual analogue is a
single-space join. Both oracle and pipeline use ``join_tokens``.
"""

from __future__ import annotations

import numpy as np

SPAN_JOIN = " "


def join_tokens(tokens: list[str]) -> str:
    return SPAN_JOIN.join(tokens)


def extract_bio(tags: list[str], words: list[str]) -> set[tuple[str, str]]:
    if len(tags) != len(words):
        raise ValueError("tags/words length mismatch")
    found: set[tuple[str, str]] = set()
    run_tokens: list[str] = []
    prev = "O"
    for tag, word in zip(tags, words):
        if tag == "O":
            if run_tokens:
                found.add((prev[2:], join_tokens(run_tokens)))
            run_tokens = []
        elif tag[0] == "B":
            if run_tokens:
                found.add((prev[2:], join_tokens(run_tokens)))
            run_tokens = [word]
        elif tag[0] == "I":
            if prev[0] == "O" or prev[2:] != tag[2:]:
                # type switch / orphan I: flush what we had, drop this token
                if run_tokens:
                    found.add((prev[2:], join_tokens(run_tokens)))
                run_tokens = []
            else:
                # NOTE: appends even when run_tokens is empty (post-orphan
                # re-accumulation from the run's 2nd token) — but an empty
                # accumulator stays "not started" only until a token lands.
                run_tokens.append(word)
        prev = tag
    if run_tokens:
        found.add((prev[2:], join_tokens(run_tokens)))
    return found


def extract_bioes(
    bio: list[str], words: list[str], attrs: list[str]
) -> set[tuple[str, str]]:
    if not (len(bio) == len(words) == len(attrs)):
        raise ValueError("bio/words/attrs length mismatch")
    found: set[tuple[str, str]] = set()
    run_tokens: list[str] = []
    for b, word, attr in zip(bio, words, attrs):
        if b == "O":
            run_tokens = []
        elif b == "S":
            found.add((attr, word))
            run_tokens = []
        elif b == "B":
            run_tokens = [word]
        elif b == "I":
            if run_tokens:
                run_tokens.append(word)
        elif b == "E":
            if run_tokens:
                run_tokens.append(word)
                found.add((attr, join_tokens(run_tokens)))
            run_tokens = []
    # deliberately no trailing flush: unterminated runs are dropped
    return found


def viterbi_decode(unary: np.ndarray, trans: np.ndarray) -> list[int]:
    """Single-sequence max-plus DP; (S, T) unary + (T, T) transitions.

    Arithmetic runs in the input dtype (float32 in this pipeline — the
    reference decodes float32 ONNX outputs, /root/reference/predict.py:19),
    so the row-wise oracle and the batched kernel perform bit-identical
    float operations."""
    S = unary.shape[0]
    if S == 0:
        return []
    trellis = np.empty_like(unary)
    pointers = np.zeros(unary.shape, dtype=np.int64)
    trellis[0] = unary[0]
    for t in range(1, S):
        cand = trellis[t - 1][:, None] + trans
        trellis[t] = unary[t] + cand.max(axis=0)
        pointers[t] = cand.argmax(axis=0)
    path = [int(trellis[S - 1].argmax())]
    for t in range(S - 1, 0, -1):
        path.append(int(pointers[t][path[-1]]))
    path.reverse()
    return path


def micro_prf(
    preds: list[set[tuple[str, str]]], golds: list[set[tuple[str, str]]]
) -> tuple[float, float, float]:
    if len(preds) != len(golds):
        raise ValueError("preds/golds length mismatch")
    n_pred = sum(len(p) for p in preds)
    n_gold = sum(len(g) for g in golds)
    n_hit = sum(sum(1 for pair in p if pair in g) for p, g in zip(preds, golds))
    precision = n_hit / n_pred if n_pred > 0 else 0.0
    recall = n_hit / n_gold if n_gold > 0 else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    return precision, recall, f1
