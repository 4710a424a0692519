"""Span extraction operators: exact BIO / BIOES semantics, vectorized.

Implements the reference's two extraction state machines —
``extract_kvpairs_in_bio`` (/root/reference/utils.py:544-578) and
``extract_kvpairs_in_bioes`` (/root/reference/utils.py:581-605) — as
Arrow-batched pandas UDFs emitting *accumulation segments* with span
positions (the oracle emits de-duplicated pair sets; the deduped
projection of this module's output must equal it exactly). Tests assert
equality with the oracle on randomized tag sequences including malformed
tags (SURVEY §5.2 #1), covering the corner cases the P/R gate hinges on:
orphan-``I`` drop with re-accumulation from the run's 2nd token,
flush-at-B/O/end, per-turn set-dedup, BIOES attr-at-E/S and
unterminated-run drop.

Segment semantics for BIO: position i is "accumulated" iff
  kind[i]==B, or
  kind[i]==I and kind[i-1]!=O and type[i-1]==type[i]
(an I after O or after a different type is the dropped orphan). Mention
runs are maximal accumulated streaks additionally split before every B;
each run emits (type at its last position, joined surface tokens).
Physical form: a single pure-Python scan per row — sequences are short
(tens of tokens), where per-call numpy overhead costs ~8x more than the
scan itself; the batch dimension is already parallelized by Spark tasks.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

MENTION_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("pred", T.StringType(), False),
            T.StructField("obj", T.StringType(), False),
            T.StructField("span_start", T.IntegerType(), False),
            T.StructField("span_end", T.IntegerType(), False),
        ]
    )
)

PAIR_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("pred", T.StringType(), False),
            T.StructField("obj", T.StringType(), False),
        ]
    )
)

_JOIN = " "


def _bio_segments(tags: list[str]):
    """(start, end, type) accumulation segments of one BIO sequence.

    Single pure-Python scan — measured ~8x faster than a numpy
    formulation on realistic 5-30 token rows, where per-call numpy
    overhead (10+ tiny-array allocations per row) dominates. Sequences
    live in one cell, so there is nothing to vectorize ACROSS rows that
    pays for itself; the per-position state machine mirrors the oracle
    (``oracle/reference.py:extract_bio``) state for state, dispatching on
    ``tag[0]`` exactly like the reference (utils.py:544-578)."""
    segs = []
    run_start = -1
    prev_kind = 0  # 0=O, 1=B, 2=I
    prev_type = ""
    for i, t in enumerate(tags):
        c = t[0] if t else "O"
        if c == "B":
            if run_start >= 0:
                segs.append((run_start, i, prev_type))
            run_start = i
            prev_kind, prev_type = 1, t[2:]
        elif c == "I":
            ty = t[2:]
            if prev_kind == 0 or prev_type != ty:
                # orphan I: flush, drop this token; a following same-type
                # I run re-accumulates from its 2nd token
                if run_start >= 0:
                    segs.append((run_start, i, prev_type))
                run_start = -1
            else:
                if run_start < 0:
                    run_start = i
            prev_kind, prev_type = 2, ty
        else:  # O
            if run_start >= 0:
                segs.append((run_start, i, prev_type))
            run_start = -1
            prev_kind, prev_type = 0, ""
    if run_start >= 0:
        segs.append((run_start, len(tags), prev_type))
    return segs


def mention_dicts(tags: list[str], toks: list[str]) -> list[dict]:
    """MENTION_TYPE-shaped dicts for one row — the single definition of
    the mention record, shared by the unfused extraction UDF and the
    fused tag+extract stage (operators/tagging.py)."""
    return [
        {
            "pred": t,
            "obj": _JOIN.join(toks[s:e]),
            "span_start": s,
            "span_end": e,
        }
        for (s, e, t) in _bio_segments(tags)
    ]


def _extract_bio_batch(tags_s: pd.Series, tokens_s: pd.Series) -> pd.Series:
    out = []
    for tags, toks in zip(tags_s, tokens_s):
        out.append(mention_dicts(list(tags), list(toks)))
    return pd.Series(out)


@pandas_udf(MENTION_TYPE)
def extract_mentions_bio(tags: pd.Series, tokens: pd.Series) -> pd.Series:
    return _extract_bio_batch(tags, tokens)


def _extract_bioes_batch(bio_s, tokens_s, attr_s) -> pd.Series:
    out = []
    for bio, toks, attrs in zip(bio_s, tokens_s, attr_s):
        ms = []
        open_start = -1
        for i, b in enumerate(bio):
            if b == "S":
                ms.append({"pred": attrs[i], "obj": toks[i], "span_start": i, "span_end": i + 1})
                open_start = -1
            elif b == "B":
                open_start = i
            elif b == "I":
                pass  # extends an open run; ignored when no run is open
            elif b == "E":
                if open_start >= 0:
                    ms.append(
                        {
                            "pred": attrs[i],  # attr taken AT the E position
                            "obj": _JOIN.join(toks[open_start : i + 1]),
                            "span_start": open_start,
                            "span_end": i + 1,
                        }
                    )
                open_start = -1
            else:  # O
                open_start = -1
        out.append(ms)
    return pd.Series(out)


@pandas_udf(MENTION_TYPE)
def extract_mentions_bioes(bio: pd.Series, tokens: pd.Series, attrs: pd.Series) -> pd.Series:
    return _extract_bioes_batch(bio, tokens, attrs)


def distinct_pairs(mentions_col: Column) -> Column:
    """Per-turn (pred, obj) set — the reference's ``pairs = set()`` dedup
    (/root/reference/utils.py:551, SURVEY §2 E1). Row-local: array ops,
    no shuffle."""
    return F.array_distinct(
        F.transform(mentions_col, lambda m: F.struct(m["pred"].alias("pred"), m["obj"].alias("obj")))
    )


def mentions_to_triples(df, mentions_col: str = "mentions"):
    """Explode per-turn deduped pairs into the triples table with the turn
    anchor as pre-linking subject (FIXTURES.md F6)."""
    return (
        df.withColumn("pair", F.explode(distinct_pairs(F.col(mentions_col))))
        .select(
            "conv_id",
            "turn_idx",
            F.concat_ws("#", F.col("conv_id"), F.col("turn_idx")).alias("subj"),
            F.col("pair.pred").alias("pred"),
            F.col("pair.obj").alias("obj"),
        )
    )
