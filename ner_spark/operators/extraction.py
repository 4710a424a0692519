"""Span extraction operators: exact BIO / BIOES semantics, vectorized.

Implements the reference's two extraction state machines —
``extract_kvpairs_in_bio`` (/root/reference/utils.py:544-578) and
``extract_kvpairs_in_bioes`` (/root/reference/utils.py:581-605) — as
Arrow-batched pandas UDFs. The implementation is deliberately different
from the row-wise oracle (ner_spark/oracle/reference.py): per row we build
NumPy kind/type arrays and derive *accumulation segments* with vectorized
boolean logic, then emit one mention per segment. Tests assert equality
with the oracle on randomized tag sequences (SURVEY §5.2 #1), covering the
corner cases the P/R gate hinges on: orphan-``I`` drop with re-accumulation
from the run's 2nd token, flush-at-B/O/end, per-turn set-dedup, BIOES
attr-at-E/S and unterminated-run drop.

Segment formulation for BIO: position i is "accumulated" iff
  kind[i]==B, or
  kind[i]==I and kind[i-1]!=O and type[i-1]==type[i]
(an I after O or after a different type is the dropped orphan). Mention
runs are maximal accumulated streaks additionally split before every B;
each run emits (type at its last position, joined surface tokens).
"""

from __future__ import annotations

import numpy as np
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
    """Yield (start, end, type) accumulation segments of one BIO sequence."""
    n = len(tags)
    if n == 0:
        return []
    kind = np.empty(n, dtype=np.int8)  # 0=O, 1=B, 2=I
    typ = np.empty(n, dtype=object)
    for i, t in enumerate(tags):
        c = t[0]
        if c == "B":
            kind[i] = 1
            typ[i] = t[2:]
        elif c == "I":
            kind[i] = 2
            typ[i] = t[2:]
        else:
            kind[i] = 0
            typ[i] = ""
    prev_kind = np.concatenate(([0], kind[:-1]))
    prev_typ = np.concatenate(([""], typ[:-1]))
    acc = (kind == 1) | ((kind == 2) & (prev_kind != 0) & (prev_typ == typ))
    prev_acc = np.concatenate(([False], acc[:-1]))
    starts = np.flatnonzero(acc & (~prev_acc | (kind == 1)))
    if starts.size == 0:
        return []
    # each run ends at the next start or the first non-accumulated position
    segs = []
    nxt = np.concatenate((starts[1:], [n]))
    for s, bound in zip(starts, nxt):
        e = s + 1
        while e < bound and acc[e] and kind[e] != 1:
            e += 1
        segs.append((int(s), int(e), typ[e - 1]))
    return segs


def _extract_bio_batch(tags_s: pd.Series, tokens_s: pd.Series) -> pd.Series:
    out = []
    for tags, toks in zip(tags_s, tokens_s):
        tags = list(tags)
        toks = list(toks)
        ms = [
            {
                "pred": t,
                "obj": _JOIN.join(toks[s:e]),
                "span_start": s,
                "span_end": e,
            }
            for (s, e, t) in _bio_segments(tags)
        ]
        out.append(ms)
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
