"""Distributed as-of (temporal) join.

Spark has no ASOF JOIN operator; the classic workaround — a range
join ``l.ts >= r.ts`` plus a per-probe max — explodes to O(|L|·|R|)
intermediate rows per key before the reduction and is a scale killer.
This module implements the canonical distributed as-of instead:

  union both sides into one slim stream keyed on the join key,
  sort each key's partition by (ts, side) — reference rows before
  probe rows at equal timestamps, so "at-or-before" is inclusive —
  and carry the latest reference payload forward with one
  ``last(..., ignorenulls)`` window expression.

Cost: ONE hash-partition exchange on the key and a per-key sort —
identical movement to a plain shuffle join of the two inputs; no
intermediate blow-up, no Python. Skew is bounded by the hottest key's
combined row count (AQE's skew handling applies to the exchange), and
the window state is O(1) per row: the frame only ever materializes the
running last reference struct, not the history.

The whole reference payload travels as ONE nullable struct so that a
NULL inside a payload column can never make ``last(..., ignorenulls)``
skip back to an older reference row — match-or-no-match is decided by
the struct, per-column nulls ride inside it.

DuckDB's native ``ASOF LEFT JOIN`` (entry_queries.py:events_asof_view)
is the cross-engine oracle. Reference rows must be unique per
(key, ts) for the semantics to be total — callers dedup with
``max_by`` (the query surface does; see ``latest_per_key_ts``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key_ts(
    df: DataFrame, key: str, ts_col: str, payload: list[str], pick_by: str
) -> DataFrame:
    """Collapse rows sharing (key, ts) to the one with the largest
    ``pick_by`` — makes the reference side unique per (key, ts) so the
    as-of match is deterministic. One hash agg (map-side partial)."""
    return df.groupBy(key, ts_col).agg(
        *[F.max_by(c, pick_by).alias(c) for c in payload]
    )


def asof_join(
    probe: DataFrame,
    reference: DataFrame,
    key: str,
    ts_col: str,
    payload: list[str],
    prefix: str = "ref_",
) -> DataFrame:
    """For every probe row, attach the reference row with the largest
    ``ts_col`` <= the probe's (same key), or NULLs if none precedes it.

    Output: all probe columns + ``<prefix>ts`` + ``<prefix><payload>``.
    Reference must be unique per (key, ts) — see ``latest_per_key_ts``.
    """
    probe_cols = probe.columns
    ref_struct = F.struct(
        F.col(ts_col).alias("ts"), *[F.col(c).alias(c) for c in payload]
    )
    r = reference.select(
        F.col(key),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        ref_struct.alias("_ref"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c)
          for c in probe_cols if c not in (key, ts_col)],
    )
    p = probe.select(
        F.col(key),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            reference.select(ref_struct.alias("_ref")).schema["_ref"].dataType
        ).alias("_ref"),
        *[F.col(c) for c in probe_cols if c not in (key, ts_col)],
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = p.unionByName(r).withColumn(
        "_m", F.last("_ref", ignorenulls=True).over(w)
    )
    return carried.where(F.col("_side") == 1).select(
        *probe_cols,
        F.col("_m.ts").alias(f"{prefix}{ts_col}"),
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload],
    )
