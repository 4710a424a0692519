"""2-D skyline (Pareto frontier) over a DataFrame — rows not strictly
dominated on a (maximize x, maximize y) pair.

Dominance: row B dominates row A iff ``x_B >= x_A AND y_B >= y_A`` with
at least one strict inequality. Exact duplicates never dominate each
other, so duplicate frontier points all survive.

The naive plan is the quadratic NOT EXISTS self-join (that IS the
DuckDB oracle restated in entry_queries, kept deliberately independent
of this implementation). The scalable plan exploits the classic 1-D
reduction: sort by x descending and a point survives iff its y exceeds
the running max of every strictly-higher-x point. A single
``Window.orderBy`` would serialize the whole table through one task, so
the running max is computed with the repo's two-level prefix device
(same shape as pack.py / corpus.py token percentiles):

1. fixed-width bucket on x (bounded dimension, default 256) — any row
   in a higher bucket has STRICTLY greater x than any row in a lower
   bucket, so cross-bucket dominance only needs the per-bucket y max;
2. per-bucket ``max(y)`` (one map-side-combinable hash aggregate,
   output <= n_buckets rows) + an unpartitioned suffix-max window over
   that bounded dimension = the cross-bucket threshold H(b);
3. within a bucket, exact strict-x semantics via a per-(bucket, x)
   aggregate and a per-bucket ordered window over DISTINCT x values —
   partitioned by bucket, so no single task sees more than one bucket's
   distinct-x set.

Every exchange carries (bucket, x, y) only; the widest state any task
holds is one bucket's distinct-x list. At 10^12 rows the dominant cost
is the two hash aggregates, both map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_B = "__sky_bucket"
_GMAX = "__sky_gmax"
_HIN = "__sky_hmax_in"
_HB = "__sky_hb"


def skyline_2d(
    df: DataFrame, x_col: str, y_col: str, n_buckets: int = 256
) -> DataFrame:
    """Rows of ``df`` on the strict-dominance Pareto frontier
    maximizing ``(x_col, y_col)``. Rows with a NULL in either
    coordinate are excluded (NULL is incomparable). Output keeps the
    input schema."""
    x, y = F.col(x_col), F.col(y_col)
    rows = df.where(x.isNotNull() & y.isNotNull())

    # bounded collect: two scalars sizing the bucket grid
    b = rows.agg(
        F.min(x).alias("lo"), F.max(x).alias("hi"), F.count(F.lit(1)).alias("n")
    ).first()
    if b is None or b["n"] == 0:
        return df.where(F.lit(False))
    lo, hi = b["lo"], b["hi"]
    span = hi - lo
    if hasattr(span, "total_seconds"):  # timestamp x axis
        span = span.total_seconds()
        off = (x.cast("double") - F.lit(lo).cast("timestamp").cast("double"))
    else:
        off = x - F.lit(lo)
    if span == 0:
        bucket = F.lit(0)
    else:
        width = span / n_buckets
        bucket = F.least(
            F.floor(off / F.lit(width)).cast("int"), F.lit(n_buckets - 1)
        )
    r = rows.withColumn(_B, bucket)

    # level 1: per-(bucket, x) y-max — exact strict-x groups.
    # localCheckpoint so BOTH consumers below (the in-bucket window and
    # the per-bucket suffix max) read the materialized aggregate instead
    # of each re-scanning the fact table: without it the base table is
    # scanned three times (once per window branch + the survivor join);
    # with it, exactly twice — once into this aggregate, once for the
    # final row filter. The checkpoint holds distinct-(bucket, x) rows,
    # far below fact cardinality.
    g = r.groupBy(_B, x_col).agg(F.max(y).alias(_GMAX)).localCheckpoint(eager=True)
    # within bucket: running max over STRICTLY higher x (distinct-x frame)
    w_in = (
        Window.partitionBy(_B)
        .orderBy(F.col(x_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = g.withColumn(_HIN, F.max(_GMAX).over(w_in))

    # level 2: per-bucket y-max + suffix max over the bounded bucket dim
    bmax = g.groupBy(_B).agg(F.max(_GMAX).alias("bm"))
    w_hi = Window.orderBy(F.col(_B).desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    hb = bmax.withColumn(_HB, F.max("bm").over(w_hi)).select(_B, _HB)

    thresh = g.join(F.broadcast(hb), _B).select(
        _B,
        x_col,
        _GMAX,
        # greatest() skips NULLs: cross-bucket H(b) is NULL for the top
        # bucket, in-bucket running max is NULL for a bucket's highest x
        F.greatest(F.col(_HIN), F.col(_HB)).alias(_HIN),
    )

    out = (
        r.join(thresh, [_B, x_col])
        # survive iff y is the max of its exact-x group (equal-x strict-y
        # dominance) AND beats every strictly-higher-x y (cross + in-bucket)
        .where((y == F.col(_GMAX)) & (F.col(_HIN).isNull() | (y > F.col(_HIN))))
        .select(*df.columns)
    )
    return out
