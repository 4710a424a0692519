"""Bucketed-table layout for co-located joins (SURVEY §4 shuffle story).

At 10^12-turn scale the recurring expensive exchange is the equi-join of
turn-keyed tables (transcripts ⋈ triples ⋈ annotations …). Writing both
sides bucketed on the SAME key with the SAME bucket count lets Spark's
sort-merge join read matching buckets pairwise — ZERO Exchange on either
side of the join, at the cost of one up-front bucketed write. This module
is the thin, catalog-backed layer around ``bucketBy`` (bucketed layout
requires ``saveAsTable``; plain ``parquet(path)`` cannot record bucket
metadata).

The no-shuffle property is asserted in tests (and only holds while
``spark.sql.sources.bucketing.enabled`` stays true and the bucket counts
match — a mismatch silently degrades to a normal shuffle join, which is
why ``is_exchange_free_join`` exists for plan audits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table keyed on
    ``bucket_cols`` — the layout both sides of a recurring join should
    share."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs the physical plan is a SortMergeJoin whose children are
    bare scans — no Exchange, no sort beyond the bucketed order."""
    return spark.table(left_table).join(spark.table(right_table), on)


def is_exchange_free_join(df: DataFrame) -> bool:
    """Plan audit: True iff the physical plan contains a join but no
    Exchange — the signature of a co-located (bucketed) join."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan and "Join" in plan
