"""Event-stream product analytics: ordered funnels and cohort
retention.

The reference's pipeline treats the events table only as a generic
scan/agg source; these operators add the two sequential-pattern reports
every analytics engine over an event log ships — ordered-step funnel
conversion and first-day cohort retention — expressed as plain
DataFrame joins/aggregations so Catalyst keeps the shuffles keyed on
``user_id`` (the natural partitioning of an event log).

Determinism conventions (shared with q_sessionize): timestamps are
compared as floor-epoch-second BIGINTs, day buckets as epoch-day
integers — no double arithmetic anywhere, so results are identical on
any engine, partitioning, or cluster size.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAY_S = 86400


def _ep_events(events: DataFrame) -> DataFrame:
    return events.select(
        "user_id",
        F.col("event_type").alias("etype"),
        F.unix_timestamp("ts").alias("ep"),
    )


def funnel_counts(events: DataFrame, steps: tuple[str, ...]) -> DataFrame:
    """Ordered-funnel conversion: row ``i`` counts the users who
    performed ``steps[0..i]`` in strict timestamp order (each step
    STRICTLY after the user's earliest completion of the previous
    step — the classic first-touch funnel semantics).

    Output ``(step_idx int, step string, n_users bigint)``.

    Scale shape: one shuffle per step, always keyed on ``user_id``
    (min-aggregations combine map-side; the step-i frame holds at most
    one row per user, monotonically shrinking down the funnel). No
    windows, no event collection — a user's events are never gathered
    into one buffer, so a 10^9-event user costs the same as ten users.
    """
    e = _ep_events(events)
    spark = events.sparkSession
    per_step: list[DataFrame] = []
    cur = (
        e.where(F.col("etype") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ep").alias("t"))
    )
    per_step.append(cur)
    for s in steps[1:]:
        cur = (
            e.where(F.col("etype") == s)
            .join(cur, "user_id")
            .where(F.col("ep") > F.col("t"))
            .groupBy("user_id")
            .agg(F.min("ep").alias("t"))
        )
        per_step.append(cur)
    rows = [
        df.agg(
            F.lit(i + 1).cast("int").alias("step_idx"),
            F.lit(steps[i]).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
        )
        for i, df in enumerate(per_step)
    ]
    return reduce(DataFrame.unionByName, rows)


def retention_table(
    events: DataFrame, offsets: tuple[int, ...] = (1, 3, 7)
) -> DataFrame:
    """First-day cohort retention: users are cohorted by the UTC epoch
    day of their first event; for each requested day offset, count how
    many of the cohort were active (any event) exactly ``cohort_day +
    offset``. Output ``(cohort_day bigint, day_offset int, n_cohort
    bigint, n_active bigint)`` — only (cohort, offset) cells with at
    least one active user, mirroring the SQL restatement.

    Scale shape: the (user, day) activity fact is deduplicated FIRST
    (one user-keyed exchange), so everything downstream is bounded by
    users x active-days, not by raw event volume; cohort sizes ride a
    broadcastable day-dimension frame.
    """
    e = _ep_events(events)
    d = (
        e.select("user_id", F.expr(f"ep div {DAY_S}").alias("day"))
        .distinct()
    )
    cohort = d.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = cohort.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("n_cohort"))
    off = F.array(*[F.lit(o) for o in offsets])
    act = (
        d.join(cohort, "user_id")
        .withColumn("day_offset", (F.col("day") - F.col("cohort_day")).cast("int"))
        .where(F.array_contains(off, F.col("day_offset")))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return act.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day", "day_offset", "n_cohort", "n_active"
    )


def event_anomaly_days(
    events: DataFrame, factor_num: int = 9, factor_den: int = 8
) -> DataFrame:
    """Per-type daily burst days: a (event_type, day) cell is anomalous
    when its count exceeds ``factor_num/factor_den`` x the type's
    per-active-day mean, tested as INTEGER cross-multiplication
    (den * n * n_days > num * total) — no mean/variance/sqrt floats,
    the kg_entity_bursts device on the event log; the RATIONAL factor
    keeps the test exact at any sensitivity (the default 9/8 resolves
    the mild daily swings of a near-uniform stream; a crawl spike
    detector would run 2/1). Output ``(event_type, day bigint,
    n_events, total_events, n_days)``, flagged cells only.

    Scale shape: one (type, day)-keyed count (map-side combined), the
    per-type totals aggregate FROM that daily frame (bounded by types x
    active days, never raw events) and broadcast back onto it.
    """
    e = _ep_events(events)
    daily = (
        e.select("etype", F.expr(f"ep div {DAY_S}").alias("day"))
        .groupBy("etype", "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    totals = daily.groupBy("etype").agg(
        F.sum("n_events").alias("total_events"),
        F.count(F.lit(1)).alias("n_days"),
    )
    return (
        daily.join(F.broadcast(totals), "etype")
        .where(
            F.lit(factor_den) * F.col("n_events") * F.col("n_days")
            > F.lit(factor_num) * F.col("total_events")
        )
        .select(
            F.col("etype").alias("event_type"),
            "day",
            "n_events",
            "total_events",
            "n_days",
        )
    )


SESSION_GAP_S = 1800


def session_funnel(
    events: DataFrame, steps: tuple[str, ...]
) -> DataFrame:
    """Ordered funnel at SESSION granularity — ``(step_idx int, step,
    n_sessions bigint)``: within each 30-min-inactivity session, count
    sessions completing ``steps[0..i]`` in strict timestamp order
    (funnel_counts' semantics with the key widened from user to
    (user, session)). The user-level funnel says WHO converts;
    this one says whether conversion happens in one sitting — the
    product-analytics pair every event pipeline ships together.

    Scale shape: session ids come from the q_sessionize device (lag +
    running count over a user-keyed window — one exchange, spill-safe
    ordered state); each funnel step is then a (user, session)-keyed
    min-agg + join exactly like funnel_counts, frames shrinking down
    the funnel.
    """
    from functools import reduce as _reduce

    from pyspark.sql import Window

    e = _ep_events(events)
    # deterministic session assignment: order by (ep, etype) — session
    # BOUNDARIES depend only on the epoch gap, and reordering equal-ep
    # rows cannot flip a gap comparison (gap is 0 either way), so the
    # per-row session id is order-independent where the sort key ties
    w = Window.partitionBy("user_id").orderBy("ep", "etype")
    gap = F.col("ep") - F.lag("ep").over(w)
    s = e.withColumn(
        "new_s",
        F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).select("user_id", "session_id", "etype", "ep")
    keys = ["user_id", "session_id"]
    per_step = []
    cur = (
        s.where(F.col("etype") == steps[0])
        .groupBy(*keys)
        .agg(F.min("ep").alias("t"))
    )
    per_step.append(cur)
    for st in steps[1:]:
        cur = (
            s.where(F.col("etype") == st)
            .join(cur, keys)
            .where(F.col("ep") > F.col("t"))
            .groupBy(*keys)
            .agg(F.min("ep").alias("t"))
        )
        per_step.append(cur)
    rows = [
        df.agg(
            F.lit(i + 1).cast("int").alias("step_idx"),
            F.lit(steps[i]).alias("step"),
            F.count(F.lit(1)).alias("n_sessions"),
        )
        for i, df in enumerate(per_step)
    ]
    return _reduce(DataFrame.unionByName, rows)
