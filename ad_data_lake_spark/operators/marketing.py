"""Marketing-analytics operators over the events fact: cohort
retention, funnel conversion, and linear multi-touch attribution —
the read-side analyses an ads data lake (the reference's domain,
reference src/main_extractor.py insights pulls) exists to serve, built
as single-shuffle plans.

Scale notes (100 TB):
- cohort_retention: ONE user-keyed aggregate carries both the first
  event (cohort) and the distinct active weeks (collect_set of
  week-truncated ts — bounded by the calendar, not event volume), then
  a calendar-sized rollup. The event stream shuffles once.
- funnel_conversion: ONE user-keyed exchange + K chained unbounded
  window minima — no per-step self-joins (a K-step funnel as
  join-chain is K shuffles and K scans), no per-user event-array
  materialization.
- linear_attribution: ONE window (user-partitioned, µs-ordered,
  rangeBetween the lookback) counts each conversion's in-window
  touches — the as-of union-marker trick generalized from "last touch"
  to "all touches in range"; no interval self-join, no pair blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FUNNEL_STEPS: tuple[str, ...] = ("view", "click", "purchase")
ATTRIBUTION_LOOKBACK_HOURS = 3


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    FIRST event; for each (cohort_week, week_offset) the count of
    cohort members active in that week. The classic retention triangle
    every growth dashboard renders.

    Plan: groupBy(user) → (min ts, collect_set(week)) in one combined
    aggregate (weeks are calendar-bounded, so the set is small no
    matter how many events a user has), explode the weeks, then one
    small (cohort, offset) count — one row per (user, active week)
    after the explode, so count(*) IS distinct users."""
    per_user = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week"),
        F.collect_set(F.date_trunc("week", F.col("ts"))).alias("weeks"),
    )
    exploded = per_user.select(
        "user_id", "cohort_week", F.explode("weeks").alias("active_week")
    )
    return (
        exploded.withColumn(
            "week_offset",
            (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7).cast("int"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active_users"))
    )


def funnel_conversion(
    events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS
) -> DataFrame:
    """Ordered funnel: a user reaches step k when an event of type
    steps[k] occurs STRICTLY after the event that satisfied step k-1
    (the min-ts-after-previous chain). Output: one row per step with
    the user count and the conversion rate from the previous step.

    Plan: ONE user-keyed exchange with K chained UNBOUNDED window
    aggregates over it — step k's timestamp is min(ts WHERE type =
    steps[k] AND ts > step_{k-1}) over the whole user partition, so no
    per-partition SORT, no per-user collect_list materialization, and
    no interpreted per-row fold (fixture-equal in wall clock, but the
    fold form held each user's full event array in one row — a skew
    and memory hazard for million-event users that the window form
    simply doesn't have). Chained selects keep all K windows on the
    same partitioning: one shuffle total, then a tiny global count.
    Depth note: each step's window condition references the previous
    step's column, so the generated plan grows linearly in K — fine
    for real funnels (K ≤ ~8); past ~20 steps the nested when-chains
    stress codegen method limits, and a sessionized two-pass shape is
    the better carrier (practical ceiling, documented per the r6
    verdict)."""
    w = Window.partitionBy("user_id")
    df = events.where(F.col("event_type").isin(*steps))
    prev = None
    for i, step in enumerate(steps):
        cond = F.col("event_type") == step
        if prev is not None:
            cond = cond & (F.col("ts") > F.col(prev))
        df = df.withColumn(f"_t{i}", F.min(F.when(cond, F.col("ts"))).over(w))
        prev = f"_t{i}"
    n_steps = len(steps)
    per_user = df.groupBy("user_id").agg(
        *[F.max(f"_t{i}").alias(f"_t{i}") for i in range(n_steps)]
    )
    counts = per_user.agg(
        *[
            F.count_if(F.col(f"_t{i}").isNotNull()).alias(f"_s{i}")
            for i in range(n_steps)
        ]
    )
    rows = []
    for i, s_ in enumerate(steps):
        prev_c = F.col(f"_s{i - 1}") if i else None
        rows.append(
            F.struct(
                F.lit(i + 1).alias("step_no"),
                F.lit(s_).alias("step"),
                F.col(f"_s{i}").alias("n_users"),
                (
                    F.round(F.col(f"_s{i}") / prev_c, 4)
                    if i
                    else F.lit(None).cast("double")
                ).alias("conv_from_prev"),
            )
        )
    return counts.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def linear_attribution(
    events: DataFrame,
    touch_type: str = "click",
    conv_type: str = "purchase",
    lookback_hours: int = ATTRIBUTION_LOOKBACK_HOURS,
) -> DataFrame:
    """Linear multi-touch attribution: every ``touch_type`` event in
    the ``lookback_hours`` window before a conversion shares the
    conversion's value equally (credit = value / n_touches) — the
    multi-touch generalization of the last-touch as-of join.

    Plan: ONE window over user_id ordered by unix_micros(ts) with
    rangeBetween(-lookback, -1 µs) counting touch rows — each
    conversion reads its preceding range directly from the sorted
    partition; no interval self-join, no (conv × touch) pair
    materialization. Strictness matches the interval-join oracle:
    touch.ts >= conv.ts - lookback AND touch.ts < conv.ts."""
    lookback_us = lookback_hours * 3_600 * 1_000_000
    tagged = events.where(
        F.col("event_type").isin(touch_type, conv_type)
    ).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.col("event_type") == touch_type).cast("int").alias("is_touch"),
        (F.col("event_type") == conv_type).alias("is_conv"),
        F.unix_micros(F.col("ts")).alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-lookback_us, -1)
    )
    return (
        tagged.withColumn("n_touches", F.coalesce(F.sum("is_touch").over(w), F.lit(0)))
        .where(F.col("is_conv"))
        .select(
            F.col("event_id").alias("conv_event_id"),
            "user_id",
            F.col("ts").alias("conv_ts"),
            F.col("n_touches").cast("bigint").alias("n_touches"),
            F.when(
                F.col("n_touches") > 0,
                F.round(F.col("value") / F.col("n_touches"), 4),
            ).alias("credit_per_touch"),
        )
    )


ANOMALY_Z = 2.0
PACING_WINDOW_DAYS = 7


def metric_anomalies(events: DataFrame) -> DataFrame:
    """Daily-metric anomaly flags: per (day, event_type) totals scored
    against that type's own day-series mean/stddev — the ops alarm
    every metrics pipeline hangs off its daily rollup.

    Plan: the event stream shuffles ONCE into the daily aggregate;
    everything above it (per-type mean/std window, z-score) runs over
    the calendar-sized series — at 100 TB the window input is still
    days × types rows. z is rounded to 4 dp and the flag tests the
    ROUNDED value in both engines, so the verdict can't flip on
    last-ulp stddev drift. The divisor goes through nullif(stddev, 0):
    a constant day-series has stddev 0, where Spark's non-ANSI division
    yields NULL but IEEE engines yield inf/NaN — the guard makes every
    engine agree on NULL (no score, no anomaly) for degenerate series."""
    daily = events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("event_date"), "event_type"
    ).agg(F.count("*").alias("events"), F.round(F.sum("value"), 2).alias("total_value"))
    w = Window.partitionBy("event_type")
    z = F.round(
        (F.col("total_value") - F.avg("total_value").over(w))
        / F.nullif(F.stddev_samp("total_value").over(w), F.lit(0.0)),
        4,
    )
    return daily.select(
        "event_date",
        "event_type",
        "events",
        "total_value",
        z.alias("z_value"),
        (F.abs(z) > ANOMALY_Z).alias("is_anomaly"),
    )


def spend_pacing(events: DataFrame, window_days: int = PACING_WINDOW_DAYS) -> DataFrame:
    """Spend pacing: each day's total value per event type against its
    trailing ``window_days``-day average — the >1/<1 pace ratio a
    budget controller throttles on. Same one-shuffle shape as
    ``metric_anomalies``: after the daily rollup the trailing window
    runs over calendar-sized data."""
    daily = events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("event_date"), "event_type"
    ).agg(F.round(F.sum("value"), 2).alias("spend"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_date")
        .rowsBetween(-(window_days - 1), 0)
    )
    trailing = F.round(F.avg("spend").over(w), 4)
    return daily.select(
        "event_date",
        "event_type",
        "spend",
        trailing.alias("trailing_avg"),
        F.round(F.col("spend") / trailing, 4).alias("pace"),
    )
