"""Temporal joins the engine adds beyond the reference: as-of join
(last-touch attribution) and interval/range join (flight-window
rollup).

The reference never joins on time — its API returns insights already
attributed and windowed (reference src/extractors/api_extractor.py:79-137
requests `time_increment: 1` and receives per-day rows). A lake that
*produces* those tables from raw impressions needs exactly these two
operators:

- ``asof_attribution``: for each conversion, the same user's most
  recent *strictly earlier* touch (click/view) — last-touch
  attribution. Implemented with the union-marker technique: tag both
  sides, union, one window over (user_id, time) carrying the last
  touch forward, filter back to conversion rows. ONE shuffle + sort on
  the user key, zero range explosion, no per-row lookups — the classic
  scale-correct as-of shape (a sort-merge as-of in one pass). At 100 TB
  both sides come from the same bucketed events fact, so the exchange
  disappears entirely under a user_id-bucketed layout.
- ``flight_window_rollup``: aggregate events into *overlapping* time
  intervals (campaign flights). A naive `t BETWEEN start AND end` join
  is a nested-loop over every (event, flight) pair. Here intervals are
  exploded into day bins and events keyed by day, so the join is a
  plain equi-join on the bin plus an exact residual range filter —
  candidate volume scales with events × overlap-degree, not
  events × flights. With a small flight dim the bin table is
  broadcast (no shuffle at all); with a large one the same plan is a
  shuffle equi-join on the bin key. Bins partition the time axis, so
  each (event, flight) pair meets exactly once — no distinct needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TOUCH_TYPES = ("click", "view")
CONV_TYPE = "purchase"

N_FLIGHTS = 20
FLIGHT_SPAN_DAYS = 5
FLIGHT_EPOCH = "2024-01-01"


def asof_attribution(
    events: DataFrame,
    touch_types: tuple[str, ...] = TOUCH_TYPES,
    conv_type: str = CONV_TYPE,
) -> DataFrame:
    """Last-touch attribution as-of join (DuckDB oracle: ASOF LEFT
    JOIN with ``touch.ts < conv.ts``).

    Union-marker plan: touches and conversions are tagged and
    unioned; a single window over (user_id) ordered by
    (ts, is_touch, sort_id) carries the latest touch struct forward
    with ``last(..., ignorenulls)``; conversion rows then read their
    attribution off the carried value. Ordering conversions *before*
    touches at equal ts implements the strict inequality. Touches are
    pre-deduped to one per (user_id, ts) (max event_id) so the pick at
    any boundary is deterministic on both engines.
    """
    touches = (
        events.where(F.col("event_type").isin(*touch_types))
        .groupBy("user_id", "ts")
        .agg(
            F.max(
                F.struct(
                    F.col("event_id").alias("touch_event_id"),
                    F.col("event_type").alias("touch_type"),
                )
            ).alias("m")
        )
        .select(
            "user_id",
            "ts",
            F.lit(1).alias("is_touch"),
            F.col("m.touch_event_id").alias("touch_event_id"),
            F.col("m.touch_type").alias("touch_type"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    convs = events.where(F.col("event_type") == conv_type).select(
        "user_id",
        "ts",
        F.lit(0).alias("is_touch"),
        F.lit(None).cast("long").alias("touch_event_id"),
        F.lit(None).cast("string").alias("touch_type"),
        "event_id",
        "value",
    )
    u = touches.unionByName(convs).withColumn(
        "sort_id", F.coalesce("event_id", "touch_event_id")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_touch", "sort_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(
        F.when(
            F.col("is_touch") == 1,
            F.struct(
                F.col("touch_event_id"), F.col("touch_type"), F.col("ts").alias("touch_ts")
            ),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        u.withColumn("attr", carried)
        .where(F.col("is_touch") == 0)
        .select(
            F.col("event_id").alias("conv_event_id"),
            "user_id",
            F.col("ts").alias("conv_ts"),
            F.round("value", 2).alias("conv_value"),
            F.col("attr.touch_event_id").alias("touch_event_id"),
            F.col("attr.touch_type").alias("touch_type"),
            F.col("attr.touch_ts").alias("touch_ts"),
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("attr.touch_ts"))).alias(
                "micros_since_touch"
            ),
        )
    )


def flight_dim(spark: SparkSession, n_flights: int = N_FLIGHTS) -> DataFrame:
    """Deterministic overlapping flight windows: flight i runs
    [epoch + i days, epoch + i + FLIGHT_SPAN_DAYS days) — every day is
    covered by up to FLIGHT_SPAN_DAYS flights, so the range join below
    is genuinely many-to-many."""
    start = F.timestamp_add("DAY", F.col("flight_id").cast("int"), F.lit(FLIGHT_EPOCH).cast("timestamp"))
    end = F.timestamp_add(
        "DAY", (F.col("flight_id") + FLIGHT_SPAN_DAYS).cast("int"), F.lit(FLIGHT_EPOCH).cast("timestamp")
    )
    return spark.range(n_flights).select(
        F.col("id").alias("flight_id"),
        start.alias("flight_start"),
        end.alias("flight_end"),
    )


def flight_window_rollup(events: DataFrame, flights: DataFrame) -> DataFrame:
    """Interval/range join via day-binning: explode each flight into
    its covered day bins, key events by day, equi-join on the bin,
    keep the exact residual range predicate, aggregate per flight.

    The residual ``ts >= start AND ts < end`` is a no-op for
    day-aligned flights but kept so arbitrary (sub-day) intervals stay
    correct with the same plan: the last bin is derived from the final
    covered INSTANT (``flight_end - 1 microsecond``), so a flight
    ending mid-day still gets a bin for its partial last day and the
    residual predicate trims it exactly. The bin table is broadcast —
    flights are a dim; were the interval side large, dropping the
    broadcast hint yields the same equi-join shape as a shuffle on
    day_bin."""
    last_instant = F.timestamp_add("MICROSECOND", F.lit(-1), F.col("flight_end"))
    fbins = flights.select(
        "flight_id",
        "flight_start",
        "flight_end",
        F.explode(
            F.sequence(
                F.datediff(F.to_date("flight_start"), F.lit(FLIGHT_EPOCH).cast("date")),
                F.datediff(F.to_date(last_instant), F.lit(FLIGHT_EPOCH).cast("date")),
            )
        ).alias("day_bin"),
    )
    ev = events.select(
        "user_id",
        "ts",
        "value",
        F.datediff(F.to_date("ts"), F.lit(FLIGHT_EPOCH).cast("date")).alias("day_bin"),
    )
    return (
        ev.join(F.broadcast(fbins), "day_bin")
        .where((F.col("ts") >= F.col("flight_start")) & (F.col("ts") < F.col("flight_end")))
        .groupBy("flight_id", "flight_start", "flight_end")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
