"""Insights aggregates: the reference delegates these to Meta's Insights
API (reference src/extractors/api_extractor.py:79-137 submits async jobs
at level ∈ {ad, adset, campaign}); this engine computes the same shapes
from the raw ``events`` fact (SURVEY.md §2.4 A1–A5).

Scale notes:
- every aggregate here is a single hash-aggregate with map-side partial
  combine; no joins, no second shuffle.
- reach is a distinct count and does NOT roll up across grains
  (reference fetches it per level for exactly this reason, SURVEY A3) —
  ``agg_rollup`` recomputes from the fact per grouping set in one pass
  via ROLLUP, which Spark plans as a single Expand+Aggregate.
- ``approx_`` variants are the 100 TB path (HLL sketch, constant memory
  per group); exact variants exist for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _day(col: str = "ts") -> Column:
    return F.date_trunc("day", F.col(col)).alias("event_date")


def _safe_div(num: Column, den: Column) -> Column:
    """Divide-by-zero guard used by every derived ratio metric
    (reference declares cpc/cpm/ctr as fetched fields,
    src/configs/fields_schema.py:224-232; we must compute them)."""
    return F.when(den != 0, num / den)


def agg_action_type(events: DataFrame) -> DataFrame:
    """A1: per (day, action_type) metric block — the
    ``action_breakdowns=['action_type']`` insights job (reference
    src/main_extractor.py:453-466). event_type plays action_type.
    """
    return events.groupBy(_day(), "event_type").agg(
        F.count("*").alias("events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.countDistinct("user_id").alias("unique_users"),
    )


def agg_reach_frequency(events: DataFrame, exact: bool = True) -> DataFrame:
    """A2: reach (distinct users) + frequency (= impressions/reach) per
    entity (reference src/configs/fields_schema.py:275-284,219).
    ``exact=False`` switches to approx_count_distinct — the scale path.
    """
    reach = F.countDistinct("user_id") if exact else F.approx_count_distinct("user_id")
    impressions = F.count("*")
    return events.groupBy("event_type").agg(
        impressions.alias("impressions"),
        reach.alias("reach"),
        F.round(impressions / reach, 4).alias("frequency"),
    )


def agg_rollup(events: DataFrame) -> DataFrame:
    """A3/A4: the ad/adset/campaign summary triple as one ROLLUP pass —
    grouping sets over (event_type) ⊃ (event_type, day) plus grand total.
    Distinct counts are recomputed per grouping set (they don't roll up).
    """
    return (
        events.rollup("event_type", _day())
        .agg(
            F.count("*").alias("impressions"),
            F.countDistinct("user_id").alias("reach"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
            F.col("event_date"),
            "impressions",
            "reach",
            "total_value",
        )
    )


def derived_ratio_metrics(lineitem: DataFrame) -> DataFrame:
    """A5: derived ratio metrics with zero-guards over the ad-like fact —
    pricing-summary shape (flagship). cpc/cpm/ctr analogues: every ratio
    uses ``_safe_div``; rounding fixes cross-engine float wobble.
    """
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = net * (1 + F.col("l_tax"))
    spend = F.sum(net)
    qty = F.sum("l_quantity")
    return lineitem.where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    ).groupBy("l_returnflag", "l_linestatus").agg(
        F.round(qty, 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(spend, 2).alias("sum_disc_price"),
        F.round(F.sum(charge), 2).alias("sum_charge"),
        F.count("*").alias("count_order"),
        F.round(_safe_div(spend, qty), 4).alias("avg_net_per_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
    )


def agg_action_breakdown(events: DataFrame) -> DataFrame:
    """A1-explode: the insights ``actions`` array-of-structs shape
    (reference src/configs/fields_schema.py:229-231 — arrays of
    {action_type, value}) built golden-style per event row, ``explode``d
    to per-action rows (SURVEY §2.10: the one table-generating
    pattern), then aggregated per action_type.

    Scale note: explode multiplies rows before the shuffle, but the
    aggregate's map-side partial combine collapses them again within
    the scan stage — the shuffle carries one row per (partition,
    action_type), not per exploded row.
    """
    actions = F.array(
        F.struct(
            F.col("event_type").alias("action_type"), F.col("value").alias("value")
        ),
        F.struct(
            F.lit("offsite_total").alias("action_type"),
            (F.col("value") * 2).alias("value"),
        ),
    )
    return (
        events.select(F.explode(actions).alias("a"))
        .groupBy(F.col("a.action_type").alias("action_type"))
        .agg(
            F.count("*").alias("n_actions"),
            F.round(F.sum("a.value"), 2).alias("total_value"),
        )
    )


def count_summary(events: DataFrame) -> DataFrame:
    """A8: count summaries (reference prints per-account pixel counts,
    src/extractors/get_pixels.py:54; report counts
    src/tools/campaign_inspector.py:304)."""
    return events.groupBy("event_type").agg(F.count("*").alias("n"))


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_action_metrics(events: DataFrame) -> DataFrame:
    """Per-day action-type pivot: the wide per-row metric layout the
    reference's insights rows carry (one column per action metric,
    reference src/configs/fields_schema.py:200-231) produced from the
    long fact.

    The pivot values are DECLARED (EVENT_TYPES), not discovered — at
    scale an undeclared pivot first runs a distinct job over the fact
    to learn the columns; declaring them keeps this a single groupBy
    with map-side combine, shuffling one row per (day, type)."""
    return (
        events.groupBy(_day().alias("event_date"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
        .withColumnsRenamed({t: f"n_{t}" for t in EVENT_TYPES})
    )


def agg_percentiles(events: DataFrame, exact: bool = True) -> DataFrame:
    """Value percentiles (p50/p90/p99) per event type — the
    distribution summary behind budget/bid diagnostics. Exact
    ``percentile`` keeps the oracle comparable (DuckDB quantile_cont,
    same linear interpolation); ``exact=False`` is the 100 TB path —
    ``approx_percentile`` (KLL-style sketch, map-side mergeable, one
    pass, bounded memory) at the cost of oracle exactness. Measured
    max relative error vs exact: 0.71% across all cells at sf0.01
    (tests/test_approx_bounds.py; REPORT.md)."""

    def pct(p: float) -> Column:
        if exact:
            return F.percentile("value", F.lit(p))
        return F.approx_percentile("value", F.lit(p), F.lit(10_000))

    return events.groupBy("event_type").agg(
        F.round(pct(0.5), 4).alias("p50"),
        F.round(pct(0.9), 4).alias("p90"),
        F.round(pct(0.99), 4).alias("p99"),
        F.round(F.max("value"), 4).alias("p100"),
    )
