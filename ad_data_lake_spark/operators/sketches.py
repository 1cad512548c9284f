"""Mergeable-sketch aggregates: HyperLogLog reach rollups.

A2's reach (distinct users) is computed exactly (`countDistinct`) for
oracle parity and approximately (`approx_count_distinct`) as the cheap
one-shot path. Neither survives the third way reach is actually
consumed at 100 TB: PRE-AGGREGATED. A reporting stack materializes
per-(day, type) rows once and answers month/quarter/campaign rollups
from that table — but distinct counts don't add, so the materialized
row must carry a MERGEABLE sketch, not a number. That is exactly what
the reference's Insights API does server-side (reach re-requested per
level/date-preset instead of summed, reference
src/extractors/api_extractor.py:79-137); this module reproduces it
engine-side with Spark's DataSketches HLL functions:

- ``daily_reach_sketches``: the silver table — per (day, event_type)
  one HLL sketch of user_id (bounded bytes per row, lgK-configurable).
- ``reach_rollup_from_sketches``: the gold rollup — per event_type
  merge the day sketches (``hll_union_agg``) and estimate. Reads ONLY
  the sketch table: rolling up a quarter touches 90×|types| rows, not
  the events fact. Re-keying (per-campaign, per-account) is the same
  shape at any grain.

Error contract: estimates carry the standard HLL relative error
(~1.04/√2^lgK ≈ 1.6 % at the default lgK=12), asserted against exact
reach in tests/test_approx_bounds.py. Sketch BYTES are not
cross-engine-reproducible, so the registry row is rows-only (the
driver's weaker check); the error-bound and rollup≡direct tests are
the real gate, mirroring how approx_count_distinct is handled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_reach_sketches(events: DataFrame) -> DataFrame:
    """Per (day, event_type): event count, summed value, and the HLL
    user sketch — the materialized row every downstream rollup merges.
    One shuffle (the groupBy); sketches build map-side like any other
    partial aggregate."""
    return events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("event_date"),
        "event_type",
    ).agg(
        F.count("*").alias("events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.hll_sketch_agg("user_id").alias("reach_sketch"),
    )


def reach_rollup_from_sketches(events: DataFrame) -> DataFrame:
    """Roll daily sketches up to per-type reach WITHOUT re-reading the
    fact: union the day sketches and estimate. Output keeps the
    additive measures alongside to show they sum normally while reach
    merges through the sketch."""
    daily = daily_reach_sketches(events)
    return (
        daily.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.sum("events").alias("events"),
            F.round(F.sum("total_value"), 2).alias("total_value"),
            F.hll_sketch_estimate(F.hll_union_agg("reach_sketch")).alias(
                "est_reach"
            ),
        )
        .orderBy("event_type")
    )
