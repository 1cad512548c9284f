"""The daily extract pipeline — the reference's batch lifecycle
(`python src/main_extractor.py`, SURVEY.md §3.1) composed end-to-end
from the engine's operators.

Reference flow (src/main_extractor.py:340-520): daily mode computes an
``updated_time`` cutoff, scans campaigns with the filter pushed into
the request, fetches ad sets / ads per parent, point-looks-up the
referenced creatives, writes every entity into a dated snapshot folder,
then aggregates insights per level per day and writes those too.

Engine form — each step is the already-oracle-checked operator, chained:

1. parent scan + projection/filter pushdown      (S1,  relational.scan_project)
2. child fetch ≡ semi join on parent keys        (S3/S5, semi join)
3. creative point-lookup ≡ broadcast semi join   (S6)
4. sanitize the outbound payload shape           (F1–F14 composite)
5. bronze snapshot write, date-partitioned       (S12/T3, sinks.write_partitioned)
6. per-day insights aggregate                    (S7/A1, aggregates)
7. idempotent MERGE into the silver fact         (S15/T1, incremental.merge_upsert)

The returned DataFrame is the run summary (stage → row count), fully
computed engine-side (no driver loops); the DuckDB oracle recomputes
every count straight from the sources, so a hash match certifies the
whole composition's row accounting end-to-end.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ad_data_lake_spark import incremental, sinks
from ad_data_lake_spark.operators import relational, sanitize_queries
from ad_data_lake_spark.sources.tables import load_table

EVENTS_DAY = "2024-01-15"

def _count_stage(df: DataFrame, stage: str) -> DataFrame:
    return df.agg(F.count("*").alias("n_rows")).select(F.lit(stage).alias("stage"), "n_rows")


def daily_extract(
    spark: SparkSession, sf_dir: str, lake_dir: str | None = None, run_day: str = EVENTS_DAY
) -> DataFrame:
    """One daily run over the fixture lake; returns the stage summary."""
    if lake_dir is None:
        from ad_data_lake_spark.scratch import scratch_dir

        lake_dir = scratch_dir(spark, "pipeline", sf_dir)

    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    events = load_table(spark, "events", sf_dir)

    # 1. parent scan: projection + status filter reach the parquet scan
    campaigns = relational.scan_project(orders)

    # 2. child fetch: the reference's per-campaign batched /adsets calls
    #    collapse into one semi join on the parent key set
    ads = lineitem.join(
        campaigns.select(F.col("o_orderkey").alias("_pk")).distinct(),
        lineitem.l_orderkey == F.col("_pk"),
        "left_semi",
    )

    # 3. creative point-lookup batch: broadcast semi join on referenced ids
    creative_ids = ads.select(F.col("l_partkey").alias("_ck")).distinct()
    creatives = part.join(
        F.broadcast(creative_ids), part.p_partkey == F.col("_ck"), "left_semi"
    )

    # 4. outbound sanitize (the POST-shape composite over the parent scan)
    sanitized = sanitize_queries.sanitize_campaign(orders)

    # 5. bronze snapshot: dated partition layout (reference output/<date>/)
    day_events = relational.filter_time_range(events, run_day).withColumn(
        "snapshot_date", F.date_format("ts", "yyyy-MM-dd")
    )
    sinks.write_partitioned(day_events, os.path.join(lake_dir, "bronze_events"))

    # 6. per-day insights aggregate over the snapshot just written
    bronze = sinks.read_lake(spark, os.path.join(lake_dir, "bronze_events"))
    insights = (
        bronze.groupBy(F.col("snapshot_date").cast("string").alias("snapshot_date"), "event_type")
        .agg(F.count("*").alias("events"), F.round(F.sum("value"), 2).alias("total_value"))
    )

    # 7. idempotent MERGE of the day's rows into the silver fact — run
    #    twice like a re-triggered daily job; second apply is a no-op
    silver = os.path.join(lake_dir, "silver_events")
    slim = day_events.select("event_id", "ts", "user_id", "event_type", "value")
    incremental.merge_upsert(spark, silver, slim, "event_id", "ts", "value")
    incremental.merge_upsert(spark, silver, slim, "event_id", "ts", "value")
    silver_df = incremental.read_merged(spark, silver)

    return (
        _count_stage(campaigns, "campaigns_scanned")
        .unionByName(_count_stage(ads, "ads_fetched"))
        .unionByName(_count_stage(creatives, "creatives_fetched"))
        .unionByName(_count_stage(sanitized, "payloads_sanitized"))
        .unionByName(_count_stage(bronze, "bronze_rows"))
        .unionByName(_count_stage(insights, "insight_groups"))
        .unionByName(_count_stage(silver_df, "silver_rows"))
    )
