"""Structured Streaming incremental path — see
``ad_data_lake_spark.streaming.incremental`` (T1 daily incremental
with watermark + dedupe, T4 late/duplicate handling)."""

from ad_data_lake_spark.streaming.incremental import (  # noqa: F401
    batch_equivalent,
    run_available_now,
    streaming_daily_insights,
    streaming_sliding_insights,
)
