"""SparkSession factory with scale-oriented defaults.

Everything here is chosen for the 100 TB target, then sized down by env
vars for local testing:

- AQE on (runtime join-strategy switch, skew-join splitting, partition
  coalescing) — replaces the reference's hand-rolled "account-level scan
  vs per-parent batched fallback" logic (reference
  src/main_extractor.py:372-384).
- UTC session timezone — the reference normalizes every timestamp to UTC
  (reference src/utils/api_helpers.py:56-95); the DuckDB oracle assumes
  the same.
- Arrow enabled for pandas UDF / toPandas paths.
- shuffle partitions default 32 locally; on a real cluster AQE coalesces
  from a high initial count, so we also leave
  ``spark.sql.adaptive.coalescePartitions.enabled`` on.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "ad_data_lake_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default 32 to match
    the driver's bench harness).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- correctness-critical session config ---
        .config("spark.sql.session.timeZone", "UTC")
        # --- adaptive execution: broadcast/skew decisions at runtime ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        # --- Arrow for any pandas-UDF / toPandas boundary ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # --- parquet scan behavior ---
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # long-lived-driver hygiene: the ContextCleaner only reclaims
        # dropped shuffle files / broadcasts / checkpointed RDDs after
        # a JVM GC notices the dropped references; the 30-min default
        # lets hundreds of executed queries accumulate block-manager
        # state in one session (observed ~10-30% late-run inflation in
        # the bench harness). Standard practice for any long-running
        # driver, ours included.
        .config("spark.cleaner.periodicGC.interval", "90s")
        # local JVM sizing; ignored when a real cluster supplies resources
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # (r14 note: -XX:+ExplicitGCInvokesConcurrent was tried for the
        # periodic cleaner GC and reverted — measured System.gc() pause
        # on this heap is ~37 ms, so the concurrent mode buys nothing.)
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    return builder.getOrCreate()
