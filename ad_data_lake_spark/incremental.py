"""Incremental-write semantics (SURVEY.md §2.9 T1–T3, §2.1 S15):
idempotent MERGE upsert and per-partition backfill over a parquet lake.

The reference's incremental contract: daily mode re-fetches only rows
with ``updated_time`` above a cutoff (reference
src/main_extractor.py:42-51,358) and re-writes whole dated folders per
backfill day (reference src/main_extractor.py:438-508) — re-running a
day must be idempotent. On Delta these are ``MERGE INTO`` and
``replaceWhere``; this container has no Delta jars, so:

- ``merge_upsert`` = read current ∪ updates → last-wins window dedupe
  → write to a staging dir → atomic directory swap. Same semantics as
  ``MERGE INTO t USING u ON t.id = u.id WHEN MATCHED UPDATE WHEN NOT
  MATCHED INSERT``, with a deterministic recency rule instead of
  arrival order (SURVEY §7 risk register: Spark needs an explicit
  tiebreak where the reference relied on dict overwrite order).
- ``backfill_partitions`` = dynamic partition overwrite — only the
  partitions present in the incoming frame are replaced, everything
  else untouched: exactly ``replaceWhere`` for the written keys.

Scale notes: the MERGE shuffle is one hash partition by key (the
window dedupe), and at 100 TB you'd bucket the target by the merge key
so the window never re-shuffles; backfill writes touch only the
affected date directories.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from ad_data_lake_spark.operators.windows import last_wins_dedupe


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: str,
    order_col: str,
    tiebreak: str,
) -> None:
    """Idempotent upsert: rows in ``updates`` win over the current
    table when newer by (order_col, tiebreak); unseen keys insert.
    Applying the same updates twice yields a byte-identical table."""
    if os.path.exists(target_path):
        current = spark.read.parquet(target_path)
        merged = current.unionByName(updates)
    else:
        merged = updates
    deduped = last_wins_dedupe(merged, key, order_col, tiebreak)

    staging = f"{target_path}.staging-{uuid.uuid4().hex[:8]}"
    deduped.write.mode("overwrite").parquet(staging)
    # atomic-ish swap: a reader never sees a PARTIAL table, but between
    # the two renames the target path briefly does not exist (a
    # concurrent reader gets FileNotFound). True old-or-new atomicity
    # needs a transactional table format (Delta/Iceberg metadata swap).
    old = f"{target_path}.old-{uuid.uuid4().hex[:8]}"
    if os.path.exists(target_path):
        os.rename(target_path, old)
        os.rename(staging, target_path)
        shutil.rmtree(old)
    else:
        os.rename(staging, target_path)


def backfill_partitions(
    df_slice: DataFrame,
    target_path: str,
    partition_cols: tuple[str, ...] = ("snapshot_date",),
) -> None:
    """T2: per-day (per-partition) backfill. Dynamic partition
    overwrite replaces only the partitions present in ``df_slice`` —
    the ``replaceWhere``-style idempotent re-run of one day. The
    overwrite mode is passed as a writer option so the session conf is
    never mutated."""
    (
        df_slice.repartition(*partition_cols)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(target_path)
    )
