"""Lake sinks (SURVEY.md §2.1 S12/S14): partitioned table writes and
the nested-report JSON sink.

The reference writes every stage as date-partitioned JSON files —
``output/<YYYY-MM-DD>/<entity>_act_<id>.json`` (reference
src/utils/storage.py:9-16, layout src/main_extractor.py:363,371,378,
398,436) — and one nested report document (reference
src/tools/campaign_inspector.py:292-304). Here the same contracts are
parquet tables partitioned by (snapshot_date, account-like key) and
``df.write.json`` for the report.

Scale notes (100 TB):
- ``partitionBy(date, account)`` mirrors the reference's layout and
  gives partition pruning to every incremental/backfill reader;
- writers ``repartition`` on the partition columns first so each
  task writes one file per partition instead of `tasks × partitions`
  small files — the classic small-file failure at scale;
- on a Delta-capable cluster these writes become ``format("delta")``
  with identical semantics; this container has no Delta jars, so
  parquet + explicit layout carries the contract (documented at each
  call).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("snapshot_date",),
    mode: str = "overwrite",
) -> None:
    """S12: partitioned table write. Repartitioning by the partition
    columns bounds output files at one-per-partition-per-skew-split."""
    (
        df.repartition(*partition_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_lake(spark: SparkSession, path: str) -> DataFrame:
    """Read a lake table root; partition columns come back as columns
    and predicates on them prune directories before any IO."""
    return spark.read.parquet(path)


def write_nested_report_json(df: DataFrame, path: str) -> None:
    """S14: the inspector's nested report as JSON documents — one line
    per parent, nested arrays inline (reference
    src/tools/campaign_inspector.py:292-304 writes exactly one such
    document per campaign)."""
    df.write.mode("overwrite").json(path)
