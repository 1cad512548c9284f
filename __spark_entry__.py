"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``ad_data_lake_spark``; this module only
adapts the registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ad_data_lake_spark import queries as _registry
from ad_data_lake_spark.operators.aggregates import agg_action_type
from ad_data_lake_spark.sources.tables import load_table

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: daily insights at the
    action_type breakdown grain — per (day, event_type) event counts,
    summed value, and distinct-user reach over the raw events fact
    (the engine-side recomputation of the reference's async insights
    job, reference src/main_extractor.py:453-466).
    """
    return agg_action_type(load_table(spark, "events", SMOKE_SF_DIR))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (subset: queries whose
    semantics are SQL-expressible; others get rows-only checks)."""
    return _registry.oracle_sqls()
