"""ad_data_lake_spark — a PySpark-native analytics engine.

Re-expresses the query/data-processing capabilities of the reference
ad-tech data lake (bebluke/ad_data_lake) as an idiomatic Spark engine:

- ``sources``    — table loaders + partitioned parquet sinks (bronze/silver/gold)
- ``functions``  — the sanitize/normalize scalar layer as native Column exprs
- ``operators``  — relational core, aggregates, hierarchy, dedup, similarity
- ``streaming``  — Structured Streaming incremental path
- ``queries``    — the oracle-checked query registry (driver contract)

Design for scale (100 TB north star): everything is declared through the
DataFrame API so Catalyst handles pushdown/pruning; dims are broadcast;
facts are partitioned by date; AQE is always on; Python never appears in
hot paths except Arrow-batched pandas UDFs where genuinely required.
"""

from ad_data_lake_spark.session import get_spark
from ad_data_lake_spark.sources.tables import TABLE_NAMES, load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables", "TABLE_NAMES"]

__version__ = "0.1.0"
