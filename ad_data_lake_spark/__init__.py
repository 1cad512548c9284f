"""ad_data_lake_spark — a PySpark-native analytics engine.

Re-expresses the query/data-processing capabilities of the reference
ad-tech data lake (bebluke/ad_data_lake) as an idiomatic Spark engine:

- ``sources``     — table loaders over the parquet fixtures
- ``sinks``       — partitioned lake writes + nested-report JSON sink
- ``incremental`` — idempotent MERGE upsert + partition-scoped backfill
- ``functions``   — the sanitize/normalize scalar layer as native Column exprs
- ``operators``   — relational core, aggregates, hierarchy, windows
- ``llm``         — dedup (exact/MinHash-LSH/SimHash), text analysis,
                    embedding similarity search, multimodal plumbing
- ``streaming``   — Structured Streaming incremental path (watermark +
                    dedupe + windowed insights)
- ``plans``       — schema-walking expression generators (recursive sanitize)
- ``queries``     — the oracle-checked query registry (driver contract)

Design for scale (100 TB north star): everything is declared through the
DataFrame API so Catalyst handles pushdown/pruning; dims are broadcast;
facts are partitioned by date; AQE is always on; Python never appears in
hot paths except Arrow-batched pandas UDFs where genuinely required.
"""

from ad_data_lake_spark.session import get_spark
from ad_data_lake_spark.sources.tables import TABLE_NAMES, load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables", "TABLE_NAMES"]

__version__ = "0.1.0"
