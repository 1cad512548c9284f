"""A Spark Python DataSource for the reference's paginated-API ingest
shape (reference src/extractors/api_extractor.py + the per-page drains
in src/main_extractor.py:78-90): entities arrive as JSON pages of
``limit`` rows behind an opaque cursor, and the extractor loops
``while next_page: fetch``.

The Spark-first re-expression is a custom DataSource whose
**partitions ARE the pages**: the driver-side planner lists the page
index (here, page files under a directory — a real deployment lists
cursor ranges or async-job shards the same way, reference
src/extractors/api_extractor.py:87 ``limit=1000``), and each Spark
task reads ONE page independently — the sequential
paginate-sleep-paginate loop of the reference becomes an
embarrassingly parallel scan with per-page retry isolation for free
(a failed page retries as a task, not a run).

This is the idiomatic Spark 4 Python DataSource API
(``spark.dataSource.register`` + ``spark.read.format("ad_api_pages")``)
— not a mapPartitions hack: schema declaration, partition planning,
and per-partition reads all go through the engine's source contract,
so column pruning and the rest of the scan machinery see a normal
source.

Page payloads use the reference's envelope: one JSON object per file,
``{"data": [row, ...], "paging": {...}}`` (reference
src/utils/api_helpers.py response shape). ``PAGE_SIZE`` mirrors the
reference's insights page size.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

PAGE_SIZE = 1000  # reference src/extractors/api_extractor.py:87
FORMAT_NAME = "ad_api_pages"


class _PagePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class AdApiPagesReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ad_api_pages requires a 'path' option")
        self.fields = [f.name for f in schema.fields]

    def partitions(self):
        # one partition per page file — the cursor walk, parallelized
        return [
            _PagePartition(os.path.join(self.path, f))
            for f in sorted(os.listdir(self.path))
            if f.endswith(".json")
        ]

    def read(self, partition):
        if partition is None:  # zero pages: Spark still schedules one task
            return
        with open(partition.path) as fh:
            envelope = json.load(fh)
        for row in envelope.get("data", []):
            yield tuple(row.get(k) for k in self.fields)


class AdApiPagesSource(DataSource):
    """``spark.read.format("ad_api_pages").schema(...).load(path)``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        raise NotImplementedError(
            "ad_api_pages requires an explicit .schema(...) — API page"
            " envelopes carry no self-describing schema (the reference"
            " declares field lists per request, src/main_extractor.py)"
        )

    def reader(self, schema) -> DataSourceReader:
        return AdApiPagesReader(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(AdApiPagesSource)


def write_pages(rows: list[dict], out_dir: str, page_size: int = PAGE_SIZE) -> int:
    """Test/fixture helper: materialize rows as the reference's page
    envelopes (``{"data": [...], "paging": {"cursors": ...}}``),
    ``page_size`` rows per file. Returns the page count."""
    os.makedirs(out_dir, exist_ok=True)
    n_pages = 0
    for i in range(0, len(rows), page_size):
        page = rows[i : i + page_size]
        envelope = {
            "data": page,
            "paging": {"cursors": {"after": f"c{i + len(page)}"}},
        }
        with open(os.path.join(out_dir, f"page-{i // page_size:05d}.json"), "w") as fh:
            json.dump(envelope, fh)
        n_pages += 1
    return n_pages
