"""Session-scoped scratch directories for the write-path demo queries.

The write/incremental queries (lake_queries, the incremental-index
builders) materialize real tables under /tmp. Scoping the path by the
Spark application id makes concurrent runs on the same fixture safe —
two sessions previously shared ``<name>-<tag>`` and could rmtree each
other mid-read (flagged in round-4 ADVICE). Within one session the
single-writer assumption holds (each query wipes and rebuilds its own
dir, and the driver/bench run queries sequentially). Old application
directories are ephemeral demo scratch; the container's /tmp is the
retention policy.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

_TMP_ROOT = "/tmp/ad_data_lake_spark_lake"


def scratch_dir(spark: SparkSession, name: str, sf_dir: str) -> str:
    """A fresh scratch path unique to (session, query, fixture) —
    wiped on every call so re-runs never observe stale state."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(
        _TMP_ROOT, spark.sparkContext.applicationId, f"{name}-{tag}"
    )
    shutil.rmtree(path, ignore_errors=True)
    return path
