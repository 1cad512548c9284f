"""Wall-clock regression bounds for the scale-evidence rows whose
oracle is engine-intractable at scale (BASELINE.md "beyond sf1"):
Spark-only slope numbers are the only comparative record these rows
have, so a silent slowdown would otherwise go unnoticed until the next
manual sweep. Bounds are ~2x the measured r10 walls — generous enough
for load jitter, tight enough to catch a lost spread()/checkpoint.

Each test skips when its replicated fixture is absent (they are built
by `scripts/bench_scale.py`, minutes of one-time work) — the bounds
are pinned on the bench host, not in every CI environment.
"""

from __future__ import annotations

import os
import time

import pytest

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fixture(sf: str) -> str:
    path = os.path.join(REPO, ".scale_fixture", f"sf{sf}")
    if not os.path.exists(os.path.join(path, "_DONE")):
        pytest.skip(f"sf{sf} replicated fixture not built on this host")
    return path


def _wall_ngram_scaled(spark, sf_dir: str, mod: int) -> float:
    from ad_data_lake_spark.llm.dedup import ngram_jaccard_pairs
    from ad_data_lake_spark.sources.tables import load_table

    corpus = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    df = ngram_jaccard_pairs(corpus, mod=mod).select(F.count("*"))
    df.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def test_ngram_scaled_mod_sf1_bound(spark):
    """Constant candidates/doc at sf1 (mod=500): measured 3.4 s r10;
    bound 10 s."""
    wall = _wall_ngram_scaled(spark, _fixture("1.0"), mod=500)
    assert wall < 10.0, f"ngram scaled-mod sf1 regressed: {wall:.1f}s"


def test_ngram_scaled_mod_sf10_bound(spark):
    """Constant candidates/doc at sf10 (mod=5000): measured 28.7 s r10;
    bound 60 s — the linear-slope pin BASELINE.md cites."""
    wall = _wall_ngram_scaled(spark, _fixture("10.0"), mod=5000)
    assert wall < 60.0, f"ngram scaled-mod sf10 regressed: {wall:.1f}s"
