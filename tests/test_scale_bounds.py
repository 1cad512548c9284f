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


# ---------------------------------------------------------------------------
# Streaming-tier drain-rate floors (VERDICT r10 ask #4). The r10 drain
# table (BASELINE.md) measured 40-92k events/s for the event streams at
# sf0.1; nothing enforced it, so the next one-file-fixture-class defect
# (every micro-batch running 1-2 tasks — the r10 bug, which billed the
# sanitize chain at 10k rows/s instead of 42k) would again need a manual
# bench read to notice. Floors are ~40% of the r10 measured rates:
# generous for shared-host jitter, but a lost-parallelism regression
# (a 4x+ hit on the compute-bound rows) fails loudly. Wall = the WHOLE
# registry callable (fixture write + availableNow drain + read-back),
# identical to scripts/bench_streaming.py.
# ---------------------------------------------------------------------------

SF01 = "/root/testdata/sf0.1"

# row name -> (input-rows source, floor in rows/s; r10 measured in comment)
_STREAM_FLOORS = {
    "streaming_daily_insights": ("events+dups", 24000),  # r10: 60175
    "streaming_sliding_insights": ("events+dups", 25000),  # r10: 63547
    "streaming_sessionize": ("events", 32000),  # r10: 81672
    "streaming_dim_enrich": ("events", 36000),  # r10: 92184
    "streaming_frequency_cap": ("events", 22000),  # r10: 57081
    "streaming_attribution_join": ("events", 16000),  # r10: 40595
    "streaming_json_sanitize": ("events", 17000),  # r10: 42386 (10k when broken)
    "streaming_corpus_ingest": ("dup_corpus", 1000),  # r10: 2713
    "streaming_rare_token_scrub": ("documents", 1700),  # r10: 4241
}


@pytest.fixture(scope="module")
def _stream_input_rows(spark):
    if not os.path.isdir(SF01):
        pytest.skip("sf0.1 fixture not present on this host")
    from ad_data_lake_spark.llm.corpus import dup_corpus
    from ad_data_lake_spark.sources.tables import load_table

    n_events = load_table(spark, "events", SF01).count()
    n_docs = load_table(spark, "documents", SF01).count()
    n_dup = dup_corpus(load_table(spark, "documents", SF01)).count()
    return {
        "events": n_events,
        "events+dups": n_events + n_events // 10,
        "dup_corpus": n_dup,
        "documents": n_docs,
    }


@pytest.mark.parametrize("name", sorted(_STREAM_FLOORS))
def test_streaming_drain_rate_floor(spark, _stream_input_rows, name):
    from ad_data_lake_spark.queries import REGISTRY

    src, floor = _STREAM_FLOORS[name]
    n = _stream_input_rows[src]

    def run():
        REGISTRY[name].fn(spark, SF01).write.format("noop").mode(
            "overwrite"
        ).save()

    run()  # warm (plans compile, fixture dirs allocate)
    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0
    rate = n / wall
    assert rate >= floor, (
        f"{name}: {rate:.0f} rows/s < floor {floor} "
        f"({n} rows in {wall:.2f}s) — drain-rate regression "
        "(lost per-batch parallelism? see BASELINE.md streaming table)"
    )
