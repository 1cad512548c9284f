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
# Streaming-tier drain-rate floors (VERDICT r10 ask #4). The drain table
# (BASELINE.md) measured 40-92k events/s for the event streams at sf0.1
# on the r10 host; nothing enforced it, so the next one-file-fixture
# defect (every micro-batch running 1-2 tasks — the r10 bug, which
# billed the sanitize chain at 10k rows/s instead of 42k) would again
# need a manual bench read to notice. Absolute rows/s floors proved
# HOST-FRAGILE in r11: the round-11 host runs the same code at ~55-70%
# of the r10 rates (a plain CPU-speed delta, verified clean-machine),
# so floors pinned as 40%-of-r10 sat within noise of an honest run.
# Two changes keep the guard while de-flaking it:
#   1. floors re-based at ~40% of the SLOWER (r11) host's clean rates
#      (r10 + r11 measured rates in comments);
#   2. a once-per-module Spark probe job scales floors DOWN when the
#      current host is slower than the r11 reference (never up), so
#      the defect class — a 4x+ lost-parallelism hit relative to the
#      same host's capability — still fails loudly on any machine.
# Wall = the WHOLE registry callable (fixture write + availableNow
# drain + read-back), identical to scripts/bench_streaming.py.
# ---------------------------------------------------------------------------

SF01 = "/root/testdata/sf0.1"

# Reference wall for the host-speed probe on the r11 bench host
# (min-of-3 after warm: 0.94-1.33 s observed; 1.0 s pinned).
_PROBE_REF_SEC = 1.0

# row name -> (input-rows source, floor in rows/s at reference host
# speed; measured clean rates in comments: r10 host / r11 host). Floors
# sit at ~30% of the r11-host clean rates: the r10 defect class ran at
# ~24% of clean (42386 -> 10000), so it still fails, while the r11
# VM's observed honest-run wobble (±35% across back-to-back idle runs)
# does not. The deterministic root-cause guard is
# test_stream_source_file_fanout below — THIS test is the timing
# backstop, not the primary detector.
_STREAM_FLOORS = {
    "streaming_daily_insights": ("events+dups", 11000),  # 60175 / 36723
    "streaming_sliding_insights": ("events+dups", 12000),  # 63547 / 39497
    "streaming_sessionize": ("events", 18000),  # 81672 / 60122
    "streaming_dim_enrich": ("events", 24000),  # 92184 / 79545
    "streaming_frequency_cap": ("events", 13500),  # 57081 / 45665
    "streaming_attribution_join": ("events", 9000),  # 40595 / 29360
    "streaming_json_sanitize": ("events", 8000),  # 42386 / 27221 (10k broken on r10 host)
    "streaming_corpus_ingest": ("dup_corpus", 800),  # 2713 / 2726
    "streaming_rare_token_scrub": ("documents", 1200),  # 4241 / 4087
    "streaming_multimodal_features": ("documents", 950),  # — / 3150 (new r11)
}


def test_stream_source_file_fanout(spark, tmp_path):
    """Deterministic pin of the r10 parallelism defect's root cause:
    stream-source fixtures MUST be written as many parquet files,
    because a file-source micro-batch parallelizes per FILE — one file
    means 1-2 tasks per batch regardless of cluster size (the bug that
    billed the sanitize chain at 10k rows/s instead of 42k). Timing
    floors above catch unknown regressions; this catches the known one
    without a stopwatch."""
    from ad_data_lake_spark.operators.lake_queries import _stream_src_write

    src = str(tmp_path / "stream_src")
    _stream_src_write(spark.range(10_000).selectExpr("id", "id * 2 AS v"), src)
    n_parts = len(
        [f for f in os.listdir(src) if f.startswith("part-") and f.endswith(".parquet")]
    )
    assert n_parts >= 8, (
        f"stream source fixture written as {n_parts} files — micro-batch "
        "parallelism collapses (r10 defect class); expected >= 8"
    )


@pytest.fixture(scope="module")
def _host_speed_scale(spark):
    """min(1, probe_ref / probe_now): 1.0 on a host at least as fast
    as the r11 reference; proportionally below 1 on slower hardware.
    The probe is a fixed CPU+shuffle Spark job (min-of-3 after warm),
    so drain rate and probe degrade together under a slower host while
    a lost-parallelism bug degrades only the drain rate."""

    def probe() -> float:
        df = (
            spark.range(0, 200_000_000, 1, 32)
            .groupBy((F.col("id") % 997).alias("k"))
            .agg(F.count("*").alias("n"), F.sum("id").alias("s"))
        )
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    probe()  # warm: codegen + JIT
    wall = min(probe() for _ in range(3))
    return min(1.0, _PROBE_REF_SEC / wall)


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
def test_streaming_drain_rate_floor(
    spark, _stream_input_rows, _host_speed_scale, name
):
    from ad_data_lake_spark.queries import REGISTRY

    src, base_floor = _STREAM_FLOORS[name]
    floor = base_floor * _host_speed_scale
    n = _stream_input_rows[src]

    def run():
        REGISTRY[name].fn(spark, SF01).write.format("noop").mode(
            "overwrite"
        ).save()

    run()  # warm (plans compile, fixture dirs allocate)
    rate = 0.0
    # best-of-3: the r11 VM's honest-run drain wobble is ±35% and one
    # GC pause or noisy-neighbor window must not fail the floor — a
    # real parallelism loss (4x+) fails all three attempts regardless
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        wall = time.perf_counter() - t0
        rate = max(rate, n / wall)
        if rate >= floor:
            break
    assert rate >= floor, (
        f"{name}: {rate:.0f} rows/s < floor {floor:.0f} "
        f"(host scale {_host_speed_scale:.2f}, {n} rows in {wall:.2f}s) — "
        "drain-rate regression (lost per-batch parallelism? see "
        "BASELINE.md streaming table)"
    )
