"""Error bounds for the approx aggregate paths vs their exact twins.

``approx_count_distinct`` (HLL++) and ``approx_percentile`` (mergeable
quantile sketch) are the stated 100 TB paths for reach and percentile
summaries; these tests measure them against the exact variants on the
same fixture so the claimed accuracy is a number, not a vibe.

Pinned at sf0.01 regardless of the session test SF: the sketch returns
an order statistic while exact ``percentile`` interpolates between
them, so on sub-1k groups (sf0.001) the comparison measures the
sample gap around p99 — up to ~25% on the heavy-tailed ``value``
column — not sketch error. At sf0.01 group sizes (~20k) both effects
are inside 1%. Measured: reach HLL 0.67%, percentile sketch 0.71%
(REPORT.md regenerates these via scripts/quality_report.py).
"""

from __future__ import annotations

import pytest

from ad_data_lake_spark.llm.evaluation import approx_errors
from ad_data_lake_spark.sources.tables import load_table

SF_APPROX = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def errors(spark):
    return approx_errors(load_table(spark, "events", SF_APPROX))


def test_reach_hll_within_5pct(errors):
    assert errors["reach_hll_max_rel_err"] <= 0.05


def test_percentile_sketch_within_1pct(errors):
    assert errors["percentile_sketch_max_rel_err"] <= 0.01


def test_reach_sketch_rollup_accuracy_and_merge(spark):
    """The DataSketches HLL path: (1) per-type rollup-from-day-sketches
    estimate within 5% of exact reach; (2) merging day sketches agrees
    with sketching the whole fact directly to within the sketch's own
    error (the two register states may differ — sparse-mode promotion —
    but both must estimate the same quantity)."""
    from pyspark.sql import functions as F

    from ad_data_lake_spark.operators import sketches as SK

    events = load_table(spark, "events", SF_APPROX)
    rolled = {r.event_type: r.est_reach for r in SK.reach_rollup_from_sketches(events).collect()}
    exact = {
        r.event_type: r.exact
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    direct = {
        r.event_type: r.est
        for r in events.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    assert set(rolled) == set(exact)
    for t, est in rolled.items():
        assert abs(est - exact[t]) / exact[t] < 0.05, (t, est, exact[t])
        assert abs(est - direct[t]) / exact[t] < 0.05, (t, est, direct[t])


def test_cms_estimate_is_one_sided_and_bounded(spark):
    """CMS never underestimates (min over rows of bucket counts that
    each INCLUDE the token's own occurrences), and the overestimate is
    within the Cormode-Muthukrishnan e/width·N bound (2x slack for the
    fixture's deliberately small grid)."""
    import math

    from pyspark.sql import functions as F

    from ad_data_lake_spark.llm.text import CMS_WIDTH, cms_heavy_hitters, words
    from tests.conftest import SF_ORACLE

    documents = load_table(spark, "documents", SF_ORACLE)
    out = cms_heavy_hitters(documents).collect()
    assert len(out) > 0
    n_total = documents.select(
        F.sum(F.size(words(F.col("text"))))
    ).collect()[0][0]
    assert all(r.cms_estimate >= r.exact_count for r in out)
    bound = 2 * math.e * n_total / CMS_WIDTH
    assert all(r.cms_estimate - r.exact_count <= bound for r in out)
