"""Per-query Spark job/stage counter for the sf0.1 floor analysis.

Runs named registry queries (default: the biggest Spark-vs-DuckDB
floor rows from BASELINE.md's bench table) twice — warm pass, then a
timed pass — and reports how many Spark JOBS and STAGES the timed pass
fired, via the status tracker's job-id high-water mark. At sf0.1 each
job costs a ~0.1-0.2 s scheduling floor, so job count ~= wall clock;
this tells us which rows have *reducible* job structure (extra
broadcasts, checkpoint materializations, sequential actions) vs an
irreducible single job.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "bm25_retrieve",
    "hybrid_retrieve_rrf",
    "bigram_lm_score",
    "nb_quality_score",
    "bloom_decontaminate",
    "contamination_check",
    "semantic_dedup",
    "semantic_dedup_ivf",
    "embed_topk_ivf",
    "embed_topk_ivf_sq8",
    "dsir_weights",
    "pmi_collocations",
    "dedup_simhash",
    "novelty_profile",
    "boilerplate_removal",
    "dedup_minhash_lsh",
    "exact_substring_dedup",
    "cross_split_leakage",
    "contrastive_triplets",
    "cms_heavy_hitters",
]


def main() -> None:
    if sys.argv[1:] == ["--all"]:
        from ad_data_lake_spark.queries import REGISTRY as _R

        names = [n for n, s in _R.items() if "write" not in s.tags]
    else:
        names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ad_data_lake_spark.queries import REGISTRY
    from ad_data_lake_spark.session import get_spark

    spark = get_spark("profile-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def run(name):
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    print(f"{'query':28} {'jobs':>5} {'stages':>7} {'sec':>7}")
    for name in names:
        run(name)  # warm
        ids0 = tracker.getJobIdsForGroup(None)
        before = max(ids0) if ids0 else -1
        t0 = time.perf_counter()
        run(name)
        el = time.perf_counter() - t0
        ids1 = tracker.getJobIdsForGroup(None)
        new_jobs = [j for j in ids1 if j > before]
        stages = 0
        for j in new_jobs:
            info = tracker.getJobInfo(j)
            if info:
                stages += len(info.stageIds)
        print(f"{name:28} {len(new_jobs):>5} {stages:>7} {el:>7.3f}")


if __name__ == "__main__":
    main()
