"""Interleaved A/B of the two topk_lsh scoring paths across scales.

This sandbox ships no sf1+ fixtures (earlier rounds' sf1/sf3/sf10 runs
came from other hosts), so scale probes REPLICATE the sf0.1 embeddings
xN with re-keyed vec_ids (DuckDB; replicas carry identical vectors, so
bucket occupancy scales xN and pair volume xN^2 — an adversarial upper
bound on true-sfN pair growth). Both paths read the identical table;
warm pass then alternating timed passes inside one SparkSession.

Usage: python scripts/ab_lsh_scale.py <embeddings_dir> [passes]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ad_data_lake_spark.llm import similarity as SIM  # noqa: E402
from ad_data_lake_spark.session import get_spark  # noqa: E402

DIRPATH = sys.argv[1]
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("ab-lsh-scale")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(DIRPATH, "embeddings.parquet"))
    src = SIM._source_bytes(emb)
    print(f"source bytes: {src}")

    def pair_path():
        SIM.LSH_COGROUP_MIN_BYTES = 1 << 60
        return SIM.topk_lsh(emb)

    def cogroup_path():
        SIM.LSH_COGROUP_MIN_BYTES = 0
        return SIM.topk_lsh(emb)

    noop(pair_path())
    noop(cogroup_path())
    ps, cs = [], []
    for i in range(PASSES):
        t0 = time.perf_counter()
        noop(pair_path())
        ps.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        noop(cogroup_path())
        cs.append(time.perf_counter() - t0)
        print(f"pass {i}: pair={ps[-1]:.3f} cogroup={cs[-1]:.3f}", flush=True)
    print(
        f"RESULT {DIRPATH}: bytes={src} "
        f"pair_median={statistics.median(ps):.3f} "
        f"cogroup_median={statistics.median(cs):.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
