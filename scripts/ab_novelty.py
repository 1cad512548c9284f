"""Interleaved A/B: novelty_profile r14 collect_set form vs r15
skew-proof union form (same SparkSession, warm pass + alternating
timed passes, medians — the only drift-valid design on this host).

Usage: python scripts/ab_novelty.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ad_data_lake_spark.llm.dedup import (  # noqa: E402
    _exploded_shingle_hashes,
    novelty_profile,
)
from ad_data_lake_spark.session import get_spark  # noqa: E402
from ad_data_lake_spark.sources.tables import load_table  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 7


def old_form(corpus):
    owners = (
        _exploded_shingle_hashes(corpus)
        .groupBy("h60")
        .agg(
            F.min("doc_id").alias("first_doc"),
            F.collect_set("doc_id").alias("_docs"),
        )
    )
    return (
        owners.select("first_doc", F.explode("_docs").alias("doc_id"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count(
                F.when(F.col("first_doc") == F.col("doc_id"), F.lit(1))
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_shingles"), 4).alias("novelty_ratio"),
        )
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("ab-novelty")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, "documents", SF)

    # value identity first
    a = sorted(map(tuple, old_form(docs).collect()))
    b = sorted(map(tuple, novelty_profile(docs).collect()))
    assert a == b, f"VALUE MISMATCH: {len(a)} vs {len(b)} rows"
    print(f"values identical over {len(a)} rows")

    noop(old_form(docs))
    noop(novelty_profile(docs))
    olds, news = [], []
    for i in range(PASSES):
        t0 = time.perf_counter()
        noop(old_form(docs))
        olds.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        noop(novelty_profile(docs))
        news.append(time.perf_counter() - t0)
        print(f"pass {i}: old={olds[-1]:.3f} new={news[-1]:.3f}")
    print(
        f"median old={statistics.median(olds):.3f} "
        f"new={statistics.median(news):.3f} "
        f"ratio={statistics.median(news) / statistics.median(olds):.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
