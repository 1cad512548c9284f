"""Interleaved A/B (r14 verdict #7): bm25 corpus stats from a second
documents-scan tokenize pass (current) vs derived from the already-
checkpointed posting table (n_docs stays a column-pruned count agg —
null-text docs never reach the postings, so n_docs is NOT derivable
from them; avgdl comes from a per-doc first(dl) rollup over the
checkpoint). The r11 rejection of this predates the lazy-checkpoint
pattern that now pins the postings anyway.

Usage: python scripts/ab_bm25_stats.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ad_data_lake_spark.llm import retrieval as R  # noqa: E402
from ad_data_lake_spark.llm.text import words  # noqa: E402
from ad_data_lake_spark.session import get_spark  # noqa: E402
from ad_data_lake_spark.sources.tables import load_table  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 7


def bm25_variant(documents, k1=R.BM25_K1, b=R.BM25_B, top_k=R.BM25_TOP_K,
                 n_queries=R.BM25_N_QUERIES):
    tf = R.term_frequencies(documents)
    qtoks = (
        documents.where(F.col("doc_id") < n_queries)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.array_distinct(words(F.col("text")))).alias("token"),
        )
    )
    n_docs = documents.agg(F.count("*").alias("n_docs"))
    avgdl = (
        tf.groupBy("doc_id")
        .agg(F.first("dl").alias("dl"))
        .agg(F.avg("dl").alias("avgdl"))
    )
    stats = n_docs.crossJoin(avgdl)
    dfreq = (
        tf.join(F.broadcast(qtoks), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm_tf = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(qtoks), "token")
        .where(F.col("doc_id") != F.col("query_id"))
        .join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(F.sum(idf * norm_tf), 4).alias("score"),
            F.count("*").alias("n_terms"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "rank", "doc_id", "score", "n_terms")
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("ab-bm25")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, "documents", SF)

    a = sorted(map(tuple, R.bm25_retrieve(docs).collect()))
    b = sorted(map(tuple, bm25_variant(docs).collect()))
    assert a == b, f"VALUE MISMATCH: first diff {next((x, y) for x, y in zip(a, b) if x != y)}"
    print(f"values identical over {len(a)} rows")

    noop(R.bm25_retrieve(docs))
    noop(bm25_variant(docs))
    cur, var = [], []
    for i in range(PASSES):
        t0 = time.perf_counter()
        noop(R.bm25_retrieve(docs))
        cur.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        noop(bm25_variant(docs))
        var.append(time.perf_counter() - t0)
        print(f"pass {i}: current={cur[-1]:.3f} variant={var[-1]:.3f}", flush=True)
    print(
        f"median current={statistics.median(cur):.3f} "
        f"variant={statistics.median(var):.3f} "
        f"ratio={statistics.median(var) / statistics.median(cur):.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
