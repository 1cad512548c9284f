"""Quality measurement for the approximate operators: ANN recall@k
against the in-repo exact baseline, and MinHash-LSH precision/recall
against planted near-duplicates.

These are the numbers a 100 TB adopter asks for first — an approximate
index that "runs" but whose recall nobody measured is not an index.
``scripts/quality_report.py`` regenerates REPORT.md from these
functions; ``tests/test_ann_recall.py`` pins lower bounds so a
regression in bucketing/probing fails CI, not the corpus.

Scale note: every function here reduces two DataFrames with a semi
join + count — no collect of the candidate sets themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ad_data_lake_spark.llm import similarity as sim

QUERY_MOD = 97


def recall_at_k(approx: DataFrame, exact: DataFrame) -> float:
    """Fraction of exact top-k (query_id, vec_id) pairs the approximate
    index returned, over all queries. Both inputs are ranked top-k
    frames with (query_id, vec_id) columns."""
    e = exact.select("query_id", "vec_id")
    total = e.count()
    hits = e.join(approx.select("query_id", "vec_id"), ["query_id", "vec_id"], "semi").count()
    return hits / total if total else float("nan")


def ann_recalls(embeddings: DataFrame, k: int = 5, query_mod: int = QUERY_MOD) -> dict[str, float]:
    """recall@k of the IVF and LSH indexes (single-probe and
    multi-probe H≤1, H≤2) vs the exact brute-force baseline, same
    query set (vec_id % query_mod == 0) for every index."""
    exact = sim.topk_bruteforce(
        embeddings, k=k, query_pred=F.col("vec_id") % query_mod == 0
    )
    ivf = sim.topk_ivf(embeddings, query_mod=query_mod, k=k)
    out = {"ivf": recall_at_k(ivf, exact)}
    for h in (0, 1, 2):
        lsh = sim.topk_lsh(embeddings, query_mod=query_mod, k=k, probe_hamming=h)
        out[f"lsh_h{h}"] = recall_at_k(lsh, exact)
    return out


def minhash_planted_quality(documents: DataFrame) -> dict[str, float]:
    """Precision/recall of MinHash-LSH near-dup GROUPS against the
    planted copies (llm/dedup.py plants one near-copy per PLANT_MOD
    docs): a planted pair is recalled when source and copy share a
    group; precision = fraction of same-group pairs that are planted
    pairs (the fixture's only true near-dups)."""
    from ad_data_lake_spark.llm import dedup

    groups = dedup.minhash_neardup_groups(documents)
    planted = dedup.near_corpus(documents).select(
        F.col("doc_id").alias("a"),
        (F.col("doc_id") + dedup.NEAR_OFFSET).alias("b"),
        F.lit(1).alias("is_planted"),
    ).where(F.col("b").isNotNull())

    g = groups.select("doc_id", "group_id")
    pairs = (
        g.alias("x")
        .join(g.alias("y"), F.col("x.group_id") == F.col("y.group_id"))
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
    )
    n_pairs = pairs.count()
    n_planted = planted.count()
    hit = planted.join(pairs, ["a", "b"], "semi").count()
    return {
        "recall": hit / n_planted if n_planted else float("nan"),
        "precision": hit / n_pairs if n_pairs else float("nan"),
        "planted_pairs": float(n_planted),
        "predicted_pairs": float(n_pairs),
    }
