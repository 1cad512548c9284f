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
    """recall@k of the IVF index (nprobe 1/2/4) and the LSH index
    (multi-probe Hamming 0/1/2) vs the exact brute-force baseline,
    same query set (vec_id % query_mod == 0) for every index."""
    exact = sim.topk_bruteforce(
        embeddings, k=k, query_pred=F.col("vec_id") % query_mod == 0
    )
    out = {}
    for p in (1, 2, 4):
        # pinned C=IVF_CELLS: these recall curves document the same
        # fixed geometry the oracle-checked registry query runs; the
        # √n default would move the scan fraction with the fixture size
        ivf = sim.topk_ivf(
            embeddings, query_mod=query_mod, k=k, n_cells=sim.IVF_CELLS, nprobe=p
        )
        out[f"ivf_p{p}"] = recall_at_k(ivf, exact)
    for h in (0, 1, 2):
        lsh = sim.topk_lsh(embeddings, query_mod=query_mod, k=k, probe_hamming=h)
        out[f"lsh_h{h}"] = recall_at_k(lsh, exact)
    for t, h in ((4, 0), (4, 1)):
        lsh = sim.topk_lsh(
            embeddings, query_mod=query_mod, k=k, probe_hamming=h, n_tables=t
        )
        out[f"lsh_t{t}_h{h}"] = recall_at_k(lsh, exact)
    binary = sim.topk_binary(
        embeddings, k=k, query_pred=F.col("vec_id") % query_mod == 0
    )
    out["binary"] = recall_at_k(binary, exact)
    return out


def approx_errors(events: DataFrame) -> dict[str, float]:
    """Max relative error of the approx aggregate paths vs their exact
    twins — ``approx_count_distinct`` (HLL++, default 5% rsd) for reach
    and ``approx_percentile`` (mergeable quantile sketch, accuracy
    10000) for p50/p90/p99 — over every event_type group. These are the
    100 TB paths (constant memory per group, map-side mergeable); the
    exact twins exist for oracle parity."""
    from ad_data_lake_spark.operators import aggregates as agg

    ex = agg.agg_reach_frequency(events, exact=True).select(
        "event_type", F.col("reach").alias("e")
    )
    ap = agg.agg_reach_frequency(events, exact=False).select(
        "event_type", F.col("reach").alias("a")
    )
    reach_err = (
        ex.join(ap, "event_type")
        .agg(F.max(F.abs(F.col("a") - F.col("e")) / F.col("e")).alias("err"))
        .first()["err"]
    )
    pcts = ("p50", "p90", "p99")
    j = (
        agg.agg_percentiles(events, exact=True)
        .alias("e")
        .join(agg.agg_percentiles(events, exact=False).alias("a"), "event_type")
    )
    pct_err = (
        j.select(
            F.greatest(
                *[
                    F.abs(F.col(f"a.{c}") - F.col(f"e.{c}")) / F.abs(F.col(f"e.{c}"))
                    for c in pcts
                ]
            ).alias("err")
        )
        .agg(F.max("err").alias("err"))
        .first()["err"]
    )
    return {
        "reach_hll_max_rel_err": float(reach_err),
        "percentile_sketch_max_rel_err": float(pct_err),
    }


def minhash_planted_quality(documents: DataFrame) -> dict[str, float]:
    """Precision/recall of MinHash-LSH near-dup PAIRS against the
    planted copies (llm/corpus.py plants one exact copy per EXACT_MOD
    docs and one suffix-perturbed near copy per NEAR_MOD docs — the
    corpus's only true duplicates). A planted pair is recalled when
    (source, copy) appears in ``minhash_neardup_pairs``; precision is
    the fraction of emitted pairs that are planted."""
    from ad_data_lake_spark.llm import corpus as cp
    from ad_data_lake_spark.llm import dedup

    pairs = dedup.minhash_neardup_pairs(cp.dup_corpus(documents)).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    planted = (
        documents.where(F.col("doc_id") % cp.EXACT_MOD == 0)
        .select(
            F.col("doc_id").alias("a"),
            (F.col("doc_id") + cp.EXACT_OFFSET).alias("b"),
        )
        .unionByName(
            documents.where(F.col("doc_id") % cp.NEAR_MOD == 0).select(
                F.col("doc_id").alias("a"),
                (F.col("doc_id") + cp.NEAR_OFFSET).alias("b"),
            )
        )
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
