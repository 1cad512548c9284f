"""Domain PageRank: equivalence against an independent numpy power
iteration, probability-mass conservation, and non-degeneracy of the
planted graph."""

from __future__ import annotations

import numpy as np

from ad_data_lake_spark.llm import webgraph as WG
from ad_data_lake_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _reference_pagerank(rows, iters, damping, teleport, rnd):
    """Dense-matrix power iteration over collected doc rows — an
    independent path (no edge aggregation, no joins)."""
    edges: dict[tuple[str, str], int] = {}
    for doc_id, source in rows:
        for expr in (
            (doc_id * doc_id + 3) % 20,
            (doc_id // 3) % 7,
        ):
            k = (source, f"src{expr}")
            edges[k] = edges.get(k, 0) + 1
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for (s, d), w in edges.items():
        W[idx[s], idx[d]] = w
    outw = W.sum(axis=1, keepdims=True)
    P = W / outw
    pr = np.full(n, round(1.0 / n, rnd))
    for _ in range(iters):
        pr = np.round(teleport / n + damping * (pr @ P), rnd)
    return {nodes[i]: round(float(pr[i]), 6) for i in range(n)}


def test_pagerank_matches_numpy_reference(spark):
    docs = load_table(spark, "documents", SF_SMOKE)
    rows = [(r.doc_id, r.source) for r in docs.select("doc_id", "source").collect()]
    expect = _reference_pagerank(
        rows, WG.PR_ITERS, WG.PR_DAMPING, WG.PR_TELEPORT, WG.PR_ROUND
    )
    got = {r.domain: r.pagerank for r in WG.domain_pagerank(docs).collect()}
    assert got == expect


def test_pagerank_mass_and_nondegeneracy(spark):
    docs = load_table(spark, "documents", SF_SMOKE)
    res = WG.domain_pagerank(docs).collect()
    total = sum(r.pagerank for r in res)
    # no dangling nodes in the planted graph -> mass conserved up to
    # the per-iteration rounding
    assert abs(total - 1.0) < 1e-4
    values = {r.pagerank for r in res}
    # the planted doc_id-mixed targets must yield a NON-uniform ranking
    # (a pure residue-class formula degenerates to a permutation graph
    # whose PageRank is exactly uniform — the case this guards against)
    assert len(values) > 5
    ranks = sorted(r.pr_rank for r in res)
    assert ranks == list(range(1, len(res) + 1))


def test_pagerank_redistributes_dangling_mass(spark):
    """A graph WITH a sink (c has no out-edges): the per-iteration
    dangling correction must conserve probability mass and match an
    independent numpy power iteration that applies the same
    dangling-sum/n redistribution. Without the correction, mass decays
    by ~damping * pr(c) every iteration (~10%+ here) — the bug this
    pins."""
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("a", "c", 1)],
        "src string, dst string, w long",
    )
    got = {r.domain: r.pagerank for r in WG.pagerank_rank(edges).collect()}

    nodes = ["a", "b", "c"]
    n = len(nodes)
    P = np.array([[0.0, 0.5, 0.5], [0.0, 0.0, 1.0], [0.0, 0.0, 0.0]])
    is_sink = np.array([False, False, True])
    pr = np.full(n, round(1.0 / n, WG.PR_ROUND))
    for _ in range(WG.PR_ITERS):
        dangling = float(pr[is_sink].sum())
        pr = np.round(
            WG.PR_TELEPORT / n + WG.PR_DAMPING * (pr @ P + dangling / n),
            WG.PR_ROUND,
        )
    expect = {nodes[i]: round(float(pr[i]), 6) for i in range(n)}
    assert got == expect
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_pagerank_emits_bounded_topk_not_global_sort(spark):
    """The final ranking must be TakeOrderedAndProject over top-k (a
    real crawl graph has 1e8 nodes — a global single-partition sort of
    the node table is the plan this pins out), and an oversized graph
    must actually truncate to top_k rows."""
    docs = load_table(spark, "documents", SF_SMOKE)
    df = WG.domain_pagerank(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    truncated = WG.pagerank_rank(WG.domain_edges(docs), top_k=3).collect()
    assert [r.pr_rank for r in truncated] == [1, 2, 3]


def test_pagerank_ranks_deterministic_under_reruns(spark):
    docs = load_table(spark, "documents", SF_SMOKE)
    a = sorted(map(tuple, WG.domain_pagerank(docs).collect()))
    b = sorted(map(tuple, WG.domain_pagerank(docs).collect()))
    assert a == b


def test_vocab_incremental_merges_match_scratch(spark):
    """The maintained vocabulary must re-derive the SAME merge table a
    from-scratch trainer produces (append-partials ≡ full recount,
    carried through to the trained artifact)."""
    from pyspark.sql import functions as F

    from ad_data_lake_spark.llm import tokenizer as TK

    docs = load_table(spark, "documents", SF_SMOKE)
    vocab = TK.bpe_vocab_incremental(spark, SF_SMOKE)
    rows = (
        vocab.orderBy(F.desc("freq"), "word").limit(TK.BPE_VOCAB_MAX).collect()
    )
    incremental = TK._merge_loop([(r.word, r.freq) for r in rows], TK.BPE_MERGES)
    scratch = TK.bpe_train(docs, TK.BPE_MERGES)
    assert incremental == scratch
