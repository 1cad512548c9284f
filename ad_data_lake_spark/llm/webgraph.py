"""Domain-authority PageRank over the corpus link graph.

Web-scale curation ranks source domains before filtering (Common-Crawl
pipelines gate on harmonic/PageRank centrality of the seed domain; the
C4/RefinedWeb lineage filters by domain reputation): a crawl's link
graph is corpus-sized, so the ranking must be a distributed iterative
aggregation, not a graph library call. This module implements weighted
PageRank as N chained DataFrame iterations — join ranks with edges on
the source node, redistribute rank proportional to edge weight /
weighted out-degree, re-aggregate per target, teleport — all LAZY: the
whole N-iteration recurrence is one Catalyst plan evaluated in a
single action (fixed iteration count, no driver-side convergence
loop).

Graph construction: the fixture's ``source`` column provides the
document's own site (20 values, ``src0..src19``); each document
contributes two out-links to deterministic doc_id-derived targets in
the same namespace (the planted-value pattern of ``url_domain_filter``
/ ``luhn_scan`` — at production scale the edge list comes from that
row's URL-extraction tier instead). Edge weights = link counts.

Scale: the edge aggregate is the one corpus-sized pass (shuffle
carries (src, dst) pairs, never text). Each iteration is a shuffle
join of the node-sized rank table with the edge table on ``src`` plus
a re-aggregation on ``dst`` — the standard distributed PageRank; at
100 TB both sides bucket by node id (layout.py Y1) so every iteration
reuses one co-located partitioning. Dangling mass IS redistributed:
each iteration anti-joins the rank vector against the out-edge source
set and broadcasts the scalar dangling sum back into the update (one
1-row cross join per iteration — the planted graph's sum is 0.0, but
real crawl graphs are full of sinks and the term is load-bearing
there). The final ranking is emitted TOP-K (TakeOrderedAndProject +
a row_number over the bounded k rows), never a global single-partition
sort of the node table — a real crawl graph has 1e8 nodes.

Numeric contract: ranks are rounded to 7 dp after every iteration on
BOTH engines (the ``cosine6_pd`` pattern) so double summation order
cannot drift across iterations; output is rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PR_ITERS = 5
PR_DAMPING = 0.85
# NOT computed as 1 - PR_DAMPING: Python's 1.0 - 0.85 is
# 0.15000000000000002 while the SQL literal 0.15 parses to a different
# double — both engines must start from the SAME IEEE value, so the
# teleport probability is its own literal (the 7-dp round would almost
# certainly absorb the 2e-18 gap, but "almost certainly" is not a
# contract).
PR_TELEPORT = 0.15
PR_ROUND = 7
# Two deterministic out-links per document, same node namespace as the
# fixture's source column (source == 'src' || doc_id % 20). Targets are
# deliberately NON-uniform — quadratic residues mod 20 for the first
# link, a 7-node hub set for the second — so in-degree (and therefore
# PageRank) is skewed like a real web graph. A linear doc_id formula is
# uniform per residue class and collapses PageRank to exactly 1/n
# everywhere (measured: 1 distinct value; the hub form gives 12 with a
# 19x top-to-bottom spread at sf0.001).
_D1 = "(doc_id * doc_id + 3) % 20"
_D2 = "(doc_id DIV 3) % 7"
# Bounded emission: the ranking returns the top-K domains, not the
# whole node table. 100 >> the 20-node planted namespace (so the
# fixture result is unchanged in membership), but the PLAN is the one
# that survives a 1e8-node crawl graph: TakeOrderedAndProject instead
# of a global single-partition sort.
PR_TOP_K = 100


def domain_edges(documents: DataFrame) -> DataFrame:
    """(src, dst, w): weighted link edges — src is the document's own
    site, targets are the two planted out-links. One corpus pass, one
    (src, dst) aggregation."""
    links = documents.select(
        F.col("source").alias("src"),
        F.explode(
            F.array(
                F.concat(F.lit("src"), F.expr(_D1).cast("string")),
                F.concat(F.lit("src"), F.expr(_D2).cast("string")),
            )
        ).alias("dst"),
    )
    return links.groupBy("src", "dst").agg(F.count("*").alias("w"))


def pagerank_rank(
    edges: DataFrame,
    iters: int = PR_ITERS,
    damping: float = PR_DAMPING,
    top_k: int = PR_TOP_K,
) -> DataFrame:
    """(domain, pr_rank, pagerank): weighted PageRank over an
    ``(src, dst, w)`` edge table after ``iters`` iterations, top-K by
    (pagerank desc, domain). Entirely lazy — one action evaluates the
    full recurrence. Sink nodes (appear only as ``dst``) have their
    rank mass redistributed uniformly each iteration, the standard
    dangling-node correction."""
    # Materialize the normalized graph ONCE: every iteration joins it,
    # so re-deriving the corpus-sized edge aggregate 5x (plus the
    # out-degree join) is pure waste — the standard production-PR
    # shape (build adjacency, then iterate). localCheckpoint also cuts
    # the 5-deep recurrence lineage, which otherwise replans the whole
    # subtree per reference.
    outw = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    graph = (
        edges.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("outw")).alias("p"))
        .localCheckpoint()
    )
    nodes = (
        graph.select(F.col("src").alias("domain"))
        .union(graph.select(F.col("dst").alias("domain")))
        .distinct()
        .localCheckpoint()
    )
    # Source set for the dangling anti-join — node-sized, bounded
    # (domains, not documents), derived from the already-materialized
    # adjacency so it costs no corpus pass.
    srcs = graph.select(F.col("src").alias("domain")).distinct().localCheckpoint()
    # The node COUNT is a bounded scalar (one long — every iteration's
    # teleport term needs it), collected once like the IVF centroid
    # list; the rank VECTOR itself stays distributed.
    n = nodes.count()

    pr = nodes.select("domain", F.round(F.lit(1.0 / n), PR_ROUND).alias("pr"))
    for _ in range(iters):
        # Each iteration references pr TWICE (dangling anti-join +
        # contrib join); without a cut the unrolled lineage doubles per
        # iteration (~2^iters subtrees) and only ReuseExchange keeps it
        # benign. A LAZY localCheckpoint pins each iteration's rank
        # vector to one evaluated node instead — plan size stays linear
        # in iters, and the module's one-action laziness contract holds
        # (eager=False defers materialization to the final action).
        # Cluster trade-off (localCheckpoint, not checkpoint): the
        # pinned partitions live only on executors, so an executor
        # loss mid-job is unrecoverable — the standard iterative-algo
        # choice (GraphX defaults the same way) because a reliable
        # checkpoint costs a full HDFS write per iteration; flip to
        # ``checkpoint()`` + ``spark.sparkContext.setCheckpointDir``
        # where executor churn is expected. Superseded iterations'
        # blocks are not pinned forever: materializing iteration N's
        # checkpoint truncates its lineage, dropping the last
        # reference to iteration N-1's RDD, which the ContextCleaner
        # then unpersists — storage holds O(1) rank vectors steady
        # state, not O(iters).
        pr = pr.localCheckpoint(eager=False)
        # Dangling mass: rank sitting on nodes with NO out-edges. One
        # scalar aggregate per iteration, broadcast back into the
        # update as a 1-row join (never a shuffle). coalesce covers
        # the no-sinks graph, where the anti-join is empty.
        dangling = pr.join(srcs, "domain", "left_anti").agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dangling")
        )
        contrib = (
            pr.join(graph, pr["domain"] == graph["src"])
            .select(
                F.col("dst").alias("domain"),
                (F.col("pr") * F.col("p")).alias("c"),
            )
            .groupBy("domain")
            .agg(F.sum("c").alias("inflow"))
        )
        pr = (
            nodes.join(contrib, "domain", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "domain",
                F.round(
                    F.lit(PR_TELEPORT / n)
                    + damping
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("dangling") / n
                    ),
                    PR_ROUND,
                ).alias("pr"),
            )
        )
    # Bounded emission: TakeOrderedAndProject to top_k rows, THEN the
    # rank window over only those k rows — never a global
    # single-partition sort of the full node table.
    top = pr.orderBy(F.desc("pr"), "domain").limit(top_k)
    w = Window.orderBy(F.desc("pr"), "domain")
    return top.select(
        "domain",
        F.row_number().over(w).cast("long").alias("pr_rank"),
        F.round("pr", 6).alias("pagerank"),
    )


def domain_pagerank(
    documents: DataFrame,
    iters: int = PR_ITERS,
    damping: float = PR_DAMPING,
) -> DataFrame:
    """(domain, pr_rank, pagerank): weighted PageRank of the planted
    corpus link graph — see :func:`pagerank_rank` for the recurrence."""
    return pagerank_rank(domain_edges(documents), iters, damping)
