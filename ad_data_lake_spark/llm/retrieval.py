"""Sparse lexical retrieval (BM25) over the ``documents`` corpus.

The dense path (``similarity.rag_retrieve``) covers embedding recall;
this module adds the sparse half every production RAG stack pairs with
it (hybrid retrieval): Okapi BM25 (Robertson et al., TREC-3) with the
standard k1/b parameterization and the +1-smoothed idf
(``ln(1 + (N - df + 0.5) / (df + 0.5))``, the Lucene form that keeps
idf positive for df > N/2).

Scale shape (the part that must survive 100 TB):

- ONE Arrow pass over the corpus computes the EXACT (doc_id, token,
  tf, dl) posting table with no shuffle at all: a document's text
  lives whole in one row, so a batch-local pandas count IS the global
  count — tokenization + counting run vectorized in Arrow batches
  instead of a JVM regex explode feeding a hash aggregate (measured
  0.9 s vs 2.0-2.4 s at sf1; the regex split is the hot loop, and the
  JVM form also evaluates it twice — once for ``size``, once for the
  explode — because CollapseProject inlines the array alias).
- The posting table is materialized ONCE (lazy ``localCheckpoint``)
  and feeds its two consumers: the query-vocab-bounded document-
  frequency aggregate (→ broadcast) and the scoring join. The corpus
  stats (n_docs, avgdl) come from one documents-scan aggregate (r11
  sweep — this used to be two separate agg+broadcast pipelines, one of
  them a two-stage per-doc rollup off the postings). At 100 TB the
  checkpoint is one postings write — the same bytes a tf exchange
  would move — paid once instead of per consumer.
- The QUERY side is tiny by construction (a handful of query strings,
  bounded distinct tokens) and BROADCASTS into the posting scan — the
  corpus-sized tf table never shuffles for the match; only the matched
  (query_id, doc_id) partials move, keyed by maximal-cardinality
  (query_id, doc_id).
- Per-query top-k is a doc_id-keyed window partitioned on query_id —
  at real query batch sizes the per-partition state is one query's
  candidate list; rank orders by the ROUNDED score then doc_id so a
  last-ulp sum difference cannot reorder engines.

Tokenizer parity: the Arrow kernel splits on ``re.compile(r"\\s+",
re.ASCII)`` after stripping spaces — exactly ``split(trim(text),
'\\s+')`` (Java ``\\s`` = ``[ \\t\\n\\x0B\\f\\r]`` = ASCII-mode Python
``\\s``); equivalence to the JVM ``words()`` stream is pinned in
tests/test_llm_pipeline.py including the empty/whitespace/null edge
cases.

The reference repo has no retrieval layer (its lake serves marketing
reads; see SURVEY.md §2.12) — this is part of the LLM-pipeline
extension (SURVEY §2 L-rows), sitting next to dense ANN the way a
hybrid retriever deploys.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ad_data_lake_spark.llm.text import words
from ad_data_lake_spark.sources.tables import spread

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 5
BM25_N_QUERIES = 3  # fixture query set: doc_id < 3 (mirrors RAG's vec_id < 5)

# ASCII-mode \s == Java regex \s == [ \t\n\x0B\f\r]: the Arrow kernel
# must tokenize EXACTLY like the JVM words() = split(trim(text), '\s+')
_WS_ASCII = re.compile(r"\s+", re.ASCII)

_TF_SCHEMA = "doc_id long, token string, tf long, dl long"


def _tf_partials(batches: Iterator) -> Iterator:
    """Exact per-document term frequencies for each Arrow batch.

    Correct WITHOUT any merge step: a document is row-atomic, so every
    occurrence of (doc_id, token) is inside one batch — the batch-local
    groupby count is the global term frequency, and ``dl`` (document
    length in tokens) is the row's own token count. Null text mirrors
    the JVM contract (split(NULL) -> NULL -> explode emits nothing).
    ``dl`` is carried POSITIONALLY into the exploded frame (and the
    count groups on the row ordinal, not the id), so a batch carrying
    duplicate doc_id rows yields per-row postings instead of an opaque
    pandas reindex error mid-Arrow-pass — well-formed corpora have
    unique doc_id and are byte-identical either way."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        pdf = pdf[pdf["text"].notna()]
        if not len(pdf):
            continue
        toks = pdf["text"].str.strip(" ").str.split(_WS_ASCII)
        rep = toks.str.len().to_numpy()
        ex = pd.DataFrame(
            {
                "rid": np.arange(len(pdf)).repeat(rep),
                "doc_id": pdf["doc_id"].to_numpy().repeat(rep),
                "dl": rep.repeat(rep),
                "token": toks.explode().to_numpy(),
            }
        )
        g = (
            ex.groupby(["rid", "doc_id", "dl", "token"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        g["dl"] = g["dl"].astype("int64")
        yield g[["doc_id", "token", "tf", "dl"]]


def term_frequencies(documents: DataFrame) -> DataFrame:
    """The (doc_id, token, tf, dl) posting table, computed in one
    shuffle-free Arrow pass (see ``_tf_partials``) and materialized
    once (lazy checkpoint) for its two consumers — the query-vocab df
    aggregate and the scoring join; without it each consumer re-runs
    the corpus tokenize pass (~0.9 s/pass at sf1). The df broadcast
    build executes first and populates the cache; the scoring job
    reads it."""
    return (
        spread(documents.select("doc_id", "text"))
        .mapInPandas(_tf_partials, _TF_SCHEMA)
        .localCheckpoint(eager=False)
    )


def bm25_retrieve(
    documents: DataFrame,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = BM25_TOP_K,
    n_queries: int = BM25_N_QUERIES,
) -> DataFrame:
    """Top-``top_k`` BM25 hits per query document (the first
    ``n_queries`` docs' texts act as queries; a query never retrieves
    itself). Returns (query_id, rank, doc_id, score, n_terms)."""
    tf = term_frequencies(documents)
    qtoks = (
        documents.where(F.col("doc_id") < n_queries)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.array_distinct(words(F.col("text")))).alias("token"),
        )
    )
    # Corpus stats in ONE documents-scan aggregate (r11 job-count
    # sweep: was three upstream jobs — an n_docs count, a two-stage
    # per-doc dl rollup off the postings, and their broadcast builds).
    # avg(size(words(text))) over non-null texts IS avg(dl): a doc's
    # dl is its total token count, and null-text docs produce no
    # postings (the JVM split(NULL) contract), so both averages range
    # over exactly the docs-with-postings set.
    stats = documents.agg(
        F.count("*").alias("n_docs"),
        F.avg(
            F.when(F.col("text").isNotNull(), F.size(words(F.col("text"))))
        ).alias("avgdl"),
    )
    # df is needed ONLY for query terms: the semi filter makes both the
    # aggregate and the broadcast QUERY-vocabulary-bounded by
    # construction — a full-corpus df table is Heaps-law unbounded at
    # 100 TB and must never be a forced broadcast. The count is a
    # map-side-combined AGGREGATE on purpose: the r11 sweep tried a
    # window over the semi-joined postings (one job cheaper at sf0.1),
    # but a window partitions by token, and one stop-word in a query
    # puts that token's ENTIRE posting list in a single partition — a
    # straggler the aggregate's partial combine is immune to. Left-semi
    # against the non-distinct qtoks is exact: semi joins never
    # duplicate the left side.
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


RRF_K = 60  # the canonical reciprocal-rank-fusion constant (Cormack 2009)
HYBRID_POOL_K = 10  # candidate-list depth fed into the fusion, per retriever
HYBRID_TOP_K = 5


def hybrid_retrieve_rrf(
    documents: DataFrame,
    embeddings: DataFrame,
    rrf_k: int = RRF_K,
    pool_k: int = HYBRID_POOL_K,
    top_k: int = HYBRID_TOP_K,
    n_queries: int = BM25_N_QUERIES,
) -> DataFrame:
    """Hybrid retrieval: fuse the sparse (BM25) and dense (exact
    cosine) candidate lists with reciprocal rank fusion —
    ``rrf(d) = Σ_r 1 / (rrf_k + rank_r(d))`` over the retrievers that
    returned ``d`` (Cormack, Clarke & Buettcher 2009, the fusion every
    production hybrid RAG stack ships because it needs no score
    calibration between BM25's unbounded scores and cosine's [-1, 1]).

    Both query sets are the first ``n_queries`` documents (doc_id and
    vec_id are the same key — ``rag_retrieve`` relies on the same
    alignment). A rank of 0 in the output means "not retrieved by that
    half" — the 0 sentinel (real ranks start at 1) keeps the columns
    int-typed and NULL-free, which the cross-engine value hash needs.

    Scale shape: each half is already scale-shaped (BM25: shuffle-free
    Arrow postings; dense: broadcast-query brute-force — swap in
    ``topk_ivf`` for the indexed path, the fusion is rank-only so any
    retriever slots in); the fusion itself touches q × 2·pool_k rows —
    a UNION + one tiny aggregate, no join — so its cost is bounded by
    the query batch, never the corpus. Rank orders by the ROUNDED rrf
    score then doc_id: scores are sums of ≤2 exact rational terms, so
    engines cannot disagree past the 6-dp round."""
    from ad_data_lake_spark.llm.similarity import topk_bruteforce

    sparse = bm25_retrieve(documents, top_k=pool_k, n_queries=n_queries).select(
        "query_id",
        "doc_id",
        F.col("rank").alias("sparse_rank"),
        F.lit(0).alias("dense_rank"),
    )
    dense = topk_bruteforce(embeddings, n_queries=n_queries, k=pool_k).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        F.lit(0).alias("sparse_rank"),
        F.col("rank").alias("dense_rank"),
    )
    # each unioned row carries exactly one non-zero rank, so the row's
    # contribution is 1 / (rrf_k + sparse_rank + dense_rank)
    contrib = F.lit(1.0) / (
        F.lit(rrf_k) + F.col("sparse_rank") + F.col("dense_rank")
    )
    fused = (
        sparse.unionByName(dense)
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(F.sum(contrib), 6).alias("rrf_score"),
            F.max("sparse_rank").alias("sparse_rank"),
            F.max("dense_rank").alias("dense_rank"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            "query_id", "rank", "doc_id", "rrf_score", "sparse_rank", "dense_rank"
        )
    )


MMR_LAMBDA = 0.7
MMR_POOL_K = 10
MMR_SELECT_K = 5


def mmr_diversify(
    embeddings: DataFrame,
    lam: float = MMR_LAMBDA,
    pool_k: int = MMR_POOL_K,
    select_k: int = MMR_SELECT_K,
    n_queries: int = BM25_N_QUERIES,
) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein
    1998) of the dense candidate pool: iteratively select the
    candidate maximizing ``λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)`` —
    the diversification pass retrieval stacks run so the final k hits
    aren't k near-copies of the same passage (RAG context windows pay
    per token; redundant passages waste them).

    Output: (query_id, select_rank, doc_id, rel, mmr_score), one row
    per selection step; ``rel`` is the candidate's (6-dp-rounded)
    query cosine from the pool, ``mmr_score`` the rounded objective at
    pick time (step 1's max-sim term is 0 — pure relevance, the paper's
    initialization).

    Scale shape: the sequential argmax loop runs per query over the
    BOUNDED pool (pool_k rows) inside one Arrow ``applyInPandas``
    group — pairwise sims are one pool_k×pool_k BLAS matmul; the
    corpus contributes only the pool join (candidate hit list
    broadcasts into the vector scan, the rag_retrieve shape). Cost is
    O(queries · pool_k²) whatever the corpus size. Determinism: every
    cosine/objective is rounded to 6 dp before comparison and ties
    break on doc_id, so the pick sequence is engine-reproducible; the
    unrolled-CTE DuckDB oracle replays the same ``select_k`` picks."""
    import numpy as np
    import pandas as pd

    from ad_data_lake_spark.llm.similarity import as_double, topk_bruteforce

    hits = topk_bruteforce(embeddings, n_queries=n_queries, k=pool_k).select(
        "query_id", "vec_id", F.col("cosine_sim").alias("rel")
    )
    vecs = embeddings.select("vec_id", as_double(F.col("embedding")).alias("cv"))
    pool = vecs.join(F.broadcast(hits), "vec_id")

    def _mmr_group(pdf: pd.DataFrame) -> pd.DataFrame:
        V = np.vstack(pdf["cv"].to_numpy())
        rel = pdf["rel"].to_numpy()
        ids = pdf["vec_id"].to_numpy()
        norms = np.linalg.norm(V, axis=1)
        S = np.round((V @ V.T) / np.outer(norms, norms), 6)
        n = len(pdf)
        # -inf sentinel: "no selected yet" scores a 0 penalty (the
        # paper's pure-relevance first pick), but once anything is
        # selected the TRUE max similarity applies — which can be
        # NEGATIVE (a clamp at 0 would under-reward anti-correlated
        # candidates and diverge from the oracle)
        maxsim = np.full(n, -np.inf)
        remaining = np.ones(n, dtype=bool)
        out = []
        for step in range(1, min(select_k, n) + 1):
            penalty = np.where(np.isneginf(maxsim), 0.0, maxsim)
            mmr = np.round(lam * rel - (1.0 - lam) * penalty, 6)
            order = sorted(
                (i for i in range(n) if remaining[i]),
                key=lambda i: (-mmr[i], ids[i]),
            )
            i = order[0]
            out.append(
                (int(pdf["query_id"].iloc[0]), step, int(ids[i]), rel[i], mmr[i])
            )
            remaining[i] = False
            maxsim = np.maximum(maxsim, S[:, i])
        return pd.DataFrame(
            out, columns=["query_id", "select_rank", "doc_id", "rel", "mmr_score"]
        )

    return pool.groupBy("query_id").applyInPandas(
        _mmr_group,
        "query_id long, select_rank int, doc_id long, rel double, mmr_score double",
    )


POSTINGS_BATCH_MOD = 6  # base/batch split (the index-maintenance contract)


def postings_index_incremental(spark, sf_dir: str) -> DataFrame:
    """Incremental inverted-index maintenance for the BM25 serving
    path: persist the (doc_id, token, tf, dl) posting table for the
    base corpus (doc_id % POSTINGS_BATCH_MOD != 0), then APPEND the
    held-out batch's postings — documents are row-atomic, so a batch's
    postings are exact in isolation and append ≡ rebuild with no merge
    step at all. Returns the df/total-tf view of the merged index; the
    DuckDB oracle recomputes it from scratch over ALL documents, so
    the hash match proves the maintained index serves the same
    statistics a full re-index would (the minhash/IVF/CMS/BPE-vocab
    invariant, closing the set for the retrieval layer). Only the
    batch re-tokenizes; history is never re-scanned.

    At scale the postings land bucketed by token (layout.py Y1) so the
    query probe is co-located; plain parquet here mirrors the other
    index-maintenance rows."""
    from ad_data_lake_spark.scratch import scratch_dir
    from ad_data_lake_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    path = scratch_dir(spark, "bm25-postings", sf_dir)

    base = docs.where(F.col("doc_id") % POSTINGS_BATCH_MOD != 0)
    batch = docs.where(F.col("doc_id") % POSTINGS_BATCH_MOD == 0)
    # term_frequencies checkpoints for multi-consumer reads; the write
    # path has exactly one consumer, so write the raw Arrow pass
    spread(base.select("doc_id", "text")).mapInPandas(
        _tf_partials, _TF_SCHEMA
    ).write.parquet(path)
    spread(batch.select("doc_id", "text")).mapInPandas(
        _tf_partials, _TF_SCHEMA
    ).write.mode("append").parquet(path)
    merged = spark.read.parquet(path)
    return merged.groupBy("token").agg(
        F.count("*").alias("df"), F.sum("tf").alias("total_tf")
    )
