"""Sparse lexical retrieval (BM25) over the ``documents`` corpus.

The dense path (``similarity.rag_retrieve``) covers embedding recall;
this module adds the sparse half every production RAG stack pairs with
it (hybrid retrieval): Okapi BM25 (Robertson et al., TREC-3) with the
standard k1/b parameterization and the +1-smoothed idf
(``ln(1 + (N - df + 0.5) / (df + 0.5))``, the Lucene form that keeps
idf positive for df > N/2).

Scale shape (the part that must survive 100 TB):

- ONE corpus tokenize pass feeds a (doc_id, token) term-frequency
  aggregate (map-side combine collapses repeats inside the scan
  stage); document length and document frequency both derive from THAT
  aggregate — the token stream is never re-scanned, and the tf
  exchange is shared by its consumers (ReusedExchange, asserted in
  tests/test_plans.py).
- The QUERY side is tiny by construction (a handful of query strings,
  bounded distinct tokens) and BROADCASTS into the posting scan — the
  corpus-sized tf table never shuffles for the match; only the matched
  (query_id, doc_id) partials move, keyed by maximal-cardinality
  (query_id, doc_id).
- df is vocabulary-bounded and broadcasts; N and avgdl are scalar
  cross-attaches.
- Per-query top-k is a doc_id-keyed window partitioned on query_id —
  at real query batch sizes the per-partition state is one query's
  candidate list; rank orders by the ROUNDED score then doc_id so a
  last-ulp sum difference cannot reorder engines.

The reference repo has no retrieval layer (its lake serves marketing
reads; see SURVEY.md §2.12) — this is part of the LLM-pipeline
extension (SURVEY §2 L-rows), sitting next to dense ANN the way a
hybrid retriever deploys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ad_data_lake_spark.llm.text import words

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 5
BM25_N_QUERIES = 3  # fixture query set: doc_id < 3 (mirrors RAG's vec_id < 5)


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
    toks = documents.select(
        "doc_id", F.explode(words(F.col("text"))).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    # The tf>0 predicate is vacuously true; it pins the tf column as
    # referenced so both derived aggregates share ONE canonical tf
    # exchange (the tfidf_top_terms ReusedExchange recipe) instead of
    # re-scanning the token stream.
    dl = tf.where(F.col("tf") > 0).groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.where(F.col("tf") > 0).groupBy("token").agg(F.count("*").alias("df"))
    n_docs = documents.agg(F.count("*").alias("n_docs"))
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))

    qtoks = (
        documents.where(F.col("doc_id") < n_queries)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.array_distinct(words(F.col("text")))).alias("token"),
        )
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
        .join(dl, "doc_id")
        .join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(avgdl))
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
