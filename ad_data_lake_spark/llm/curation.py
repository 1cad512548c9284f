"""Dataset-curation operators a training-data pipeline runs after
cleaning/dedup: deterministic split assignment, token-budget sequence
packing, and benchmark-contamination checks.

Scale design (100 TB):
- split assignment is a pure projection on a content-stable hash — no
  shuffle, no state, reproducible run-to-run and engine-to-engine;
- sequence packing partitions by shard and runs ONE window cumsum per
  shard — bins never cross shards, so packing 100 TB is exactly as
  parallel as the shard count, and the window never sees more than one
  shard's rows;
- contamination joins the corpus's exploded shingle hashes against the
  (small) benchmark shingle set — the benchmark side broadcasts, the
  corpus side never shuffles; cost is one scan of the corpus shingles.

Hashes are md5-derived (cross-engine reproducible) so every operator
here is value-verified by the DuckDB oracle; swap a ``hash_family``
the way llm/dedup.py does when pinning to the JVM is acceptable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ad_data_lake_spark.llm.dedup import _exploded_shingle_hashes
from ad_data_lake_spark.llm.text import words

# (name, cumulative upper bound in percent): 90/5/5
SPLIT_BOUNDS: tuple[tuple[str, int], ...] = (("train", 90), ("val", 95), ("test", 100))

PACK_BUDGET = 2048  # tokens per packed sequence (context-window analogue)
PACK_SHARDS = 8

BENCHMARK_MOD = 41  # every 41st doc plays the held-out benchmark set


def _id_hash_pct(id_col: Column) -> Column:
    """Deterministic 0–99 bucket from md5 of the id — the split lever.
    Content-stable: a document keeps its split across reruns, engines,
    and (unlike row_number schemes) upstream re-partitioning."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 7), 16, 10).cast("long")
        % 100
    )


def split_assign(documents: DataFrame) -> DataFrame:
    """Deterministic train/val/test assignment (90/5/5) by hashed
    doc_id. One projection; the per-split counts any consumer needs are
    a groupBy away (``split_summary``)."""
    pct = _id_hash_pct(F.col("doc_id"))
    expr = F.lit(None).cast("string")
    for name, bound in reversed(SPLIT_BOUNDS):
        expr = F.when(pct < bound, F.lit(name)).otherwise(expr)
    return documents.select("doc_id", pct.alias("split_pct"), expr.alias("split"))


def split_summary(documents: DataFrame) -> DataFrame:
    """Per-split document and token totals — the sanity sheet cut
    before training: one hash projection + one small aggregate."""
    s = split_assign(documents).join(documents, "doc_id")
    return (
        s.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(words(F.col("text")))).alias("n_tokens"),
        )
        .orderBy("split")
    )


def pack_sequences(
    documents: DataFrame,
    budget: int = PACK_BUDGET,
    n_shards: int = PACK_SHARDS,
) -> DataFrame:
    """Token-budget sequence packing: assign consecutive documents
    (hash-sharded, doc_id order within shard) to fixed-budget bins —
    the streaming first-fit approximation every LLM data loader uses:
    a document goes to the bin its running token offset falls in, so
    bins hold consecutive docs and a doc may straddle a boundary
    (loaders split or pad there; the assignment is what the engine
    owns).

    One window cumsum per shard — shards are independent, so the
    operator parallelizes by shard count at any scale and the window
    state never exceeds one shard."""
    n_tok = F.size(words(F.col("text")))
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7), 16, 10).cast(
            "long"
        )
        % n_shards
    )
    base = documents.select(
        "doc_id", shard.alias("shard"), n_tok.alias("n_tokens")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("tok_start")
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        start,
        F.floor((cum - F.col("n_tokens")) / budget).cast("long").alias("bin_id"),
        ((cum - F.col("n_tokens")) % budget).cast("long").alias("bin_offset"),
    )


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame | None = None,
    benchmark_mod: int = BENCHMARK_MOD,
) -> DataFrame:
    """Benchmark contamination: per corpus document, the fraction of
    its distinct 3-gram shingle hashes that appear anywhere in the
    benchmark set. ``benchmark`` defaults to every ``benchmark_mod``-th
    document (the deterministic stand-in for a real eval suite);
    benchmark members are excluded from the scored corpus.

    Join shape: the benchmark's distinct shingle-hash set is tiny
    relative to the corpus (eval suites are MBs against TBs) and
    broadcasts; the corpus's exploded shingles stream past it in one
    scan — no corpus shuffle until the per-doc count aggregate on
    doc_id, whose input is one row per (doc, distinct shingle)."""
    if benchmark is None:
        benchmark = corpus.where(F.col("doc_id") % benchmark_mod == 0)
        corpus = corpus.where(F.col("doc_id") % benchmark_mod != 0)
    bench_hashes = (
        _exploded_shingle_hashes(benchmark).select("h60").distinct()
    )
    # occurrence rows, deduped inside the aggregates: count_distinct
    # starts its distinct set map-side, so each path pays ONE doc_id
    # shuffle instead of a (doc_id, h60) distinct shuffle plus a
    # second count shuffle on the same rows
    doc_hashes = _exploded_shingle_hashes(corpus).select("doc_id", "h60")
    flagged = doc_hashes.join(
        F.broadcast(bench_hashes), "h60", "left_semi"
    ).groupBy("doc_id").agg(F.count_distinct("h60").alias("n_shared"))
    totals = doc_hashes.groupBy("doc_id").agg(
        F.count_distinct("h60").alias("n_shingles")
    )
    return (
        totals.join(flagged, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("n_shared"), F.lit(0)).alias("n_shared"),
            F.round(
                F.coalesce(F.col("n_shared"), F.lit(0)) / F.col("n_shingles"), 4
            ).alias("contamination"),
        )
    )


def curation_pipeline(documents: DataFrame) -> DataFrame:
    """End-to-end corpus curation — the LLM-layer analogue of
    pipeline.daily_extract_pipeline: quality-filter (keep band), exact
    dedup (keep the min doc_id per content hash), split assignment,
    per-split doc/token summary. One composed lazy plan: Catalyst sees
    the whole lineage, so the quality projection fuses with the scan,
    the dedup is one hash shuffle, and the summary is one small
    aggregate — running the pipeline costs the same as its most
    expensive stage, not the sum of four materialized steps."""
    from ad_data_lake_spark.llm.dedup import content_hash
    from ad_data_lake_spark.llm.text import quality_score

    q = quality_score(documents).where(F.col("keep")).select("doc_id", "n_tokens")
    kept = documents.select("doc_id", "text").join(q, "doc_id")
    keep_ids = (
        kept.select(content_hash(F.col("text")).alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    final = kept.join(keep_ids.select("doc_id"), "doc_id", "semi")
    s = split_assign(final.select("doc_id", "text")).select("doc_id", "split")
    return (
        final.join(s, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("split")
    )


# keep-rate (percent) by source tier (tier = source index // 5): the
# domain-mixture weights a pretraining recipe assigns — oversample the
# high-quality tier, heavily downsample the bulk tail
MIXTURE_RATES: tuple[int, ...] = (100, 50, 20, 5)


def mixture_sample(documents: DataFrame) -> DataFrame:
    """Weighted domain-mixture sampling: each source tier keeps a
    deterministic hash fraction of its documents (doc-stable — the
    same md5 pct bucket as ``split_assign``, so a doc's inclusion
    never depends on which other docs are present). Returns the
    per-source audit sheet (rate, total, kept); the row-level keep
    predicate is the same ``pct < rate`` projection.

    Scale: a pure projection + one small aggregate — the mixture is
    applied at scan time (predicate on a computed column), never by
    materializing intermediate samples."""
    idx = F.substring(F.col("source"), 4, 10).cast("int")
    tier = F.least(F.floor(idx / 5).cast("int"), F.lit(len(MIXTURE_RATES) - 1))
    rate = F.element_at(
        F.array(*[F.lit(r) for r in MIXTURE_RATES]), tier + F.lit(1)
    )
    pct = _id_hash_pct(F.col("doc_id"))
    return (
        documents.select("source", rate.alias("rate"), pct.alias("pct"))
        .groupBy("source", "rate")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_if(F.col("pct") < F.col("rate")).alias("n_kept"),
        )
        .orderBy("source")
    )


CHUNK_TOKENS = 32
CHUNK_OVERLAP = 8


def chunk_documents(
    documents: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Sliding-window document chunking: split each document's token
    stream into ``chunk_tokens``-sized windows stepping by
    ``chunk_tokens - overlap`` — the RAG/pretraining windowing op.
    Chunk count uses pure integer arithmetic (ceil-div via
    ``(n - overlap + step - 1) div step``, floored at 1) so both
    engines cut identical windows; the final chunk may be short.

    Pure per-row array work (sequence + posexplode + slice): no
    shuffle, no Python — output row count is Σ chunks, each row
    carrying only its own window's text."""
    step = chunk_tokens - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    w = words(F.col("text"))
    base = documents.select("doc_id", w.alias("w"), F.size(w).alias("n")).withColumn(
        "nc",
        F.greatest(F.expr(f"(n - {overlap} + {step - 1}) div {step}"), F.lit(1)),
    )
    exploded = base.select(
        "doc_id",
        "w",
        F.posexplode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("chunk_id", "_c"),
    )
    chunk = F.slice(F.col("w"), F.col("chunk_id") * step + 1, chunk_tokens)
    return exploded.select(
        "doc_id",
        "chunk_id",
        F.size(chunk).alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )
