"""Deduplication operators for a training-data pipeline: exact
(content-hash), normalized, MinHash-LSH near-dup, SimHash, and exact
n-gram Jaccard verification.

Scale design (100 TB) — the thing that matters most here:
- exact/normalized dedup is one hash-groupBy with map-side partial
  aggregation; the shuffle carries (hash, id), never the text.
- MinHash-LSH is strictly bucketed: signatures are per-row array math
  (no shuffle), candidate pairs come from a self-join on (band_id,
  band_key) — only documents agreeing on an entire band ever meet.
  There is NO all-pairs cross join anywhere; candidate volume scales
  with true collision rate, not n².
- Jaccard verification runs only on candidate pairs, joining back the
  (distinct) shingle arrays.
- hashes are md5 hex strings so the DuckDB oracle reproduces every
  value exactly (a seeded murmur/xxhash would diverge across engines).

SimHash note: 16-bit fingerprints (md5-derived per-token hashes,
bit-majority vote) — wide enough to demonstrate the operator and verify
cross-engine, short enough that the oracle SQL stays readable; widen
BITS for production use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ad_data_lake_spark.llm.text import word_shingles, words

N_HASHES = 9
N_BANDS = 3
ROWS_PER_BAND = N_HASHES // N_BANDS
SIMHASH_BITS = 16


def content_hash(col: Column) -> Column:
    """sha256 of the raw text — the exact-dedup key."""
    return F.sha2(col, 256)


def normalize_text(col: Column) -> Column:
    """Casefold + whitespace-collapse + trim: the cheap normalization
    pass applied before hashing (catches reflowed/re-cased copies)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def dedup_exact(corpus: DataFrame) -> DataFrame:
    """Exact dedup via content-hash groupBy: one row per distinct text,
    keeping the smallest doc_id (deterministic last-wins analogue) and
    the duplicate count. The shuffle key is the 64-hex hash, uniformly
    distributed — no skew at any scale."""
    return (
        corpus.select(content_hash(F.col("text")).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


def dedup_normalized(corpus: DataFrame) -> DataFrame:
    """Normalized dedup: hash of normalized text; catches copies that
    differ only in case/whitespace."""
    return (
        corpus.select(
            content_hash(normalize_text(F.col("text"))).alias("norm_hash"), "doc_id"
        )
        .groupBy("norm_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


def minhash_signature(col: Column, n_hashes: int = N_HASHES) -> Column:
    """MinHash signature as an array of n lexicographic-min md5 values
    over the distinct 3-word shingles, one per seed. Pure per-row array
    math — computed in a single projection, no shuffle."""
    shingles = word_shingles(col)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingles, lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s)))
        ),
    )


def band_keys(sig: Column, n_bands: int = N_BANDS, rows: int = ROWS_PER_BAND) -> Column:
    """LSH banding: hash each contiguous run of ``rows`` signature
    entries into one band key. Two documents collide on a band iff that
    entire run matches."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.md5(
            F.concat(*[F.element_at(sig, b * rows + r + 1) for r in range(rows)])
        ),
    )


def minhash_bands(corpus: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_key) — the LSH bucket table."""
    sig = minhash_signature(F.col("text"))
    return corpus.select(
        "doc_id", F.posexplode(band_keys(sig)).alias("band_id", "band_key")
    )


def minhash_candidate_pairs(corpus: DataFrame) -> DataFrame:
    """Candidate near-dup pairs: self-join of the bucket table on
    (band_id, band_key) with doc_a < doc_b, distinct. This is the
    bucketed step that replaces the disqualifying all-pairs join — the
    shuffle key is the band hash, and only same-bucket rows pair up."""
    bands = minhash_bands(corpus)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_neardup_pairs(corpus: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: bucketed candidates, then
    exact n-gram Jaccard verification on candidates only. Output:
    (doc_a, doc_b, jaccard) for verified pairs ≥ threshold."""
    shingle_sets = corpus.select("doc_id", word_shingles(F.col("text")).alias("shingles"))
    pairs = minhash_candidate_pairs(corpus)
    sa = shingle_sets.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    sb = shingle_sets.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a", "doc_b", F.round(inter / union, 4).alias("jaccard")
        )
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(corpus: DataFrame, mod: int = 50) -> DataFrame:
    """Exact n-gram Jaccard over an explicit (bounded) candidate set —
    the verification primitive on its own, for callers that bring their
    own candidate generator. Here candidates are id-bucketed (doc_id %
    mod) so the join stays bounded; production candidates come from
    ``minhash_candidate_pairs``."""
    sh = corpus.select(
        "doc_id", (F.col("doc_id") % mod).alias("bucket"), word_shingles(F.col("text")).alias("sh")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(inter / union, 4).alias("jaccard"),
        )
    )


def simhash(corpus: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash fingerprint: md5-derived ``bits``-bit hash per token,
    per-bit majority vote over all tokens (duplicates weighted), sign →
    bit. Documents with equal fingerprints are near-dup candidates via
    a plain groupBy — no pairwise work at all. Per-row array math; the
    per-token hash array is materialized once and reused by every bit."""
    w = words(F.col("text"))
    hs = F.transform(
        w, lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("long")
    )

    def bit_vote(mask: int) -> Column:
        return F.aggregate(
            hs,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(mask)) != 0, 1).otherwise(-1),
        )

    fingerprint = None
    for b in range(bits):
        mask = 1 << b
        term = F.when(bit_vote(mask) >= 0, F.lit(mask)).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return corpus.select("doc_id", fingerprint.cast("long").alias("simhash"))


def simhash_groups(corpus: DataFrame) -> DataFrame:
    """Near-dup groups = documents sharing a SimHash fingerprint."""
    return (
        simhash(corpus)
        .groupBy("simhash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_docs"))
        .where(F.col("n_docs") > 1)
    )
