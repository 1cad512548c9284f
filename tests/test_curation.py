"""Semantic tests for the dataset-curation layer (llm/curation.py) —
beyond oracle parity: is the split content-stable under subsetting, do
packed bins respect the token budget, does a planted copy of a
benchmark document actually get flagged.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ad_data_lake_spark.llm import curation as CU
from ad_data_lake_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def documents(spark):
    return load_table(spark, "documents", SF_ORACLE)


def test_split_ratios_and_stability(documents):
    n = documents.count()
    counts = {
        r.split: r.n
        for r in CU.split_assign(documents).groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) <= {"train", "val", "test"}
    # 90/5/5 by hash: allow binomial wobble on the small fixture
    assert counts["train"] / n == pytest.approx(0.90, abs=0.06)
    # content stability: a document's split must not depend on which
    # other documents are present (rules out row_number-style schemes)
    half = documents.where(F.col("doc_id") % 2 == 0)
    full_map = dict(
        CU.split_assign(documents).select("doc_id", "split").collect()
    )
    for doc_id, split in CU.split_assign(half).select("doc_id", "split").collect():
        assert full_map[doc_id] == split


def test_pack_sequences_invariants(documents):
    rows = CU.pack_sequences(documents).collect()
    budget = CU.PACK_BUDGET
    by_shard: dict[int, list] = {}
    for r in rows:
        assert r.bin_offset == r.tok_start % budget
        assert r.bin_id == r.tok_start // budget
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) == CU.PACK_SHARDS
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        # bins are consecutive and non-decreasing in doc order, and the
        # running offset is exactly the cumulative token count
        cum = 0
        for r in shard_rows:
            assert r.tok_start == cum
            cum += r.n_tokens


def test_contamination_flags_planted_benchmark_copy(documents):
    bench = documents.where(F.col("doc_id") % CU.BENCHMARK_MOD == 0)
    clean = documents.where(F.col("doc_id") % CU.BENCHMARK_MOD != 0)
    planted = bench.withColumn("doc_id", F.col("doc_id") + 10_000_000)
    scored = CU.contamination_check(
        clean.unionByName(planted), benchmark=bench
    )
    flagged = {r.doc_id: r.contamination for r in scored.collect()}
    n_bench = bench.count()
    assert n_bench > 0
    # every verbatim copy of a benchmark doc is fully contaminated
    for r in bench.select("doc_id").collect():
        assert flagged[r.doc_id + 10_000_000] == 1.0
    # the untouched corpus is mostly clean (shared boilerplate 3-grams
    # allowed, wholesale overlap not)
    clean_scores = [
        v for k, v in flagged.items() if k < 10_000_000
    ]
    assert sum(s < 0.5 for s in clean_scores) / len(clean_scores) > 0.95


def test_curation_ops_on_degenerate_inputs(spark, documents):
    """Empty and sub-shingle-width inputs must flow through every
    curation operator without crashing and with the documented
    semantics: empty in → empty out; a doc too short to shingle is
    absent from contamination output (it has no shingle set to score)."""
    empty = documents.where(F.lit(False))
    assert CU.split_assign(empty).count() == 0
    assert CU.split_summary(empty).count() == 0
    assert CU.pack_sequences(empty).count() == 0
    assert CU.contamination_check(empty, benchmark=documents.limit(5)).count() == 0
    assert CU.curation_pipeline(empty).count() == 0

    short = spark.createDataFrame(
        [(1, "too short", "en", "web"), (2, "word", "en", "web")],
        "doc_id long, text string, lang string, source string",
    )
    # packing still assigns (token counts 2 and 1); contamination has
    # no shingles to score, so both docs are absent rather than NaN
    packed = {r.doc_id: r.n_tokens for r in CU.pack_sequences(short).collect()}
    assert packed == {1: 2, 2: 1}
    assert CU.contamination_check(short, benchmark=documents.limit(5)).count() == 0


def test_mixture_sample_tracks_rates(documents):
    """Each source tier's kept fraction must track its configured rate
    (binomial wobble allowed at 25-docs-per-source fixture scale), and
    the keep decision must be doc-stable (hash pct, not row order)."""
    rows = CU.mixture_sample(documents).collect()
    assert {r.rate for r in rows} <= set(CU.MIXTURE_RATES)
    for r in rows:
        assert 0 <= r.n_kept <= r.n_docs
        if r.rate == 100:
            assert r.n_kept == r.n_docs
    by_rate: dict[int, list] = {}
    for r in rows:
        by_rate.setdefault(r.rate, []).append(r)
    for rate, rs in by_rate.items():
        kept = sum(r.n_kept for r in rs)
        total = sum(r.n_docs for r in rs)
        assert abs(kept / total - rate / 100) < 0.25


def test_chunk_documents_window_properties(spark, documents):
    """Sliding-window chunking invariants: stepping by (chunk - overlap)
    from token 0; every chunk ≤ chunk_tokens; consecutive full chunks
    share exactly `overlap` tokens; the union of de-overlapped chunks
    reproduces the document's token stream."""
    from ad_data_lake_spark.llm.text import words

    step = CU.CHUNK_TOKENS - CU.CHUNK_OVERLAP
    chunks = CU.chunk_documents(documents).collect()
    toks = {
        r.doc_id: r.t
        for r in documents.select("doc_id", words(F.col("text")).alias("t")).collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        assert 1 <= r.n_tokens <= CU.CHUNK_TOKENS
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(toks)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_id)
        full = toks[doc_id]
        for r in rs:
            start = r.chunk_id * step
            assert r.chunk_text.split(" ") == full[start : start + CU.CHUNK_TOKENS]
        # de-overlapped reconstruction covers every token exactly
        rebuilt = rs[0].chunk_text.split(" ")
        for r in rs[1:]:
            rebuilt += r.chunk_text.split(" ")[CU.CHUNK_OVERLAP :]
        assert rebuilt == full


def test_boilerplate_removal_invariants(documents):
    """Two-pass n-gram boilerplate removal: non-vacuous on the fixture
    (some spans removed, some docs untouched), the cleaned text is
    exactly the uncovered tokens in order, and no boilerplate 3-gram
    survives fully intact in any cleaned document."""
    from ad_data_lake_spark.llm.text import words

    out = CU.remove_boilerplate(documents).collect()
    toks = {
        r.doc_id: r.t
        for r in documents.select("doc_id", words(F.col("text")).alias("t")).collect()
    }
    assert {r.doc_id for r in out} == set(toks)
    removed_docs = [r for r in out if r.n_removed > 0]
    untouched = [r for r in out if r.n_removed == 0]
    assert removed_docs, "boilerplate removal is vacuous on the fixture"
    assert untouched, "every doc hit — min_docs threshold too low to be meaningful"
    boiler = {
        r.s for r in CU.boilerplate_ngrams(documents).collect()
    }
    assert boiler
    for r in out:
        full = toks[r.doc_id]
        assert r.n_tokens == len(full)
        cleaned = r.cleaned_text.split(" ") if r.cleaned_text else []
        assert len(cleaned) == r.n_tokens - r.n_removed
        # cleaned is a subsequence of the original tokens
        it = iter(full)
        assert all(any(tok == x for x in it) for tok in cleaned)
    # the worst offender actually lost its boilerplate spans
    worst = max(removed_docs, key=lambda r: r.n_removed)
    assert worst.n_removed >= 3  # at least one full 3-gram span


def test_stratified_sample_exactness(documents):
    """The sample must be EXACTLY the K smallest md5 keys per stratum
    (verified against an independent Python computation), with dense
    ranks 1..n and every row's stratum intact."""
    import hashlib

    rows = CU.stratified_sample(documents).collect()
    base = {r.doc_id: r.lang for r in documents.select("doc_id", "lang").collect()}
    per_lang: dict[str, list] = {}
    for r in rows:
        assert base[r.doc_id] == r.lang
        per_lang.setdefault(r.lang, []).append(r)
    want: dict[str, list] = {}
    for doc_id, lang in base.items():
        key = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
        want.setdefault(lang, []).append((key, doc_id))
    for lang, lst in want.items():
        lst.sort()
        want_ids = {d for _, d in lst[: CU.STRATA_K]}
        got = per_lang.get(lang, [])
        assert {r.doc_id for r in got} == want_ids
        assert sorted(r.sample_rank for r in got) == list(range(1, len(got) + 1))


def test_epoch_shuffle_is_seeded_permutation(documents):
    """Every document appears exactly once with dense per-shard
    positions and exact running token offsets; a different seed moves
    most documents (it is a real reshuffle, not an identity)."""
    rows = CU.epoch_shuffle(documents).collect()
    n = documents.count()
    assert len(rows) == n
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) <= set(range(CU.SHUFFLE_SHARDS))
    for rs in by_shard.values():
        rs.sort(key=lambda r: r.pos)
        assert [r.pos for r in rs] == list(range(1, len(rs) + 1))
        offset = 0
        for r in rs:
            assert r.tok_offset == offset
            offset += r.n_tokens
    pos0 = {r.doc_id: (r.shard, r.pos) for r in rows}
    other = CU.epoch_shuffle(documents, seed="epoch-1").collect()
    moved = sum(1 for r in other if pos0[r.doc_id] != (r.shard, r.pos))
    assert moved > n // 2


def test_cross_split_leakage_flags_match_split_assign(documents):
    """Each pair's split annotations must agree with split_assign on
    the dup corpus, and the leak flag must be their inequality — with
    at least one real leak present (non-vacuous)."""
    from ad_data_lake_spark.llm.corpus import dup_corpus

    leaks = CU.cross_split_leakage(documents).collect()
    assert leaks
    split_of = {
        r.doc_id: r.split
        for r in CU.split_assign(dup_corpus(documents)).collect()
    }
    for r in leaks:
        assert r.split_a == split_of[r.doc_a]
        assert r.split_b == split_of[r.doc_b]
        assert r.is_leak == (r.split_a != r.split_b)
    assert any(r.is_leak for r in leaks)


def test_bloom_decontaminate_no_false_negatives_bounded_fp(documents):
    """Every shingle truly shared with the reference set must hit the
    Bloom filter (no false negatives — a Bloom filter can only
    over-flag), and the false-positive tail over NON-shared shingles
    must stay near the m/k design point (~1–2 % here), not degenerate
    toward an always-hit filter."""
    from ad_data_lake_spark.llm import selection as SEL

    exact = {
        (r.doc_id): (r.n_shingles, r.n_shared)
        for r in CU.contamination_check(documents).collect()
    }
    bloom = {r.doc_id: (r.n_shingles, r.n_flagged) for r in SEL.bloom_decontaminate(documents).collect()}
    assert set(bloom) == set(exact)
    extra = total_clean = 0
    for doc_id, (n, flagged) in bloom.items():
        n_exact, shared = exact[doc_id]
        assert n == n_exact
        assert flagged >= shared, f"doc {doc_id}: bloom missed a shared shingle"
        extra += flagged - shared
        total_clean += n - shared
    fp_rate = extra / total_clean
    assert fp_rate < 0.05, f"false-positive rate {fp_rate:.3f} exceeds design point"


def test_dsir_prefers_target_like_documents(documents):
    """A document whose text IS a benchmark document's text (planted
    into the raw corpus) must score above the raw-corpus median — the
    importance ratio has to actually pull target-like text upward."""
    from ad_data_lake_spark.llm import selection as SEL

    bench_text = (
        documents.where(F.col("doc_id") % CU.BENCHMARK_MOD == 0)
        .orderBy("doc_id")
        .select("text")
        .first()
        .text
    )
    planted_id = 10**6 + 7  # not divisible by BENCHMARK_MOD
    assert planted_id % CU.BENCHMARK_MOD != 0
    spiked = documents.unionByName(
        documents.sparkSession.createDataFrame(
            [(planted_id, bench_text, "en", "planted", len(bench_text))],
            documents.schema,
        )
    )
    scores = {r.doc_id: r.avg_log_ratio for r in SEL.dsir_weights(spiked).collect()}
    others = sorted(v for k, v in scores.items() if k != planted_id)
    median = others[len(others) // 2]
    assert scores[planted_id] > median, (
        f"planted target copy scored {scores[planted_id]} <= median {median}"
    )


def test_exact_substring_dedup_semantics(documents):
    """The planted exact-duplicate copy (doc_id + 1e6) must lose its
    ENTIRE text (every span is non-owner), while its original keeps
    every token that isn't part of some other duplicated span; and no
    kept document ever loses tokens that exist nowhere else."""
    from ad_data_lake_spark.llm import corpus as CP

    out = {
        r.doc_id: r
        for r in CU.exact_substring_dedup(CP.dup_corpus(documents)).collect()
    }
    originals = [
        d for d in out if d < CP.EXACT_OFFSET and d % CP.EXACT_MOD == 0
    ]
    assert originals, "fixture must contain planted exact duplicates"
    for doc_id in originals:
        copy = out[doc_id + CP.EXACT_OFFSET]
        if copy.n_tokens >= CU.SUBSTR_N:
            assert copy.cleaned_text == "", (
                f"copy of {doc_id} kept text: {copy.cleaned_text!r}"
            )
        orig = out[doc_id]
        assert orig.n_removed <= orig.n_tokens
    # documents below the span length are never touched
    for r in out.values():
        if r.n_tokens < CU.SUBSTR_N:
            assert r.n_removed == 0


def test_bloom_bitmap_memoized_per_reference_plan(documents):
    """The built bitmap is an immutable bounded model: probing the same
    reference plan twice must reuse the cached list (no second build
    job), and a different reference plan must NOT collide with it."""
    from pyspark.sql import functions as F

    from ad_data_lake_spark.llm import selection as SEL

    ref_a = documents.where(F.col("doc_id") % 41 == 0)
    ref_b = documents.where(F.col("doc_id") % 43 == 0)
    a1 = SEL.bloom_bitmap(ref_a)
    a2 = SEL.bloom_bitmap(ref_a)
    assert a1 is a2, "same reference plan must hit the memo"
    b = SEL.bloom_bitmap(ref_b)
    assert b is not a1 and b != a1, "distinct reference plans must not collide"


def test_temperature_mixture_flattens_toward_uniform(documents):
    """The α<1 temperature rule: the smallest source must keep
    everything (rate6 = 1e6 ⇒ every bucket < rate6), larger sources
    keep monotonically less, and the kept-share ordering inverts the
    size ordering — the flattening that is the operator's whole
    point."""
    rows = CU.temperature_mixture(documents).collect()
    assert rows
    by_size = sorted(rows, key=lambda r: r.src_chars)
    smallest = by_size[0]
    assert smallest.rate6 == 1_000_000
    assert smallest.n_kept == smallest.n_docs
    rates = [r.rate6 for r in by_size]
    assert rates == sorted(rates, reverse=True)
    assert all(0 < r.rate6 <= 1_000_000 for r in rows)
    # kept fraction ≈ rate (hash buckets are uniform): within 20 pp
    for r in rows:
        assert abs(r.n_kept / r.n_docs - r.rate6 / 1e6) < 0.2


def test_gopher_rules_verdicts_consistent(documents):
    """Each rule column must agree with its underlying measure, keep
    must be the conjunction, and the fixture-scaled word band must
    actually discriminate (some docs fail, most pass)."""
    from ad_data_lake_spark.llm.text import gopher_rules

    rows = gopher_rules(documents, min_words=40, max_words=90).collect()
    assert rows
    n_fail = sum(1 for r in rows if not r.keep)
    assert 0 < n_fail < len(rows)
    for r in rows:
        assert r.ok_word_count == (40 <= r.n_words <= 90)
        assert r.ok_repetition == (r.top_token_ratio <= 0.2)
        assert r.keep == (
            r.ok_word_count
            and r.ok_mean_word_len
            and r.ok_alpha_ratio
            and r.ok_stopwords
            and r.ok_repetition
        )
        # top-token ratio is a real run-length: between 1/n and 1
        assert 0 < r.top_token_ratio <= 1


def test_bloom_bitmap_cache_invalidated_by_data_change(spark, documents, tmp_path):
    """Regenerating the reference parquet AT THE SAME PATH must
    invalidate the memoized bitmap: the cache key folds in a file
    fingerprint (size + mtime), so the plan hash alone — identical for
    re-derived reads of the same path — can no longer serve stale
    bits."""
    import os
    import time

    from pyspark.sql import functions as F

    from ad_data_lake_spark.llm import selection as SEL

    path = str(tmp_path / "ref_docs")
    documents.where(F.col("doc_id") % 41 == 0).write.parquet(path)
    a = SEL.bloom_bitmap(spark.read.parquet(path))
    # regenerate DIFFERENT data under the same path
    documents.where(F.col("doc_id") % 43 == 0).write.mode("overwrite").parquet(path)
    # parquet mtime granularity can be coarse; nudge mtimes to be sure
    now = time.time() + 2
    for f in os.listdir(path):
        os.utime(os.path.join(path, f), (now, now))
    b = SEL.bloom_bitmap(spark.read.parquet(path))
    assert b != a, "stale bitmap served after the reference data changed"


def test_shard_assign_balances_token_totals(documents):
    """shard_assign: every doc assigned exactly once, shards within a
    tight token-total band (serpentine LPT bounds imbalance by one
    round's spread per group), and the serpentine rule holds: within a
    group, ranks r and 2N-1-r of each round land on the same shard."""
    rows = CU.shard_assign(documents).collect()
    n_docs = documents.count()
    assert len(rows) == n_docs
    totals = {}
    for r in rows:
        assert 0 <= r["shard"] < CU.BALANCE_SHARDS
        totals[r["shard"]] = totals.get(r["shard"], 0) + r["n_tokens"]
    assert len(totals) == CU.BALANCE_SHARDS
    imbalance = max(totals.values()) / min(totals.values())
    assert imbalance < 1.05, f"shards off-balance: {totals}"
    # hash-sharded packing baseline for comparison: same corpus through
    # doc-count-balanced (not size-balanced) assignment is worse
    by_hash = (
        CU.pack_sequences(documents)
        .groupBy("shard")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    )
    hash_imb = max(r["t"] for r in by_hash) / min(r["t"] for r in by_hash)
    assert imbalance <= hash_imb


def test_weighted_sample_matches_independent_aes(documents):
    """The A-ES reduction is re-derived INDEPENDENTLY in numpy/hashlib
    (md5 → 52-bit u → ln(u)/w, top-k) and must reproduce the operator's
    exact sample, order included — pinning the sampling law, not just
    the plumbing the oracle already checks."""
    import hashlib
    import math
    import re as _re

    rows = documents.select("doc_id", "text").collect()
    expect = []
    for r in rows:
        toks = _re.split(r"\s+", r.text.strip(" ")) if r.text is not None else []
        w = len(toks)
        h = int(
            hashlib.md5(f"{CU.WSAMPLE_SEED}:{r.doc_id}".encode()).hexdigest()[:13], 16
        )
        u = (h + 1) / float((1 << 52) + 1)
        expect.append((round(math.log(u) / w, 7), r.doc_id, w))
    expect.sort(key=lambda t: (-t[0], t[1]))
    expect = expect[: CU.WSAMPLE_K]

    got = [
        (r.es_key, r.doc_id, r.n_tokens)
        for r in CU.weighted_sample(documents).orderBy("sample_rank").collect()
    ]
    assert got == expect


def test_weighted_sample_tilts_toward_heavy_docs(documents, spark):
    """Doubling every even doc's weight must raise the even-doc share
    of the sample vs the unweighted hash draw — the sampling law does
    real work, not just deterministic selection."""
    # weight = n_tokens of text duplicated for even doc_ids
    boosted = documents.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0, F.concat_ws(" ", "text", "text")
        ).otherwise(F.col("text")).alias("text"),
    )
    base_even = sum(
        1 for r in CU.weighted_sample(documents).collect() if r.doc_id % 2 == 0
    )
    boosted_even = sum(
        1 for r in CU.weighted_sample(boosted).collect() if r.doc_id % 2 == 0
    )
    assert boosted_even > base_even


def test_contrastive_negatives_are_safe(documents):
    """Every triplet's negative must be a base-corpus doc that is NOT
    the anchor, NOT the positive, and NOT a verified near-dup of the
    anchor; every verified pair must yield exactly one triplet on the
    fixture (no probe exhaustion)."""
    from ad_data_lake_spark.llm import corpus as CP
    from ad_data_lake_spark.llm.dedup import minhash_neardup_pairs

    trips = CU.contrastive_triplets(documents).collect()
    pairs = minhash_neardup_pairs(CP.dup_corpus(documents)).collect()
    neighbors = {}
    for p in pairs:
        neighbors.setdefault(p.doc_a, set()).add(p.doc_b)
        neighbors.setdefault(p.doc_b, set()).add(p.doc_a)
    n_docs = documents.count()
    assert len(trips) == len(pairs)
    for t in trips:
        assert 0 <= t.negative_id < n_docs
        assert t.negative_id != t.anchor_id
        assert t.negative_id != t.positive_id
        assert t.negative_id not in neighbors.get(t.anchor_id, set())
        assert 0 <= t.probe < CU.CTR_PROBES


def test_fim_reconstruction_is_token_exact(documents):
    """Reassembling prefix+middle+suffix from the PSM text must
    reproduce the original token stream exactly for every transformed
    doc; pass-through docs keep their text verbatim; the FIM rate is
    near the configured 50%; spans are non-empty and sum to n."""
    import re as _re

    out = {r.doc_id: r for r in CU.fim_transform(documents).collect()}
    raw = {r.doc_id: r.text for r in documents.collect()}
    n_fim = 0
    for doc_id, r in out.items():
        toks = _re.split(r"\s+", raw[doc_id].strip(" "))
        if not r.is_fim:
            assert r.train_text == raw[doc_id]
            assert (r.n_prefix, r.n_middle, r.n_suffix) == (len(toks), 0, 0)
            continue
        n_fim += 1
        m = _re.match(r"<PRE> (.*) <SUF> (.*) <MID> (.*)$", r.train_text, _re.S)
        assert m, r.train_text[:80]
        pre, suf, mid = (g.split(" ") for g in m.groups())
        assert pre + mid + suf == toks
        assert (r.n_prefix, r.n_middle, r.n_suffix) == (len(pre), len(mid), len(suf))
        assert len(mid) >= 1 and len(pre) >= 1 and len(suf) >= 1
    assert 0.35 <= n_fim / len(out) <= 0.65


def test_token_budget_plan_sums_exactly_and_flattens(documents):
    """Quotas must sum EXACTLY to the budget (largest-remainder
    guarantee), and the α=0.5 rule must flatten: the smallest source's
    budget share must exceed its raw availability share."""
    rows = CU.token_budget_plan(documents).collect()
    assert sum(r.quota for r in rows) == CU.BUDGET_TOKENS
    total_avail = sum(r.n_avail for r in rows)
    smallest = min(rows, key=lambda r: r.n_avail)
    assert smallest.quota / CU.BUDGET_TOKENS > smallest.n_avail / total_avail
