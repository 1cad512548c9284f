"""BPE tokenizer trainer: algorithm equivalence against an independent
reference implementation, merge-application semantics on adversarial
symbol runs, the bounded-collect training contract, and encode
consistency."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ad_data_lake_spark.llm import tokenizer as TK
from ad_data_lake_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _reference_bpe(texts: list[str], n_merges: int):
    """Straight Sennrich-style reference: symbol lists per word
    occurrence (no word-frequency compaction, no string rendering) —
    a genuinely different code path from the engine's trainer."""
    words: Counter = Counter()
    for t in texts:
        for w in re.split(TK.WORD_SPLIT, t.lower()):
            if w:
                words[w] += 1
    vocab = {tuple(list(w[:-1]) + [w[-1] + TK.EOW]): f for w, f in words.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        stats: Counter = Counter()
        for syms, f in vocab.items():
            for pair in zip(syms, syms[1:]):
                stats[pair] += f
        if not stats:
            break
        (a, b), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, a, b, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_trainer_matches_independent_reference(spark):
    docs = load_table(spark, "documents", SF_SMOKE)
    texts = [r.text for r in docs.select("text").collect()]
    expect = _reference_bpe(texts, TK.BPE_MERGES)
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in TK.bpe_train_merges(docs).orderBy("merge_rank").collect()
    ]
    assert got == expect


def test_merge_application_on_overlapping_runs(spark):
    """[a,a,a,a] under merge (a,a) must become [aa,aa] — the leftmost
    non-overlapping greedy rule. This is the case a naive space-joined
    replace representation gets wrong; the '<sym>' rendering plus
    str/SQL replace gets it right by construction."""
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa"), (2, "aaaa aaaa"), (3, "ab ab ab")],
        "doc_id long, text string",
    )
    merges = TK.bpe_train(docs, 2)
    # round 1: (a, a) dominates (count 3 per 'aaaa' occurrence * 4 = 12
    # vs (a, b) 3 and (b, EOW'd) pairs)
    assert (merges[0][1], merges[0][2]) == ("a", "a")
    # after merging, 'aaaa' is [aa, aa, ... wait: chars a,a,a,a_ ->
    # leftmost pass gives [aa, aa_]? No: last symbol is 'a_', so syms
    # are [a, a, a, a_]; (a,a) replaces positions 0-1 -> [aa, a, a_].
    enc = TK.bpe_encode_stats(docs, merges[:1]).orderBy("doc_id").collect()
    # doc 1: two words, each [aa, a, a_] = 3 tokens -> 6
    assert enc[0].n_tokens == 6 and enc[0].n_words == 2


def test_merge_never_crosses_symbol_boundary(spark):
    """A learned pair (a, b) must not match inside longer symbols:
    with words 'xab' and planted merges, the pattern '<a><b>' cannot
    bind to the 'ab' inside a future '<xa><b...>' cell."""
    docs = spark.createDataFrame(
        [(1, "ab ab ab ab xab")], "doc_id long, text string"
    )
    m = TK.bpe_train(docs, 1)
    # 'ab' (4x): pairs (a,b_) x4; 'xab': (x,a),(a,b_) -> (a,b_) wins 5
    assert (m[0][1], m[0][2], m[0][3]) == ("a", "b_", 5)
    enc = {r.doc_id: r for r in TK.bpe_encode_stats(docs, m).collect()}
    # 'ab' -> [ab_] 1 token x4; 'xab' -> [x, ab_] 2 tokens
    assert enc[1].n_tokens == 4 * 1 + 2


def test_train_collect_is_capped(spark, monkeypatch):
    """The trainer contract: whatever frame it is handed, at most
    BPE_VOCAB_MAX (word, freq) rows reach the driver."""
    monkeypatch.setattr(TK, "BPE_VOCAB_MAX", 3)
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon alpha beta gamma") for i in range(4)],
        "doc_id long, text string",
    )
    rows = (
        TK.word_freqs(docs)
        .orderBy(F.desc("freq"), "word")
        .limit(TK.BPE_VOCAB_MAX)
        .collect()
    )
    assert len(rows) == 3
    # and the capped trainer still runs end-to-end deterministically:
    # top-3 words by (freq desc, word) = alpha, beta, gamma
    m = TK.bpe_train(docs, 1)
    assert m, "capped trainer produced no merges"


def test_encode_stats_bounds(spark):
    """n_tokens is monotonically non-increasing in merges and bounded
    by per-word symbol counts: chars >= tokens >= words."""
    docs = load_table(spark, "documents", SF_SMOKE).limit(50)
    no_merges = TK.bpe_encode_stats(docs, [])
    trained = TK.bpe_encode_stats(docs, TK.bpe_train(docs, TK.BPE_MERGES))
    joined = (
        no_merges.alias("a")
        .join(trained.alias("b"), "doc_id")
        .select("doc_id", "a.n_tokens", "b.n_tokens", "a.n_words")
        .collect()
    )
    assert joined
    for r in joined:
        assert r[1] >= r[2] >= r[3]


def test_empty_corpus_yields_no_merges(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert TK.bpe_train(docs, TK.BPE_MERGES) == []
    assert TK.bpe_train_merges(docs).count() == 0


def test_word_count_pass_is_single_shuffle(spark):
    """The corpus-sized pass must be scan -> partial agg -> exchange ->
    final agg: exactly one exchange, no join."""
    docs = load_table(spark, "documents", SF_SMOKE)
    plan = TK.word_freqs(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # agg exchange (+ spread round-robin)
    assert "Join" not in plan


def test_encode_paths_value_identical(spark, monkeypatch):
    """The inline-vocab fast path (Path A) and the per-occurrence
    expression path (Path B) must produce byte-identical results —
    forcing Path B via the inline threshold pins the equivalence the
    r14 optimization relies on."""
    docs = load_table(spark, "documents", SF_SMOKE)
    merges = TK.bpe_train(docs)
    fast_ids_df = TK.bpe_encode_ids(docs, merges)
    fast_st_df = TK.bpe_encode_stats(docs, merges)
    fast_ids = sorted(tuple(r) for r in fast_ids_df.collect())
    fast_st = sorted(tuple(r) for r in fast_st_df.collect())
    monkeypatch.setattr(TK, "BPE_INLINE_VOCAB_MAX", 0)
    slow_ids_df = TK.bpe_encode_ids(docs, merges)
    slow_st_df = TK.bpe_encode_stats(docs, merges)
    slow_ids = sorted(tuple(r) for r in slow_ids_df.collect())
    slow_st = sorted(tuple(r) for r in slow_st_df.collect())
    assert fast_ids == slow_ids and fast_ids
    assert fast_st == slow_st and fast_st
    # name/type parity (the cross-engine value hash depends on types;
    # nullability flags may differ between plans and are not part of
    # the driver contract)
    def _nt(df):
        return [(f.name, f.dataType) for f in df.schema.fields]

    assert _nt(fast_ids_df) == _nt(slow_ids_df)
    assert _nt(fast_st_df) == _nt(slow_st_df)


def test_encode_ids_exact_when_word_table_truncated(spark, monkeypatch):
    """A truncated trainer collect (BPE_VOCAB_MAX below the distinct
    word count) must route encode to Path B and stay exact: the vocab
    derives from the FULL word table, never the capped collect."""
    docs = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "aa bb"), (3, "zz")],
        "doc_id long, text string",
    )
    merges = TK.bpe_train(docs, 1)
    full = sorted(tuple(r) for r in TK.bpe_encode_ids(docs, merges).collect())
    monkeypatch.setattr(TK, "BPE_VOCAB_MAX", 2)  # 5 distinct words > cap
    capped = sorted(tuple(r) for r in TK.bpe_encode_ids(docs, merges).collect())
    assert capped == full and len(full) == 3


def test_encode_ids_consistent_with_stats_and_decodable(spark):
    """The id sequences must (a) count exactly what encode_stats
    counts per doc, (b) decode back to the encoded symbol stream via
    the inverse vocab (ids are information-preserving), (c) use a
    dense 0-based id space."""
    import json

    from ad_data_lake_spark.llm.tokenizer import (
        bpe_encode_ids,
        bpe_encode_stats,
        bpe_train,
    )

    documents = load_table(spark, "documents", SF_SMOKE)
    merges = bpe_train(documents)
    ids = {r.doc_id: json.loads(r.token_ids) for r in bpe_encode_ids(documents, merges).collect()}
    stats = {r.doc_id: r.n_tokens for r in bpe_encode_stats(documents, merges).collect()}
    assert set(ids) == set(stats)
    assert all(len(ids[d]) == stats[d] for d in ids)
    all_ids = {i for seq in ids.values() for i in seq}
    assert all_ids == set(range(len(all_ids))), "ids must be dense from 0"
