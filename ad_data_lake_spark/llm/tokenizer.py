"""Distributed BPE tokenizer training over the document corpus.

The reference repo ships no tokenizer, but a training-data pipeline at
100 TB needs one: byte-pair-encoding statistics are the canonical
pre-training vocabulary step (Sennrich et al. 2016; the HF/SentencePiece
trainers). The Spark decomposition follows how every production BPE
trainer actually scales:

1. **The corpus-sized pass is ONE distributed aggregation** — lowercase,
   pre-tokenize on ``[^a-z0-9]+``, explode, ``groupBy(word).count()``.
   Map-side combine means the shuffle carries (word, partial-count),
   never text; output is vocabulary-bounded, not corpus-bounded.
2. **The merge loop runs over the bounded word-frequency table** — the
   classic compaction: pair statistics are identical whether computed
   over 100 TB of text or over its (word, freq) table, and the latter
   is O(vocab). Like the IVF coarse quantizer (``similarity.ivf_centroids``),
   the loop is a bounded driver computation, ENFORCED by
   ``BPE_VOCAB_MAX``: the collect goes through
   ``orderBy(freq desc, word).limit(BPE_VOCAB_MAX)``, so handing the
   trainer a web-scale table trains on the top-``BPE_VOCAB_MAX`` words
   by frequency (the long tail of hapaxes contributes ~nothing to pair
   statistics) instead of driving an unbounded collect. Below the cap —
   every fixture — the limit is a no-op and the merge table is exact.

Symbol sequences are rendered as ``'<t><h><e_>'`` strings (one
``<sym>`` cell per symbol, ``_`` marking the end-of-word symbol, the
Sennrich ``</w>``): with that representation, applying merge (a, b) is
a plain leftmost-non-overlapping ``replace(seq, '<a><b>', '<ab>')`` —
the exact same primitive in Spark, DuckDB, and Python ``str.replace``,
which is what makes the *iterative* trainer fully value-oracle-able:
the DuckDB oracle re-derives every merge independently through a
chained-CTE unroll of the same loop. The wrapper also makes matches
unambiguous (a pattern can never match across a symbol boundary or a
symbol prefix), and pre-tokenization guarantees symbols never contain
``<``/``>``/``_``.

Encoding (``bpe_encode_stats``) applies the learned merge table as a
chain of literal ``replace`` calls — whole-stage-codegen JVM string
ops, no Python in the corpus pass — then counts symbols per document:
the tokens-per-word compression ratio every tokenizer report quotes.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ad_data_lake_spark.sources.tables import spread

# Pre-tokenizer: lowercase alphanumeric runs. Mirrored literally in the
# DuckDB oracle (registry) — the two sides share this constant.
WORD_SPLIT = "[^a-z0-9]+"
EOW = "_"  # end-of-word marker, appended to the final character symbol
BPE_MERGES = 6  # merge count for the registry rows (mechanical to raise)
BPE_TOP_PAIRS = 20  # rows returned by bpe_pair_counts
# Hard ceiling on the trainer collect: no call path may materialize more
# than this many (word, freq) rows on the driver, whatever frame it is
# handed. 256k words x ~16 B is ~4 MB — bounded by construction
# regardless of corpus size; hapax-tail truncation beyond the cap is the
# standard trainer contract (HF/SentencePiece cap their word tables the
# same way).
BPE_VOCAB_MAX = 262_144

# Encode-path strategy gate (r14 optimization): when the collected word
# table is COMPLETE (under BPE_VOCAB_MAX, so no corpus word is missing)
# and small enough to inline as a plan literal without stressing
# codegen, the encoders ship the whole word -> token-ids mapping into
# the projection (every production tokenizer inlines its vocab table —
# a GPU/CPU encode kernel IS a bounded lookup table). Above the
# threshold the per-occurrence expression path applies (exact at any
# vocabulary size; see bpe_encode_ids Path B).
BPE_INLINE_VOCAB_MAX = 4096

# Spark-side expression fragments (F.expr SQL so the DuckDB oracle can
# mirror them token-for-token; see registry.py).
_SEQ_EXPR = (
    "concat('<', array_join(transform(sequence(1, length(word)), "
    "i -> CASE WHEN i = length(word) THEN concat(substr(word, i, 1), '{eow}') "
    "ELSE substr(word, i, 1) END), '><'), '>')"
).format(eow=EOW)
_SYMS_EXPR = "regexp_extract_all({col}, '<([^<>]+)>', 1)"


def word_freqs(documents: DataFrame) -> DataFrame:
    """(word, freq): the one corpus-sized pass. Shuffle carries (word,
    partial count) via map-side combine — never text. Deliberately NOT
    ``spread``: split-and-count is scan-bound, not compute-bound, and
    the A/B at sf0.1 measured the added round-robin exchange as a net
    loss (0.65 s vs 0.31 s trainer wall); at scale the scan splits
    naturally and parallelism comes for free. Contrast
    ``bpe_pair_counts``, whose per-occurrence symbolize IS
    compute-bound and keeps the fan-out (its A/B ran the other way).

    INVARIANT (Path A completeness): this split —
    ``split(lower(text), WORD_SPLIT)`` minus empties — MUST stay
    normalization-identical to ``_doc_words()``. The inline-vocab
    encode paths look every corpus word up in a map built from THIS
    table; a word the map misses silently NULLs the doc's whole
    token output via try_element_at (no loud failure), so any change
    here must change ``_doc_words`` in lockstep (and vice versa)."""
    words = documents.select(
        F.explode(F.split(F.lower(F.col("text")), WORD_SPLIT)).alias("word")
    ).where(F.col("word") != "")
    return words.groupBy("word").agg(F.count("*").alias("freq"))


def _word_seqs(wf: DataFrame) -> DataFrame:
    """(seq, freq) with seq = '<c1><c2>...<cn_>' — the symbolized word."""
    return wf.select(F.expr(_SEQ_EXPR).alias("seq"), "freq")


def pair_counts(seqs: DataFrame) -> DataFrame:
    """(lhs, rhs, cnt): adjacent-symbol pair statistics, frequency
    weighted. Runs over the word-frequency table, so the explode is
    vocabulary-bounded.

    The single-symbol guard is a CASE inside the projection, NOT a
    ``.where(size(syms) >= 2)``: a deterministic filter on a
    word-derived expression gets pushed BELOW the upstream word
    aggregation, re-evaluating the interpreted symbolize + regexp per
    word OCCURRENCE instead of per vocabulary entry — measured 10.3 s
    vs 1.4 s at sf1 (the whole point of compaction silently undone by
    predicate pushdown). The CASE keeps the expression above the agg;
    exploding the empty array drops the row exactly as the filter
    did. (``element_at`` past the end is not an option for the guard:
    ANSI mode throws, and ``sequence(1, 0)`` counts DOWN.)"""
    syms = seqs.select(
        F.expr(_SYMS_EXPR.format(col="seq")).alias("syms"), "freq"
    )
    pairs = syms.select(
        F.explode(
            F.expr(
                "CASE WHEN size(syms) >= 2 THEN "
                "transform(sequence(1, size(syms) - 1), "
                "i -> struct(element_at(syms, i) AS lhs, "
                "element_at(syms, i + 1) AS rhs)) "
                "ELSE array() END"
            )
        ).alias("p"),
        "freq",
    )
    return pairs.groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs")).agg(
        F.sum("freq").alias("cnt")
    )


def bpe_pair_counts(documents: DataFrame, top: int = BPE_TOP_PAIRS) -> DataFrame:
    """Round-0 BPE pair statistics: the top ``top`` adjacent symbol
    pairs by frequency-weighted count (ties broken lexicographically —
    the trainer's deterministic selection rule). Compaction-first, like
    the trainer: the corpus-sized pass is the scan-bound word count;
    the expensive symbolize + pair explode (interpreted HOF transforms
    + regexp) runs over the vocabulary-bounded word table. The
    measured A/B settled this both ways: a direct per-occurrence count
    saves one exchange and wins the scheduling floor at sf0.1 (0.71 s
    vs 0.84 s) but loses 2.8x at sf1 (3.59 s vs DuckDB 1.27 s) because
    interpreted per-occurrence symbol compute does NOT amortize — the
    same lesson rare_token_scrub measured; the compacted form's
    corpus pass is cheap string splitting and its compute is O(vocab),
    giving 0.34x at sf1 on the trainer's identical pipeline. The rank
    window runs on the already-limited ``top`` rows, never the full
    pair table."""
    pc = pair_counts(_word_seqs(word_freqs(documents)))
    topk = pc.orderBy(F.desc("cnt"), "lhs", "rhs").limit(top)
    w = Window.orderBy(F.desc("cnt"), "lhs", "rhs")
    return topk.select(
        F.row_number().over(w).cast("long").alias("pair_rank"),
        "lhs",
        "rhs",
        "cnt",
    )


def _merge_loop(
    word_freq_rows: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """The bounded driver-side merge loop over the collected word table.
    Semantics match the DuckDB oracle's CTE unroll exactly: count all
    adjacent (overlapping) pairs weighted by word frequency, pick
    (max cnt, then lexicographic lhs, rhs), apply as leftmost
    non-overlapping replace (Python ``str.replace`` == SQL ``replace``).
    Returns [(merge_rank, lhs, rhs, pair_count)]."""
    sym_re = re.compile(r"<([^<>]+)>")

    def encode(word: str) -> str:
        cells = [f"<{c}>" for c in word[:-1]] + [f"<{word[-1]}{EOW}>"]
        return "".join(cells)

    seqs: list[tuple[str, int]] = [(encode(w), f) for w, f in word_freq_rows]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for seq, freq in seqs:
            syms = sym_re.findall(seq)
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += freq
        if not counts:
            break
        (lhs, rhs), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, lhs, rhs, int(cnt)))
        pat, rep = f"<{lhs}><{rhs}>", f"<{lhs}{rhs}>"
        seqs = [(s.replace(pat, rep), f) for s, f in seqs]
    return merges


def _encode_word_syms(
    word: str, merges: list[tuple[int, str, str, int]]
) -> list[str]:
    """Driver-side twin of the engine's encode expression: symbolize
    one word and apply the merge chain as leftmost non-overlapping
    ``str.replace`` — the exact primitive the Spark/DuckDB ``replace``
    chain uses (see ``_merge_loop``), so the resulting symbol list is
    identical to what ``_SEQ_EXPR`` + the replace chain produces."""
    seq = "".join([f"<{c}>" for c in word[:-1]] + [f"<{word[-1]}{EOW}>"])
    for _, lhs, rhs, _cnt in merges:
        seq = seq.replace(f"<{lhs}><{rhs}>", f"<{lhs}{rhs}>")
    return re.findall(r"<([^<>]+)>", seq)


def _collect_word_table(documents: DataFrame) -> list:
    """The trainer's bounded collect, shared by every encode path."""
    return (
        word_freqs(documents)
        .orderBy(F.desc("freq"), "word")
        .limit(BPE_VOCAB_MAX)
        .collect()
    )


def _probe_word_table(documents: DataFrame) -> list | None:
    """Cheap inline-path probe for encode calls that BRING their own
    merges (r14 advice: those calls paid the full 262k-row sorted
    trainer collect just to pick a path, and Path B then re-counted the
    corpus a second time for its vocab). ``limit(INLINE_MAX + 1)``
    needs no sort and collects at most 4097 rows: if fewer than the
    limit come back, that IS the complete word table (complete AND
    inline-sized, the Path A precondition — completeness w.r.t.
    BPE_VOCAB_MAX is implied since INLINE_MAX < VOCAB_MAX); if the
    limit fills, the probe says nothing more than "take Path B", and
    WHICH 4097 rows it returned never matters."""
    rows = word_freqs(documents).limit(BPE_INLINE_VOCAB_MAX + 1).collect()
    return rows if 0 < len(rows) <= BPE_INLINE_VOCAB_MAX else None


def bpe_train(documents: DataFrame, n_merges: int = BPE_MERGES) -> list[tuple[int, str, str, int]]:
    """Train ``n_merges`` BPE merges: one distributed word-count pass,
    then the bounded driver loop (see module docstring for the
    scale contract). Returns [(merge_rank, lhs, rhs, pair_count)]."""
    rows = _collect_word_table(documents)
    return _merge_loop([(r.word, r.freq) for r in rows], n_merges)


def bpe_train_merges(documents: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """The learned merge table as a DataFrame — the registry row. The
    DuckDB oracle re-derives the same table via a chained-CTE unroll of
    the training loop, so the value hash pins the full algorithm
    (selection rule, tie-breaks, and replace semantics included)."""
    spark = documents.sparkSession
    merges = bpe_train(documents, n_merges)
    return spark.createDataFrame(
        merges, schema="merge_rank bigint, lhs string, rhs string, pair_count bigint"
    )


def _doc_words() -> "F.Column":
    """The in-order word array of one document (empty words dropped),
    as a column expression — the zero-explode encode paths aggregate
    over this array instead of exploding it."""
    return F.filter(
        F.split(F.lower(F.col("text")), WORD_SPLIT), lambda w: w != ""
    )


def bpe_encode_stats(
    documents: DataFrame, merges: list[tuple[int, str, str, int]] | None = None
) -> DataFrame:
    """(doc_id, n_words, n_tokens): per-document token counts under the
    learned merge table — the compression-ratio report.

    Fast path (complete word table under ``BPE_INLINE_VOCAB_MAX``): the
    per-word token counts are computed ONCE on the driver from the
    trainer's already-collected word table and inlined as a map
    literal; the corpus pass is then a ZERO-SHUFFLE projection — no
    explode, no per-occurrence merge chain, no re-aggregation (r14
    A/B: 0.52 -> 0.34 s median at sf0.01 under load; plan loses the
    Generate + both aggregate exchanges). Above the threshold — or
    when the table was truncated at ``BPE_VOCAB_MAX`` and may miss
    corpus words — the original per-occurrence expression path runs:
    the merge chain as literal nested ``replace`` calls (codegen JVM
    string ops), one per-doc aggregation shuffle. Both paths are
    value-identical (pytest-pinned) and oracle-gated."""
    if merges is None:
        rows = _collect_word_table(documents)
        merges = _merge_loop([(r.word, r.freq) for r in rows], BPE_MERGES)
        # Inline only when the table is COMPLETE (under the trainer
        # cap, so no corpus word can be missing from the map — the
        # word_freqs/_doc_words normalization invariant) and
        # codegen-sized.
        inline_rows = (
            rows
            if 0 < len(rows) < BPE_VOCAB_MAX and len(rows) <= BPE_INLINE_VOCAB_MAX
            else None
        )
    else:
        # Caller brought merges: probe instead of the full sorted
        # trainer collect (r15 guard — this path paid the 262k-row
        # collect just to pick a branch).
        inline_rows = _probe_word_table(documents)
    if inline_rows is not None:
        ntok = {r.word: len(_encode_word_syms(r.word, merges)) for r in inline_rows}
        kv: list = []
        for w, n in ntok.items():
            kv.extend((F.lit(w), F.lit(n)))
        m = F.create_map(*kv)
        ws = _doc_words()
        n_tokens = F.aggregate(
            ws, F.lit(0).cast("long"), lambda acc, w: acc + F.try_element_at(m, w)
        )
        return documents.select(
            "doc_id",
            F.size(ws).cast("long").alias("n_words"),
            n_tokens.alias("n_tokens"),
        ).where(F.size(ws) > 0)
    per_word = (
        spread(documents)
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), WORD_SPLIT)).alias("word"),
        )
        .where(F.col("word") != "")
    )
    seq = F.expr(_SEQ_EXPR)
    for _, lhs, rhs, _cnt in merges:
        seq = F.replace(seq, F.lit(f"<{lhs}><{rhs}>"), F.lit(f"<{lhs}{rhs}>"))
    tokens = per_word.withColumn("encoded", seq).select(
        "doc_id",
        F.size(F.expr(_SYMS_EXPR.format(col="encoded"))).alias("n_tokens_w"),
    )
    return tokens.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum("n_tokens_w").alias("n_tokens"),
    )


BPE_BATCH_MOD = 10  # same base/batch split contract as the LSH/IVF index rows


def bpe_vocab_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental tokenizer-vocabulary maintenance, exercised
    end-to-end: persist the word-frequency table from the base corpus
    (doc_id % BPE_BATCH_MOD != 0), then APPEND the new batch's partial
    counts — counting only the batch, never re-scanning history — and
    read back the merged vocabulary by summing partials per word.
    Returns the merged (word, freq) state; the DuckDB oracle recounts
    from scratch over ALL documents, so a hash match proves
    append-partials ≡ full recount (the invariant that lets a corpus
    pipeline maintain its tokenizer statistics per ingest batch; the
    re-derived merges then come from ``_merge_loop`` over this table —
    pinned equal to a from-scratch ``bpe_train`` in pytest).

    At scale the partials table is written bucketed by word (layout.py
    Y1) so the merge read is co-located; plain parquet here mirrors
    the LSH/IVF index-maintenance rows (``minhash_index_incremental``)."""
    from ad_data_lake_spark.scratch import scratch_dir
    from ad_data_lake_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    path = scratch_dir(spark, "bpe-vocab", sf_dir)

    base = docs.where(F.col("doc_id") % BPE_BATCH_MOD != 0)
    batch = docs.where(F.col("doc_id") % BPE_BATCH_MOD == 0)
    word_freqs(base).write.parquet(path)
    word_freqs(batch).write.mode("append").parquet(path)
    return (
        spark.read.parquet(path)
        .groupBy("word")
        .agg(F.sum("freq").alias("freq"))
    )


def bpe_encode_ids(
    documents: DataFrame, merges: list[tuple[int, str, str, int]] | None = None
) -> DataFrame:
    """(doc_id, token_ids, n_tokens): the full tokenizer read path —
    encode every document to its BPE token-ID sequence under the
    learned merge table. ``bpe_encode_stats`` reports the compression;
    this row emits the actual training input a data loader consumes.

    ID contract (engine-reproducible): the symbol alphabet is BOUNDED
    BY CONSTRUCTION — every post-merge symbol is a single character or
    one of the ``n_merges`` merge outputs — and ids are the dense
    alphabetical rank over the symbols observed in the corpus (a real
    tokenizer ships ids in its vocab file; alphabetical rank is the
    deterministic stand-in both engines can derive independently).

    Scale shape, two value-identical paths (pytest-pinned equal;
    oracle-gated):

    - **Path A — inline vocab (complete word table under
      ``BPE_INLINE_VOCAB_MAX``)**: the word -> token-id-array mapping
      is computed once on the driver from the trainer's
      already-collected word table (``_encode_word_syms`` — the same
      replace primitive as the engine expression) and inlined as a map
      literal, so the corpus pass is a ZERO-SHUFFLE projection:
      ``flatten(transform(words, w -> map[w]))``. No per-occurrence
      merge chain, no explode, no vocab join, no reassembly exchange
      (r14: the before-plan scanned the corpus TWICE — the vocab
      branch re-ran the full symbolize per occurrence — and shuffled
      per-SYMBOL rows into the doc aggregate; A/B halved the wall).
    - **Path B — per-occurrence expression (truncated or oversized
      word table)**: the merge chain applies as literal nested
      ``replace`` calls (codegen) over the posexploded word stream —
      exact at ANY vocabulary size; symbol ids attach via ONE
      broadcast join against the bounded vocab, which is now derived
      from the COMPACTED word table (one cheap word-count pass)
      instead of re-symbolizing every occurrence; per-doc sequences
      reassemble in one doc_id aggregate whose array_sort key
      (word_pos, symbol_pos) makes the order exact. Distinct symbols
      over distinct words == distinct symbols over occurrences, so
      the id space is unchanged.

    Serialization: ``to_json`` (the driver-canon contract for nested
    results) in both paths."""
    complete_rows: list | None = None
    if merges is None:
        rows = _collect_word_table(documents)
        merges = _merge_loop([(r.word, r.freq) for r in rows], BPE_MERGES)
        # len(rows) < BPE_VOCAB_MAX means the sorted-limit collect was
        # NOT truncated: `rows` is the complete word table.
        complete_rows = rows if 0 < len(rows) < BPE_VOCAB_MAX else None
        inline_rows = (
            rows
            if complete_rows is not None and len(rows) <= BPE_INLINE_VOCAB_MAX
            else None
        )
    else:
        inline_rows = _probe_word_table(documents)
        complete_rows = inline_rows
    if inline_rows is not None:
        # Path A: the complete word table is on the driver; ids are the
        # dense alphabetical rank over exactly the observed symbols.
        word_syms = {r.word: _encode_word_syms(r.word, merges) for r in inline_rows}
        vocab = {
            s: i
            for i, s in enumerate(sorted(set().union(*word_syms.values())))
        }
        kv: list = []
        for w, syms_w in word_syms.items():
            kv.append(F.lit(w))
            kv.append(
                F.array(*[F.lit(vocab[s]) for s in syms_w]).cast("array<int>")
            )
        m = F.create_map(*kv)
        ws = _doc_words()
        ids_flat = F.flatten(F.transform(ws, lambda w: F.try_element_at(m, w)))
        return documents.select(
            "doc_id",
            F.to_json(ids_flat).alias("token_ids"),
            F.size(ids_flat).cast("long").alias("n_tokens"),
        ).where(F.size(ws) > 0)
    # Path B: exact at any scale — per-occurrence codegen encode.
    per_word = (
        spread(documents)
        .select(
            "doc_id",
            F.posexplode(F.split(F.lower(F.col("text")), WORD_SPLIT)).alias(
                "wpos", "word"
            ),
        )
        .where(F.col("word") != "")
    )
    seq = F.expr(_SEQ_EXPR)
    for _, lhs, rhs, _cnt in merges:
        seq = F.replace(seq, F.lit(f"<{lhs}><{rhs}>"), F.lit(f"<{lhs}{rhs}>"))
    syms = per_word.withColumn("encoded", seq).select(
        "doc_id",
        "wpos",
        F.posexplode(F.expr(_SYMS_EXPR.format(col="encoded"))).alias("spos", "sym"),
    )
    # Vocab from the compacted word table: one word-count aggregate +
    # a vocabulary-bounded symbolize, not a second corpus-sized
    # symbolize pass (the set of symbols over distinct words IS the
    # set over occurrences). When the trainer's collect already proved
    # the table COMPLETE (merely too large to inline), the word list is
    # on the driver — reuse it and skip even that aggregate (r15 guard;
    # a truncated table must re-count, exactness beats the pass).
    if complete_rows is not None:
        wsrc = documents.sparkSession.createDataFrame(
            [(r.word,) for r in complete_rows], "word string"
        )
    else:
        wsrc = word_freqs(documents)
    wsyms = (
        wsrc.withColumn("encoded", seq)
        .select(
            F.explode(F.expr(_SYMS_EXPR.format(col="encoded"))).alias("sym")
        )
        .distinct()
    )
    vw = Window.orderBy("sym")
    vocab_ids = wsyms.select("sym", (F.row_number().over(vw) - 1).alias("token_id"))
    joined = syms.join(F.broadcast(vocab_ids), "sym")
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("wpos", "spos", "token_id"))),
        lambda s: s["token_id"],
    )
    return joined.groupBy("doc_id").agg(
        F.to_json(ordered).alias("token_ids"),
        F.count("*").alias("n_tokens"),
    )
