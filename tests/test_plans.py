"""Physical-plan assertions — the scale contract, enforced by test.

Correctness tests prove the VALUES; these prove the PLANS stay the
shape that survives a 100 TB / 1000-executor scale-up: filters reach
the parquet scan, dimension joins broadcast (never sort-merge a small
dim), aggregates combine map-side, top-k never materializes a global
sort, nothing degenerates into a cartesian product, and the MinHash
pipeline's one heavy shuffle is computed once and reused. A future
refactor that silently regresses a plan fails here, not in a
100×-slower production run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ad_data_lake_spark.queries import REGISTRY
from tests.conftest import SF_ORACLE, SF_SMOKE


def plan_of(spark, name: str) -> str:
    return REGISTRY[name].fn(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()


# Streaming/write queries execute real IO inside fn(); the sweep only
# needs the read-side plans (the write paths are covered in test_lake).
_SWEEP = [n for n, s in REGISTRY.items() if "write" not in s.tags]


# Exemptions are ONE-ROW scalar attaches (a corpus total / document
# count broadcast as BroadcastNestedLoopJoin BuildRight — a single-row
# build side is a scalar attach, not a data-volume join;
# test_lm_scoring_plans pins the real joins). The former deliberate
# cross joins are gone: the brute-force/binary ANN family now scores
# in Arrow batch matmuls (topk_bruteforce shape), and topk_ivf's
# centroids are a driver-side literal. embed_topk_bruteforce /
# rag_retrieve / mmr_diversify stay listed only for the bounded
# query-set collect they share, which can still plan a one-row
# broadcast under AQE on degenerate inputs.
_CROSS_BY_DESIGN = {
    "embed_topk_bruteforce",
    "unigram_lm_score",
    "tfidf_top_terms",
    "rag_retrieve",
    "dsir_weights",  # one-row (t_total, s_total) scalar attach
    "temperature_mixture",  # one-row min_chars scalar attach
    "bigram_lm_score",  # one-row n_total scalar attach
    "perplexity_buckets",  # composes unigram's n_total scalar attach
    "nb_quality_score",  # one-row model-totals + prior scalar attaches
    "bm25_retrieve",  # one-row n_docs + avgdl scalar attaches
    "hybrid_retrieve_rrf",  # composes bm25's scalar attaches
    "mmr_diversify",
    "embed_topk_binary",
    "pmi_collocations",  # one-row n_tokens + n_pairs scalar attaches
    "contrastive_triplets",  # one-row n_docs scalar attach
    "token_budget_plan",  # one-row denom scalar attach
    "domain_pagerank",  # one-row dangling-mass scalar attach per iteration (r8)
}


@pytest.mark.parametrize("name", _SWEEP)
def test_no_cartesian_product(spark, name):
    p = plan_of(spark, name)
    assert "CartesianProduct" not in p, f"{name} degenerated into a cartesian product"
    if name not in _CROSS_BY_DESIGN:
        assert "BroadcastNestedLoopJoin" not in p, f"{name} fell back to nested-loop join"


def test_scan_projection_and_filter_pushdown(spark):
    p = plan_of(spark, "scan_project")
    assert "EqualTo(o_orderstatus,O)" in p, "status filter must reach the parquet scan"
    # column pruning: the scan must not read unprojected columns
    read_schema = p.split("ReadSchema: ")[1].splitlines()[0]
    assert "o_orderpriority" not in read_schema and "o_custkey" in read_schema


def test_dim_joins_broadcast(spark):
    p = plan_of(spark, "broadcast_dim_join")
    assert p.count("BroadcastHashJoin") == 2, "nation+region must broadcast"
    assert "SortMergeJoin" not in p, "small dims must never sort-merge"


def test_semi_join_is_broadcast_semi(spark):
    p = plan_of(spark, "semi_join_lookup")
    assert "BroadcastHashJoin" in p and "LeftSemi" in p


def test_hierarchy_joins_broadcast_with_pushdown(spark):
    p = plan_of(spark, "hierarchy_flat")
    assert p.count("BroadcastHashJoin") == 3
    assert "EqualTo(o_orderstatus,F)" in p, "parent filter must push below the joins"


def test_frequency_is_single_combined_aggregate(spark):
    p = plan_of(spark, "per_user_frequency")
    assert p.count("Exchange") == 1, "one shuffle: groupBy with map-side combine"
    assert "partial_count" in p, "partial aggregation must run map-side"


def test_top_k_never_global_sorts(spark):
    p = plan_of(spark, "top_k")
    assert "TakeOrderedAndProject" in p
    assert p.count("Exchange") == 0, "top-k must not materialize a global sort"


def test_exact_dedup_single_shuffle(spark):
    p = plan_of(spark, "dedup_exact")
    assert p.count("Exchange") == 1 and "partial_" in p


def test_fuzzy_trigram_sides_evaluated_once(spark):
    """fuzzy_name_join's trigram tables attach their set sizes via a
    count window over the distinct output, not a size aggregate joined
    back (the r13 shape — which evaluated each side's input subtree
    twice and re-scanned the catalog 6 times), and the dirty side keys
    on the name itself rather than minting a rep id it must join back.
    Pins: exactly 3 parquet scans (catalog reps, dirty trigram stream,
    dirty row fan-out) and exactly 2 joins (trigram candidates + the
    final name fan-out)."""
    plan = plan_of(spark, "fuzzy_name_join")
    assert plan.count("Scan parquet") == 3, plan
    joins = sum(plan.count(j) for j in (
        "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
    ))
    assert joins == 2, plan


def test_minhash_heavy_stage_reused(spark):
    """The minhash_prepped aggregate is materialized ONCE (lazy
    localCheckpoint) for its four consumers. ReuseExchange could not
    share it by itself: the band sides prune ``jset`` out of the
    aggregate while the verify sides keep it, so the subtrees
    canonicalize differently and the r14 plan audit found the whole
    scan→shingle→md5→aggregate chain evaluated four times. After the
    checkpoint, every consumer must read the materialized RDD and the
    final plan must contain NO parquet scan at all (the one corpus
    pass runs inside the checkpoint's own job)."""
    df = REGISTRY["dedup_minhash_lsh"].fn(spark, SF_ORACLE)
    df.collect()  # materializes the checkpoint, then the final plan
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in p, (
        "consumers must read the checkpointed minhash_prepped aggregate"
    )
    assert "Scan parquet" not in p, (
        "the corpus scan + shingle-hash aggregate must run once inside the "
        "checkpoint job, not be re-evaluated per consumer"
    )


def test_asof_join_is_single_pass(spark):
    """The union-marker as-of must be ONE exchange on user_id + sorts —
    never a range-condition join (nested-loop) or a per-row lookup."""
    p = plan_of(spark, "asof_attribution")
    assert "Join" not in p, "as-of must not plan a join operator at all"
    assert p.count("Exchange hashpartitioning(user_id") <= 2, (
        "touch dedupe + window must share the user_id partitioning"
    )


def test_range_join_is_binned_equi_join(spark):
    """The flight rollup must equi-join on the day bin (broadcast here,
    shuffle-on-bin at scale) — never nested-loop the range predicate."""
    p = plan_of(spark, "flight_window_rollup")
    assert "BroadcastHashJoin" in p and "day_bin" in p
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_bucketed_join_has_no_exchange_below_join(spark):
    """Both sides bucketed ×8 on the key: the SortMergeJoin's
    distribution requirement is satisfied by the layout, so the ONLY
    exchange in the plan is the final groupBy's."""
    df = REGISTRY["bucketed_join_colocated"].fn(spark, SF_ORACLE)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in p
    assert "Bucketed: true" in p and p.count("SelectedBucketsCount: 8 out of 8") == 2
    assert p.count("Exchange") == 1, "join must read co-located buckets shuffle-free"


def test_salted_join_spreads_hot_key(spark):
    """The salted join must shuffle on (key, salt) — the hot key's rows
    land on n_salts partitions instead of one."""
    p = plan_of(spark, "skew_salted_agg")
    assert "ShuffledHashJoin" in p
    join_keys = p.split("ShuffledHashJoin")[1].splitlines()[0]
    assert "salt" in join_keys, "join keys must include the salt"
    assert "Exchange hashpartitioning(c_custkey" in p and ", salt" in p.split(
        "Exchange hashpartitioning(c_custkey"
    )[1].splitlines()[0], "fact shuffle must partition on (key, salt)"


def test_aqe_skew_join_splits_hot_partition(spark):
    """Y2 evidence for the FIRST-line skew answer: AQE skew-split.
    layout.salted_join is the manual fallback (measured 1.5x at 50%
    skew, scripts/skew_probe.py); this pins the trigger condition for
    when AQE handles it instead — a shuffled equi-JOIN whose hot
    reducer partition exceeds max(factor * median, thresholdInBytes).
    At fixture scale the default 256MB threshold can never trip, so
    the test scales the thresholds to fixture bytes (exactly what a
    100 TB deployment does NOT need to do) and asserts the executed
    adaptive plan marked the join skew=true, i.e. the hot partition
    was split across reducer tasks. Where AQE does NOT apply — skewed
    AGGREGATES, or joins the planner broadcasts — the salting operator
    remains the tool; that boundary is the documented reason both
    exist."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # fixture-scaled: hot partition ~2MB >> 32KB; median ~tens of KB
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32768",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k in confs:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        n = 200_000
        fact = spark.range(n).select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("payload"),
        )
        dim = spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        joined = fact.join(dim, "k")
        # execute THIS dataframe (count() would build its own query
        # execution and leave joined's adaptive plan un-finalized)
        assert len(joined.collect()) == n  # runtime: AQE re-plans here
        p = joined._jdf.queryExecution().executedPlan().toString()
        assert "AdaptiveSparkPlan" in p
        assert "skew=true" in p, (
            "AQE did not split the hot partition — skew-join trigger "
            "condition regressed:\n" + p[:2000]
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_native_sessionize_is_single_aggregate(spark):
    """session_window sessionization must be ONE user_id exchange with
    map-side partial session merging — no lag/running-sum window sorts."""
    p = plan_of(spark, "sessionize_native")
    assert p.count("Exchange") == 1
    assert "partial_min" in p, "session merge must start map-side"
    assert "Window" not in p, "the native form must not fall back to window passes"


def test_contamination_broadcasts_benchmark_side(spark):
    """The benchmark shingle set is the eval-suite-sized side (MBs vs
    TBs at scale): it must broadcast into ONE left join that marks hits
    — the corpus's exploded shingles never shuffle to meet it, and the
    former flagged/totals double-aggregate + doc_id join-back must stay
    gone (a single join in the whole plan)."""
    p = plan_of(spark, "contamination_check")
    assert "BroadcastHashJoin" in p and "LeftOuter" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert p.count("Join") == 1, "contamination must be single-join (no agg join-back)"


def test_curation_pipeline_single_shuffle_join(spark):
    """curation_pipeline's ONLY join is the dedup semi join (min doc_id
    per content hash) — quality and split are projections of the same
    row and must compute inline, never join back on doc_id. At 100 TB
    each removed join was a full-corpus shuffle."""
    p = plan_of(spark, "curation_pipeline")
    assert p.count("Join") == 1 and "LeftSemi" in p
    # split_summary is pure scan + aggregate: zero joins of any kind
    assert plan_of(spark, "split_summary").count("Join") == 0


def test_pack_sequences_single_shard_window(spark):
    """Packing is one window cumsum partitioned by shard — exactly one
    exchange (hashpartitioning on shard), no global sort."""
    p = plan_of(spark, "pack_sequences")
    assert p.count("Exchange hashpartitioning(shard") == 1
    assert "Exchange rangepartitioning" not in p, "no global sort in packing"
    assert "Window" in p


def test_stratified_sample_rank_limit_pushed_below_shuffle(spark):
    """Low-cardinality strata are only skew-safe because Catalyst plans
    the rank filter as a PARTIAL WindowGroupLimit below the exchange:
    each map partition pre-prunes to its local K per stratum, so the
    shuffle carries ≤ K × tasks rows per stratum, never the corpus."""
    p = plan_of(spark, "stratified_sample")
    assert p.count("WindowGroupLimit") == 2, "need Partial + Final group limits"
    assert "row_number(), 40, Partial" in p, "map-side prune must exist"
    assert p.count("Exchange") == 1, "one stratum exchange, no salted second pass"


def test_epoch_shuffle_single_shard_window(spark):
    """Epoch shuffle = pack_sequences' shard-window shape: one exchange
    on shard, both window functions in one pass, no global sort."""
    p = plan_of(spark, "epoch_shuffle")
    assert p.count("Exchange hashpartitioning(shard") == 1
    assert "Exchange rangepartitioning" not in p, "no global sort in epoch order"


def test_lm_scoring_plans(spark):
    """unigram_lm_score / tfidf_top_terms: the trained model tables
    (vocab counts / document frequencies) must BROADCAST back to the
    token stream — never sort-merge — and the shared training aggregate
    must be computed once (ReusedExchange), not rebuilt per consumer."""
    for name in ("unigram_lm_score", "tfidf_top_terms"):
        df = REGISTRY[name].fn(spark, SF_ORACLE)
        df.collect()  # exchange reuse is decided at runtime under AQE
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in p, f"{name}: model table must broadcast"
        assert "SortMergeJoin" not in p, f"{name}: token stream must not shuffle to join"
        assert p.count("ReusedExchange") >= 1, (
            f"{name}: training aggregate must be shared, not recomputed"
        )


def test_rag_retrieve_broadcasts_hits_into_documents_scan(spark):
    """The q×k hit list must broadcast into the documents scan — the
    corpus side streams and is never shuffled (no sort-merge join
    anywhere in the retrieval plan)."""
    p = plan_of(spark, "rag_retrieve")
    assert "BroadcastHashJoin" in p, "hits must broadcast into the documents scan"
    assert "SortMergeJoin" not in p and "Exchange hashpartitioning(doc_id" not in p


def test_corpus_health_is_single_aggregate_no_joins(spark):
    """Quality score and content hash are projections of the row they
    describe — the health sheet must be scan → one source aggregate,
    with no join anywhere (the count_distinct Expand is fine; a
    join-back for quality or hashes is not)."""
    p = plan_of(spark, "corpus_health")
    assert p.count("Join") == 0


def test_cross_split_leakage_is_pure_projection_over_pairs(spark):
    """The split annotation is an inline hash projection of the pair
    columns — it must add ZERO joins beyond the MinHash pair pipeline
    it decorates (a join-back to the corpus would shuffle the full
    corpus at scale for a value derivable from the id in hand)."""
    base = plan_of(spark, "dedup_minhash_lsh")
    leak = plan_of(spark, "cross_split_leakage")
    assert leak.count("Join") == base.count("Join"), (
        "split annotation added a join to the pair pipeline"
    )


def test_snapshot_diff_is_single_aggregate_no_joins(spark):
    """Both snapshot states are conditional struct-max aggregates of
    ONE groupBy — the diff must be scan → single exchange on the
    entity key, with no join anywhere (the naive two-snapshot
    full-outer join shuffles the fact three times), and the window
    union predicate must reach the parquet scan so a dated lake reads
    only the relevant days."""
    p = plan_of(spark, "snapshot_diff")
    assert p.count("Join") == 0, "snapshot_diff must not join snapshot states"
    assert p.count("Exchange hashpartitioning") == 1
    assert "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts" in p, (
        "snapshot window bounds must push to the scan"
    )


def test_scd2_history_single_shuffle_shared_sort(spark):
    """lag() and lead() ride the SAME (user_id, ts, event_id) sort:
    one exchange, one sort, two Window nodes — a second sort or
    exchange means the stacked windows stopped sharing their
    distribution and the history build pays double at scale."""
    p = plan_of(spark, "scd2_history")
    assert p.count("Exchange hashpartitioning") == 1
    assert p.count("+- Sort ") == 1, "both windows must reuse one sort"
    assert p.count("Window") == 2


def test_bloom_probe_has_no_joins(spark):
    """The Bloom probe is a pure codegen projection against the
    literal bitmap — the corpus side must carry ZERO joins (the whole
    point vs the broadcast-set join in contamination_check); its only
    shuffles are the (doc_id, h60) dedup and the per-doc count."""
    p = plan_of(spark, "bloom_decontaminate")
    assert p.count("Join") == 0, "bloom probe must not join anything"


def test_dsir_model_broadcasts_over_token_stream(spark):
    """The B-bounded bucket model must broadcast back over the token
    stream — a sort-merge join here would shuffle the full corpus
    token stream to meet a 1024-row table."""
    p = plan_of(spark, "dsir_weights")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_exact_substring_dedup_joins_are_equi_on_hash(spark):
    """The duplicated-span filter must meet the occurrence stream in an
    EQUI-join on the span hash — broadcast when AQE sees the span table
    is small (the fixture case), shuffle-on-h with a shared exchange at
    scale; never a nested-loop over the residual owner predicate. The
    owner residual (doc_id, pos) != owner must ride the equi-join as a
    post-condition, not become the join itself."""
    df = REGISTRY["exact_substring_dedup"].fn(spark, SF_ORACLE)
    df.collect()  # join strategy is decided at runtime under AQE
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    h_joins = [
        ln for ln in p.splitlines()
        if ("BroadcastHashJoin [h#" in ln or "SortMergeJoin [h#" in ln
            or "ShuffledHashJoin [h#" in ln)
    ]
    assert h_joins, "span filter must equi-join on the span hash"


def test_quality_projections_zero_shuffle(spark):
    """gopher_rules and luhn_scan are pure per-row verdict sheets — no
    aggregate, no join. gopher_rules (per-row array_sort + fold over
    every token) additionally spread()s the scan to session parallelism,
    which at FIXTURE scale materializes as one RoundRobin exchange (a
    single-row-group scan yields 2 tasks; measured 4.48 -> 0.82 s at
    sf1) and is a no-op on production row groups — so the contract is:
    at most the spread's round-robin fan-out, never a KEY exchange
    (hashpartitioning = a re-introduced aggregate/join)."""
    for name in ("gopher_rules", "luhn_scan"):
        p = plan_of(spark, name)
        assert "hashpartitioning" not in p, f"{name} must not key-shuffle"
        assert p.count("Exchange") <= 1, f"{name}: more than the spread fan-out"
        assert "Join" not in p, f"{name} must not join"


def test_bigram_lm_scoring_pass_joins_broadcast_only(spark):
    """The bigram scorer's corpus stream must meet its three bounded
    model tables via broadcast joins — a SortMergeJoin would mean a
    vocab table lost its truncation (unbounded) or the corpus stream
    shuffled on a token key."""
    p = plan_of(spark, "bigram_lm_score")
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") >= 3


def test_linear_attribution_is_single_window_no_join(spark):
    """Multi-touch credit must come from ONE user-partitioned range
    window over the tagged union — an interval self-join here would
    materialize the (conversion × touch) pair space."""
    p = plan_of(spark, "linear_attribution")
    assert "Join" not in p, "linear attribution must not plan a join"
    assert p.count("Exchange") == 1 and "Window" in p


def test_funnel_is_single_user_aggregate(spark):
    """The K-step funnel must be one user-keyed aggregate + fold —
    never K chained self-joins (K shuffles, K scans)."""
    p = plan_of(spark, "funnel_conversion")
    assert "Join" not in p
    assert p.count("Exchange hashpartitioning(user_id") == 1


def test_cohort_single_event_shuffle(spark):
    """The event stream must shuffle ONCE (the user aggregate); the
    (cohort, offset) rollup above it is calendar-sized."""
    p = plan_of(spark, "cohort_retention")
    assert "Join" not in p
    assert p.count("Exchange hashpartitioning(user_id") == 1


def test_sql_surface_views_run_and_match(spark):
    """The DEFAULT SQL surface is the full lazy read-path registry
    (view count ~= read-path row count), its registration runs ZERO
    jobs beyond parquet footer reads, and views return the same rows
    as the DataFrame registry plans they wrap. Action-bearing rows
    (model trains / iterative loops / bounded collects at plan build)
    are excluded by default and register only on explicit opt-in."""
    from ad_data_lake_spark.queries import REGISTRY
    from ad_data_lake_spark.sql import (
        ACTION_VIEWS,
        lazy_views,
        register_sql_surface,
    )

    read_path = [
        n
        for n, s in REGISTRY.items()
        if "write" not in s.tags and "streaming" not in s.tags
    ]
    assert set(lazy_views()) | set(ACTION_VIEWS) == set(read_path)
    # every ACTION_VIEWS name must still be a real registry row
    assert set(ACTION_VIEWS) <= set(read_path)

    registered = register_sql_surface(spark, SF_SMOKE)
    assert list(registered) == list(lazy_views())
    assert len(registered) >= 100  # the widened surface, not the r7 34
    for name in ("hierarchy_flat", "dedup_exact", "sessionize_events"):
        via_sql = spark.sql(f"SELECT * FROM {name}")
        via_df = REGISTRY[name].fn(spark, SF_SMOKE)
        assert via_sql.columns == via_df.columns
        assert via_sql.count() == via_df.count()
    # ad-hoc SQL over a view composes (filter + aggregate)
    n = spark.sql(
        "SELECT count(*) AS n FROM frequency_cap WHERE capped"
    ).collect()[0].n
    assert n > 0
    # opt-in tier: registration is eager but the view then works
    more = register_sql_surface(
        spark, SF_SMOKE, views=("bm25_retrieve",), include_action_views=True
    )
    assert more == ["bm25_retrieve"]
    assert spark.sql("SELECT * FROM bm25_retrieve WHERE rank = 1").count() > 0


def test_sql_surface_default_registration_is_lazy(spark):
    """Registering the default surface must not execute operator jobs:
    the job-count delta over registration stays at footer-read scale
    (one small job per distinct parquet read, no corpus passes). This
    pins the ACTION_VIEWS split — a collect-bearing operator slipping
    into the default tier shows up as a job-count jump here."""
    from ad_data_lake_spark.sql import lazy_views, register_sql_surface

    tracker = spark.sparkContext.statusTracker()

    def latest_job():
        ids = tracker.getJobIdsForGroup()
        return max(ids) if ids else -1

    before = latest_job()
    registered = register_sql_surface(spark, SF_SMOKE)
    jobs = latest_job() - before
    # footer reads only: bounded by ~2 per registered view (most rows
    # read 1-2 tables), nowhere near what one corpus operator costs
    assert jobs <= 2 * len(registered), (
        f"registration ran {jobs} jobs for {len(registered)} views — "
        "an action-bearing operator leaked into the lazy tier"
    )


def test_sql_view_pushdown(spark):
    """A WHERE on a SQL view must reach the parquet scan — views are
    inlined logical plans, not materialization boundaries."""
    from ad_data_lake_spark.sql import register_sql_surface

    register_sql_surface(spark, SF_SMOKE)
    plan = (
        spark.sql("SELECT o_orderkey FROM scan_project WHERE o_orderkey = 42")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "o_orderkey" in plan.split("PushedFilters", 1)[1][:200]


def test_dynamic_json_sanitize_zero_shuffle(spark):
    """The schema-free sanitizer is one generated column expression —
    an Exchange or Join in its plan means the permissive-parse path
    regressed into something non-projection-shaped."""
    p = plan_of(spark, "sanitize_dynamic_json")
    # the spread() round-robin repartition is deliberate parallelism
    # (single-file scan), not a semantic shuffle — no hash exchange,
    # no join allowed
    assert "hashpartitioning" not in p
    assert "Join" not in p


def test_nb_quality_model_broadcasts_over_token_stream(spark):
    """The NB classifier's corpus token stream must meet the bounded
    llr model via broadcast — a SortMergeJoin means the top-K vocab
    truncation (what makes the model broadcastable by construction)
    was lost."""
    p = plan_of(spark, "nb_quality_score")
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_perplexity_buckets_thresholds_broadcast(spark):
    """Tertile thresholds are a language-keyed aggregate broadcast
    back over the scored stream — the scored corpus must never
    sort-merge against the threshold table."""
    p = plan_of(spark, "perplexity_buckets")
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_semantic_dedup_ivf_no_cartesian(spark):
    """IVF-bucketed SemDeDup must pair only within cells (grouped
    applyInPandas) — a cartesian/nested-loop anywhere means the pair
    space stopped being bucketed."""
    p = plan_of(spark, "semantic_dedup_ivf")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the within-cell pair stage runs under the components
    # localCheckpoint, so assert its shape directly on the pairs plan
    from pyspark.sql import functions as F

    from ad_data_lake_spark.llm import similarity as SIM
    from ad_data_lake_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF_ORACLE)
    cents = SIM.ivf_centroids(emb, SIM.IVF_CELLS)
    assigned = SIM.near_corpus(emb).select(
        "vec_id", "v",
        SIM._unit_and_cell_pd(cents)(F.col("v"))["cell"].alias("cell"),
    )
    pp = (
        assigned.groupBy("cell")
        .applyInPandas(lambda g: g.iloc[:0][["vec_id"]], "vec_id long")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "FlatMapGroupsInPandas" in pp
    assert "CartesianProduct" not in pp


def test_keep_best_window_and_rollup_share_one_label_exchange(spark):
    """dedup_keep_best: the sparse label table broadcasts into the
    scored corpus scan, and the ranking window + cluster rollup run on
    ONE hashpartitioning(label) exchange — the aggregate reuses the
    window's partitioning (partial+final ObjectHashAggregate, no second
    exchange above the window)."""
    plan = plan_of(spark, "dedup_keep_best")
    assert "BroadcastHashJoin" in plan
    tail = plan[: plan.index("Window")]
    # everything above the window: final+partial agg, zero exchanges
    assert "Exchange hashpartitioning" not in tail
    assert "partial_collect_list" in plan


def test_novelty_profile_has_no_joins(spark):
    """novelty_profile: skew-proof shape (r15) — NO membership set is
    ever built (the r14 collect_set held a hot shingle's every member
    in one aggregate cell, an OOM AQE cannot split), first-owner is a
    mergeable partial_min, the distinct pair table is checkpointed once
    for its two consumers, and per-doc counts come from a union + sum
    aggregate. Still no join operator anywhere; exactly TWO hash
    exchanges above the checkpoint (owner aggregate + doc aggregate;
    the pair-keyed distinct exchange lives inside the checkpointed
    subplan, keeping the r14 total of ≤3)."""
    plan = plan_of(spark, "novelty_profile")
    assert "Join" not in plan
    assert "collect_set" not in plan  # the skew cell must not return
    assert "partial_min" in plan  # h60 owner aggregate combines map-side
    assert "Scan ExistingRDD" in plan  # the checkpointed pair table
    assert "Union" in plan
    assert plan.count("Exchange hashpartitioning") == 2, (
        "novelty_profile must spend exactly two exchanges above the "
        "checkpoint: the h60 owner aggregate and the per-doc aggregate"
    )


def test_bpe_pair_count_symbolize_stays_above_word_agg(spark):
    """The pair-count guard must not be a pushable predicate: Catalyst
    pushes a deterministic filter on a word-derived expression BELOW
    the word aggregate, re-running the interpreted symbolize regexp
    per word occurrence (measured 10.3 s vs 1.4 s at sf1). With the
    CASE-guarded projection the symbolize expression appears exactly
    once, in the post-aggregate projection — never in a scan-side
    Filter."""
    plan = plan_of(spark, "bpe_pair_counts")
    # The pushed-down regression manifests as a Filter whose condition
    # re-derives the symbol array (size(regexp_extract_all(...)) >= 2)
    # on the scan side of the word aggregate. In the healthy plan the
    # only Filter is the empty-word guard, and the CASE-guarded pair
    # explode sits ABOVE the word-count HashAggregate.
    bad = [
        ln
        for ln in plan.splitlines()
        if "Filter" in ln and ("regexp_extract_all" in ln or "size(" in ln)
    ]
    assert not bad, f"symbolize pushed into a filter: {bad[0][:120]}"
    explode_at = plan.index("Generate explode(CASE WHEN")
    word_guard_at = plan.index("Filter NOT (word")
    assert explode_at < word_guard_at, (
        "pair explode must be above the word aggregate (compaction intact)"
    )


def test_pagerank_iterations_never_rescan_the_corpus(spark):
    """domain_pagerank materializes the normalized adjacency once
    (localCheckpoint): the 5-iteration recurrence plan must contain
    ZERO parquet scans — re-deriving the corpus-sized edge aggregate
    per iteration is the first-cut mistake this pins (2.71 s vs
    0.80 s at sf0.1)."""
    plan = plan_of(spark, "domain_pagerank")
    assert "Scan parquet" not in plan
    assert "CartesianProduct" not in plan


def test_bm25_single_arrow_tokenize_no_corpus_shuffle(spark):
    """BM25's posting table is ONE checkpointed Arrow pass (documents
    are row-atomic, so batch-local counts are globally exact — no tf
    shuffle exists at all); document frequency is a query-vocab-bounded
    map-side-combined AGGREGATE (NOT a token window: one stop-word in a
    query would put that token's entire posting list in a single window
    partition — the r11 sweep tried and rejected it), corpus stats one
    documents-scan aggregate. Query and df sides broadcast; the corpus
    never sort-merges, and the only JVM explode left is the bounded
    query side."""
    from ad_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_ORACLE

    df = REGISTRY["bm25_retrieve"].fn(spark, SF_ORACLE)
    df.collect()
    full = df._jdf.queryExecution().executedPlan().toString()
    p = full.split("== Initial Plan ==")[0]  # AQE prints the plan twice
    assert "ExistingRDD" in p, "tf must read the checkpointed postings"
    # the stop-word skew hazard: df must NOT be a token-keyed window
    assert "windowspecdefinition(token" not in p
    # only the BOUNDED query side explodes (twice: the scoring probe
    # and the df semi-filter both derive from the doc_id < n_queries
    # scan) — the corpus text never JVM-explodes
    assert p.count("Generate explode") <= 2
    assert p.count("LessThan(doc_id,") >= 1, "every explode sits on the query scan"
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") >= 2


def test_hybrid_rrf_fusion_adds_no_join(spark):
    """The fusion stage is a UNION + one q×2k-row aggregate — rank
    lists are combined without any join, and nothing in the composed
    plan sort-merges (each half keeps its own broadcast shape)."""
    from ad_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_ORACLE

    df = REGISTRY["hybrid_retrieve_rrf"].fn(spark, SF_ORACLE)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "Union" in p
    assert "SortMergeJoin" not in p


def test_pmi_broadcasts_unigram_model(spark):
    """The unigram count table is vocabulary-bounded and must broadcast
    onto the pair table (twice — lhs and rhs); the rank window runs on
    the already-limited top-k rows (TakeOrdered, no global sort of the
    pair table)."""
    p = plan_of(spark, "pmi_collocations")
    assert p.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in p
    assert "TakeOrderedAndProject" in p


def test_weighted_sample_is_scan_plus_takeordered(spark):
    """A-ES weighted sampling must stay a pure projection + per-
    partition top-k heap: zero exchanges below the k-row gather, no
    global sort, no shuffle of the corpus."""
    p = plan_of(spark, "weighted_sample")
    assert "TakeOrderedAndProject" in p
    assert p.count("Exchange") == 0


def test_cms_grid_is_broadcast_and_join_free_of_sortmerge(spark):
    """The depth×width grid is bounded by construction and must
    BROADCAST into the probe; the corpus-side cell aggregate's shuffle
    is grid-bounded (map-side combine), so nothing sort-merges."""
    p = plan_of(spark, "cms_heavy_hitters")
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_iterative_tier_job_count_ceilings(spark):
    """Job-count regression bounds for the iterative tier (VERDICT r11
    ask #7): the r11 sweeps cut ~10 jobs across bm25/components by
    folding per-round materializations into the convergence actions,
    and nothing previously FAILED if a refactor quietly re-split them
    (each extra job costs a ~0.1-0.2 s scheduling floor at sf0.1 — the
    r11 census put wall ≈ 245 ms + 84 ms·jobs). Ceilings are generous
    (~2x the measured sf0.001 counts) so data-dependent convergence
    never flakes them; a lost lazy-checkpoint or a reintroduced
    per-round action blows straight through."""
    import os

    from ad_data_lake_spark.queries import REGISTRY

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    tracker = spark.sparkContext.statusTracker()

    def jobs_for(name: str) -> int:
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        ids = tracker.getJobIdsForGroup(None)
        before = max(ids) if ids else -1
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return len([j for j in tracker.getJobIdsForGroup(None) if j > before])

    ceilings = {
        "domain_pagerank": 60,
        "neardup_clusters": 40,
        "neardup_clusters_star": 40,
        "dedup_keep_best": 25,
        "bm25_retrieve": 15,
    }
    counts = {name: jobs_for(name) for name in ceilings}
    over = {n: c for n, c in counts.items() if c > ceilings[n]}
    assert not over, f"job-count regression past ceiling: {over} (all: {counts})"


def test_bpe_encode_inline_path_zero_exchange(spark):
    """bpe_encode_ids Path A (inline vocab, the fixture regime) must
    stay a ZERO-SHUFFLE single-scan projection — a refactor that
    silently falls back to the per-occurrence Path B shape would
    reintroduce the posexplode + vocab window + reassembly exchanges
    (r14: 2 scans + 6 Exchange). Pins the r14 inline-vocab win."""
    plan = plan_of(spark, "bpe_encode_ids")
    assert "Exchange" not in plan, "Path A must plan no exchange at all"
    assert plan.count("Scan parquet") == 1
    assert "Generate" not in plan, "Path A must not explode"
