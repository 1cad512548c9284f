"""SQL surface: run the engine's headline operators from ``spark.sql``.

The reference exposes no SQL (its consumers call Python), and this
engine's primary API is the DataFrame registry — but a temp-view layer
costs nothing and widens the audience to SQL-only users: base tables
register under their TPC-H-ish names, and each headline operator
registers as a VIEW over its registry plan. Views are lazy logical
plans, not materializations — Catalyst inlines them, so a user's
``WHERE``/column selection on a view still prunes and pushes down into
the underlying parquet scan exactly as the DataFrame form would
(asserted in tests/test_plans.py::test_sql_view_pushdown).

Usage::

    from ad_data_lake_spark.sql import register_sql_surface
    register_sql_surface(spark, "/root/testdata/sf0.1")
    spark.sql("SELECT * FROM hierarchy_flat WHERE o_orderkey < 100")
    spark.sql("SELECT * FROM dedup_exact WHERE n_copies > 1")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ad_data_lake_spark.sources.tables import TABLE_NAMES, load_table

# Read-path registry entries exposed as SQL views: the hierarchy /
# insights / window / dedup / text headliners a reference user would
# reach for first. (Write-path rows are actions, not views.)
HEADLINE_VIEWS: tuple[str, ...] = (
    "scan_project",
    "hierarchy_flat",
    "broadcast_dim_join",
    "agg_action_type",
    "agg_reach_frequency",
    "agg_rollup",
    "latest_snapshot_window",
    "sessionize_events",
    "frequency_cap",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_stats",
    "quality_score",
    "rag_retrieve",
    "dedup_keep_best",
    "novelty_profile",
    "shard_assign",
    "embed_topk_int8",
    "bpe_pair_counts",
    "bpe_encode_stats",
    "bm25_retrieve",
    "hybrid_retrieve_rrf",
    "pmi_collocations",
    "weighted_sample",
    "cms_heavy_hitters",
    "mmr_diversify",
    "embed_topk_binary",
    "contrastive_triplets",
    "fim_transform",
    "bpe_encode_ids",
    "lang_quality_calibration",
    "filter_agreement",
    "fuzzy_name_join",
    "token_budget_plan",
)


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every base parquet table as a temp view (same names the
    DuckDB oracle uses), all reads going through ``load_table`` so the
    timestamp-nanos handling stays uniform."""
    for t in TABLE_NAMES:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)


def register_sql_surface(
    spark: SparkSession,
    sf_dir: str,
    views: tuple[str, ...] = HEADLINE_VIEWS,
) -> list[str]:
    """Register base tables + headline operator views; returns the
    registered view names. Operator views are the registry plans
    verbatim — the same oracle-verified DataFrames, now addressable
    from SQL."""
    from ad_data_lake_spark.queries import REGISTRY

    register_tables(spark, sf_dir)
    out = []
    for name in views:
        REGISTRY[name].fn(spark, sf_dir).createOrReplaceTempView(name)
        out.append(name)
    return out


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Thin alias so callers can stay inside this module."""
    return spark.sql(query)
