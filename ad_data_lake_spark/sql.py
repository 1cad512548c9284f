"""SQL surface: run the engine's operators from ``spark.sql``.

The reference exposes no SQL (its consumers call Python), and this
engine's primary API is the DataFrame registry — but a temp-view layer
widens the audience to SQL-only users: base tables register under
their TPC-H-ish names, and every READ-PATH registry operator registers
as a VIEW over its registry plan. Views are lazy logical plans, not
materializations — Catalyst inlines them, so a user's ``WHERE``/column
selection on a view still prunes and pushes down into the underlying
parquet scan exactly as the DataFrame form would (asserted in
tests/test_plans.py::test_sql_view_pushdown).

Two tiers, split by what PLAN CONSTRUCTION costs (measured by job
count at build, not guessed):

- **Lazy views** (the default surface): building the DataFrame runs
  zero Spark jobs beyond the parquet footer reads — registration is
  pure plan construction, cheap at any scale.
- **Action-bearing views** (``ACTION_VIEWS``): the operator's plan
  build itself executes jobs — model training collects (BPE merge
  table, IVF centroids, NB log-likelihood model), iterative
  convergence loops (connected components, PageRank), bounded query-
  side collects (the embed_topk/bm25/mmr families), or an eager
  corpus checkpoint. Registering these at default-session scale is a
  real compute cost, so they are OPT-IN via
  ``register_sql_surface(..., include_action_views=True)`` — the
  registration is eager, the resulting view is then a plain lazy
  plan like any other.

Usage::

    from ad_data_lake_spark.sql import register_sql_surface
    register_sql_surface(spark, "/root/testdata/sf0.1")
    spark.sql("SELECT * FROM hierarchy_flat WHERE o_orderkey < 100")
    spark.sql("SELECT * FROM dedup_exact WHERE n_copies > 1")

    # the model-backed operators, accepting the build cost explicitly:
    register_sql_surface(spark, sf_dir, include_action_views=True)
    spark.sql("SELECT * FROM bm25_retrieve WHERE rank = 1")

    # writes (r14): MERGE / INSERT OVERWRITE / APPLY CHANGES statements
    # dispatch into the commit-protocol-backed writers via execute():
    from ad_data_lake_spark.sql import execute
    execute(spark, "MERGE INTO '/lake/t' USING (SELECT ...) "
                   "ON event_id PRECEDENCE (ts, value)")
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from ad_data_lake_spark.sources.tables import TABLE_NAMES, load_table

# Registry rows whose PLAN BUILD executes Spark jobs (beyond table
# footer reads): driver-bounded model collects, iterative loops, or
# eager materialization. Measured empirically (statusTracker job
# deltas with table loads subtracted) — see module docstring. These
# register only when the caller opts into the build cost.
ACTION_VIEWS: tuple[str, ...] = (
    "bigram_lm_score",
    "bloom_decontaminate",
    "bm25_retrieve",
    "boilerplate_removal",
    "bpe_encode_ids",
    "bpe_encode_stats",
    "bpe_train_merges",
    "contrastive_triplets",
    "dedup_keep_best",
    "domain_pagerank",
    "embed_topk_binary",
    "embed_topk_bruteforce",
    "embed_topk_int8",
    "embed_topk_ivf",
    "embed_topk_ivf_sq8",
    "exact_substring_dedup",
    "hybrid_retrieve_rrf",
    "mmr_diversify",
    "nb_quality_score",
    "neardup_clusters",
    "neardup_clusters_star",
    "pmi_collocations",
    "rag_retrieve",
    "rare_token_scrub",
    "semantic_dedup",
    "semantic_dedup_ivf",
)


def _read_path_views() -> tuple[str, ...]:
    """Every registry row that is a pure read (no table writes, no
    streaming trigger) — the rows that make sense as SQL views."""
    from ad_data_lake_spark.queries import REGISTRY

    return tuple(
        n
        for n, s in REGISTRY.items()
        if "write" not in s.tags and "streaming" not in s.tags
    )


def lazy_views() -> tuple[str, ...]:
    """The default view surface: read-path rows whose registration is
    pure plan construction (no jobs at build)."""
    action = set(ACTION_VIEWS)
    return tuple(n for n in _read_path_views() if n not in action)


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLE_NAMES
) -> None:
    """Register base parquet tables as temp views (same names the
    DuckDB oracle uses), all reads going through ``load_table`` so the
    timestamp-nanos handling stays uniform. ``tables`` narrows the set
    — callers that read one table (the SQL-surface write rows) skip
    the other nine registrations."""
    for t in tables:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)


def register_sql_surface(
    spark: SparkSession,
    sf_dir: str,
    views: tuple[str, ...] | None = None,
    include_action_views: bool = False,
) -> list[str]:
    """Register base tables + operator views; returns the registered
    view names. Operator views are the registry plans verbatim — the
    same oracle-verified DataFrames, now addressable from SQL.

    ``views=None`` registers the full lazy read-path surface (every
    registry read row whose plan build runs no jobs).
    ``include_action_views=True`` additionally registers the
    ``ACTION_VIEWS`` tier, accepting that each one's registration
    executes its build-time jobs (model trains, convergence loops,
    bounded collects) right here, eagerly."""
    from ad_data_lake_spark.queries import REGISTRY

    register_tables(spark, sf_dir)
    if views is None:
        views = lazy_views()
        if include_action_views:
            views = views + ACTION_VIEWS
    out = []
    for name in views:
        REGISTRY[name].fn(spark, sf_dir).createOrReplaceTempView(name)
        out.append(name)
    return out


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Thin alias so callers can stay inside this module."""
    return spark.sql(query)


# ---------------------------------------------------------------------------
# Write surface (r13 verdict #8): spark.sql-level entry points for the
# T1/T2/T13 write contracts. Plain parquet is not a DSv2 row-level
# table, so Spark's parser would reject MERGE INTO against it at
# analysis; like Delta's SQL front-end, a thin statement layer
# recognizes the write VERB and dispatches into the engine's own
# commit-protocol-backed writers — everything inside the statement's
# subquery is genuine Catalyst SQL over the registered views. Grammar
# (case-insensitive keywords; <path> single-quoted; <subquery>
# parenthesized and balanced):
#
#   MERGE INTO '<path>' USING (<subquery>) ON <key>
#       PRECEDENCE (<order_col>, <tiebreak>)
#     -> incremental.merge_upsert. PRECEDENCE names the last-wins
#        recency rule the bucket merge needs explicitly (standard
#        MERGE hides it in WHEN MATCHED AND u.ts > t.ts; SURVEY §7's
#        risk register requires the tiebreak be deterministic).
#
#   INSERT OVERWRITE '<path>' PARTITION (<col>[, <col>...]) <subquery>
#     -> incremental.backfill_partitions (dynamic partition
#        overwrite — only partitions present in the subquery's result
#        are replaced; Spark's own INSERT OVERWRITE ... PARTITION
#        spelling, addressed by path).
#
#   APPLY CHANGES INTO '<path>' FROM (<subquery>) ON <key>
#       PRECEDENCE (<order_col>, <tiebreak>) [TOMBSTONE <col>]
#     -> incremental.cdc_apply (the DLT APPLY CHANGES INTO shape:
#        upserts + delete tombstones, latest change per key wins).
#
# Any other statement passes through to spark.sql unchanged, so one
# entry point serves both halves of the surface.
# ---------------------------------------------------------------------------

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"

_MERGE_RE = re.compile(
    rf"^\s*MERGE\s+INTO\s+'(?P<path>[^']+)'\s+USING\s*(?=\()", re.I
)
_MERGE_TAIL_RE = re.compile(
    rf"^\s*ON\s+(?P<key>{_IDENT})\s+PRECEDENCE\s*\(\s*(?P<oc>{_IDENT})\s*,"
    rf"\s*(?P<tb>{_IDENT})\s*\)\s*$",
    re.I,
)
_INSERT_RE = re.compile(
    rf"^\s*INSERT\s+OVERWRITE\s+'(?P<path>[^']+)'\s+PARTITION\s*\("
    rf"(?P<cols>{_IDENT}(?:\s*,\s*{_IDENT})*)\s*\)\s*(?P<query>\S[\s\S]*)$",
    re.I,
)
_APPLY_RE = re.compile(
    rf"^\s*APPLY\s+CHANGES\s+INTO\s+'(?P<path>[^']+)'\s+FROM\s*(?=\()", re.I
)
_APPLY_TAIL_RE = re.compile(
    rf"^\s*ON\s+(?P<key>{_IDENT})\s+PRECEDENCE\s*\(\s*(?P<oc>{_IDENT})\s*,"
    rf"\s*(?P<tb>{_IDENT})\s*\)(?:\s+TOMBSTONE\s+(?P<dc>{_IDENT}))?\s*$",
    re.I,
)


def _balanced(s: str, start: int) -> int:
    """Index one past the ')' closing the '(' at ``start``, honoring
    single-quoted SQL strings, double-quoted/backquoted identifiers,
    ``--`` line comments, and ``/* */`` block comments (a paren inside
    any of those is text, not structure)."""
    depth, i = 0, start
    while i < len(s):
        c = s[i]
        if c in ("'", '"', "`"):
            q = c
            i += 1
            while i < len(s):
                if s[i] == q:
                    # doubled quote is the escaped form: stay inside
                    if i + 1 < len(s) and s[i + 1] == q:
                        i += 1
                    else:
                        break
                i += 1
        elif c == "-" and s[i : i + 2] == "--":
            nl = s.find("\n", i)
            i = len(s) - 1 if nl < 0 else nl
        elif c == "/" and s[i : i + 2] == "/*":
            end = s.find("*/", i + 2)
            if end < 0:
                break  # unterminated comment: fall through to the error
            i = end + 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError(f"unbalanced parentheses in statement: {s[start:start+80]!r}")


def execute(spark: SparkSession, statement: str) -> DataFrame:
    """Run one statement against the SQL surface: the three write
    verbs above dispatch into the engine's writers (MERGE/APPLY
    return the post-write table via ``incremental.read_merged``;
    INSERT OVERWRITE returns it via ``sinks.read_lake``), and every
    other statement is plain ``spark.sql``. The write subqueries are
    evaluated by Catalyst against whatever views the session has
    registered (``register_sql_surface`` / ``register_tables``)."""
    from ad_data_lake_spark import incremental, sinks

    # one optional trailing semicolon, the SQL-user reflex — stripped
    # here so the $-anchored tail grammars don't reject an otherwise
    # well-formed write statement with a misleading diagnosis
    statement = statement.rstrip()
    if statement.endswith(";"):
        statement = statement[:-1].rstrip()
    m = _MERGE_RE.match(statement)
    if m:
        qstart = statement.index("(", m.end())
        qend = _balanced(statement, qstart)
        tail = _MERGE_TAIL_RE.match(statement[qend:])
        if tail is None:
            raise ValueError(
                "MERGE INTO needs: ON <key> PRECEDENCE (<order_col>, <tiebreak>)"
            )
        updates = spark.sql(statement[qstart + 1 : qend - 1])
        incremental.merge_upsert(
            spark,
            m.group("path"),
            updates,
            tail.group("key"),
            tail.group("oc"),
            tail.group("tb"),
        )
        return incremental.read_merged(spark, m.group("path"))
    m = _APPLY_RE.match(statement)
    if m:
        qstart = statement.index("(", m.end())
        qend = _balanced(statement, qstart)
        tail = _APPLY_TAIL_RE.match(statement[qend:])
        if tail is None:
            raise ValueError(
                "APPLY CHANGES INTO needs: ON <key> PRECEDENCE "
                "(<order_col>, <tiebreak>) [TOMBSTONE <col>]"
            )
        changes = spark.sql(statement[qstart + 1 : qend - 1])
        incremental.cdc_apply(
            spark,
            m.group("path"),
            changes,
            tail.group("key"),
            tail.group("oc"),
            tail.group("tb"),
            delete_col=tail.group("dc") or incremental.DELETE_COL,
        )
        return incremental.read_merged(spark, m.group("path"))
    m = _INSERT_RE.match(statement)
    if m:
        cols = tuple(c.strip() for c in m.group("cols").split(","))
        incremental.backfill_partitions(
            spark.sql(m.group("query")), m.group("path"), cols
        )
        return sinks.read_lake(spark, m.group("path"))
    if re.match(r"^\s*INSERT\s+OVERWRITE\s+'", statement, re.I):
        # a quoted-path INSERT that missed the grammar would otherwise
        # fall through to spark.sql, which cannot parse the path form
        # at all and emits an unrelated Catalyst syntax error — raise
        # the statement-layer diagnosis instead (static partition
        # specs like PARTITION (col='v') are deliberately unsupported:
        # the dynamic overwrite replaces exactly the partitions the
        # subquery produces, which subsumes the static spelling)
        raise ValueError(
            "INSERT OVERWRITE against a path needs: INSERT OVERWRITE "
            "'<path>' PARTITION (<col>[, <col>...]) <subquery> "
            "(dynamic partition columns only, no static =value specs)"
        )
    return spark.sql(statement)
