"""Oracle-checked queries over the write/incremental layer (SURVEY.md
§2.1 S12/S15, §2.9 T1/T2/T4).

Each query actually exercises the lake write path — partitioned
parquet write, MERGE-style upsert, dynamic-partition backfill, the
Structured Streaming daily aggregate — into a scratch dir under /tmp,
then returns the *final table state* as a DataFrame. The DuckDB oracle
computes the same final state directly from the source tables, so a
hash match proves the write semantics (idempotency, partition
replacement, streaming dedupe) end-to-end, not just the read plan.

Scratch dirs are deterministic per (query, sf) and wiped at the start
of every invocation, so re-runs can't observe stale state. The
returned DataFrame reads lazily from the scratch path — it stays on
disk so the caller (driver/bench) can collect after return.

Scale notes: these run the exact production entry points
(`sinks.write_partitioned`, `incremental.merge_upsert`,
`incremental.backfill_partitions`, `streaming.streaming_daily_insights`)
whose 100 TB design notes live on those functions; nothing here is
test-only plumbing beyond the scratch-dir swap.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ad_data_lake_spark import incremental, sinks
from ad_data_lake_spark.sources.tables import load_table
from ad_data_lake_spark.streaming import run_available_now, streaming_daily_insights

# Deterministic backfill/pruning day (events span 2024-01; mirrored in
# the oracle SQL literals in queries.py).
EVENTS_DAY = "2024-01-15"

def _scratch(spark: SparkSession, name: str, sf_dir: str) -> str:
    from ad_data_lake_spark.scratch import scratch_dir

    return scratch_dir(spark, name, sf_dir)


def _events_slim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def lake_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12: date-partitioned lake write → partition-pruned read-back.

    Writes events partitioned by snapshot_date (the reference's
    ``output/<YYYY-MM-DD>/`` layout, reference src/utils/storage.py:9-16,
    src/main_extractor.py:363), then reads one day back through the
    partition filter and aggregates it. The read-back scan lists only
    the matching partition directory (partition pruning — verify with
    ``.explain``: PartitionFilters on snapshot_date)."""
    daily = _events_slim(spark, sf_dir).withColumn(
        "snapshot_date", F.date_format("ts", "yyyy-MM-dd")
    )
    path = _scratch(spark, "roundtrip", sf_dir)
    sinks.write_partitioned(daily, path, ("snapshot_date",))
    back = sinks.read_lake(spark, path).where(
        F.col("snapshot_date").cast("string") == EVENTS_DAY
    )
    return back.groupBy(
        F.col("snapshot_date").cast("string").alias("snapshot_date"),
        "event_type",
    ).agg(
        F.count("*").alias("events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def merge_upsert_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S15/T1: MERGE-style idempotent upsert, applied twice.

    Seeds the lake with events, then merges newer rows (+1h, +1 value
    for every 10th id) TWICE — the second application must be a no-op
    (the reference's daily re-run overwrite contract, reference
    src/main_extractor.py:42-51,358). Returns the final table; the
    oracle computes last-wins over the union directly, so a hash match
    proves both upsert correctness and idempotency."""
    events = _events_slim(spark, sf_dir)
    target = os.path.join(_scratch(spark, "merge", sf_dir), "events")
    incremental.merge_upsert(spark, target, events, "event_id", "ts", "value")
    updates = (
        events.where(F.col("event_id") % 10 == 0)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
        .withColumn("value", F.col("value") + 1)
    )
    incremental.merge_upsert(spark, target, updates, "event_id", "ts", "value")
    incremental.merge_upsert(spark, target, updates, "event_id", "ts", "value")
    return incremental.read_merged(spark, target)


def lake_concurrent_writers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T20: the optimistic-concurrency commit protocol, driver-checked.

    Replays the exact lost-update interleaving deterministically:
    writer A computes a merge of the EVEN event_ids (+100, ts+1h) from
    the seed version; before A publishes, writer B runs a COMPLETE
    merge of the ODD event_ids (+200, ts+1h) and commits. A's publish
    must CAS-fail against the advanced ``_CURRENT``, retry off B's
    version, and land — so the final table carries BOTH updates and a
    publish history of exactly depth 3 (seed → B → A-retried). Without
    the CAS (reference has a single-writer overwrite contract,
    src/main_extractor.py:358; Delta solves this with its commit
    protocol), A's pointer flip would silently discard B's merge and
    the odd ids would hash-mismatch the oracle.

    The injection point is the module's ``_publish`` seam — B's merge
    runs between A's compute and A's publish, the narrowest window the
    protocol must survive."""
    return _concurrent_writers_run(spark, sf_dir, "concurrent")


def lake_concurrent_writers_sqlite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T20 twin on the NON-FLOCK commit arbiter: the identical
    lost-update interleave as ``lake_concurrent_writers``, but the
    table's commits are arbitered by the sqlite-backed
    :class:`~ad_data_lake_spark.sqlite_store.SqliteTableCommitStore`
    (a real transactional conditional-put — sqlite's write lock is the
    CAS, no flock anywhere), planted as the table's marker database
    before the first merge. Same oracle, same expected final state and
    publish depth — proving the publish path is genuinely
    store-agnostic: swapping the backend changes the durability story,
    not one observable byte of the protocol's behavior."""

    def plant(target: str) -> None:
        from ad_data_lake_spark.sqlite_store import SqliteTableCommitStore

        SqliteTableCommitStore(target)  # marker db routes commits to sqlite

    return _concurrent_writers_run(spark, sf_dir, "concurrent_sqlite", plant)


def lake_concurrent_writers_http(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T20 twin on the HTTP/S3-wire commit arbiter: the identical
    lost-update interleave as ``lake_concurrent_writers``, but the
    table's commits CAS through a live TCP endpoint speaking the S3
    conditional-put contract (``PUT`` + ``If-Match``/``If-None-Match``
    → 412) via :class:`~ad_data_lake_spark.http_store.
    HttpTableCommitStore` — marker-planted before the first merge, so
    every publish (both writers, the CAS reject, the retry) crosses a
    real socket. Same oracle, same expected final state and publish
    depth of 3: the third backend through the identical store-agnostic
    publish path (reference has a single-writer overwrite contract,
    src/main_extractor.py:358)."""
    from ad_data_lake_spark.http_store import EtagStoreServer, HttpTableCommitStore

    with EtagStoreServer() as url:

        def plant(target: str) -> None:
            HttpTableCommitStore(target, base_url=url)

        # every publish runs eagerly inside this block; the returned
        # DataFrame reads only the local file projection, so it stays
        # valid after the endpoint goes away
        return _concurrent_writers_run(spark, sf_dir, "concurrent_http", plant)


def _concurrent_writers_run(
    spark: SparkSession, sf_dir: str, scratch_name: str, plant=None
) -> DataFrame:
    events = _events_slim(spark, sf_dir).select("event_id", "ts", "user_id", "value")
    target = os.path.join(_scratch(spark, scratch_name, sf_dir), "events")
    if plant is not None:
        plant(target)
    incremental.merge_upsert(spark, target, events, "event_id", "ts", "value")

    def upd(parity: int, bump: int) -> DataFrame:
        return events.where(F.col("event_id") % 2 == parity).select(
            "event_id",
            (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
            "user_id",
            (F.col("value") + bump).alias("value"),
        )

    orig_publish = incremental._publish
    state = {"fired": False}

    def hooked(target_path, new_version, *args, **kwargs):
        # fire ONLY for this query's table: the hook patches a module
        # global, and another registry row publishing to its own table
        # concurrently must pass through untouched
        if not state["fired"] and target_path == target:
            state["fired"] = True
            incremental._publish = orig_publish
            incremental.merge_upsert(
                spark, target_path, upd(1, 200), "event_id", "ts", "value"
            )
        return orig_publish(target_path, new_version, *args, **kwargs)

    incremental._publish = hooked
    try:
        incremental.merge_upsert(spark, target, upd(0, 100), "event_id", "ts", "value")
    finally:
        incremental._publish = orig_publish

    depth = len(
        incremental._published_history(
            target, incremental._current_version(target)
        )
    )
    return incremental.read_merged(spark, target).select(
        "event_id",
        "ts",
        "user_id",
        F.round("value", 2).alias("value"),
        F.lit(depth).cast("int").alias("publish_depth"),
    )


def backfill_partition_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: per-day backfill via dynamic partition overwrite.

    Writes the full partitioned table, then reprocesses ONE day with
    amended values (+100) — ``replaceWhere`` semantics (reference
    src/main_extractor.py:438-508). The per-day aggregate of the final
    table proves exactly that day was replaced (its values shifted)
    and every other partition was untouched (counts unchanged)."""
    daily = _events_slim(spark, sf_dir).withColumn(
        "snapshot_date", F.date_format("ts", "yyyy-MM-dd")
    )
    path = _scratch(spark, "backfill", sf_dir)
    sinks.write_partitioned(daily, path, ("snapshot_date",))
    amended = daily.where(F.col("snapshot_date") == EVENTS_DAY).withColumn(
        "value", F.col("value") + 100
    )
    incremental.backfill_partitions(amended, path, ("snapshot_date",))
    back = sinks.read_lake(spark, path)
    return back.groupBy(
        F.col("snapshot_date").cast("string").alias("snapshot_date")
    ).agg(
        F.count("*").alias("events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )



def sql_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 driven ENTIRELY through the SQL surface (r13 verdict #8):
    the same seed + twice-applied MERGE as ``merge_upsert_idempotent``,
    but every write is a ``MERGE INTO '<path>' USING (<subquery>) ON
    <key> PRECEDENCE (<order_col>, <tiebreak>)`` statement through
    ``sql.execute`` — the subqueries are genuine Catalyst SQL over the
    registered base views, and the statement layer dispatches into the
    commit-protocol-backed ``incremental.merge_upsert``. Same oracle
    as the DataFrame row, so a hash match proves the SQL spelling is
    semantics-identical (idempotency included — the second MERGE must
    be a no-op)."""
    from ad_data_lake_spark.sql import execute, register_tables

    register_tables(spark, sf_dir, tables=("events",))
    target = os.path.join(_scratch(spark, "sql_merge", sf_dir), "events")
    seed = (
        "SELECT event_id, ts, user_id, event_type, value FROM events"
    )
    updates = (
        "SELECT event_id, ts + INTERVAL 1 HOUR AS ts, user_id, "
        "event_type, value + 1 AS value FROM events WHERE event_id % 10 = 0"
    )
    execute(
        spark,
        f"MERGE INTO '{target}' USING ({seed}) "
        "ON event_id PRECEDENCE (ts, value)",
    )
    stmt = (
        f"MERGE INTO '{target}' USING ({updates}) "
        "ON event_id PRECEDENCE (ts, value)"
    )
    execute(spark, stmt)
    return execute(spark, stmt)


def sql_backfill_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 through the SQL surface: seed the date-partitioned table,
    then replace ONE day with amended values via ``INSERT OVERWRITE
    '<path>' PARTITION (snapshot_date) <subquery>`` — the statement
    layer dispatches into ``incremental.backfill_partitions`` (dynamic
    partition overwrite), and the read-back aggregate runs as plain
    ``spark.sql`` over a view of the final table. Same oracle as
    ``backfill_partition_replace``."""
    from ad_data_lake_spark.sql import execute, register_tables

    register_tables(spark, sf_dir, tables=("events",))
    path = _scratch(spark, "sql_backfill", sf_dir)
    daily = (
        "SELECT event_id, ts, user_id, event_type, value, "
        "date_format(ts, 'yyyy-MM-dd') AS snapshot_date FROM events"
    )
    # seed is the same statement shape: dynamic overwrite of a fresh
    # path writes every partition present in the subquery
    execute(
        spark,
        f"INSERT OVERWRITE '{path}' PARTITION (snapshot_date) {daily}",
    )
    back = execute(
        spark,
        f"INSERT OVERWRITE '{path}' PARTITION (snapshot_date) "
        f"SELECT event_id, ts, user_id, event_type, value + 100 AS value, "
        f"snapshot_date FROM ({daily}) WHERE snapshot_date = '{EVENTS_DAY}'",
    )
    back.createOrReplaceTempView("sql_backfill_final")
    return execute(
        spark,
        "SELECT CAST(snapshot_date AS STRING) AS snapshot_date, "
        "count(*) AS events, round(sum(value), 2) AS total_value "
        "FROM sql_backfill_final GROUP BY 1",
    )


def sql_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T13 through the SQL surface: the same seed + twice-applied CDC
    batch as ``cdc_apply_roundtrip``, every write an ``APPLY CHANGES
    INTO '<path>' FROM (<subquery>) ON <key> PRECEDENCE (<order_col>,
    <tiebreak>) TOMBSTONE <col>`` statement (the DLT shape) through
    ``sql.execute`` — completing the SQL-write triple
    (MERGE / INSERT OVERWRITE / APPLY CHANGES) as driver-gated rows.
    Same oracle as the DataFrame row: update recency, tombstone
    removal, tombstone-over-update precedence, and replay idempotence
    all proven from the SQL spelling."""
    from ad_data_lake_spark.sql import execute, register_tables

    register_tables(spark, sf_dir, tables=("events",))
    target = os.path.join(_scratch(spark, "sql_cdc", sf_dir), "events_cdc")
    execute(
        spark,
        f"MERGE INTO '{target}' USING "
        "(SELECT event_id, ts, user_id, value FROM events) "
        "ON event_id PRECEDENCE (ts, value)",
    )
    changes = (
        "SELECT event_id, ts + INTERVAL 1 HOUR AS ts, user_id, "
        f"value + 10 AS value, false AS {incremental.DELETE_COL} "
        "FROM events WHERE event_id % 7 = 0 "
        "UNION ALL "
        "SELECT event_id, ts + INTERVAL 2 HOUR AS ts, user_id, value, "
        f"true AS {incremental.DELETE_COL} "
        "FROM events WHERE event_id % 10 = 0"
    )
    stmt = (
        f"APPLY CHANGES INTO '{target}' FROM ({changes}) "
        f"ON event_id PRECEDENCE (ts, value) TOMBSTONE {incremental.DELETE_COL}"
    )
    execute(spark, stmt)
    out = execute(spark, stmt)  # replay: at-least-once must be a no-op
    return out.select(
        "event_id", "ts", "user_id", F.round("value", 2).alias("value")
    )


def _stream_src_write(df: DataFrame, src: str, n_files: int = 16) -> None:
    """Write a stream-source fixture as MULTIPLE parquet files. A real
    stream source lands many files (one per upstream writer task per
    trigger); the single-file write these fixtures used to do is the
    one-partition trap in stream form — every micro-batch ran 1-2
    tasks regardless of cores, which billed compute-bound rows (the
    sanitize chain) at 1/16th of the machine. File-source parallelism
    is per-file, so n_files bounds per-batch parallelism exactly the
    way upstream writer parallelism does in production."""
    df.repartition(n_files).write.mode("overwrite").parquet(src)


def streaming_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/T4: Structured Streaming daily insights with late/duplicate
    handling.

    Plants exact duplicate rows for every 10th event into a file
    stream source, then runs readStream → watermark(1 day) →
    dropDuplicates(event_id) → tumbling 1-day window aggregate
    (streaming/incremental.py). The oracle is the plain per-day batch
    aggregate over the original events — a hash match proves the
    stream deduped the planted rows and reproduced batch semantics."""
    events = _events_slim(spark, sf_dir)
    src = os.path.join(_scratch(spark, "stream-src", sf_dir), "events")
    dup = events.where(F.col("event_id") % 10 == 0)
    _stream_src_write(events.unionByName(dup), src)
    stream = streaming_daily_insights(spark, src, events.schema)
    return run_available_now(
        stream, f"stream_daily_{uuid.uuid4().hex[:8]}", shuffle_partitions=8
    )


def streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8-adjacent: sliding-window streaming aggregate (3-day window,
    1-day slide) with the same planted-duplicate source as
    ``streaming_daily`` — the oracle is the batch equivalent (each
    event exploded into its 3 covering windows), so a hash match
    proves both the window assignment and the streaming dedupe."""
    from ad_data_lake_spark.streaming import streaming_sliding_insights

    events = _events_slim(spark, sf_dir)
    src = os.path.join(_scratch(spark, "slide-src", sf_dir), "events")
    dup = events.where(F.col("event_id") % 10 == 0)
    _stream_src_write(events.unionByName(dup), src)
    stream = streaming_sliding_insights(spark, src, events.schema)
    return run_available_now(
        stream, f"stream_slide_{uuid.uuid4().hex[:8]}", shuffle_partitions=8
    )


def streaming_sessionize_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T11: native streaming sessionization — the session_window + gap
    aggregate running UNDER a watermark (streaming/stateful.py::
    streaming_sessionize), drained over the events fact. The oracle is
    the batch lag-islands SQL (sessionize_native's), so a hash match
    proves the streaming session merge reproduces batch gap semantics
    exactly; state is one row per OPEN session (the watermark closes
    and evicts the rest), which is what makes live session rollups
    viable at event-time scale."""
    from ad_data_lake_spark.streaming.stateful import streaming_sessionize

    events = _events_slim(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    src = os.path.join(_scratch(spark, "sess-src", sf_dir), "events")
    _stream_src_write(events, src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    return run_available_now(
        streaming_sessionize(stream),
        f"stream_sess_{uuid.uuid4().hex[:8]}",
        shuffle_partitions=8,
    )


def streaming_dim_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12: stream-static enrichment join — the events stream joined to
    the (static) customer dimension on user_id, the per-event payload
    hydration every serving pipeline runs. The static side broadcasts
    per micro-batch (no stream state at all — unlike a stream-stream
    join there is nothing to watermark), so the operator is stateless
    and scales with batch size; the oracle is the plain batch join."""
    events = _events_slim(spark, sf_dir)
    customer = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_mktsegment"
    )
    src = os.path.join(_scratch(spark, "enrich-src", sf_dir), "events")
    _stream_src_write(events, src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    enriched = stream.join(F.broadcast(customer), "user_id").select(
        "event_id", "user_id", "ts", "event_type", "value", "c_name", "c_mktsegment"
    )
    return run_available_now(
        enriched, f"stream_enrich_{uuid.uuid4().hex[:8]}", output_mode="append"
    )


def cdc_apply_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T13: CDC apply with DELETE tombstones (Debezium-style feed →
    table). Base table = the events fact keyed on event_id; the change
    batch carries an UPDATE for every 7th event (ts+1h, value+10) and
    a DELETE tombstone for every 10th (ts+2h — tombstones outrank the
    updates they follow). The batch is applied TWICE against the same
    table — the oracle computes the final state directly, so the hash
    match proves update recency, tombstone removal, tombstone-newer-
    than-update precedence, AND replay idempotence in one row."""
    base = _events_slim(spark, sf_dir).select("event_id", "ts", "user_id", "value")
    lake_dir = _scratch(spark, "cdc-apply", sf_dir)
    target = os.path.join(lake_dir, "events_cdc")
    incremental.merge_upsert(spark, target, base, "event_id", "ts", "value")
    upd = base.where(F.col("event_id") % 7 == 0).select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
        "user_id",
        (F.col("value") + 10).alias("value"),
        F.lit(False).alias(incremental.DELETE_COL),
    )
    dele = base.where(F.col("event_id") % 10 == 0).select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 2 HOUR")).alias("ts"),
        "user_id",
        "value",
        F.lit(True).alias(incremental.DELETE_COL),
    )
    changes = upd.unionByName(dele)
    incremental.cdc_apply(spark, target, changes, "event_id", "ts", "value")
    # replay: at-least-once delivery must be a no-op
    incremental.cdc_apply(spark, target, changes, "event_id", "ts", "value")
    out = incremental.read_merged(spark, target)
    return out.select(
        "event_id", "ts", "user_id", F.round("value", 2).alias("value")
    )


def streaming_frequency_cap_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T14: the arbitrary-stateful streaming operator as a driver-
    checked row — ``applyInPandasWithState`` per-user impression
    counters drained over the events fact; the oracle is the batch
    row_number() cap, so the hash match proves the custom stateful
    operator reproduces batch semantics end to end."""
    from ad_data_lake_spark.streaming.stateful import streaming_frequency_cap

    events = _events_slim(spark, sf_dir).select("event_id", "user_id", "ts")
    src = os.path.join(_scratch(spark, "cap-src", sf_dir), "events")
    _stream_src_write(events, src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    return run_available_now(
        streaming_frequency_cap(stream),
        f"stream_cap_{uuid.uuid4().hex[:8]}",
        output_mode="append",
        shuffle_partitions=8,
    )


def streaming_frequency_cap_batchwise_drain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """T14 twin, all-JVM: the foreachBatch frequency cap
    (``streaming/stateful.py::streaming_frequency_cap_batchwise`` —
    per-batch window numbering + a versioned per-user offsets table,
    zero Python in the row path). Same oracle as the stateful-API row,
    so the driver gate proves both forms reproduce batch semantics;
    the A/B walls live in BASELINE.md's streaming table.

    Both forms number impressions against the global row_number oracle
    under the in-order-batch assumption (each user's events arrive in
    non-decreasing (ts, event_id) order across micro-batches — the
    fixture's time-ordered file delivery guarantees it here); see the
    ORDERING ASSUMPTION note in streaming/stateful.py."""
    from ad_data_lake_spark.streaming.stateful import (
        streaming_frequency_cap_batchwise,
    )

    events = _events_slim(spark, sf_dir).select("event_id", "user_id", "ts")
    src = os.path.join(_scratch(spark, "capbw-src", sf_dir), "events")
    _stream_src_write(events, src)
    base = _scratch(spark, "capbw", sf_dir)
    results = os.path.join(base, "results")
    state = os.path.join(base, "state")
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = streaming_frequency_cap_batchwise(stream, results, state)
    q.awaitTermination()
    return spark.read.parquet(results).drop("batch")


def merge_schema_evolution_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T15: schema-evolving MERGE — the update batch carries a column
    the table has never seen (``status``). After the merge, updated
    rows carry their status, every pre-existing row (including whole
    hardlinked untouched buckets, whose parquet files still have the
    OLD column set) reads back as NULL via merged-footer reading —
    Delta's ADD COLUMN read semantics on the plain-parquet layout."""
    base = _events_slim(spark, sf_dir).select("event_id", "ts", "user_id", "value")
    lake_dir = _scratch(spark, "schema-evo", sf_dir)
    target = os.path.join(lake_dir, "events_evo")
    incremental.merge_upsert(spark, target, base, "event_id", "ts", "value")
    upd = base.where(F.col("event_id") % 5 == 0).select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
        "user_id",
        "value",
        F.lit("updated").alias("status"),
    )
    incremental.merge_upsert(spark, target, upd, "event_id", "ts", "value")
    out = incremental.read_merged(spark, target)
    return out.select(
        "event_id", "ts", "user_id", F.round("value", 2).alias("value"), "status"
    )


def time_travel_read_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T16: VERSION-AS-OF read on the versioned layout — merge an
    update batch over the base table, then read the RETAINED previous
    version: it must be byte-identically the pre-merge state (the
    rollback/audit read). The oracle computes the base state directly,
    so the hash match proves the retained version is untouched by the
    merge that superseded it (hardlinked buckets included)."""
    base = _events_slim(spark, sf_dir).select("event_id", "ts", "user_id", "value")
    lake_dir = _scratch(spark, "time-travel", sf_dir)
    target = os.path.join(lake_dir, "events_tt")
    incremental.merge_upsert(spark, target, base, "event_id", "ts", "value")
    upd = base.where(F.col("event_id") % 9 == 0).select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
        "user_id",
        (F.col("value") + 5).alias("value"),
    )
    incremental.merge_upsert(spark, target, upd, "event_id", "ts", "value")
    out = incremental.read_previous(spark, target)
    return out.select(
        "event_id", "ts", "user_id", F.round("value", 2).alias("value")
    )


def time_travel_depth_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T16+: N-deep VERSION-AS-OF — three merges (base, +1 h update on
    every 9th key, +2 h update on every 13th key), then read BOTH
    retained priors: two versions back must be byte-identically the
    base state and one back the state after the first update. The
    oracle computes both states directly; the union is tagged with
    ``version_back`` so one hash match pins the whole retained history
    (the bounded-retention analog of the reference's keep-every-dated-
    snapshot layout, reference src/main_extractor.py:363)."""
    base = _events_slim(spark, sf_dir).select("event_id", "ts", "user_id", "value")
    lake_dir = _scratch(spark, "time-travel-depth", sf_dir)
    target = os.path.join(lake_dir, "events_ttd")
    incremental.merge_upsert(spark, target, base, "event_id", "ts", "value")
    upd_a = base.where(F.col("event_id") % 9 == 0).select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
        "user_id",
        (F.col("value") + 5).alias("value"),
    )
    incremental.merge_upsert(spark, target, upd_a, "event_id", "ts", "value")
    upd_b = base.where(F.col("event_id") % 13 == 0).select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 2 HOUR")).alias("ts"),
        "user_id",
        (F.col("value") + 7).alias("value"),
    )
    incremental.merge_upsert(spark, target, upd_b, "event_id", "ts", "value")
    two_back = incremental.read_version(spark, target, 2).withColumn(
        "version_back", F.lit(2)
    )
    one_back = incremental.read_version(spark, target, 1).withColumn(
        "version_back", F.lit(1)
    )
    return two_back.unionByName(one_back).select(
        "event_id", "ts", "user_id", F.round("value", 2).alias("value"), "version_back"
    )


def bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout: bucketed tables co-locate their join (SURVEY §2 scale
    notes; layout.write_bucketed).

    Writes orders and customer bucketed ×8 on the customer key, joins
    them through the catalog, and aggregates. The join plans with ZERO
    exchanges — both sides' bucket layout satisfies the join's
    distribution requirement (asserted in tests/test_plans.py). The
    oracle computes the same aggregate straight from the source
    parquet, proving the bucketed write+join changed nothing but the
    physical plan."""
    from ad_data_lake_spark import layout

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    base = _scratch(spark, "bucketed", sf_dir)
    layout.write_bucketed(orders, "lake_orders_bucketed", os.path.join(base, "orders"), "o_custkey")
    layout.write_bucketed(cust, "lake_customer_bucketed", os.path.join(base, "customer"), "o_custkey")
    j = layout.bucketed_join(spark, "lake_orders_bucketed", "lake_customer_bucketed", "o_custkey")
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


def compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout: small-file compaction (layout.compact_table).

    Fragments events into 64 files (the accreted state an incremental
    writer leaves behind), compacts to ~target-size files with a
    narrow coalesce rewrite, and returns the per-type aggregate of the
    compacted table. Hash match vs the source proves the rewrite is
    lossless; the file-count collapse itself is asserted in
    tests/test_lake.py."""
    from ad_data_lake_spark import layout

    events = _events_slim(spark, sf_dir)
    path = os.path.join(_scratch(spark, "compact", sf_dir), "events")
    events.repartition(64).write.parquet(path)
    layout.compact_table(spark, path)
    return (
        spark.read.parquet(path)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


ZORDER_DAY0 = "2024-01-01"
ZORDER_USER_LO, ZORDER_USER_HI = 100, 499
ZORDER_DAY_LO, ZORDER_DAY_HI = 7, 21
ZORDER_TILE_SHIFT = 12


def zorder_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout: multi-dimensional z-order clustering
    (layout.write_zordered).

    Writes events z-ordered on (user_id, day index), reads back
    through a predicate on BOTH dimensions, and aggregates per z-tile
    (z >> 12). The oracle recomputes the identical Morton interleave
    arithmetic straight from the source — a hash match proves both
    the layout rewrite is lossless and the z math is exactly the
    documented curve. File-skipping quality (per-file bounding boxes
    vs a time-sorted baseline) is asserted in tests/test_lake.py."""
    from ad_data_lake_spark import layout

    events = _events_slim(spark, sf_dir).withColumn(
        "day_idx",
        F.datediff(F.to_date("ts"), F.lit(ZORDER_DAY0).cast("date")),
    )
    path = os.path.join(_scratch(spark, "zorder", sf_dir), "events")
    layout.write_zordered(events, path, "user_id", "day_idx")
    back = spark.read.parquet(path).where(
        F.col("user_id").between(ZORDER_USER_LO, ZORDER_USER_HI)
        & F.col("day_idx").between(ZORDER_DAY_LO, ZORDER_DAY_HI)
    )
    tile = F.shiftright(
        layout.zvalue(F.col("user_id"), F.col("day_idx")), ZORDER_TILE_SHIFT
    ).alias("z_tile")
    return back.groupBy(tile).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def streaming_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4+: stream-stream interval join (multi-touch attribution).

    Feeds events through two file streams (clicks / purchases), joins
    them within the 3-hour look-back under both-side watermarks, and
    drains with availableNow. The oracle is the plain batch interval
    join — a hash match proves the streaming join's time bounds and
    state semantics reproduce batch exactly."""
    from ad_data_lake_spark.streaming.incremental import streaming_attribution_join

    events = _events_slim(spark, sf_dir)
    src = os.path.join(_scratch(spark, "attr-src", sf_dir), "events")
    _stream_src_write(events, src)
    stream = streaming_attribution_join(spark, src, events.schema)
    return run_available_now(
        stream,
        f"stream_attr_{uuid.uuid4().hex[:8]}",
        output_mode="append",
        shuffle_partitions=8,
    )


def api_pages_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10/S11 as a REAL Spark source: the events fact is materialized
    as the reference's paginated JSON envelopes ({"data": [...],
    "paging": ...}, 1000 rows/page — reference
    src/extractors/api_extractor.py:87) and read back through the
    custom ``ad_api_pages`` Python DataSource, whose partitions ARE
    the pages — the reference's sequential cursor walk executed as a
    parallel scan with per-page task retry. The oracle computes the
    same projection straight from parquet, so the hash match proves
    the source's partition planning + per-page decode is lossless.
    (The page WRITER here is fixture scaffolding standing in for the
    remote API; the source/reader is the product surface.)"""
    from ad_data_lake_spark.sources import api_source

    events = _events_slim(spark, sf_dir).select(
        "event_id", "user_id", "event_type", F.round("value", 2).alias("value")
    )
    # FIXTURE-WRITER GUARD: the collect below is quarantined to the
    # synthetic page-envelope scaffolding and must never be repointed
    # at a production-scale fact — hard ceiling before any row moves
    # to the driver. (The reader side is partition-parallel; a real
    # deployment's pages come from the remote API, not this writer.)
    _PAGE_FIXTURE_MAX_ROWS = 2_000_000
    n_rows = events.count()
    if n_rows > _PAGE_FIXTURE_MAX_ROWS:
        raise ValueError(
            f"api_pages_ingest fixture writer refuses {n_rows} rows "
            f"(> {_PAGE_FIXTURE_MAX_ROWS}): this driver-side page writer is "
            "test scaffolding, not an export path — page envelopes at scale "
            "must be produced by the upstream system"
        )
    rows = [r.asDict() for r in events.collect()]
    out = os.path.join(_scratch(spark, "api-pages", sf_dir), "pages")
    n_pages = api_source.write_pages(rows, out)
    assert n_pages >= 1
    api_source.register(spark)
    return (
        spark.read.format(api_source.FORMAT_NAME)
        .schema("event_id long, user_id long, event_type string, value double")
        .load(out)
    )


def streaming_json_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-row: the schema-free dynamic-JSON sanitizer running UNDER
    Structured Streaming — drifted payloads arrive on a file stream and
    sanitize in-flight (a pure stateless projection, so the streaming
    plan is the batch plan per micro-batch: no state, no watermark).
    The oracle is the batch sanitize SQL, so the hash match proves the
    streaming path emits byte-identical canonical JSON."""
    from ad_data_lake_spark.functions.dynamic_json import sanitize_json_fragment
    from ad_data_lake_spark.operators.sanitize_queries import dynamic_json_payload

    events = _events_slim(spark, sf_dir)
    payloads = events.select(
        "event_id", dynamic_json_payload(events).alias("payload")
    )
    src = os.path.join(_scratch(spark, "json-sanitize-src", sf_dir), "payloads")
    _stream_src_write(payloads, src)
    stream = spark.readStream.schema(payloads.schema).parquet(src)
    out = stream.withColumn("sanitized", sanitize_json_fragment(F.col("payload")))
    return run_available_now(
        out, f"stream_sanitize_{uuid.uuid4().hex[:8]}", output_mode="append"
    )


JSONL_CORRUPT_MOD = 37  # every 37th doc's line is truncated (malformed)


def jsonl_corpus_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus ingest from JSONL with corrupt-record quarantine — the
    standard shape for raw web-scrape/export drops (one JSON object per
    line, some lines truncated by the producer). The fixture writes the
    documents table as JSONL and TRUNCATES every ``JSONL_CORRUPT_MOD``-th
    line (scaffolding standing in for a flaky upstream); the product
    surface is the read: ``spark.read.json`` in PERMISSIVE mode with a
    ``columnNameOfCorruptRecord`` column, malformed lines quarantined
    (status='quarantined') with the doc_id SALVAGED from the raw line
    by regex so the quarantine report is keyed, clean lines parsed.

    The DuckDB oracle derives the identical report straight from the
    parquet table and the planting rule, so the hash match proves the
    JSONL round-trip (escaping, unicode, line framing) is lossless AND
    the corrupt-path routing is exact.

    Scale: both legs are fully distributed — the writer is a
    per-partition projection (to_json + conditional truncate) through
    ``df.write.text``; the reader is Spark's native JSONL scan
    (splittable by line, schema supplied so no inference pass). No
    driver-side row handling anywhere."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    path = os.path.join(_scratch(spark, "jsonl-ingest", sf_dir), "corpus")

    line = F.to_json(F.struct("doc_id", "text"))
    # null-text guard: to_json omits null fields, so a null-text line
    # ends in the doc_id digits and truncation would corrupt the id the
    # salvage regex recovers — only corrupt lines whose tail is text
    corrupted = F.when(
        (F.col("doc_id") % JSONL_CORRUPT_MOD == 0) & F.col("text").isNotNull(),
        line.substr(F.lit(1), F.length(line) - 2),
    ).otherwise(line)
    docs.select(corrupted.alias("value")).write.mode("overwrite").text(path)

    parsed = (
        spark.read.schema("doc_id long, text string, _corrupt string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    ok = F.col("_corrupt").isNull()
    return parsed.select(
        F.coalesce(
            F.col("doc_id"),
            F.regexp_extract(F.col("_corrupt"), r'"doc_id":(\d+)', 1).cast("long"),
        ).alias("doc_id"),
        F.when(ok, F.lit("ok")).otherwise(F.lit("quarantined")).alias("status"),
        F.when(ok, F.length("text").cast("long")).alias("n_chars"),
    )
