"""Incremental-write semantics (SURVEY.md §2.9 T1–T3, §2.1 S15):
idempotent MERGE upsert and per-partition backfill over a parquet lake.

The reference's incremental contract: daily mode re-fetches only rows
with ``updated_time`` above a cutoff (reference
src/main_extractor.py:42-51,358) and re-writes whole dated folders per
backfill day (reference src/main_extractor.py:438-508) — re-running a
day must be idempotent. On Delta these are ``MERGE INTO`` and
``replaceWhere``; this container has no Delta jars, so the same
contracts are carried by an explicit bucketed + versioned layout:

- ``merge_upsert`` = **bucket-scoped MERGE**. The table lives as
  hash-bucket directories (``_mb=N``, N = pmod(xxhash64(key))) under a
  version directory, with a ``_CURRENT`` pointer file naming the live
  version. A merge reads ONLY the buckets that contain update keys
  (partition pruning on ``_mb``), last-wins-dedupes current ∪ updates
  within those buckets, writes them to a NEW version directory,
  hardlinks every untouched bucket across (O(1) per file — no data
  copied, bytes shared with the previous version), and atomically
  repoints ``_CURRENT`` (``os.replace``). Semantics = ``MERGE INTO t
  USING u ON t.id = u.id WHEN MATCHED UPDATE WHEN NOT MATCHED
  INSERT`` with a deterministic recency rule (SURVEY §7 risk register:
  Spark needs an explicit tiebreak where the reference relied on dict
  overwrite order). Cost is O(affected buckets), not O(table) — the
  Delta/Iceberg cost model — and readers resolve the pointer, so they
  see strictly old-version-or-new-version, never a partial or missing
  table. The newest ``RETAIN_VERSIONS`` versions are retained (for
  in-flight readers and ``read_version`` time travel) and everything
  older is GC'd — the snapshot-retention window every real lake tunes
  (Delta ``VERSION AS OF`` + ``VACUUM``); an ordered ``_VERSIONS``
  log records publish order so "N back" is well-defined even when a
  crashed merge leaves an orphaned directory.
- ``read_merged`` = the pointer-resolving reader (falls back to a
  plain parquet read for unbucketed directories).
- ``backfill_partitions`` = dynamic partition overwrite — only the
  partitions present in the incoming frame are replaced, everything
  else untouched: exactly ``replaceWhere`` for the written keys.

Scale notes: the MERGE shuffle is one hash partition by key (the
window dedupe) over the AFFECTED buckets only; ``n_buckets`` should
scale with table size (buckets ≈ table_bytes / target_rewrite_bytes)
so a daily merge touching k keys rewrites ~k/n_buckets of the table.
A legacy unbucketed target (plain parquet dir, no ``_CURRENT``) takes
the old full-rewrite + directory-swap path, kept as a fallback.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ad_data_lake_spark.operators.windows import last_wins_dedupe

N_MERGE_BUCKETS = 8
# target rewrite granularity: one bucket ≈ this many (pre-compression)
# bytes, so a merge touching one key rewrites ~256 MB, not the table
MERGE_BUCKET_TARGET_BYTES = 256 << 20
# versions kept on disk (current + RETAIN_VERSIONS-1 priors). The
# reference keeps EVERY dated snapshot folder (src/main_extractor.py:363);
# a real lake bounds that with a retention window — this is that knob.
RETAIN_VERSIONS = 3
_MAX_MERGE_BUCKETS = 1 << 16
_BUCKET = "_mb"
_PTR = "_CURRENT"
_NB = "_BUCKETS"
_LOG = "_VERSIONS"
_SCHEMA_FILE = "_SCHEMA.json"


def buckets_for_bytes(
    nbytes: int,
    target_bytes: int = MERGE_BUCKET_TARGET_BYTES,
    min_buckets: int = N_MERGE_BUCKETS,
) -> int:
    """Bucket count for a table of ``nbytes``: enough buckets that each
    holds ≈ ``target_bytes``, rounded UP to a power of two (stable
    doubling as tables grow), floored at the fixture default and capped
    at 2^16 (a 16 PB table at the default target — past that, raise
    ``target_bytes`` rather than multiplying directories)."""
    if nbytes <= 0:
        return min_buckets
    want = -(-nbytes // target_bytes)
    return min(_MAX_MERGE_BUCKETS, max(min_buckets, 1 << (want - 1).bit_length()))


def _estimated_plan_bytes(df: DataFrame) -> int:
    """Catalyst's sizeInBytes for the frame — file-size-derived for
    scans, a (possibly inflated) estimate otherwise. Inflation only
    OVERSIZES the bucket count, which costs directories, not
    correctness; the power-of-two rounding keeps it tame."""
    try:
        return int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:
        return 0


def _stored_buckets(target_path: str) -> int | None:
    try:
        with open(os.path.join(target_path, _NB)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


def _bucket_expr(key: str, n_buckets: int):
    """Deterministic bucket id for a merge key. Cast-to-string first so
    the bucket of a key never depends on its physical type; xxhash64 is
    stable across sessions/versions (recomputes agree at any time)."""
    return F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(n_buckets)).cast("int")


def _current_version(target_path: str) -> str | None:
    try:
        with open(os.path.join(target_path, _PTR)) as f:
            return f.read().strip() or None
    except FileNotFoundError:
        return None


def _version_history(target_path: str) -> list[str]:
    """Ordered publish history (oldest first) from the ``_VERSIONS``
    log. A pre-log (legacy) table reconstructs a best-effort history
    from the directory listing — under the old 1-deep retention at
    most one non-current dir exists, so the order is unambiguous."""
    try:
        with open(os.path.join(target_path, _LOG)) as f:
            return [line.strip() for line in f if line.strip()]
    except FileNotFoundError:
        current = _current_version(target_path)
        if current is None:
            return []
        priors = sorted(
            d
            for d in os.listdir(target_path)
            if d.startswith("v-") and d != current
        )
        return priors + [current]


def _published_history(target_path: str, current: str | None) -> list[str]:
    """The version log truncated at the ``_CURRENT`` pointer. A merge
    that crashed between the log append and the pointer flip leaves a
    never-published tail in ``_VERSIONS``; every consumer that reasons
    about "prior versions" (time travel, vacuum, the next publish)
    must ignore that tail — it was never current, so it is not a
    readable prior, just an orphan directory awaiting GC."""
    history = _version_history(target_path)
    if current is not None and current in history:
        history = history[: history.index(current) + 1]
    return history


def _write_atomic(target_path: str, name: str, content: str) -> None:
    tmp = os.path.join(target_path, f".{name}.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        f.write(content)
    os.replace(tmp, os.path.join(target_path, name))


def _save_schema(version_dir: str, schema: StructType) -> None:
    """Persist the logical schema next to the data so an all-tombstone
    version (zero part files) still reads back as an EMPTY table with
    the right columns instead of a schema-inference error."""
    os.makedirs(version_dir, exist_ok=True)
    with open(os.path.join(version_dir, _SCHEMA_FILE), "w") as f:
        f.write(schema.json())


def _read_version_dir(spark: SparkSession, version_dir: str) -> DataFrame:
    """Read one version directory. mergeSchema: after a schema-evolving
    merge the hardlinked untouched buckets still hold the old column
    set; merged-footer reading surfaces evolved columns as nulls there
    (exactly Delta's read behavior for files predating an ADD COLUMN).
    A version with no bucket directories (every key tombstoned) reads
    as an empty frame from the persisted schema."""
    has_data = any(
        d.startswith(f"{_BUCKET}=") for d in os.listdir(version_dir)
    )
    if not has_data:
        with open(os.path.join(version_dir, _SCHEMA_FILE)) as f:
            schema = StructType.fromJson(json.load(f))
        return spark.createDataFrame([], schema)
    return (
        spark.read.option("mergeSchema", "true").parquet(version_dir).drop(_BUCKET)
    )


def read_merged(spark: SparkSession, target_path: str) -> DataFrame:
    """Resolve the ``_CURRENT`` pointer and read the live version.
    Readers never observe a mid-merge state: the pointer flips
    atomically (``os.replace``) from one complete version directory to
    another. Unbucketed legacy directories read as plain parquet."""
    version = _current_version(target_path)
    if version is None:
        return spark.read.parquet(target_path)
    return _read_version_dir(spark, os.path.join(target_path, version))


def _link_tree(src: str, dst: str) -> None:
    """Hardlink a bucket directory into the new version (fall back to
    copy on filesystems without link support). Linked files share
    bytes with — and are trivially byte-identical to — the previous
    version's files."""
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        tgt = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(tgt, exist_ok=True)
        for f in files:
            try:
                os.link(os.path.join(root, f), os.path.join(tgt, f))
            except OSError:
                shutil.copy2(os.path.join(root, f), os.path.join(tgt, f))


def _publish(
    target_path: str, new_version: str, retain: int = RETAIN_VERSIONS
) -> None:
    """Append ``new_version`` to the ordered version log, atomically
    repoint ``_CURRENT``, and GC versions past the retention window
    (the newest ``retain`` versions — current plus ``retain - 1``
    priors — stay readable via ``read_version``). Write order is
    log → pointer → GC, so a crash at any boundary leaves the table
    consistent: an unpointed log tail is just an orphaned directory
    the next publish GCs, never a dangling pointer. The history this
    publish extends is truncated at the CURRENT pointer first, so a
    prior crash's never-published tail is dropped from the log (and
    its directory GC'd below) instead of surviving as a readable
    'prior' ahead of the version it never superseded."""
    history = [
        v
        for v in _published_history(target_path, _current_version(target_path))
        if v != new_version
    ]
    history.append(new_version)
    kept = history[-max(1, retain):]
    _write_atomic(target_path, _LOG, "\n".join(kept) + "\n")
    _write_atomic(target_path, _PTR, new_version)
    retain_set = set(kept)
    for d in os.listdir(target_path):
        if d.startswith("v-") and d not in retain_set:
            shutil.rmtree(os.path.join(target_path, d), ignore_errors=True)


def _apply_bucketed(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    key: str,
    order_col: str,
    tiebreak: str,
    n_buckets: int | None,
    delete_col: str | None,
) -> None:
    """Shared bucket-scoped write core for MERGE and CDC-apply: resolve
    the bucket count (stored layout wins; first write sizes from the
    batch), last-wins-dedupe current ∪ batch within the TOUCHED buckets
    only, optionally drop tombstoned keys (``delete_col``), write a new
    version, hardlink untouched buckets, persist the count, publish."""

    def finalize(deduped: DataFrame) -> DataFrame:
        if delete_col is None:
            return deduped
        return deduped.where(~F.col(delete_col)).drop(delete_col)

    prev_version = _current_version(target_path)
    if prev_version is None and os.path.isdir(target_path) and os.listdir(target_path):
        # legacy unbucketed parquet directory: full-rewrite fallback
        current = spark.read.option("mergeSchema", "true").parquet(target_path)
        if delete_col is not None:
            current = current.withColumn(delete_col, F.lit(False))
        deduped = finalize(
            last_wins_dedupe(
                current.unionByName(batch, allowMissingColumns=True),
                key,
                order_col,
                tiebreak,
            )
        )
        staging = f"{target_path}.staging-{uuid.uuid4().hex[:8]}"
        deduped.write.mode("overwrite").parquet(staging)
        old = f"{target_path}.old-{uuid.uuid4().hex[:8]}"
        os.rename(target_path, old)
        os.rename(staging, target_path)
        shutil.rmtree(old)
        return

    stored = _stored_buckets(target_path)
    if prev_version is not None:
        # layout-bound: a pre-knob table stored nothing and was always
        # written with the fixture default
        n_buckets = stored if stored is not None else N_MERGE_BUCKETS
    elif n_buckets is None:
        n_buckets = buckets_for_bytes(_estimated_plan_bytes(batch))

    batch_b = batch.withColumn(_BUCKET, _bucket_expr(key, n_buckets))
    new_version = f"v-{uuid.uuid4().hex[:8]}"
    new_dir = os.path.join(target_path, new_version)

    if prev_version is None:
        # first write: every bucket materializes
        deduped = finalize(last_wins_dedupe(batch_b, key, order_col, tiebreak))
        deduped.repartition(_BUCKET).write.partitionBy(_BUCKET).parquet(new_dir)
    else:
        cur_dir = os.path.join(target_path, prev_version)
        # the touched-bucket set is bounded by n_buckets, never by data
        # volume — a cheap partial-aggregate job over the (small)
        # batch side, collected so the planner can PRUNE the target
        # scan to exactly those _mb= directories
        touched = {r[0] for r in batch_b.select(_BUCKET).distinct().collect()}
        touched_dirs = [
            os.path.join(cur_dir, f"{_BUCKET}={b}")
            for b in sorted(touched)
            if os.path.isdir(os.path.join(cur_dir, f"{_BUCKET}={b}"))
        ]
        if touched_dirs:
            # mergeSchema is REQUIRED here: after a schema-evolving
            # merge the version holds mixed footers (rewritten buckets
            # carry evolved columns, hardlinked ones don't) — a single-
            # footer inference could silently drop an evolved column
            # from the rewrite. basePath-scoped listing keeps the
            # footer merge O(touched buckets), not O(table).
            affected = (
                spark.read.option("mergeSchema", "true")
                .option("basePath", cur_dir)
                .parquet(*touched_dirs)
            )
        else:
            affected = spark.createDataFrame(
                [], batch_b.drop(*([delete_col] if delete_col else [])).schema
            )
        if delete_col is not None:
            affected = affected.withColumn(delete_col, F.lit(False))
        # allowMissingColumns = schema evolution: the batch may ADD
        # columns (old rows read as null via read_merged's mergeSchema)
        # and rewritten buckets may carry columns a given batch
        # doesn't know about
        deduped = finalize(
            last_wins_dedupe(
                affected.unionByName(batch_b, allowMissingColumns=True),
                key,
                order_col,
                tiebreak,
            )
        )
        deduped.repartition(_BUCKET).write.partitionBy(_BUCKET).parquet(new_dir)
        for d in os.listdir(cur_dir):
            if d.startswith(f"{_BUCKET}=") and int(d.split("=", 1)[1]) not in touched:
                _link_tree(os.path.join(cur_dir, d), os.path.join(new_dir, d))
    _save_schema(new_dir, deduped.drop(_BUCKET).schema)
    if _stored_buckets(target_path) != n_buckets:
        _write_atomic(target_path, _NB, str(n_buckets))
    _publish(target_path, new_version)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: str,
    order_col: str,
    tiebreak: str,
    n_buckets: int | None = None,
) -> None:
    """Idempotent bucket-scoped upsert: rows in ``updates`` win over
    the current table when newer by (order_col, tiebreak); unseen keys
    insert. Applying the same updates twice yields an identical table.
    Only buckets containing update keys are rewritten; every other
    bucket's files carry over by hardlink, untouched.

    ``n_buckets=None`` (default) resolves the bucket count: an existing
    table's stored count always wins (the bucket function is part of
    the layout — changing it would scatter keys across old buckets), a
    first write sizes from the incoming frame via ``buckets_for_bytes``
    so the count GROWS with data instead of pinning the fixture's 8.
    The resolved count is persisted next to ``_CURRENT``."""
    _apply_bucketed(
        spark, target_path, updates, key, order_col, tiebreak, n_buckets, None
    )


def backfill_partitions(
    df_slice: DataFrame,
    target_path: str,
    partition_cols: tuple[str, ...] = ("snapshot_date",),
) -> None:
    """T2: per-day (per-partition) backfill. Dynamic partition
    overwrite replaces only the partitions present in ``df_slice`` —
    the ``replaceWhere``-style idempotent re-run of one day. The
    overwrite mode is passed as a writer option so the session conf is
    never mutated."""
    (
        df_slice.repartition(*partition_cols)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(target_path)
    )


DELETE_COL = "_deleted"


def cdc_apply(
    spark: SparkSession,
    target_path: str,
    changes: DataFrame,
    key: str,
    order_col: str,
    tiebreak: str,
    n_buckets: int | None = None,
    delete_col: str = DELETE_COL,
) -> None:
    """Apply a CDC change stream (upserts + DELETE tombstones) to the
    bucketed table: per key the LATEST change wins (same (order_col,
    tiebreak) recency rule as ``merge_upsert``); if that winner is a
    tombstone the key is REMOVED from the table, otherwise it upserts.
    Idempotent like MERGE — replaying the same change batch leaves the
    table byte-identical — which is what makes an at-least-once CDC
    feed (Debezium-style) safe to apply.

    Built ON the bucket machinery, not beside it (``_apply_bucketed``):
    current rows enter the dedupe carrying ``delete_col=false``, so one
    last-wins window + one tombstone filter computes the final state of
    the AFFECTED buckets only; untouched buckets hardlink over exactly
    as in ``merge_upsert``. A tombstone for an absent key is a no-op
    (the filter drops it), matching MERGE's WHEN-NOT-MATCHED-AND-DELETE
    semantics."""
    _apply_bucketed(
        spark, target_path, changes, key, order_col, tiebreak, n_buckets, delete_col
    )


def read_version(
    spark: SparkSession, target_path: str, steps_back: int = 0
) -> DataFrame:
    """Time travel: read the table as of ``steps_back`` merges ago
    (0 = current) — ``VERSION AS OF`` on the versioned layout. The
    version is resolved from the ordered ``_VERSIONS`` log relative to
    the ``_CURRENT`` pointer (never from directory-listing order, which
    a crashed merge's orphan dir would scramble), so "previous" is
    always the version the last publish actually superseded. Depth is
    bounded by the ``RETAIN_VERSIONS`` retention window; past it the
    version is GC'd and this raises — the reference instead retains
    every dated snapshot folder forever (src/main_extractor.py:363),
    which is this layout with retention = ∞."""
    current = _current_version(target_path)
    if current is None:
        raise ValueError(f"{target_path} is not a versioned (bucketed) table")
    if steps_back < 0:
        raise ValueError(f"steps_back must be >= 0, got {steps_back}")
    if steps_back == 0:
        return _read_version_dir(spark, os.path.join(target_path, current))
    # truncated-at-current history: a crashed merge's unpointed log
    # tail is never resolvable as a prior version
    history = _published_history(target_path, current)
    try:
        idx = history.index(current) - steps_back
    except ValueError:
        raise ValueError(f"{target_path}: version log does not list {current}")
    if idx < 0:
        raise ValueError(
            f"{target_path} retains no version {steps_back} back "
            f"(history depth {history.index(current) + 1})"
        )
    vdir = os.path.join(target_path, history[idx])
    if not os.path.isdir(vdir):
        raise ValueError(f"{target_path}: version {history[idx]} was GC'd")
    return _read_version_dir(spark, vdir)


def read_previous(spark: SparkSession, target_path: str) -> DataFrame:
    """The table as of just before the last merge — the rollback/audit
    read; sugar for ``read_version(..., steps_back=1)``."""
    return read_version(spark, target_path, steps_back=1)


def vacuum(target_path: str, retain: int = 1) -> list[str]:
    """Explicit retention tightening — the ``VACUUM`` analog: keep only
    the newest ``retain`` versions (the current version is always
    kept), truncate the ``_VERSIONS`` log to match, delete the rest.
    Returns the removed version names. Complements the automatic
    per-publish window: a pipeline that just finished an audited
    backfill calls this to reclaim the space early instead of waiting
    ``RETAIN_VERSIONS`` more merges."""
    current = _current_version(target_path)
    if current is None:
        raise ValueError(f"{target_path} is not a versioned (bucketed) table")
    # Truncate at the pointer BEFORE applying the retention window: a
    # crashed merge's unpointed log tail must be GC'd as the orphan it
    # is, never retained ahead of current as a readable 'prior'.
    history = _published_history(target_path, current)
    kept = history[-max(1, retain):]
    if current not in kept:
        kept = kept + [current]
    _write_atomic(target_path, _LOG, "\n".join(kept) + "\n")
    removed = []
    keep_set = set(kept)
    for d in os.listdir(target_path):
        if d.startswith("v-") and d not in keep_set:
            shutil.rmtree(os.path.join(target_path, d), ignore_errors=True)
            removed.append(d)
    return sorted(removed)


def lake_stats(target_path: str) -> dict:
    """Table-inspection utility (DESCRIBE DETAIL analog): version
    history, live-version file/byte/bucket counts, and how many bytes
    the live version SHARES with prior versions via hardlinks (the
    observable form of the O(affected-buckets) merge cost). Pure
    driver-side directory walk — no Spark job."""
    current = _current_version(target_path)
    if current is None:
        n_files = n_bytes = 0
        for root, _dirs, files in os.walk(target_path):
            for f in files:
                if f.endswith(".parquet"):
                    n_files += 1
                    n_bytes += os.path.getsize(os.path.join(root, f))
        return {
            "versioned": False,
            "n_files": n_files,
            "n_bytes": n_bytes,
        }
    history = _version_history(target_path)
    vdir = os.path.join(target_path, current)
    n_files = n_bytes = shared_bytes = 0
    buckets = set()
    for root, _dirs, files in os.walk(vdir):
        b = os.path.basename(root)
        if b.startswith(f"{_BUCKET}="):
            buckets.add(b)
        for f in files:
            if not f.endswith(".parquet"):
                continue
            st = os.stat(os.path.join(root, f))
            n_files += 1
            n_bytes += st.st_size
            if st.st_nlink > 1:  # hardlinked into other versions
                shared_bytes += st.st_size
    return {
        "versioned": True,
        "current_version": current,
        "n_versions": len(history),
        "version_history": history,
        "n_buckets": _stored_buckets(target_path),
        "n_bucket_dirs": len(buckets),
        "n_files": n_files,
        "n_bytes": n_bytes,
        "shared_bytes": shared_bytes,
    }
