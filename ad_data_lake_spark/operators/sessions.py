"""Sessionization and frequency capping over the events fact.

Neither exists verbatim in the reference (its insights arrive
pre-aggregated from the API, including `frequency`, reference
src/configs/fields_schema.py:219); these are the engine-side operators
a lake needs to *produce* those metrics from raw impressions:

- ``sessionize``: gap-based sessions per user — lag() boundary flag,
  running sum as session number, then one aggregate per session. Two
  window passes over the SAME (user_id, ts) partitioning + ordering, so
  Catalyst plans one exchange + one sort, and the follow-up groupBy on
  (user_id, session_no) reuses the partitioning.
- ``frequency_cap``: the ad-serving cap — only the first N impressions
  per user count; row_number() within user, flag the overflow. The
  streaming form (continuous cap state across micro-batches) lives in
  ``streaming/stateful.py`` via applyInPandasWithState.

Scale: both partition by user_id — high-cardinality, naturally
well-spread; no global sort anywhere. At 100 TB you'd bucket the events
fact by user_id so these windows (and the streaming state shuffle)
co-locate with the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MINUTES = 30
FREQUENCY_CAP = 5


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Per-user gap sessions: a new session starts when the gap from
    the previous event exceeds ``gap_minutes``. Output: one row per
    session with start/end/size/value."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    # exact microsecond arithmetic (unix_micros ↔ DuckDB epoch_us) — a
    # seconds-floor comparison would disagree across engines on
    # sub-second gaps around the boundary
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)
    is_new = prev_ts.isNull() | (gap_us > gap_minutes * 60 * 1_000_000)
    sess_no = F.sum(is_new.cast("int")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.withColumn("session_no", sess_no)
        .groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def frequency_cap(events: DataFrame, cap: int = FREQUENCY_CAP) -> DataFrame:
    """Batch frequency cap: rank each user's impressions by time and
    flag everything past the cap. Deterministic (event_id tiebreak)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rn = F.row_number().over(w)
    return events.select(
        "event_id",
        "user_id",
        "ts",
        rn.alias("impression_no"),
        (rn > cap).alias("capped"),
    )


def sessionize_native(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES
) -> DataFrame:
    """Gap sessions via Spark's native ``session_window`` aggregate —
    the preferred scale shape: ONE aggregate (no lag/running-sum window
    passes, no per-partition sort-then-scan twice), and the same
    operator runs unchanged under Structured Streaming with a watermark
    (see streaming/stateful.py::streaming_sessionize).

    Boundary semantics differ from ``sessionize`` by the open interval:
    session_window closes a session when the next gap is >= the
    timeout (window [ts, ts+gap) no longer overlaps), while the lag()
    formulation starts a new session strictly past it (> gap). The
    oracle SQL mirrors >= — with microsecond-random timestamps the two
    agree except on exact-boundary gaps."""
    sw = F.session_window("ts", f"{gap_minutes} minutes")
    return (
        events.groupBy(sw.alias("sw"), F.col("user_id"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
    )
