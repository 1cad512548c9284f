"""Custom stateful streaming operator: continuous per-user frequency
capping via ``applyInPandasWithState`` (SURVEY.md §2.9/§2.10).

The batch cap (``operators.sessions.frequency_cap``) ranks a bounded
table; in production impressions arrive continuously and the cap must
hold ACROSS micro-batches — a per-user counter that outlives any one
batch. That is exactly Spark's arbitrary-stateful-processing surface:
group the stream by user, keep one integer of state per user, emit each
impression with its running number and capped flag.

Scale notes:
- state is one long per user key — the state store stays tiny at any
  impression volume, no watermark needed for correctness (the cap is
  monotone; a timeout could expire idle users to bound the store);
- the groupBy(user_id) state shuffle is the same key layout as the
  batch windows, so a user_id-bucketed fact co-locates both;
- rows within a micro-batch are materialized and ordered ONCE inside
  the function (a user's rows can span multiple Arrow chunks, which
  carry no order guarantee — per-chunk sorting would misnumber), so
  stream and batch agree exactly whenever event-time arrival respects
  batch boundaries. A user's per-batch row count must fit in one
  worker's memory; at ad-impression rates that is thousands of rows,
  far below Arrow chunk sizing concerns.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ad_data_lake_spark.operators.sessions import FREQUENCY_CAP

_OUT_SCHEMA = (
    "event_id bigint, user_id bigint, ts timestamp, impression_no int, capped boolean"
)
_STATE_SCHEMA = "seen int"


def _cap_fn(cap: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (seen,) = state.get if state.exists else (0,)
        # Materialize the whole group first: one user's rows can span
        # several Arrow chunks, and numbering chunks independently after
        # per-chunk sorts would diverge from the batch frequency_cap.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
            n = len(pdf)
            nums = pd.RangeIndex(seen + 1, seen + n + 1).to_numpy()
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"].to_numpy(),
                    "user_id": pdf["user_id"].to_numpy(),
                    "ts": pdf["ts"].to_numpy(),
                    "impression_no": nums.astype("int32"),
                    "capped": nums > cap,
                }
            )
            seen += n
        state.update((seen,))

    return fn


def streaming_frequency_cap(stream_events: DataFrame, cap: int = FREQUENCY_CAP) -> DataFrame:
    """readStream-side frequency cap: one state row per user, updated
    per micro-batch, impressions emitted with running number + flag."""
    return (
        stream_events.select("event_id", "user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _cap_fn(cap),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_sessionize(
    stream_events: DataFrame, gap_minutes: int | None = None
) -> DataFrame:
    """Native streaming sessionization: the SAME session_window
    aggregate as the batch operator (operators/sessions.py::
    sessionize_native), plus a watermark so closed sessions emit and
    their state evicts. State per open session only — the operator a
    lake needs to maintain live session rollups at event-time scale."""
    from pyspark.sql import functions as F

    from ad_data_lake_spark.operators import sessions as S

    gap = gap_minutes if gap_minutes is not None else S.SESSION_GAP_MINUTES
    sw = F.session_window("ts", f"{gap} minutes")
    return (
        stream_events.withWatermark("ts", "1 day")
        .groupBy(sw.alias("sw"), F.col("user_id"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
    )
