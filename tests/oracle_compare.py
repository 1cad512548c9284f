"""Order-insensitive Spark↔DuckDB result comparison, mimicking the
driver's correctness gate (row-count + schema + value-hash with columns
sorted by name). Used by the parity tests for every registry query.
"""

from __future__ import annotations

import math
from datetime import datetime

import pandas as pd


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        # full shortest-round-trip repr: the driver's value hash does NOT
        # absorb float-vs-int or last-ulp drift (CORRECTNESS_r03 caught
        # DuckDB HUGEINT sums arriving as float64 while the old 6-decimal
        # truncation here hid them), so the local gate must be as strict.
        return repr(v)
    if isinstance(v, pd.Timestamp) or isinstance(v, datetime):
        return pd.Timestamp(v).tz_localize(None).isoformat() if pd.Timestamp(v).tzinfo else pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, (int,)):
        return str(v)
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows)


def _reject_list_cells(pdf: pd.DataFrame, name: str, side: str) -> None:
    # Driver-canon fidelity: the driver's pandas canonicalizer sorts /
    # hashes raw cell values and dies on unhashable list cells
    # (CORRECTNESS_r05 neardup_clusters). Registry queries must
    # serialize array outputs (to_json) — fail locally the way the
    # driver would instead of silently absorbing lists in _canon_cell.
    for col in pdf.columns:
        s = pdf[col].dropna()
        if len(s) == 0:
            continue
        v = s.iloc[0]
        if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
            raise AssertionError(
                f"{name}: {side} column {col!r} holds raw array cells; "
                "serialize with to_json — the driver gate cannot hash lists"
            )


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    _reject_list_cells(spark_pdf, name, "spark")
    _reject_list_cells(duck_pdf, name, "oracle")
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    s_rows, d_rows = canon_rows(spark_pdf), canon_rows(duck_pdf)
    mism = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: spark={s_rows[mism[0]]} duck={d_rows[mism[0]]}"
    )
