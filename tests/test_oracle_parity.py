"""Every registry query must hash-match its DuckDB oracle — the local
mirror of the driver's t2 correctness gate (at sf0.001 for speed; the
driver runs sf0.01).
"""

from __future__ import annotations

import pytest

from ad_data_lake_spark.queries import REGISTRY
from tests.conftest import SF_ORACLE
from tests.oracle_compare import assert_frames_match

ORACLED = [n for n, s in REGISTRY.items() if s.oracle is not None]
ROWS_ONLY = [n for n, s in REGISTRY.items() if s.oracle is None]


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, SF_ORACLE).toPandas()
    duck_pdf = duck.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = {q for q in e.queries()}
    assert set(e.oracle_sql()) <= names


def test_driver_priority_tuple_invariants():
    """The rotation tuple the driver-facing ordering is built from:
    no duplicates (a dupe silently shrinks the 50-slot window), every
    name resolves to a registry entry (a typo would silently drop the
    row to the unordered tail), and the window leads with rows that
    have an oracle (rows-only entries get weaker checks and should not
    occupy priority slots)."""
    from ad_data_lake_spark.queries import REGISTRY, _DRIVER_PRIORITY

    assert len(set(_DRIVER_PRIORITY)) == len(_DRIVER_PRIORITY)
    unknown = [n for n in _DRIVER_PRIORITY if n not in REGISTRY]
    assert not unknown, f"priority names missing from registry: {unknown}"
    window = _DRIVER_PRIORITY[:50]
    no_oracle = [n for n in window if REGISTRY[n].oracle is None]
    assert not no_oracle, f"rows-only entries in the 50-slot window: {no_oracle}"
