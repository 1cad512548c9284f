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


@pytest.fixture(scope="module")
def action_view_session(spark):
    from ad_data_lake_spark.sql import ACTION_VIEWS, register_sql_surface

    register_sql_surface(spark, SF_ORACLE, views=ACTION_VIEWS)
    return spark


def _action_views():
    from ad_data_lake_spark.sql import ACTION_VIEWS

    return list(ACTION_VIEWS)


@pytest.mark.parametrize("name", _action_views())
def test_action_view_sql_output_matches_oracle(action_view_session, duck, name):
    """The 26 opt-in ACTION_VIEWS, checked at the SQL SURFACE: the
    registered view's ``SELECT *`` must hash-match the same oracle the
    underlying DataFrame does. The registry parity test proves the
    DataFrame; this proves view registration (name binding, analyzer
    resolution over the temp catalog) adds no drift between the SQL
    user's result and the verified plan."""
    spec = REGISTRY[name]
    assert spec.oracle is not None, f"{name}: action view without an oracle"
    spark_pdf = action_view_session.sql(f"SELECT * FROM {name}").toPandas()
    duck_pdf = duck.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, duck_pdf, f"view:{name}")


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
    # rows-only rows get a weaker driver check, so they should occupy
    # window slots only when ROTATION demands it (every name must
    # appear in the union of recent correctness files) — and only the
    # two by-design rows-only entries qualify (engine-internal HLL
    # bytes / xxhash64 not reproducible in DuckDB; both pytest-pinned)
    rows_only_ok = {"reach_sketch_rollup", "dedup_minhash_lsh_xx"}
    no_oracle = [
        n for n in window if REGISTRY[n].oracle is None and n not in rows_only_ok
    ]
    assert not no_oracle, f"rows-only entries in the 50-slot window: {no_oracle}"


def test_latent_input_parity_nulls_tabs_zero_vectors(spark, tmp_path):
    """Spark-vs-DuckDB parity on the inputs absent from the driver
    fixtures but plausible in regenerated corpora: text with leading
    tab / trailing newline (space-only trim semantics), NULL text
    (null-propagating scrub, un-corruptable JSONL lines), and an
    exact-zero embedding (eps-floored quantized cosine on BOTH sides).
    Pins the round-7 review fixes so a fixture regeneration can't
    surface them as driver reds."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as entrymod
    from tests.oracle_compare import canon_rows

    docs = pd.DataFrame(
        {
            "doc_id": list(range(80)),
            "text": [
                "\tthe fast key order sort table scan merge part window\n"
                if i % 7 == 0
                else None
                if i % 37 == 0 and i > 0
                else f"spark group query row data slow small filter batch value t{i % 13} extra{i % 29}"
                for i in range(80)
            ],
            "lang": ["en"] * 80,
            "source": ["web"] * 80,
        }
    )
    rng = np.random.RandomState(7)
    emb = pd.DataFrame(
        {
            "vec_id": list(range(40)),
            "embedding": [
                [0.0] * 64 if i == 9 else list(rng.randn(64).astype(np.float32))
                for i in range(40)
            ],
            "label": [i % 4 for i in range(40)],
        }
    )
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(docs), f"{sf}/documents.parquet")
    pq.write_table(pa.Table.from_pandas(emb), f"{sf}/embeddings.parquet")

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in ("jsonl_corpus_ingest", "embed_topk_int8", "rare_token_scrub"):
        sdf = qs[name](spark, sf).toPandas()
        ddf = con.execute(oracles[name]).fetchdf()
        assert sorted(sdf.columns) == sorted(ddf.columns), name
        assert len(sdf) == len(ddf), (name, len(sdf), len(ddf))
        s, d = canon_rows(sdf), canon_rows(ddf)
        bad = [i for i, (a, b) in enumerate(zip(s, d)) if a != b]
        assert not bad, (name, s[bad[0]], d[bad[0]])
    con.close()
