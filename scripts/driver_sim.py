"""Simulate the driver's verify gate end-to-end.

Uses a PLAIN SparkSession (none of our session.py tuning) exactly as the
driver would, runs entry() at sf0.001, then every queries() entry at
sf0.01 side-by-side with its oracle_sql() in DuckDB, comparing row count,
column set, and order-insensitive canonical values.

Usage: python scripts/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod
from tests.oracle_compare import canon_rows

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

print("== entry() smoke ==")
edf = entrymod.entry(spark)
rows = edf.count()
print(f"entry rows={rows} schema={[f'{f.name}:{f.dataType.simpleString()}' for f in edf.schema.fields]}")
assert rows > 0

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events documents embeddings".split()):
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs = entrymod.queries()
oracles = entrymod.oracle_sql()
fail = 0
for name, fn in qs.items():
    sdf = fn(spark, SF).toPandas()
    if name not in oracles:
        print(f"{name:28s} ROWS-ONLY rows={len(sdf)}")
        continue
    ddf = con.execute(oracles[name]).fetchdf()
    status = "OK"
    if sorted(sdf.columns) != sorted(ddf.columns):
        status = f"SCHEMA-MISMATCH {sorted(sdf.columns)} vs {sorted(ddf.columns)}"
    elif len(sdf) != len(ddf):
        status = f"ROWCOUNT {len(sdf)} vs {len(ddf)}"
    else:
        s, d = canon_rows(sdf), canon_rows(ddf)
        bad = [i for i, (a, b) in enumerate(zip(s, d)) if a != b]
        if bad:
            status = f"VALUE-MISMATCH {len(bad)} rows; first spark={s[bad[0]]} duck={d[bad[0]]}"
    if status != "OK":
        fail += 1
    print(f"{name:28s} rows={len(sdf):6d} {status}")

print(f"\n{'ALL MATCH' if fail == 0 else f'{fail} FAILURES'} over {len(qs)} queries at {SF}")
sys.exit(1 if fail else 0)
