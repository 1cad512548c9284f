"""Scale-crossover bench: time the flagged >2x-of-DuckDB queries at a
REPLICATED scale factor and print the sf0.1 -> sfN ratio trajectory.

Motivation (VERDICT r6): eleven LLM-layer rows run 2-8x DuckDB at
sf0.1, which REPORT.md attributes to Spark's ~0.2 s/stage scheduling
floor at fixture scale. That claim is an extrapolation until the same
queries are timed at a scale where the floor stops dominating. This
script builds that scale:

- Fixture: documents/embeddings replicated REP x from sf0.1 into
  ``<repo>/.scale_fixture/sf<sf>`` (other tables symlinked). Replica
  i != 0 rewrites every token with an ``_i`` suffix (documents) /
  shifts the vector by a per-replica constant (embeddings), so
  replicas share NO shingles with each other or the original — the
  dup/near-dup structure of sf0.1 is reproduced 10x in parallel rather
  than turned into artificial 10-deep duplicate clusters, and ids/
  labels are remapped densely (doc_id*REP+i) so every id-derived
  split (benchmark_mod, dataset splits, query_mod) keeps its sf0.1
  proportions. Both engines read the SAME files, so the ratio is
  apples-to-apples whatever the generator's quirks.
- Timing: identical discipline to bench.py / fill_baseline.py — noop
  sink for Spark, fetchall for DuckDB, warm pass discarded, min of two
  timed passes.

Usage: python scripts/bench_scale.py [--rep 10] [--queries a,b,c]
Prints one JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SRC_DIR = "/root/testdata/sf0.1"

# The eleven rows graded `weak` in VERDICT r6 (>2x DuckDB at >=0.9 s).
WEAK_ROWS = [
    "exact_substring_dedup",
    "cross_split_leakage",
    "dedup_minhash_lsh",
    "boilerplate_removal",
    "bigram_lm_score",
    "embed_topk_ivf",
    "contamination_check",
    "bloom_decontaminate",
    "semantic_dedup",
    "dsir_weights",
    "dedup_simhash",
]


def build_fixture(rep: int) -> str:
    sf = round(0.1 * rep, 4)
    dst = REPO / ".scale_fixture" / f"sf{sf}"
    done = dst / "_DONE"
    if done.exists():
        return str(dst)
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    # documents: token-suffix rewrite decorrelates replicas' shingles
    con.execute(
        f"""
        COPY (
          WITH r AS (SELECT unnest(range({rep})) AS i),
               s AS (
            SELECT d.doc_id * {rep} + r.i AS doc_id,
                   CASE WHEN r.i = 0 THEN d.text
                        ELSE array_to_string(
                               list_transform(string_split(d.text, ' '),
                                              w -> w || '_' || r.i), ' ')
                   END AS text,
                   d.lang, d.source
            FROM read_parquet('{SRC_DIR}/documents.parquet') d CROSS JOIN r)
          SELECT doc_id, text, lang, source, length(text) AS n_chars
          FROM s ORDER BY doc_id
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
        """
    )
    # embeddings: constant per-replica shift (cheap, deterministic);
    # labels remap densely so per-bucket sizes stay sf0.1-sized — the
    # LINEAR scale path for bucketed pairwise operators
    con.execute(
        f"""
        COPY (
          WITH r AS (SELECT unnest(range({rep})) AS i)
          SELECT e.vec_id * {rep} + r.i AS vec_id,
                 CASE WHEN r.i = 0 THEN e.embedding
                      ELSE list_transform(e.embedding,
                             x -> CAST(x + ((r.i * 7) % 19 - 9) * 0.001
                                       AS FLOAT))
                 END AS embedding,
                 CAST(e.label * {rep} + r.i AS INTEGER) AS label
          FROM read_parquet('{SRC_DIR}/embeddings.parquet') e CROSS JOIN r
          ORDER BY vec_id
        ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    for f in os.listdir(SRC_DIR):
        if f.endswith(".parquet") and not (dst / f).exists():
            os.symlink(os.path.join(SRC_DIR, f), dst / f)
    done.touch()
    return str(dst)


def duckdb_timings(sf_dir: str, names: list[str]) -> dict[str, float]:
    from ad_data_lake_spark.queries import REGISTRY
    from ad_data_lake_spark.sources.tables import TABLE_NAMES

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    out: dict[str, float] = {}
    for name in names:
        sql = REGISTRY[name].oracle
        con.execute(sql).fetchall()  # warm
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            el = time.perf_counter() - t0
            out[name] = min(out.get(name, el), el)
    con.close()
    return out


def spark_timings(sf_dir: str, names: list[str]) -> dict[str, float]:
    from ad_data_lake_spark.queries import REGISTRY
    from ad_data_lake_spark.session import get_spark

    spark = get_spark("bench-scale")
    spark.sparkContext.setLogLevel("ERROR")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    for name in names:
        mat(REGISTRY[name].fn(spark, sf_dir))  # warm
    out: dict[str, float] = {}
    for _ in range(2):
        for name in names:
            t0 = time.perf_counter()
            mat(REGISTRY[name].fn(spark, sf_dir))
            el = time.perf_counter() - t0
            out[name] = min(out.get(name, el), el)
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=10)
    ap.add_argument("--queries", type=str, default=",".join(WEAK_ROWS))
    args = ap.parse_args()
    names = [q for q in args.queries.split(",") if q]

    sf_dir = build_fixture(args.rep)
    sf = round(0.1 * args.rep, 4)
    duck = duckdb_timings(sf_dir, names)
    spark = spark_timings(sf_dir, names)

    rows = []
    for n in names:
        d, s = duck[n], spark[n]
        rows.append((n, round(d, 3), round(s, 3), round(s / d, 2) if d else None))
    print(f"\n| Query | DuckDB sf{sf} (s) | Spark sf{sf} (s) | Ratio |")
    print("|---|---|---|---|")
    for n, d, s, r in rows:
        print(f"| {n} | {d} | {s} | {r}x |")
    print(
        json.dumps(
            {
                "sf": sf,
                "rep": args.rep,
                "duckdb": duck,
                "spark": spark,
                "ratios": {n: r for n, _, _, r in rows},
            }
        )
    )


if __name__ == "__main__":
    main()
