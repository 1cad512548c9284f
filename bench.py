"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing = full query execution via the JVM-side noop sink
(``df.write.format("noop")``) so every row is produced but nothing
crosses to Python and nothing hits disk. Every query is warmed once
(full first pass) before the timed second pass, so JVM startup, codegen
compilation, and parquet footer caching aren't billed to any query —
ratios against the (equally warm) DuckDB baseline stay honest.

Measurement-bug fix (r15, per the r14 verdict): the Bloom bitmap memo
(`llm/selection.py::_BITMAP_CACHE`, keyed on the reference plan + data
fingerprint) let the warm pass pre-build the ~0.7 s model for
`bloom_decontaminate`/`contamination_check`, so the timed passes
skipped work the DuckDB oracle re-does every run. The cache is now
CLEARED before every timed invocation, so each timed pass computes the
model from the parquet inputs like everything else. (Production reuse
of the memo across calls is untouched — only the bench stops
benefiting from it.) r14 walls for the two affected rows predate this
fix: bloom_decontaminate 1.391 s, contamination_check 1.713 s in
BENCH_r14; expect ~+0.5-0.7 s each under the corrected contract.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _materialize(df) -> None:
    # Full plan execution, zero serialization/IO cost billed to the query.
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ad_data_lake_spark.queries import REGISTRY
    from ad_data_lake_spark.session import get_spark

    spark = get_spark("ad_data_lake_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # "write"-tagged queries exercise the lake write path; their DuckDB
    # oracle computes only the final state (no IO), so a wall-clock
    # ratio would be write+read vs pure agg — correctness-gated in
    # CORRECTNESS_r*.json but excluded from the bench headline.
    names = [n for n, s in REGISTRY.items() if "write" not in s.tags]
    skipped = [n for n in REGISTRY if n not in names]
    # Warm pass: JVM + codegen compile + parquet footers, per query.
    for name in names:
        _materialize(REGISTRY[name].fn(spark, sf_dir))

    # Two timed passes, per-query min: absorbs GC/JIT wobble (observed
    # ±1 s on individual queries in a long-lived local JVM) without
    # hiding real cost — both passes run the full plan end-to-end.
    from ad_data_lake_spark.llm.selection import clear_bitmap_cache

    timings: dict[str, float] = {}
    for _ in range(2):
        for name in names:
            # No memoized intermediate keyed on the test data may
            # survive into a timed pass (see module docstring).
            clear_bitmap_cache()
            t0 = time.perf_counter()
            _materialize(REGISTRY[name].fn(spark, sf_dir))
            el = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, el), el)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "skipped_write_path": skipped,
    }
    line = json.dumps(out)
    print(line)
    # Durable copy (r12 verdict #6): the driver's BENCH_r*.json capture
    # truncates the one-line JSON (parsed: null), losing the per-query
    # record; bench_results/ keeps it. Round tag from the env when the
    # driver exports one, else a plain latest-file.
    try:
        os.makedirs("bench_results", exist_ok=True)
        rnd = os.environ.get("SPARK_GRAFT_ROUND")
        # No max(BENCH_r*)+1 guessing (r13 ADVICE): re-runs after the
        # driver has already written the current round's BENCH_rN.json
        # would mis-tag the copy into the NEXT round's slot. Untagged
        # runs land in a stable "latest" file instead.
        tag = f"_r{rnd}" if rnd else "_latest"
        path = os.path.join("bench_results", f"bench_sf{sf}{tag}.json")
        with open(path, "w") as f:
            f.write(line + "\n")
    except OSError:
        pass  # bench output is the stdout line; the copy is best-effort
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
