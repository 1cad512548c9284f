"""Dump .explain("formatted") for registry queries to plans/<round>/.

Usage: python scripts/dump_plans.py <suffix> [query ...]

Writes plans/r14/<query>_<suffix>.txt for each named query (default:
every non-write registry row). The suffix is "before"/"after" per the
optimization-round contract: the judge checks plan claims (Exchange
count, join strategy, PushedFilters, BatchEvalPython nodes) against
these files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUND_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r15"),
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    from ad_data_lake_spark.queries import REGISTRY
    from ad_data_lake_spark.session import get_spark

    names = sys.argv[2:] or [n for n, s in REGISTRY.items() if "write" not in s.tags]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(ROUND_DIR, exist_ok=True)
    for name in names:
        spec = REGISTRY[name]
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001 - record the failure in the artifact
            plan = f"PLAN DUMP FAILED: {exc!r}\n"
        path = os.path.join(ROUND_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
