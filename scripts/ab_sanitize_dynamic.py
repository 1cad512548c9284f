"""Trial (r14 verdict #4): sanitize_dynamic_json as an Arrow-batched
Python pass vs the interpreted Catalyst HOF expression.

The current form is ONE zero-shuffle projection, but every entry rule
runs through interpreted higher-order-function lambdas (~20 us/row at
~25 entries/row across 3 nesting levels). The trial reimplements the
exact rule contract in Python over mapInPandas batches and checks
BYTE-level equality on every fixture row before timing.

Usage: python scripts/ab_sanitize_dynamic.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ad_data_lake_spark.functions.dynamic_json_py import (  # noqa: E402
    sanitize_dynamic_json_pandas,
)
from pyspark.sql import functions as F2  # noqa: E402

from ad_data_lake_spark.functions.dynamic_json import (  # noqa: E402
    sanitize_json_fragment,
)
from ad_data_lake_spark.operators.sanitize_queries import (  # noqa: E402
    dynamic_json_payload,
)
from ad_data_lake_spark.session import get_spark  # noqa: E402
from ad_data_lake_spark.sources.tables import load_table, spread  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 7


def _base(events):
    return spread(events).select(
        "event_id", dynamic_json_payload(events).alias("payload")
    )


def column_form(events):
    return _base(events).withColumn(
        "sanitized", sanitize_json_fragment(F2.col("payload"))
    )


def variant(events):
    return sanitize_dynamic_json_pandas(_base(events), "payload", "sanitized")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("ab-sanitize")
    spark.sparkContext.setLogLevel("ERROR")
    events = load_table(spark, "events", SF)

    cur = {r.event_id: r.sanitized for r in column_form(events).collect()}
    new = {r.event_id: r.sanitized for r in variant(events).collect()}
    assert len(cur) == len(new)
    bad = [k for k in cur if cur[k] != new[k]]
    if bad:
        k = bad[0]
        print(f"MISMATCH on {len(bad)}/{len(cur)} rows; first event_id={k}")
        print(" cur:", cur[k])
        print(" new:", new[k])
        sys.exit(1)
    print(f"byte-identical over {len(cur)} rows")

    noop(column_form(events))
    noop(variant(events))
    cs, vs = [], []
    for i in range(PASSES):
        t0 = time.perf_counter()
        noop(column_form(events))
        cs.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        noop(variant(events))
        vs.append(time.perf_counter() - t0)
        print(f"pass {i}: current={cs[-1]:.3f} python={vs[-1]:.3f}", flush=True)
    print(
        f"median current={statistics.median(cs):.3f} "
        f"python={statistics.median(vs):.3f} "
        f"ratio={statistics.median(vs) / statistics.median(cs):.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
