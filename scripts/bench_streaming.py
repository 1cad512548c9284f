"""Streaming-tier throughput baseline (VERDICT r9 ask #7).

The nine streaming registry rows are value-verified by the driver gate
but appear in no perf table — bench.py and the scale runs exclude
"write"-tagged rows because their oracles do no IO. This script gives
the tier a REGRESSION baseline: one end-to-end wall measurement per
row at sf0.1 and the implied drain rate.

Method: warm pass discarded, min of two timed passes (the bench.py
discipline). Wall is the WHOLE registry callable — source-fixture
write + availableNow drain + result read-back — so events/s here is a
conservative LOWER bound on pure drain rate; it is stable enough for
regression detection, which is all this table claims. Input rows are
the rows actually fed to the stream source (events fact = 100k at
sf0.1; the two planted-duplicate pipelines feed 110k; the corpus rows
feed the duplicated documents corpus, counted at runtime).

Usage: python scripts/bench_streaming.py [sf_dir]
Prints a markdown table + one JSON line; paste the table into
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

# name -> how to count the rows the pipeline streams (evaluated once)
_EVENTS = "events"
_EVENTS_PLUS_DUPS = "events+dups"  # every 10th event planted twice
_DUP_CORPUS = "dup_corpus"
_DOCS = "documents"

STREAM_ROWS: dict[str, str] = {
    "streaming_daily_insights": _EVENTS_PLUS_DUPS,
    "streaming_sliding_insights": _EVENTS_PLUS_DUPS,
    "streaming_sessionize": _EVENTS,
    "streaming_dim_enrich": _EVENTS,
    "streaming_frequency_cap": _EVENTS,
    "streaming_attribution_join": _EVENTS,
    "streaming_json_sanitize": _EVENTS,
    "streaming_corpus_ingest": _DUP_CORPUS,
    "streaming_rare_token_scrub": _DOCS,
}


def _input_rows(spark) -> dict[str, int]:
    from ad_data_lake_spark.llm.corpus import dup_corpus
    from ad_data_lake_spark.sources.tables import load_table

    n_events = load_table(spark, "events", SF_DIR).count()
    n_docs = load_table(spark, "documents", SF_DIR).count()
    n_dup_corpus = dup_corpus(load_table(spark, "documents", SF_DIR)).count()
    return {
        _EVENTS: n_events,
        _EVENTS_PLUS_DUPS: n_events + n_events // 10,
        _DUP_CORPUS: n_dup_corpus,
        _DOCS: n_docs,
    }


def main() -> None:
    from ad_data_lake_spark.queries import REGISTRY
    from ad_data_lake_spark.session import get_spark

    spark = get_spark("bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    counts = _input_rows(spark)

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    walls: dict[str, float] = {}
    for name in STREAM_ROWS:
        mat(REGISTRY[name].fn(spark, SF_DIR))  # warm
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            mat(REGISTRY[name].fn(spark, SF_DIR))
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        walls[name] = best
        print(f"{name:32s} {best:7.2f}s", file=sys.stderr, flush=True)

    sf = os.path.basename(SF_DIR.rstrip("/")).removeprefix("sf")
    print(f"\n| Streaming row | Input rows (sf{sf}) | Wall (s) | rows/s |")
    print("|---|---|---|---|")
    rates = {}
    for name, src in STREAM_ROWS.items():
        n = counts[src]
        w = walls[name]
        rates[name] = round(n / w)
        print(f"| {name} | {n} | {w:.2f} | {rates[name]} |")
    print(
        json.dumps(
            {
                "metric": "streaming_drain",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "walls": {k: round(v, 3) for k, v in walls.items()},
                "rows_per_sec": rates,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
