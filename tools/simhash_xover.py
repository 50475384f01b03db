"""SimHash blocking-scheme head-to-head at one corpus size
(BASELINE.md §5a; VERDICT r6 item 4 asks for the 2M-doc point that
BRACKETS the 4M auto-gate instead of extrapolating the 0.87x/doubling
ratio past 1M).

Times the complete classic (4x15-bit single-block) and combo (C(6,3)
three-block-combination) schemes of ``simhash_near_pairs`` on the SAME
documents fixture, in a fresh session, classic first (fixed order —
BASELINE.md §5c JVM-contamination hygiene), 1 warmup + ``reps`` timed
runs each, medians reported.

Usage:
    python tools/simhash_xover.py <sf> [reps] [--base /tmp/scalefix_r6]
Generates the documents-only fixture at {base}/sf{sf} if missing
(sf40 = 2M docs). Prints one JSON line; committed as
bench/simhash_xover{sf}_r{N}.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    os.environ["TZ"] = "UTC"
    time.tzset()
    sf = float(sys.argv[1])
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    base = sys.argv[4] if len(sys.argv) > 4 else "/tmp/scalefix_r6"

    from flight_events_flink_job_spark.operators.dedup import simhash_near_pairs
    from flight_events_flink_job_spark.session import get_spark
    from flight_events_flink_job_spark.sources.fixtures import load_table
    from flight_events_flink_job_spark.sources.scalegen import gen_scale_tables

    spark = get_spark("simhash_xover")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = f"{base}/sf{sf}"
    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        gen_scale_tables(spark, sf_dir, sf, tables=["documents"])
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()

    out = {"docs": n}
    for scheme in ("classic", "combo"):
        ts = []
        for i in range(reps + 1):
            t0 = time.perf_counter()
            simhash_near_pairs(docs, scheme=scheme).write.format(
                "noop"
            ).mode("overwrite").save()
            if i > 0:  # first run is warmup
                ts.append(time.perf_counter() - t0)
        out[scheme] = round(statistics.median(ts), 2)
        print(f"# {scheme}: {out[scheme]}s", file=sys.stderr)
    out["ratio_classic_over_combo"] = round(out["classic"] / out["combo"], 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
