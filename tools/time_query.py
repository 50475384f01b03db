"""Time a handful of registry queries under the bench protocol with a
configurable rep count — the adjudication tool for single-query watch
items (round-9 VERDICT item 2: decide noise vs regression for
`regional_supplier_volume` with a 5-rep MAD run instead of re-paying a
full-surface sweep).

Protocol matches bench.py exactly (noop-sink materialization, warmup
then timed reps, median + MAD) so the number is comparable to the
bench_out*.json rows. Run on a QUIET host.

Usage: python tools/time_query.py QUERY [QUERY...] [--reps 5] [--sf-dir D]
Prints one JSON line per query.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    os.environ.setdefault("TZ", "UTC")
    time.tzset()
    from flight_events_flink_job_spark.plans import QUERIES
    from flight_events_flink_job_spark.session import get_spark

    spark = get_spark("time_query")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args.queries:
        fn = QUERIES[name]
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        med = statistics.median(samples)
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": args.sf_dir,
                    "reps": args.reps,
                    "median_sec": round(med, 3),
                    "mad_sec": round(
                        statistics.median(abs(s - med) for s in samples), 3
                    ),
                    "samples": samples,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
