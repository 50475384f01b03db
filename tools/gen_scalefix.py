"""Pre-generate scale-curve fixtures (same marker convention as
tools/scale_bench.py, so a later scale_bench run at the same --base
skips generation and times only the queries).

Usage: python tools/gen_scalefix.py [--sfs 0.1,0.5] [--base /tmp/scalefix_r6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_bench import TABLES_NEEDED  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", default="0.1,0.5,1.0,2.0")
    ap.add_argument("--base", default="/tmp/scalefix_r6")
    args = ap.parse_args()

    os.environ.setdefault("TZ", "UTC")
    time.tzset()
    from flight_events_flink_job_spark.session import get_spark
    from flight_events_flink_job_spark.sources.scalegen import gen_scale_tables

    spark = get_spark("gen_scalefix")
    spark.sparkContext.setLogLevel("ERROR")
    for sf in [float(s) for s in args.sfs.split(",")]:
        sf_dir = f"{args.base}/sf{sf}"
        marker = f"{sf_dir}/.complete"
        if os.path.exists(marker):
            print(f"# sf{sf}: cached", file=sys.stderr)
            continue
        t0 = time.perf_counter()
        rows = gen_scale_tables(spark, sf_dir, sf, tables=TABLES_NEEDED)
        open(marker, "w").write(json.dumps(rows))
        print(
            f"# generated sf{sf} in {time.perf_counter() - t0:.1f}s: {rows}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
