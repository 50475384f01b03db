"""Dump `.explain("formatted")` for named registry queries into
plans/<round>/<query>_<tag>.txt — the before/after plan evidence the
optimization rounds commit (VERDICT r12: the judge checks plan claims
against these files).

Usage: python tools/dump_plans.py ROUND TAG QUERY [QUERY...]
       e.g. python tools/dump_plans.py r13 before dedup_ngram_jaccard
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    rnd, tag, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from flight_events_flink_job_spark.plans import QUERIES
    from flight_events_flink_job_spark.session import get_spark

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(path, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
