"""Round-12 optimization profiler (guide §1: measure first).

For each named query, splits wall time into:
  - build_s:   Python-side DataFrame construction (fn call, no action)
  - first_s:   first noop materialization (includes Catalyst + codegen)
  - steady_s:  median of N repeat materializations (the bench's signal)
and counts Spark jobs / stages / tasks per materialization via the
status tracker, so overhead-dominated queries (many tiny jobs, tiny
tasks) separate from compute-dominated ones.

Usage: python tools/profile_r12.py [sf_dir] query [query ...]
       python tools/profile_r12.py [sf_dir] --top N   (N slowest from bench/bench_out34.json)
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

REPEATS = 3


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and "/" in args[0]:
        sf_dir = args.pop(0)
    from flight_events_flink_job_spark.plans import QUERIES
    from flight_events_flink_job_spark.session import get_spark

    if args[:1] == ["--top"]:
        n = int(args[1])
        rec = json.loads(open("bench/bench_out34.json").readline())
        names = [
            k
            for k, _ in sorted(rec["queries"].items(), key=lambda kv: -kv[1])[:n]
        ]
    else:
        names = args

    spark = get_spark("profile_r12")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out = {}
    for name in names:
        fn = QUERIES[name]
        sc.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        build_s = time.perf_counter() - t0

        jobs_before = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        first_s = time.perf_counter() - t0

        samples = []
        for _ in range(REPEATS):
            # fn() inside the timed window — exactly the bench's timed
            # region (matters for eager work at build time).
            t0 = time.perf_counter()
            d = fn(spark, sf_dir)
            d.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        steady_s = statistics.median(samples)

        jobs_after = set(tracker.getJobIdsForGroup(None) or [])
        new_jobs = sorted(jobs_after - jobs_before)
        n_stages = n_tasks = 0
        for j in new_jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        per_mat = 1 + REPEATS
        out[name] = {
            "build_s": round(build_s, 3),
            "first_s": round(first_s, 3),
            "steady_s": round(steady_s, 3),
            "jobs_per_run": round(len(new_jobs) / per_mat, 1),
            "stages_per_run": round(n_stages / per_mat, 1),
            "tasks_per_run": round(n_tasks / per_mat, 0),
        }
        print(name, json.dumps(out[name]), flush=True)
        sc.setJobDescription(None)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
