"""Session-aging A/B probe (round-13 VERDICT item 6).

Times a fixed 10-query slice EARLY in a fresh session, ages the session
by running a configurable number of other registry queries (bench
protocol: rebuild + noop-materialize), then re-times the SAME slice
LATE and reports early/late medians per query plus JVM code-cache and
heap stats (jcmd) before and after aging — the evidence for/against
the JIT-code-cache-exhaustion hypothesis behind the ~0.15 s/stage
late-session drift.

Usage:
  python tools/aging_probe.py [--age N] [--reps R] [--conf k=v ...]
Prints one JSON line. Run on a QUIET host; compare runs with identical
--age between configs.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Mixed slice: flight core, TPC-H shape, text, dedup-lite, vector — all
# sub-2 s queries whose individual MADs are small, so the early/late
# delta reads against a stable baseline.
SLICE = [
    "airline_delay_stats",
    "route_delay_stats",
    "rejected_rows",
    "nation_market_share",
    "value_histogram",
    "bm25_topk",
    "doc_novelty",
    "repeated_passages",
    "similarity_topk_ivf",
    "event_pagerank",
]


def _jcmd(pid: int, cmd: str) -> str:
    try:
        return subprocess.run(
            ["jcmd", str(pid), cmd], capture_output=True, text=True, timeout=30
        ).stdout
    except Exception as exc:  # tool missing / denied: record, don't die
        return f"jcmd failed: {exc}"


def _codecache_summary(text: str) -> dict:
    out = {}
    for line in text.splitlines():
        line = line.strip()
        for seg in ("CodeHeap 'non-profiled nmethods'", "CodeHeap 'profiled nmethods'", "CodeCache"):
            if line.startswith(seg + ":"):
                out[seg] = line.split(":", 1)[1].strip()
        if line.startswith("full_count="):
            out["full_count"] = line
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--age", type=int, default=80, help="queries to run between slices")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--conf", action="append", default=[], help="extra spark conf k=v")
    args = ap.parse_args()

    os.environ.setdefault("TZ", "UTC")
    time.tzset()
    from flight_events_flink_job_spark.plans import BENCH_SKIP, QUERIES
    from flight_events_flink_job_spark.session import get_spark

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark("aging_probe", extra_conf=extra or None)
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    jvm_pid = int(sc._jvm.java.lang.ProcessHandle.current().pid())

    def run_slice(tag: str) -> dict:
        res = {}
        for name in SLICE:
            fn = QUERIES[name]
            sc.setJobDescription(f"aging:{tag}:{name}")
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            samples = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            res[name] = round(statistics.median(samples), 3)
        return res

    early = run_slice("early")
    cc_early = _codecache_summary(_jcmd(jvm_pid, "Compiler.codecache"))

    # Age: run the slowest non-slice queries (alphabetical from the
    # registry, skipping streaming + the slice itself), one warm + one
    # timed materialization each — about what the bench does.
    aged = 0
    for name in sorted(QUERIES):
        if aged >= args.age:
            break
        if name in BENCH_SKIP or name in SLICE:
            continue
        fn = QUERIES[name]
        sc.setJobDescription(f"aging:age:{name}")
        try:
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # aging only; a failure here is not the experiment
        aged += 1

    late = run_slice("late")
    cc_late = _codecache_summary(_jcmd(jvm_pid, "Compiler.codecache"))

    e_tot, l_tot = sum(early.values()), sum(late.values())
    print(
        json.dumps(
            {
                "conf": extra,
                "age_queries": aged,
                "reps": args.reps,
                "early": early,
                "late": late,
                "early_total": round(e_tot, 3),
                "late_total": round(l_tot, 3),
                "late_over_early": round(l_tot / e_tot, 3) if e_tot else None,
                "codecache_early": cc_early,
                "codecache_late": cc_late,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
