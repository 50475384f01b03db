"""Benchmark harness — the driver's per-round perf signal.

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` following the
BASELINE.md protocol: 1 warmup run, then median of 3 timed runs per
query. Each run materializes the full result via the noop sink (all
columns computed, nothing collected to the driver — measures the
engine, not IPC).

Prints TWO JSON lines: first the full per-query record
    {"metric": "sum_median_query_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}
with dispersion keys (``query_mad``, ``mad_total``): per-query median
absolute deviation across the timed runs, so round-over-round deltas
can be read against run-to-run noise (VERDICT r3 item 8); then LAST a
compact summary trailer (same metric/value/unit/sf, totals + the
6-query parity core only) sized to survive the driver's ~2000-char
stdout tail capture, which truncated the full line mid-JSON in round 5.

Extra (non-contract) keys: ``materialized`` re-times the window
aggregates over a pre-materialized flights table, separating the
events→JSON→parse adapter cost from aggregation cost (VERDICT round 1).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WARMUPS = 1
RUNS = 3


def _materialize(df) -> None:
    """Force full computation of every column without driver collect."""
    df.write.format("noop").mode("overwrite").save()


def _layout(sf_dir: str) -> dict:
    """Parquet layout fingerprint of the fixture dir (round-10 VERDICT
    item 2): rows / row groups / file count per table. Two rounds in a
    row the driver regenerated fixtures with a different physical
    layout (single-row-group files serialize first pipeline stages)
    and the resulting bench movers cost real adjudication work —
    recording the layout in the bench record lets tools/bench_diff.py
    tag cross-record flags as layout-change instead of code-change."""
    import glob as globmod

    import pyarrow.parquet as pq

    tables: dict[str, dict] = {}
    for path in sorted(globmod.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.basename(path)[: -len(".parquet")]
        try:
            parts = (
                sorted(globmod.glob(os.path.join(path, "*.parquet")))
                if os.path.isdir(path)
                else [path]
            )
            rows = groups = nbytes = 0
            for part in parts:
                md = pq.ParquetFile(part).metadata
                rows += md.num_rows
                groups += md.num_row_groups
                nbytes += os.path.getsize(part)
            # bytes is the CONTENT proxy: the r10->r11 regeneration
            # kept rows/row_groups/files identical while changing the
            # data (different seed), which a layout-only fingerprint
            # cannot see — compressed size does.
            tables[name] = {
                "rows": rows,
                "row_groups": groups,
                "files": len(parts),
                "bytes": nbytes,
            }
        except Exception as exc:  # unreadable table: record, don't die
            tables[name] = {"error": str(exc)[:80]}
    return tables


def _time(df_fn) -> tuple[float, float]:
    """(median, MAD) over RUNS timed materializations.

    The MAD (median absolute deviation from the median) is the
    dispersion signal BASELINE.md's ±15% single-machine caveat calls
    for: a query whose MAD is a large fraction of its median moved
    between runs, so a round-over-round delta smaller than ~2x MAD is
    noise, not a regression (tests/test_plans.py stays the stable
    plan-shape gate).
    """
    for _ in range(WARMUPS):
        _materialize(df_fn())
    samples = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        _materialize(df_fn())
        samples.append(time.perf_counter() - t0)
    med = statistics.median(samples)
    mad = statistics.median(abs(s - med) for s in samples)
    return round(med, 3), round(mad, 3)


def main() -> int:
    os.environ["TZ"] = "UTC"
    time.tzset()

    from flight_events_flink_job_spark.operators.aggregates import (
        airline_stats,
        hourly_stats,
        route_stats,
    )
    from flight_events_flink_job_spark.plans import BENCH_SKIP, QUERIES
    from flight_events_flink_job_spark.session import get_spark
    from flight_events_flink_job_spark.sources.flight_adapter import (
        flights_from_events,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # Smoke mode (tools/verify.sh gate 4): only the 6-query
    # reference-parity core — proves the harness runs end-to-end
    # without paying the full-surface bench.
    smoke_core = {
        "flights_raw",
        "delay_notifications",
        "airline_delay_stats",
        "route_delay_stats",
        "hourly_delay_stats",
        "rejected_rows",
    }
    smoke = bool(os.environ.get("SPARK_GRAFT_BENCH_SMOKE"))

    spark = get_spark("bench")
    timings: dict[str, float] = {}
    mads: dict[str, float] = {}
    # FIXED alphabetical order, decoupled from the registry's driver-
    # priority order: priority reshuffles every round (it drives the
    # correctness window), and a query timed right after the heavy
    # dedup tier reads 2-3x slower from accumulated JVM old-gen
    # pressure (measured round 6: text_repetition 0.84 s early-order
    # vs 2.71 s after the dedup block). A canonical order keeps
    # round-over-round per-query deltas comparable.
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        if name in BENCH_SKIP:
            continue  # streaming round trips time tempdir IO, not the engine
        if smoke and name not in smoke_core:
            continue
        timings[name], mads[name] = _time(lambda: fn(spark, sf_dir))

    # Adapter-cost separation: write the parsed flights table once,
    # then time the three window aggregates over the parquet directly.
    mat: dict[str, float] = {}
    tmp = tempfile.mkdtemp(prefix="bench_flights_")
    if smoke:
        shutil.rmtree(tmp, ignore_errors=True)
        print(
            json.dumps(
                {
                    "metric": "smoke_core_sec",
                    "value": round(sum(timings.values()), 3),
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf,
                }
            )
        )
        return 0
    try:
        flights_from_events(spark, sf_dir).write.mode("overwrite").parquet(tmp)
        flights = spark.read.parquet(tmp)
        for name, op in [
            ("airline_delay_stats", airline_stats),
            ("route_delay_stats", route_stats),
            ("hourly_delay_stats", hourly_stats),
        ]:
            mat[name], _ = _time(lambda: op(flights))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    layout = _layout(sf_dir)
    out = {
        "metric": "sum_median_query_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "query_mad": mads,
        "mad_total": round(sum(mads.values()), 3),
        "layout": layout,
        "materialized": mat,
        "config": {
            "master": spark.sparkContext.master,
            "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
            "warmups": WARMUPS,
            "runs": RUNS,
        },
    }
    print(json.dumps(out))
    # Tail-truncation-proof trailer (VERDICT r5 task #6): the full line
    # above is ~6 KB at 150+ queries and the driver records only the
    # last ~2000 chars of stdout, which cut BENCH_r05 mid-JSON. The
    # LAST line is therefore a compact self-contained summary — totals,
    # dispersion, and the 6-query reference-parity core — guaranteed to
    # fit any reasonable tail window.
    core = {k: v for k, v in timings.items() if k in smoke_core}
    # r13 (VERDICT r12 item 7, additions-only): the trailer's `queries`
    # dict used to carry ONLY the 6-query parity core, so the driver's
    # round-over-round PERF geomean compared six sub-second,
    # noise-dominated queries and read 0.92 in a round that made the
    # whole bench 15% faster. Adding the 20 slowest queries (the ones
    # optimization rounds actually move) keeps the trailer within the
    # driver's stdout tail window while making PERF's per-query
    # comparison track the queries that carry the total. Existing keys
    # are unchanged; `queries` only GAINS entries.
    top20 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:20])
    print(
        json.dumps(
            {
                "metric": "sum_median_query_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "mad_total": round(sum(mads.values()), 3),
                "core_sec": round(sum(core.values()), 3),
                "queries": {**top20, **core},
                # compact layout fingerprint (full per-table dict on
                # the previous line): stable digest of rows/row-groups/
                # files per table, so even the tail-surviving trailer
                # shows whether the fixtures' physical layout moved
                "layout_fp": __import__("hashlib").md5(
                    json.dumps(layout, sort_keys=True).encode()
                ).hexdigest()[:12],
                # round-9 VERDICT item 9: per-query dispersion in the
                # SURVIVING line too, so a round-over-round core delta
                # can be gated on median±MAD (tools/bench_diff.py is
                # the committed protocol for the full record) even when
                # only the trailer makes it into BENCH_r{N}.json.
                "query_mad": {k: mads[k] for k in {**top20, **core}},
                "note": "summary trailer; per-query detail on the previous line",
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
