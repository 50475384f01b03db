"""State-expiry soak for the event-time timer trackers — BOTH APIs
(round-11; extends the VERDICT r10 item 5 pytest twin to endurance
scale): v1 ``expire_idle_users`` (applyInPandasWithState +
EventTimeTimeout) and v2 ``expire_idle_users_v2``
(transformWithStateInPandas + registerTimer/handleExpiredTimer).

The workload is built so that BOUNDED STATE IS ONLY POSSIBLE IF THE
TIMERS ACTUALLY FIRE: the user population rotates in cohorts (a fresh
set of 500 user ids every 5 simulated days, 24 cohorts over 120
days), so every key eventually goes idle past the 2-day gap and must
tombstone itself out of the store. Without expiry, state rows grow
linearly with cohorts (~12k keys by the end); with it, the store
holds only the active cohort plus the not-yet-expired tail — the
plateau the gate asserts. This is the 100 TB-keyspace property the
docstrings claim: idle keys retire THEMSELVES; the store tracks the
activity horizon, not the key universe.

Gates per soak (same shape as tools/stream_state_soak.py): >= 100
data batches, state-row plateau (last-quarter max <= 1.25x
second-quarter max), stable latency. Plus a cross-API gate: the two
trackers must emit EXACTLY the same tombstone multiset
((user_id, n_events) pairs) — emission-level equivalence at soak
scale, not just on the 3-batch pytest fixture.

Usage: python tools/stream_expire_soak.py [n_files] [rows_per_file]
Prints one JSON line per soak + a comparison line; committed as
bench/stream_expire_soak_r11.json.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    os.environ["TZ"] = "UTC"
    time.tzset()
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    from pyspark.sql import functions as F
    from pyspark.sql.streaming import StreamingQueryListener

    from flight_events_flink_job_spark.session import get_spark
    from flight_events_flink_job_spark.streaming.job import ROCKSDB_PROVIDER
    from flight_events_flink_job_spark.streaming.stateful import (
        HAS_TWS,
        expire_idle_users,
        expire_idle_users_v2,
    )

    spark = get_spark("stream_expire_soak")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.compactOnCommit", "true"
    )

    work = tempfile.mkdtemp(prefix="expire_soak_")
    staging = f"{work}/staging"

    # One file per simulated day; a FRESH 500-user cohort every 5 days
    # (cohort c owns ids c*1000 .. c*1000+499). Deterministic: every
    # column is a pure function of the row id.
    base = dt.datetime(2024, 1, 1)
    cohort_days, cohort_users = 5, 500
    for f in range(n_files):
        day = base + dt.timedelta(days=f)
        cohort = f // cohort_days
        df = (
            spark.range(f * per_file, (f + 1) * per_file, 1, 1)
            .select(
                (
                    F.lit(day)
                    + F.make_interval(
                        secs=F.pmod(F.col("id") * 37, 86_400).cast("double")
                    )
                ).alias("ts"),
                (
                    F.lit(cohort * 1000)
                    + F.pmod(F.xxhash64("id", F.lit("u")), F.lit(cohort_users))
                ).alias("user_id"),
                F.lit("evt").alias("event_type"),
                (F.pmod(F.xxhash64("id", F.lit("v")), F.lit(10_000)) / 100.0).alias(
                    "value"
                ),
            )
            .coalesce(1)
        )
        df.write.mode("append").parquet(staging)

    schema = "ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
    gap_seconds = 2 * 86_400  # idle past 2 days of event time -> expire

    progress: list[dict] = []

    class Collector(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            progress.append(
                {
                    "duration_ms": p.batchDuration,
                    "input_rows": p.numInputRows,
                    "state_rows": sum(
                        op.numRowsTotal for op in p.stateOperators
                    )
                    if p.stateOperators
                    else None,
                }
            )

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(Collector())

    def soak(name: str, op) -> tuple[dict, dict]:
        progress.clear()
        sink = f"expire_soak_{name}"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
        )
        t0 = time.perf_counter()
        q = (
            op(stream, gap_seconds=gap_seconds)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .option("checkpointLocation", f"{work}/ck_{name}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(1800)
        if q.isActive:
            q.stop()
            q.awaitTermination(60)
        wall = time.perf_counter() - t0
        # tombstone multiset, bounded: <= one expiry per (key, era)
        tombs = {
            (r.user_id, r.n_events): r["count"]
            for r in spark.table(sink)
            .where("expired")
            .groupBy("user_id", "n_events")
            .count()
            .collect()
        }
        data = [
            p
            for p in progress
            if p["input_rows"] > 0 and p["state_rows"] is not None
        ]
        n = len(data)
        quarter = max(n // 4, 1)
        second = data[quarter : 2 * quarter]
        last = data[-quarter:]
        max_mid = max(p["state_rows"] for p in second)
        max_last = max(p["state_rows"] for p in last)
        lat_mid = statistics.median(p["duration_ms"] for p in second)
        lat_last = statistics.median(p["duration_ms"] for p in last)
        verdict = {
            "soak": name,
            "n_batches": n,
            "rows_per_file": per_file,
            "wall_sec": round(wall, 1),
            "distinct_keys_seen": int(n_files / cohort_days) * cohort_users,
            "state_rows_max_q2": max_mid,
            "state_rows_max_q4": max_last,
            "state_bounded": max_last <= 1.25 * max_mid,
            "n_tombstones": int(sum(tombs.values())),
            "latency_ms_median_q2": lat_mid,
            "latency_ms_median_q4": lat_last,
            "latency_stable": lat_last <= 2 * lat_mid,
            "state_rows_series_every_10": [
                p["state_rows"] for p in data[::10]
            ],
        }
        verdict["pass"] = bool(
            n >= 100
            and verdict["state_bounded"]
            and verdict["latency_stable"]
            and verdict["n_tombstones"] > 0
        )
        print(json.dumps(verdict), flush=True)
        return verdict, tombs

    v1, tombs1 = soak("expire_v1_applyInPandasWithState", expire_idle_users)
    if not HAS_TWS:
        print(json.dumps({"soak": "expire_v2", "skipped": "no TWS"}))
        return 0 if v1["pass"] else 1
    v2, tombs2 = soak(
        "expire_v2_transformWithState", expire_idle_users_v2
    )
    cmp_line = {
        "comparison": "v1_vs_v2_tombstones",
        "v1_tombstones": int(sum(tombs1.values())),
        "v2_tombstones": int(sum(tombs2.values())),
        "multisets_equal": tombs1 == tombs2,
    }
    print(json.dumps(cmp_line), flush=True)
    shutil.rmtree(work, ignore_errors=True)
    ok = v1["pass"] and v2["pass"] and cmp_line["multisets_equal"]
    if not ok:
        raise SystemExit("expire soak FAILED")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
