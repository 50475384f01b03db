"""Controlled RocksDB-vs-HDFS state-store provider ACCOUNTING comparison
(round-9 VERDICT item 8).

BASELINE.md §8b diagnosed the RocksDB provider's
``stateOperators.memoryUsedBytes`` aggregate growing linearly under
availableNow trigger cadence (~145 KB/batch) while every live-state
component (SST file size, pinned-block memory, get/put counts) sits
flat — and the HDFS-backed provider PLATEAUS on the identical
workload. That elimination run was ad-hoc in round 9; this tool makes
it a committed, regenerable artifact so the claim is pinned
(tests/test_streaming.py::test_provider_accounting_artifact) and a
future Spark upgrade that FIXES the accounting is detected the moment
the artifact is regenerated (the RocksDB aggregate would plateau and
the pin's growth assertion would flip).

Workload: the stream-stream interval join from the §8b soak (the
shape with both-sided watermark-evicted join state), same
deterministic one-file-per-day staging, run once per provider with a
fresh checkpoint. Output: ONE JSON line per provider —
live-bytes + provider-aggregate trajectories and their q2→q4 ratios.

Usage: python tools/provider_accounting.py [n_files] [rows_per_file]
Committed as bench/provider_accounting_r{N}.json.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    os.environ["TZ"] = "UTC"
    time.tzset()
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    from pyspark.sql import functions as F
    from pyspark.sql.streaming import StreamingQueryListener

    from flight_events_flink_job_spark.session import get_spark
    from flight_events_flink_job_spark.streaming.job import ROCKSDB_PROVIDER
    from flight_events_flink_job_spark.streaming.joins import (
        signup_purchase_conversions,
    )

    HDFS_PROVIDER = (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    )

    spark = get_spark("provider_accounting")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    work = tempfile.mkdtemp(prefix="provider_acct_")
    staging = f"{work}/staging"
    base = dt.datetime(2024, 1, 1)
    n_users = 500
    for f in range(n_files):
        day = base + dt.timedelta(days=f)
        (
            spark.range(f * per_file, (f + 1) * per_file, 1, 1)
            .select(
                F.col("id").alias("event_id"),
                (
                    F.lit(day)
                    + F.make_interval(
                        secs=F.pmod(F.col("id") * 37, 86_400).cast("double")
                    )
                ).alias("ts"),
                F.pmod(F.xxhash64("id", F.lit("u")), F.lit(n_users)).alias(
                    "user_id"
                ),
                F.element_at(
                    F.array(
                        F.lit("signup"),
                        F.lit("purchase"),
                        F.lit("view"),
                        F.lit("click"),
                    ),
                    (F.pmod(F.xxhash64("id", F.lit("t")), F.lit(4)) + 1).cast(
                        "int"
                    ),
                ).alias("event_type"),
                (
                    F.pmod(F.xxhash64("id", F.lit("v")), F.lit(10_000)) / 100.0
                ).alias("value"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(staging)
        )

    schema = (
        "event_id LONG, ts TIMESTAMP, user_id LONG, "
        "event_type STRING, value DOUBLE"
    )

    progress: list[dict] = []

    class Collector(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            ops = p.stateOperators or []
            progress.append(
                {
                    "input_rows": p.numInputRows,
                    "state_rows": sum(op.numRowsTotal for op in ops),
                    "live_bytes": sum(
                        op.customMetrics.get("rocksdbSstFileSize", 0)
                        + op.customMetrics.get(
                            "rocksdbPinnedBlocksMemoryUsage", 0
                        )
                        for op in ops
                    ),
                    "provider_mem_bytes": sum(
                        op.memoryUsedBytes for op in ops
                    ),
                }
            )

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(Collector())

    def run(provider_name: str, provider_class: str) -> dict:
        progress.clear()
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", provider_class
        )
        ck = f"{work}/ck_{provider_name}"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
        )
        # Same retention shape as tools/stream_state_soak.py: 1-day
        # watermark + 6-hour interval, one simulated day per batch —
        # rows enter AND leave join state every micro-batch.
        joined = signup_purchase_conversions(
            stream.where(F.col("event_type") == "signup"),
            stream.where(F.col("event_type") == "purchase"),
            upper="6 HOURS",
            watermark="1 DAY",
        )
        q = (
            joined.writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(1800)
        if q.isActive:
            q.stop()
            q.awaitTermination(60)
        data = [p for p in progress if p["input_rows"] > 0]
        n = len(data)
        quarter = max(n // 4, 1)
        second = data[quarter : 2 * quarter]
        last = data[-quarter:]
        agg_q2 = max(p["provider_mem_bytes"] for p in second)
        agg_q4 = max(p["provider_mem_bytes"] for p in last)
        out = {
            "provider": provider_name,
            "n_batches": n,
            "rows_per_file": per_file,
            "state_rows_q2": max(p["state_rows"] for p in second),
            "state_rows_q4": max(p["state_rows"] for p in last),
            "live_bytes_q2": max(p["live_bytes"] for p in second),
            "live_bytes_q4": max(p["live_bytes"] for p in last),
            "provider_mem_bytes_q2": agg_q2,
            "provider_mem_bytes_q4": agg_q4,
            "aggregate_growth_ratio": round(agg_q4 / max(agg_q2, 1), 3),
            "provider_mem_series_every_5": [
                p["provider_mem_bytes"] for p in data[::5]
            ],
        }
        print(json.dumps(out), flush=True)
        return out

    try:
        run("rocksdb", ROCKSDB_PROVIDER)
        run("hdfs", HDFS_PROVIDER)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
