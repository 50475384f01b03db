"""Per-increment cost soak for incremental dedup (VERDICT r6 item 8,
stretch): the production shape of dedup at 100 TB is INCREMENTAL — each
new crawl snapshot dedups against everything already ingested — so the
cost that matters is per-INCREMENT wall as the persisted index grows,
not one-shot corpus wall.

Protocol: split a scalegen documents corpus into ``n_increments``
equal-size batches by doc_id range. Maintain a persisted content-key
index (parquet of ``token_set_key`` values — the exact-dedup tier
``operators/pipeline.incremental_dedup`` joins against). Per increment:
run incremental_dedup(existing=index, incoming=batch), count admitted
rows, append the increment's OWN new keys to the index, record wall.

Expected shape: per-increment wall ~ O(|increment| + |index|) at this
harness's plain-parquet index (the anti join re-shuffles the key
column each increment; keys are narrow, so the slope is shallow), with
NO super-linear term — a quadratic would show the last increments
ballooning. At 100 TB the index side is stored BUCKETED on the key
(the operator docstring's shuffle-free variant), turning the recurring
shuffle into a co-partitioned read; this soak measures the repo's
registered operator as-is.

Usage: python tools/incremental_dedup_soak.py [n_increments] [sf]
Prints one JSON line; committed as bench/incremental_dedup_soak_r{N}.json.
"""

from __future__ import annotations

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
    n_inc = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0

    from pyspark.sql import functions as F

    from flight_events_flink_job_spark.functions.textual import token_set_key
    from flight_events_flink_job_spark.operators.pipeline import (
        incremental_dedup,
    )
    from flight_events_flink_job_spark.session import get_spark
    from flight_events_flink_job_spark.sources.fixtures import load_table
    from flight_events_flink_job_spark.sources.scalegen import gen_scale_tables

    spark = get_spark("incremental_dedup_soak")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = f"/tmp/scalefix_r6/sf{sf}"
    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        gen_scale_tables(spark, sf_dir, sf, tables=["documents"])
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    step = n_docs // n_inc

    work = tempfile.mkdtemp(prefix="incdedup_")
    index_dir = f"{work}/key_index"
    # seed the index with increment 0 so every timed increment joins a
    # non-empty existing side
    first = docs.filter(F.col("doc_id") < step)
    first.select(token_set_key(F.col("text")).alias("key")).distinct().write.mode(
        "overwrite"
    ).parquet(index_dir)

    series = []
    for i in range(1, n_inc):
        lo, hi = i * step, (i + 1) * step
        batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        existing_keys = spark.read.parquet(index_dir).select(
            F.col("key").alias("text")
        )
        # incremental_dedup keys the existing side with token_set_key;
        # the index already stores canonical keys, which token_set_key
        # maps to themselves (sorted-unique tokens are a fixpoint), so
        # handing them through the text column reuses the operator
        # unmodified.
        index_rows_before = spark.read.parquet(index_dir).count()
        t0 = time.perf_counter()
        admitted = incremental_dedup(existing_keys, batch)
        n_admitted = admitted.count()
        wall = time.perf_counter() - t0
        # maintain the index exactly (append only keys not already in
        # it, so index_rows == distinct corpus keys seen) — untimed
        # bookkeeping, not part of the operator under test. Staged via
        # a delta dir: Spark refuses to append to a path read in the
        # same plan.
        delta = f"{work}/delta_{i}"
        batch.select(token_set_key(F.col("text")).alias("key")).distinct().join(
            spark.read.parquet(index_dir), "key", "left_anti"
        ).write.mode("overwrite").parquet(delta)
        spark.read.parquet(delta).write.mode("append").parquet(index_dir)
        shutil.rmtree(delta, ignore_errors=True)
        series.append(
            {
                "increment": i,
                "batch_rows": step,
                "index_rows_before": index_rows_before,
                "admitted": n_admitted,
                "wall_s": round(wall, 2),
            }
        )
        print(f"# inc {i}: {wall:.2f}s index_before={index_rows_before}", file=sys.stderr)

    walls = [s["wall_s"] for s in series]
    q = max(len(walls) // 4, 1)
    head = sorted(walls[:q] or walls)[len(walls[:q] or walls) // 2]
    tail = sorted(walls[-q:])[len(walls[-q:]) // 2]
    out = {
        "n_increments": len(series),
        "rows_per_increment": step,
        "median_wall_first_quarter_s": head,
        "median_wall_last_quarter_s": tail,
        "flat": tail <= 2.0 * head,
        "series": series,
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    return 0 if out["flat"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
