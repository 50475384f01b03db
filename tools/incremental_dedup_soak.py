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

Usage: python tools/incremental_dedup_soak.py [n_increments] [sf] [--bucketed]
Prints one JSON line; committed as bench/incremental_dedup_soak_r{N}.json.

``--bucketed`` (round-7 VERDICT item 5): the index lives as a table
BUCKETED on the key (32 buckets) and each increment runs
``incremental_dedup_keyed`` against it with broadcast disabled — the
100 TB plan shape (ONE exchange, on the increment side; the index is a
co-partitioned bucketed read, asserted per increment from the executed
plan). A snapshot of the anti-join plan at increment 10 is printed for
tools/plans_r8.md.
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
    args = [a for a in sys.argv[1:] if a != "--bucketed"]
    bucketed = "--bucketed" in sys.argv
    n_inc = int(args[0]) if len(args) > 0 else 20
    sf = float(args[1]) if len(args) > 1 else 2.0

    from pyspark.sql import functions as F

    from flight_events_flink_job_spark.functions.textual import token_set_key
    from flight_events_flink_job_spark.operators.pipeline import (
        incremental_dedup,
        incremental_dedup_keyed,
    )
    from flight_events_flink_job_spark.session import get_spark
    from flight_events_flink_job_spark.sources.fixtures import load_table
    from flight_events_flink_job_spark.sources.scalegen import gen_scale_tables

    spark = get_spark("incremental_dedup_soak")
    spark.sparkContext.setLogLevel("ERROR")
    if bucketed:
        # the realistic big-index plan: the index side must never
        # broadcast at 100 TB, so assert the co-partitioned shape
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sf_dir = f"/tmp/scalefix_r6/sf{sf}"
    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        gen_scale_tables(spark, sf_dir, sf, tables=["documents"])
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    step = n_docs // n_inc

    work = tempfile.mkdtemp(prefix="incdedup_")
    index_dir = f"{work}/key_index"
    table = "inc_soak_key_index"
    # seed the index with increment 0 so every timed increment joins a
    # non-empty existing side
    first = docs.filter(F.col("doc_id") < step)
    seed = first.select(token_set_key(F.col("text")).alias("key")).distinct()
    if bucketed:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        (
            seed.write.format("parquet")
            .mode("overwrite")
            .option("path", index_dir)
            .bucketBy(32, "key")
            .sortBy("key")
            .saveAsTable(table)
        )
    else:
        seed.write.mode("overwrite").parquet(index_dir)

    def index_df():
        return spark.table(table) if bucketed else spark.read.parquet(index_dir)

    series = []
    for i in range(1, n_inc):
        lo, hi = i * step, (i + 1) * step
        batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        index_rows_before = index_df().count()
        t0 = time.perf_counter()
        if bucketed:
            admitted = incremental_dedup_keyed(index_df(), batch)
        else:
            # incremental_dedup keys the existing side with
            # token_set_key; the index already stores canonical keys,
            # which token_set_key maps to themselves (sorted-unique
            # tokens are a fixpoint), so handing them through the text
            # column reuses the operator unmodified.
            admitted = incremental_dedup(
                index_df().select(F.col("key").alias("text")), batch
            )
        n_admitted = admitted.count()
        wall = time.perf_counter() - t0
        if bucketed:
            plan = admitted._jdf.queryExecution().executedPlan().toString()
            final = plan.split("== Initial Plan ==")[0]
            anti = final[final.index("LeftAnti"):]
            n_ex = anti.count("Exchange hashpartitioning")
            assert n_ex == 1 and "SelectedBucketsCount" in final, (
                f"inc {i}: expected co-partitioned index read, got\n{plan}"
            )
            if i == 10:
                print("# PLAN SNAPSHOT (increment 10):\n" + final,
                      file=sys.stderr)
        # maintain the index exactly (append only keys not already in
        # it, so index_rows == distinct corpus keys seen) — untimed
        # bookkeeping, not part of the operator under test. Staged via
        # a delta dir: Spark refuses to append to a path read in the
        # same plan.
        delta = f"{work}/delta_{i}"
        batch.select(token_set_key(F.col("text")).alias("key")).distinct().join(
            index_df(), "key", "left_anti"
        ).write.mode("overwrite").parquet(delta)
        if bucketed:
            (
                spark.read.parquet(delta)
                .write.format("parquet")
                .mode("append")
                .option("path", index_dir)
                .bucketBy(32, "key")
                .sortBy("key")
                .saveAsTable(table)
            )
        else:
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
        "index": "bucketed(32, key) catalog table, broadcast disabled, "
        "co-partitioned anti join asserted per increment"
        if bucketed
        else "plain parquet",
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
