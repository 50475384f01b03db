"""Soak the streaming IVFADC serving path (round-11 VERDICT item 7):
prove that a long run of query micro-batches served from the
batch-built index performs ZERO per-batch index rebuilds and that the
streamed union equals the batch serve exactly.

Protocol: build the residual index once through the registry cache
(timed), stage the 16 probe vectors as 16 single-row files so
availableNow drains 16 micro-batches, serve each batch from the cached
index via drain_ivfpq_queries_from_staged with an instrumented
ivf_pq_index (build counter) and a per-batch wall-time hook, then
compare the appended union against the batch ivf_pq_query result.

Writes bench/stream_ivfpq_soak_r12.json:
  {build_sec, index_builds_during_stream, n_batches,
   batch_sec: [...], median_batch_sec, values_match}

Usage: python tools/stream_ivfpq_soak.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("stream_ivfpq_soak")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from flight_events_flink_job_spark.operators import clustering
    from flight_events_flink_job_spark.operators.clustering import ivf_pq_query
    from flight_events_flink_job_spark.plans.registry_ext import (
        _embs,
        _ivfpq_index_cached,
    )
    from flight_events_flink_job_spark.streaming.similarity import (
        drain_ivfpq_queries_from_staged,
    )

    t0 = time.monotonic()
    idx = _ivfpq_index_cached(spark, sf_dir, "residual")
    build_sec = time.monotonic() - t0

    # instrument: any index build during the stream is a soak failure
    builds = {"n": 0}
    real_build = clustering.ivf_pq_index

    def counting_build(*a, **kw):
        builds["n"] += 1
        return real_build(*a, **kw)

    clustering.ivf_pq_index = counting_build
    try:
        embs = _embs(spark, sf_dir)
        queries = embs.filter(F.col("vec_id") < 16)
        base = tempfile.mkdtemp(prefix="ivfpq_soak_")
        staging, ckpt = f"{base}/in", f"{base}/ckpt"
        # 16 single-query files -> 16 micro-batches at 1 file/trigger
        queries.repartition(16, "vec_id").write.mode("overwrite").parquet(
            staging
        )
        batch_sec: list[float] = []

        streamed = drain_ivfpq_queries_from_staged(
            spark,
            staging,
            ckpt,
            idx,
            batch_hook=lambda bid, sec: batch_sec.append(round(sec, 3)),
        )
        got = sorted(map(tuple, streamed.collect()))
        want = sorted(map(tuple, ivf_pq_query(idx, queries).collect()))
    finally:
        clustering.ivf_pq_index = real_build

    nonempty = [s for s in batch_sec if s > 0]
    nonempty.sort()
    out = {
        "sf_dir": sf_dir,
        "build_sec": round(build_sec, 3),
        "index_builds_during_stream": builds["n"],
        "n_batches": len(batch_sec),
        "batch_sec": batch_sec,
        "median_batch_sec": nonempty[len(nonempty) // 2] if nonempty else None,
        "values_match": got == want and len(got) > 0,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench",
        "stream_ivfpq_soak_r12.json",
    )
    with open(path, "w") as f:
        json.dump(out, f)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
