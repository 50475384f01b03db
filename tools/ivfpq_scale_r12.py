"""Scale check of the round-12 IVFADC index/query split: build the
residual index ONCE at 200k/400k/800k vectors (the cached scale
fixtures), then serve repeated query batches from the persisted
artifacts — the numbers that substantiate "write codes once, serve
queries from them" past driver scale.

Records per scale point: index build wall (one-time), serve median/MAD
over reps (16 queries per call), and the build:serve ratio. The serve
side must stay roughly flat in corpus size relative to build (it
touches ~nprobe/|C| of the corpus in codes), while build is linear.

Writes bench/ivfpq_scale_r12.json (one JSON object per line).

Usage: python tools/ivfpq_scale_r12.py [sf ...]   # default 10.0 20.0 40.0
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXDIR = "/tmp/scalefix_r6"


def main() -> None:
    sfs = sys.argv[1:] or ["10.0", "20.0", "40.0"]
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        # fresh-process tool: size the single local JVM for the 800k
        # residual build (the default 1g heap OOMs at 200k)
        .config("spark.driver.memory", "48g")
        .appName("ivfpq_scale_r12")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from flight_events_flink_job_spark.operators.clustering import (
        ivf_pq_index,
        ivf_pq_query,
    )
    from flight_events_flink_job_spark.operators.similarity import (
        ivf_centroids,
    )
    from flight_events_flink_job_spark.sources.fixtures import load_table

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench",
        "ivfpq_scale_r12.json",
    )
    # Untimed warmup build+serve at the smallest cached fixture: the
    # first Spark jobs of a session pay JVM/codegen/Arrow-UDF init that
    # otherwise lands entirely on the first scale point (first run of
    # this tool read build 137 s at 200k vs 78 s at 800k — the order
    # artifact, not the curve).
    wdir = os.path.join(FIXDIR, "sf2.0")
    wembs = load_table(spark, wdir, "embeddings")
    widx = ivf_pq_index(
        wembs, centroids=ivf_centroids(wembs), residuals=True
    )
    ivf_pq_query(widx, wembs.filter(F.col("vec_id") < 16)).count()
    widx.unpersist()
    spark.catalog.clearCache()

    results = []
    for sf in sfs:
        sf_dir = os.path.join(FIXDIR, f"sf{sf}")
        embs = load_table(spark, sf_dir, "embeddings")
        n = embs.count()
        cents = ivf_centroids(embs)
        t0 = time.monotonic()
        idx = ivf_pq_index(embs, centroids=cents, residuals=True)
        build = time.monotonic() - t0
        serves = []
        for rep in range(5):
            t0 = time.monotonic()
            got = ivf_pq_query(
                idx, embs.filter(F.col("vec_id") < 16)
            ).count()
            serves.append(round(time.monotonic() - t0, 3))
        med = statistics.median(serves)
        rec = {
            "sf": sf,
            "n_vectors": n,
            "n_cells": len(cents),
            "build_sec": round(build, 3),
            "serve_sec": serves,
            "serve_median_sec": med,
            "build_over_serve": round(build / med, 1),
            "rows_served": got,
        }
        results.append(rec)
        print(json.dumps(rec))
        idx.unpersist()
        spark.catalog.clearCache()
    with open(out_path, "w") as f:
        for rec in results:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
