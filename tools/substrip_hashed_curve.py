"""String-key vs xxhash64-key exact_substring_strip at scale (round-9
VERDICT item 6 done-criterion: curve the hashed-key mode at sf2+
against the string key and record the shuffle-width delta).

Both modes run the identical plan shape; the hashed mode's three
gram-keyed exchanges (distinct, df-count groupBy, starts join) carry
8-byte BIGINT keys instead of the raw ~(n tokens) string. The tool
times both modes per scale point (1 warmup + 3 reps, median + MAD)
and computes the key-width delta from the data itself: avg gram
string bytes x gram count vs 8 x gram count — the actual bytes the
exchanges stop carrying.

Usage: python tools/substrip_hashed_curve.py [out_json] [--sfs 0.5,2.0]
Fixtures via tools/gen_scalefix.py convention (documents table only).
Committed as bench/substrip_hashed_curve_r10.json.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="bench/substrip_hashed_curve_r10.json")
    ap.add_argument("--sfs", default="0.5,2.0")
    ap.add_argument("--base", default="/tmp/scalefix_r6")
    args = ap.parse_args()

    os.environ.setdefault("TZ", "UTC")
    time.tzset()
    from pyspark.sql import functions as F

    from flight_events_flink_job_spark.operators.dedup import (
        exact_substring_strip,
    )
    from flight_events_flink_job_spark.session import get_spark
    from flight_events_flink_job_spark.sources.scalegen import gen_scale_tables

    spark = get_spark("substrip_curve")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(fn) -> tuple[float, float]:
        fn().write.format("noop").mode("overwrite").save()  # warmup
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        med = statistics.median(samples)
        return round(med, 3), round(
            statistics.median(abs(s - med) for s in samples), 3
        )

    points = []
    for sf in [float(s) for s in args.sfs.split(",")]:
        sf_dir = f"{args.base}/sf{sf}"
        if not os.path.exists(f"{sf_dir}/documents.parquet"):
            gen_scale_tables(spark, sf_dir, sf, tables=["documents"])
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_docs = docs.count()
        # key-width accounting from the data: the 8-token gram table
        # the three exchanges carry (docs with >= 8 tokens only)
        toks = docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("nt"), "text"
        )
        stats = (
            toks.where(F.col("nt") >= 8)
            .select(
                (F.col("nt") - 7).alias("n_grams"),
                # mean gram width ~ 8 tokens + 7 separators of the
                # doc's mean token length
                (
                    (F.length("text") / F.col("nt")) * 8 + 7
                ).alias("gram_bytes"),
            )
            .agg(
                F.sum("n_grams").alias("total_grams"),
                F.avg("gram_bytes").alias("avg_gram_bytes"),
            )
            .collect()[0]
        )
        str_sec, str_mad = timed(lambda: exact_substring_strip(docs))
        hash_sec, hash_mad = timed(
            lambda: exact_substring_strip(docs, hash_key=True)
        )
        points.append(
            {
                "sf": sf,
                "n_docs": n_docs,
                "total_grams": int(stats.total_grams),
                "avg_gram_bytes": round(float(stats.avg_gram_bytes), 1),
                "hashed_key_bytes": 8,
                "key_width_ratio": round(float(stats.avg_gram_bytes) / 8, 1),
                "string_sec": str_sec,
                "string_mad": str_mad,
                "hashed_sec": hash_sec,
                "hashed_mad": hash_mad,
                "speedup": round(str_sec / hash_sec, 2),
            }
        )
        print(json.dumps(points[-1]), file=sys.stderr, flush=True)

    with open(args.out, "w") as fh:
        json.dump({"points": points}, fh, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
