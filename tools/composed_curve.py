"""Composed end-to-end curation job at scale (VERDICT r6 item 7).

The registered ``curation_pipeline`` (quality gate -> exact dedup ->
split -> totals) fuses to one exchange and measures flat (§6e). The
expensive composition a real curation pass runs is FUZZY dedup chained
into decontamination and mixing — stages that are each curved alone
but never measured as ONE job, where cross-stage cliffs (an AQE
partition collapse feeding a skewed next stage; a dedup output
distribution starving the mix sampler) would hide.

Chain measured here, one lazy plan end to end (no mid-pipeline
materialization):

    documents
      -> neardup_dedup_corpus        (MinHash-LSH ∪ capped-prefix pairs,
                                      exact verify, CC, keep-one)
      -> decontaminate               (5-gram collision vs the stand-in
                                      doc_id%97 eval slice; broadcast
                                      benchmark n-grams) -> anti join
      -> stratified_sample           (per-lang deterministic keep)

Usage: python tools/composed_curve.py [sfs] [reps]
Prints one JSON line; committed as bench/composed_curve_r{N}.json.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    os.environ["TZ"] = "UTC"
    time.tzset()
    sfs = [float(s) for s in (sys.argv[1] if len(sys.argv) > 1 else "0.1,1.0,5.0,10.0").split(",")]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from flight_events_flink_job_spark.operators.dedup import (
        neardup_dedup_corpus,
    )
    from flight_events_flink_job_spark.operators.pipeline import (
        decontaminate,
        stratified_sample,
    )
    from flight_events_flink_job_spark.session import get_spark
    from flight_events_flink_job_spark.sources.fixtures import load_table

    spark = get_spark("composed_curve")
    spark.sparkContext.setLogLevel("ERROR")

    def job(sf_dir: str):
        docs = load_table(spark, sf_dir, "documents")
        survivors = neardup_dedup_corpus(docs).select("doc_id").join(
            docs, "doc_id"
        )
        contaminated = decontaminate(survivors).select("doc_id")
        clean = survivors.join(contaminated, "doc_id", "left_anti")
        return stratified_sample(
            clean,
            {"en": 0.5, "de": 0.5, "fr": 0.5, "es": 0.5, "zh": 0.5},
        )

    out = {"sfs": sfs, "points": {}}
    for sf in sfs:
        sf_dir = f"/tmp/scalefix_r6/sf{sf}"
        job(sf_dir).write.format("noop").mode("overwrite").save()  # warmup
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            job(sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        med = statistics.median(ts)
        out["points"][str(sf)] = {
            "sec": round(med, 3),
            "mad": round(statistics.median(abs(t - med) for t in ts), 3),
            "out_rows": job(sf_dir).count(),
        }
        print(f"# sf{sf}: {med:.2f}s", file=sys.stderr)
    pts = [out["points"][str(sf)]["sec"] for sf in sfs]
    out["alphas"] = [
        round(math.log(b / a) / math.log(hi / lo), 2)
        for (a, b), (lo, hi) in zip(zip(pts, pts[1:]), zip(sfs, sfs[1:]))
    ]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
