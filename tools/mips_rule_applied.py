"""The §8d planes rule APPLIED at the largest fixture: exact vs
augmented-LSH at |Q|=64 on 800k uniform vectors, B from
similarity.lsh_planes_for_corpus at two recall targets
(target_bucket=128 -> B=13, target_bucket=4096 -> B=8), wall + recall
for each — closing the loop from "the lever exists" (planes sweep, 200k
rows, |Q|=1024) to "derive it from the data and it wins here too".

Usage: python tools/mips_rule_applied.py [out_json] [fixture_base]
Writes one JSON document (file, not stdout). Committed as
bench/mips_rule_applied_r9.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "bench/mips_rule_applied_r9.json"
    )
    base = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scalefix_r6"

    os.environ.setdefault("TZ", "UTC")
    time.tzset()
    from pyspark.sql import functions as F

    from flight_events_flink_job_spark.operators.similarity import (
        lsh_planes_for_corpus,
        mips_topk,
        mips_topk_lsh,
    )
    from flight_events_flink_job_spark.session import get_spark

    spark = get_spark("mips-rule")
    embs = spark.read.parquet(f"{base}/sf40.0/embeddings.parquet")
    n = embs.count()
    nq = 64

    def timed(fn) -> float:
        samples = []
        for rep in range(3):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        return round(statistics.median(samples), 3)

    exact_sec = timed(lambda: mips_topk(embs, num_queries=nq))
    exact = (
        mips_topk(embs, num_queries=nq)
        .select("q_id", F.col("n_id").alias("e_id"))
        .persist()
    )
    n_exact = exact.count()

    out: dict = {
        "rows": n,
        "num_queries": nq,
        "k": 10,
        "num_tables": 16,
        "exact_sec": exact_sec,
        "configs": {},
    }
    for label, target in (("recall-first", 4096), ("speed-first", 128)):
        planes = lsh_planes_for_corpus(n, target_bucket=target)
        sec = timed(
            lambda: mips_topk_lsh(embs, num_queries=nq, num_planes=planes)
        )
        approx = mips_topk_lsh(
            embs, num_queries=nq, num_planes=planes
        ).select("q_id", F.col("n_id").alias("a_id"))
        hits = exact.join(
            approx,
            (exact.q_id == approx.q_id) & (F.col("e_id") == F.col("a_id")),
            "inner",
        ).count()
        out["configs"][label] = {
            "target_bucket": target,
            "derived_planes": planes,
            "lsh_sec": sec,
            "recall_at_10": round(hits / n_exact, 4),
            "wins": sec < exact_sec,
        }
        print(
            f"# {label}: B={planes} lsh {sec}s recall {hits / n_exact:.3f}"
            f" (exact {exact_sec}s)",
            file=sys.stderr,
        )
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
