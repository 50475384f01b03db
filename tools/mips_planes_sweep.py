"""Planes-per-table sweep for the augmented-MIPS LSH tier at high
query count — the tuning axis the crossover measurement exposed.

bench/mips_crossover_r9.json shows the registered 16x4 config winning
only near |Q|=256 on the 200k-vector fixture: with B=4 planes a random
pair matches some table with p = 1-(1-2^-4)^16 ~ 0.64, so the
"pruned" candidate set is ~64% of the corpus PER QUERY and the
LSH pipeline's join machinery can't beat the exact scan's raw matmul
economics as |Q| grows. B is the lever: bucket population halves per
added plane (recall pays — fewer tables agree on all B signs), i.e.
B ~ log2(N / target_bucket) must scale with the corpus, exactly like
the adaptive planes-per-table in dedup.embedding_neardup_cosine.
This sweep measures both sides of that trade at |Q|=1024.

Usage: python tools/mips_planes_sweep.py [out_json] [fixture_base]
Writes one JSON document (file, not stdout — GC-warning pollution).
Committed as bench/mips_planes_sweep_r9.json.
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
        sys.argv[1] if len(sys.argv) > 1 else "bench/mips_planes_sweep_r9.json"
    )
    base = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scalefix_r6"

    os.environ.setdefault("TZ", "UTC")
    time.tzset()
    from pyspark.sql import functions as F

    from flight_events_flink_job_spark.operators.similarity import (
        mips_topk,
        mips_topk_lsh,
    )
    from flight_events_flink_job_spark.session import get_spark

    spark = get_spark("mips-planes")
    embs = spark.read.parquet(f"{base}/sf10.0/embeddings.parquet")
    n = embs.count()
    nq = 1024

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
        "by_num_planes": {},
    }
    for planes in (4, 6, 8, 10):
        sec = timed(
            lambda: mips_topk_lsh(embs, num_queries=nq, num_planes=planes)
        )
        approx = mips_topk_lsh(
            embs, num_queries=nq, num_planes=planes
        ).select("q_id", F.col("n_id").alias("a_id"))
        hits = (
            exact.join(
                approx,
                (exact.q_id == approx.q_id)
                & (F.col("e_id") == F.col("a_id")),
                "inner",
            ).count()
        )
        out["by_num_planes"][str(planes)] = {
            "lsh_sec": sec,
            "recall_at_10": round(hits / n_exact, 4),
            "wins": sec < exact_sec,
        }
        print(
            f"# B={planes}: lsh {sec}s recall {hits / n_exact:.3f} "
            f"(exact {exact_sec}s)",
            file=sys.stderr,
        )
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
