"""The FULLY-derived MIPS LSH config validated at 800k vectors
(round-9 VERDICT item 4 done-criterion: measured recall >= the floor
at a derived (B, T) with the rule in code).

Round 9 derived B (planes/table) from the corpus via
lsh_planes_for_corpus but hard-coded T=16; §8d addendum 2 concluded
more TABLES, not more planes, is the recall lever past the
recall-first point. lsh_tables_for_recall now derives T from the
recall SLO via the capture model 1-(1-p^B)^T (p = per-plane sign
agreement of a relevant neighbor, default 0.75 — deliberately
conservative so the derived T lands AT OR ABOVE the target).

This tool runs exact MIPS vs the LSH tier at |Q|=64 on the 800k
uniform fixture with BOTH knobs derived (recall-first target_bucket →
B, target_recall → T), records wall + recall@10, and fails loudly if
the measured recall misses the SLO the rule promised.

Usage: python tools/mips_derived_config.py [out_json] [fixture_base]
Committed as bench/mips_rule_applied_r10.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGET_RECALL = 0.85


def main() -> None:
    out_path = (
        sys.argv[1] if len(sys.argv) > 1 else "bench/mips_rule_applied_r10.json"
    )
    base = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scalefix_r6"

    os.environ.setdefault("TZ", "UTC")
    time.tzset()
    from pyspark.sql import functions as F

    from flight_events_flink_job_spark.operators.similarity import (
        lsh_planes_for_corpus,
        lsh_tables_for_recall,
        mips_topk,
        mips_topk_lsh,
    )
    from flight_events_flink_job_spark.session import get_spark

    spark = get_spark("mips-derived")
    spark.sparkContext.setLogLevel("ERROR")
    embs = spark.read.parquet(f"{base}/sf40.0/embeddings.parquet")
    n = embs.count()
    nq = 64

    # BOTH knobs derived: recall-first bucket target -> B; SLO -> T.
    planes = lsh_planes_for_corpus(n, target_bucket=4096)
    tables = lsh_tables_for_recall(TARGET_RECALL, planes)

    def timed(fn) -> float:
        samples = []
        for _ in range(3):
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
    exact.count()

    lsh_sec = timed(
        lambda: mips_topk_lsh(
            embs, num_queries=nq, num_tables=tables, num_planes=planes
        )
    )
    approx = mips_topk_lsh(
        embs, num_queries=nq, num_tables=tables, num_planes=planes
    ).select("q_id", F.col("n_id").alias("a_id"))
    row = (
        exact.join(
            approx,
            (exact.q_id == approx.q_id) & (F.col("e_id") == F.col("a_id")),
            "left",
        )
        .drop(approx.q_id)
        .agg(
            F.count("*").alias("n_exact"),
            F.sum(F.when(F.col("a_id").isNotNull(), 1).otherwise(0)).alias(
                "n_hit"
            ),
        )
        .collect()[0]
    )
    recall = row.n_hit / row.n_exact
    out = {
        "rows": n,
        "num_queries": nq,
        "k": 10,
        "target_recall": TARGET_RECALL,
        "derived_planes": planes,
        "derived_tables": tables,
        "exact_sec": exact_sec,
        "lsh_sec": lsh_sec,
        "speedup": round(exact_sec / lsh_sec, 2),
        "recall_at_10": round(recall, 4),
        "meets_slo": bool(recall >= TARGET_RECALL),
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), file=sys.stderr)
    if not out["meets_slo"]:
        raise SystemExit(
            f"derived (B={planes}, T={tables}) missed the recall SLO: "
            f"{recall:.4f} < {TARGET_RECALL}"
        )


if __name__ == "__main__":
    main()
