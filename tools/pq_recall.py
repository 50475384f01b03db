"""recall@k of IVFADC raw-vector codes vs RESIDUAL codes vs exact L2.

Round-7 VERDICT item 8 (stretch): residual encoding (Jégou 2011 §IV)
should buy recall at identical index size, most visibly on a clustered
corpus where global blob structure wastes the raw codebook's
codewords. Both modes share the SAME coarse model, probes and
candidate gate, so any recall difference isolates the code quality.

Ground truth = exact squared-L2 top-k over the full corpus (self
excluded, ties by neighbor id). Run on the uniform AND clustered
scalegen fixtures.

Usage:
    python tools/pq_recall.py [sf] [k] [nprobe] [m] [k_codes]
    # defaults 1.0 10 4 4 8 (the registered toy codebook); run a
    # finer codebook (8 16) to see both modes climb toward the
    # shared gate ceiling with residual keeping its lead
Prints one JSON document; committed as bench/pq_residual_recall_r8.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def exact_l2_topk(embs, k: int, num_queries: int):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flight_events_flink_job_spark.operators.similarity import _prepared

    q = _prepared(embs.filter(F.col("vec_id") < num_queries), "q")
    c = _prepared(embs, "n")
    d2 = F.aggregate(
        F.zip_with(F.col("q_vec"), F.col("n_vec"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("q_id").orderBy(F.col("_d2"), F.col("n_id"))
    return (
        c.join(F.broadcast(q))
        .where(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", d2.alias("_d2"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id")
    )


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    nprobe = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    m = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    k_codes = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    num_queries = 16

    os.environ.setdefault("TZ", "UTC")
    time.tzset()
    from flight_events_flink_job_spark.operators.clustering import ivf_pq_topk
    from flight_events_flink_job_spark.operators.similarity import ivf_centroids
    from flight_events_flink_job_spark.session import get_spark
    from flight_events_flink_job_spark.sources.scalegen import gen_scale_tables

    spark = get_spark("pq_recall")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {
        "metric": "pq_residual_recall",
        "sf": sf,
        "k": k,
        "nprobe": nprobe,
        "m": m,
        "k_codes": k_codes,
        "fixtures": {},
    }
    for mode in ("uniform", "clustered"):
        suffix = "-clustered" if mode == "clustered" else ""
        sf_dir = f"/tmp/scalefix_r6/sf{sf}{suffix}"
        if not os.path.exists(f"{sf_dir}/embeddings.parquet"):
            gen_scale_tables(
                spark, sf_dir, sf, tables=["embeddings"], emb_mode=mode
            )
        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        truth: dict[int, set] = {}
        for r in exact_l2_topk(embs, k, num_queries).collect():
            truth.setdefault(r.q_id, set()).add(r.n_id)
        cents = ivf_centroids(embs, stride=61)
        res: dict = {"n_vectors": embs.count(), "modes": {}}
        # gate ceiling: the candidate gate is shared, so the best any
        # code can do is the fraction of true neighbors inside probed
        # cells — report it so code quality is judged against it
        for label, kwargs in (
            ("raw", {}),
            ("residual", {"residuals": True}),
        ):
            got: dict[int, set] = {}
            for r in ivf_pq_topk(
                embs,
                k=k,
                num_queries=num_queries,
                nprobe=nprobe,
                m=m,
                k_codes=k_codes,
                centroids=cents,
                **kwargs,
            ).collect():
                got.setdefault(r.q_id, set()).add(r.n_id)
            hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
            total = sum(len(t) for t in truth.values())
            res["modes"][label] = {
                "recall_at_k": round(hits / total, 4),
                "hits": hits,
                "of": total,
            }
        # shared-gate ceiling: exact re-rank of gated candidates
        from pyspark.sql import functions as F

        from flight_events_flink_job_spark.operators.similarity import (
            _prepared,
            _ranked_centroids,
        )

        cell = (
            _prepared(embs, "n")
            .select(
                F.col("n_id"),
                F.element_at(
                    _ranked_centroids(F.col("n_vec"), cents, 1), 1
                ).alias("cell"),
            )
        )
        probes = (
            _prepared(embs.filter(F.col("vec_id") < num_queries), "q")
            .select(
                "q_id",
                F.explode(
                    _ranked_centroids(F.col("q_vec"), cents, nprobe)
                ).alias("cell"),
            )
        )
        gated = {
            (r.q_id, r.n_id)
            for r in cell.join(F.broadcast(probes), "cell")
            .where(F.col("q_id") != F.col("n_id"))
            .select("q_id", "n_id")
            .collect()
        }
        in_gate = sum(
            sum(1 for n in t if (q, n) in gated) for q, t in truth.items()
        )
        res["gate_ceiling_recall"] = round(
            in_gate / sum(len(t) for t in truth.values()), 4
        )
        out["fixtures"][mode] = res
        print(f"# {mode}: {res['modes']} ceiling={res['gate_ceiling_recall']}",
              file=sys.stderr)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
