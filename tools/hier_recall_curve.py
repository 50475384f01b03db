"""recall@k vs nprobe for the HIERARCHICAL quantizer family (round-8
VERDICT item 5): the hier tier's occupancy wins (bench/
scale_curve_r8_vectors.json) need a stated recall floor — this curve
measures, per nprobe, how much of the exact top-k the two-level router
retains, on the clustered sf40 fixture where the hier tier earns its
keep (and the uniform one for contrast).

Ground truth per family matches the family's own metric:

- ``similarity_topk_ivf_hier`` (cosine re-rank over probed cells) is
  scored against EXACT COSINE top-k over the full corpus;
- ``ivf_pq_topk_hier`` (ADC L2 over probed cells, registered toy
  codebook m=4/k_codes=8) against EXACT L2 top-k. Its ceiling is the
  GATE recall (true neighbors inside probed cells) degraded by code
  quantization — both reported, so code loss and routing loss are
  separable.

One hier model per fixture (target_occupancy=64, the registered
default), shared across the nprobe sweep — recall differences isolate
the probe count.

Usage: python tools/hier_recall_curve.py [sf] [k] [num_queries]
Prints one JSON document; committed as bench/hier_recall_curve_r9.json.
The pytest floor (tests/test_similarity.py
test_hier_recall_floor_at_default_nprobe) asserts recall@10 >= the
documented floor at the default nprobe=4 on the driver fixture.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 40.0
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    num_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    os.environ.setdefault("TZ", "UTC")
    time.tzset()
    from pyspark.sql import functions as F

    from flight_events_flink_job_spark.operators.clustering import ivf_pq_topk
    from flight_events_flink_job_spark.operators.similarity import (
        _prepared,
        _ranked_cells_hier,
        cosine_topk,
        cosine_topk_ivf_hier,
        ivf_model_hier,
    )
    from flight_events_flink_job_spark.session import get_spark
    from flight_events_flink_job_spark.sources.scalegen import gen_scale_tables
    from pq_recall import exact_l2_topk

    spark = get_spark("hier_recall_curve")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {
        "metric": "hier_recall_vs_nprobe",
        "sf": sf,
        "k": k,
        "num_queries": num_queries,
        "target_occupancy": 64,
        "fixtures": {},
    }
    for mode in ("clustered", "uniform"):
        suffix = "-clustered" if mode == "clustered" else ""
        sf_dir = f"/tmp/scalefix_r6/sf{sf}{suffix}"
        if not os.path.exists(f"{sf_dir}/embeddings.parquet"):
            gen_scale_tables(
                spark, sf_dir, sf, tables=["embeddings"], emb_mode=mode
            )
        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n_vec = embs.count()

        t0 = time.perf_counter()
        model = ivf_model_hier(embs, target_occupancy=64)
        train_s = round(time.perf_counter() - t0, 1)

        def truth_set(df):
            t: dict[int, set] = {}
            for r in df.collect():
                t.setdefault(r.q_id, set()).add(r.n_id)
            return t

        cos_truth = truth_set(cosine_topk(embs, k=k, num_queries=num_queries))
        l2_truth = truth_set(exact_l2_topk(embs, k, num_queries))
        total_cos = sum(len(t) for t in cos_truth.values())
        total_l2 = sum(len(t) for t in l2_truth.values())

        # corpus cell assignment reused across the gate-recall sweep
        corpus_cells = {
            r.n_id: r.cell
            for r in _prepared(embs, "n")
            .select(
                "n_id",
                F.try_element_at(
                    _ranked_cells_hier(F.col("n_vec"), model, 1), F.lit(1)
                ).alias("cell"),
            )
            .collect()
        }

        fixture: dict = {
            "n_vectors": n_vec,
            "train_s": train_s,
            "nprobe": {},
        }
        for nprobe in (1, 2, 4, 8, 16):
            point: dict = {}
            t0 = time.perf_counter()
            got = truth_set(
                cosine_topk_ivf_hier(
                    embs, k=k, num_queries=num_queries, nprobe=nprobe,
                    model=model,
                )
            )
            point["cosine_search_s"] = round(time.perf_counter() - t0, 1)
            hits = sum(len(got.get(q, set()) & t) for q, t in cos_truth.items())
            point["cosine_recall"] = round(hits / total_cos, 4)

            # gate recall: fraction of exact-L2 neighbors inside probed
            # cells (the ceiling any code quality can reach)
            probes = {
                r.q_id: set(r.probes)
                for r in _prepared(
                    embs.filter(F.col("vec_id") < num_queries), "q"
                )
                .select(
                    "q_id",
                    _ranked_cells_hier(F.col("q_vec"), model, nprobe).alias(
                        "probes"
                    ),
                )
                .collect()
            }
            gate_hits = sum(
                sum(1 for nb in t if corpus_cells.get(nb) in probes[q])
                for q, t in l2_truth.items()
            )
            point["pq_gate_ceiling"] = round(gate_hits / total_l2, 4)

            # two codebooks: the REGISTERED toy (m=4, k_codes=8 —
            # 4096 distinct codes, sized for oracle tractability; its
            # ADC ties make recall FALL as extra probed candidates
            # displace true neighbors by lower-id tie-break) and a
            # production-ish m=8/k_codes=16 where code resolution
            # stops dominating the gate.
            for label, m_, kc in (("pq_toy", 4, 8), ("pq_m8k16", 8, 16)):
                t0 = time.perf_counter()
                got = truth_set(
                    ivf_pq_topk(
                        embs, k=k, num_queries=num_queries, nprobe=nprobe,
                        m=m_, k_codes=kc, hier_model=model,
                    )
                )
                point[f"{label}_search_s"] = round(time.perf_counter() - t0, 1)
                hits = sum(
                    len(got.get(q, set()) & t) for q, t in l2_truth.items()
                )
                point[f"{label}_recall"] = round(hits / total_l2, 4)

            fixture["nprobe"][str(nprobe)] = point
            print(f"# {mode} sf{sf} nprobe={nprobe}: {point}", file=sys.stderr)
        out["fixtures"][mode] = fixture

    print(json.dumps(out))


if __name__ == "__main__":
    main()
