"""Corpus-derived plane-agreement probability feeding the MIPS LSH
table derivation, validated at 800k vectors (round-10 VERDICT item 3
done-criterion: recall >= SLO with T BELOW the 0.75-default value).

Round 10 derived both (B, T) but fed the capture model the
conservative 45-degree default p = 0.75; the measured over-delivery
(recall 0.9062 vs the 0.85 SLO at T=18, bench/mips_rule_applied_r10)
said real corpora cluster tighter. similarity.plane_agree_p_sample
now measures the per-pair p distribution from sampled true top-k
neighbor pairs in the augmented space (the geometry the sign-LSH
actually buckets) and lsh_tables_for_recall_from_pairs derives T from
the DISTRIBUTION — the first run of this tool plugged the MEAN p into
the closed form and measured recall 0.823 < SLO at T=13 (the Jensen
gap: capture is convex in p, low-p pairs dominate misses), which is
why the pair-level rule exists. This tool derives T that way, runs
the LSH tier at the smaller derived config, and fails loudly if
recall misses the SLO or if the derived T fails to undercut the
default-p T.

Also validates the portable-plane recurrence at scale (round-10
VERDICT item 8): the same derived config is run with
plane_source="portable" (the oracle-compact integer-hash planes the
registry queries now use) and must meet the same SLO — evidence the
uniform-entry planes are recall-equivalent to the seeded Gaussian
draw beyond fixture scale.

Usage: python tools/mips_derived_p.py [out_json] [fixture_base]
Committed as bench/mips_rule_applied_r11.json.
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
        sys.argv[1] if len(sys.argv) > 1 else "bench/mips_rule_applied_r11.json"
    )
    base = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scalefix_r6"

    os.environ.setdefault("TZ", "UTC")
    time.tzset()
    from pyspark.sql import functions as F

    from flight_events_flink_job_spark.operators.similarity import (
        lsh_planes_for_corpus,
        lsh_tables_for_recall,
        lsh_tables_for_recall_from_pairs,
        mips_topk,
        mips_topk_lsh,
        plane_agree_p_sample,
    )
    from flight_events_flink_job_spark.session import get_spark

    spark = get_spark("mips-derived-p")
    spark.sparkContext.setLogLevel("ERROR")
    embs = spark.read.parquet(f"{base}/sf40.0/embeddings.parquet")
    n = embs.count()
    nq = 64

    planes = lsh_planes_for_corpus(n, target_bucket=4096)
    t_default = lsh_tables_for_recall(TARGET_RECALL, planes)  # p = 0.75
    ps = plane_agree_p_sample(embs, k=10, num_queries=nq)
    p_hat = sum(ps) / len(ps)
    t_mean = lsh_tables_for_recall(TARGET_RECALL, planes, plane_agree_p=p_hat)
    tables = lsh_tables_for_recall_from_pairs(ps, TARGET_RECALL, planes)

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
    n_exact = exact.count()

    def recall_of(plane_source: str) -> tuple[float, float]:
        sec = timed(
            lambda: mips_topk_lsh(
                embs,
                num_queries=nq,
                num_tables=tables,
                num_planes=planes,
                plane_source=plane_source,
            )
        )
        approx = mips_topk_lsh(
            embs,
            num_queries=nq,
            num_tables=tables,
            num_planes=planes,
            plane_source=plane_source,
        ).select("q_id", F.col("n_id").alias("a_id"))
        hits = (
            exact.join(
                approx,
                (exact.q_id == approx.q_id) & (F.col("e_id") == F.col("a_id")),
                "left",
            )
            .where(F.col("a_id").isNotNull())
            .count()
        )
        return hits / n_exact, sec

    recall_seeded, lsh_sec = recall_of("seeded")
    recall_portable, lsh_sec_portable = recall_of("portable")

    out = {
        "rows": n,
        "num_queries": nq,
        "k": 10,
        "target_recall": TARGET_RECALL,
        "derived_planes": planes,
        "estimated_p": round(p_hat, 4),
        "pair_sample_size": len(ps),
        "tables_default_p": t_default,
        "tables_mean_p": t_mean,
        "derived_tables": tables,
        "tables_saved": t_default - tables,
        "exact_sec": exact_sec,
        "lsh_sec": lsh_sec,
        "lsh_sec_portable": lsh_sec_portable,
        "speedup": round(exact_sec / lsh_sec, 2),
        "recall_at_10": round(recall_seeded, 4),
        "recall_at_10_portable": round(recall_portable, 4),
        "meets_slo": bool(
            recall_seeded >= TARGET_RECALL
            and recall_portable >= TARGET_RECALL
        ),
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), file=sys.stderr)
    if not out["meets_slo"]:
        raise SystemExit(
            f"derived (B={planes}, T={tables}, p={p_hat:.3f}) missed the "
            f"recall SLO: seeded {recall_seeded:.4f} / portable "
            f"{recall_portable:.4f} < {TARGET_RECALL}"
        )
    if tables >= t_default:
        raise SystemExit(
            f"derived p {p_hat:.3f} did not undercut the default-p table "
            f"count ({tables} >= {t_default}) — the corpus-derivation "
            "bought nothing here"
        )


if __name__ == "__main__":
    main()
