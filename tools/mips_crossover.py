"""Query-count crossover between exact MIPS (broadcast BNLJ, O(|Q|*N))
and the augmented-LSH tier (O(T*N) corpus bucketing + bucket join).

The sf10-40 wall curve (bench/scale_curve_r9_mips.json) showed the LSH
tier LOSING to exact at the registered |Q|=16 — expected: with T=16
tables the corpus-side bucketing alone costs as much as scoring all 16
queries exactly. The LSH tier's economics are per-QUERY: its corpus
pass is fixed in |Q| while exact grows linearly, so there is a |Q|
crossover above which the approximate tier wins. This measures it.

Usage: python tools/mips_crossover.py [sf] [fixture_base] [out_json]
Writes one JSON document to out_json (file, not stdout — JVM GC
warnings under heavy allocation land on stdout and polluted the first
artifact, recovered by stripping). Committed as
bench/mips_crossover_r9.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "10.0"
    base = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scalefix_r6"
    out_path = (
        sys.argv[3] if len(sys.argv) > 3 else "bench/mips_crossover_r9.json"
    )

    os.environ.setdefault("TZ", "UTC")
    time.tzset()
    from flight_events_flink_job_spark.operators.similarity import (
        mips_topk,
        mips_topk_lsh,
    )
    from flight_events_flink_job_spark.session import get_spark

    spark = get_spark("mips-crossover")
    embs = spark.read.parquet(f"{base}/sf{sf}/embeddings.parquet")
    n = embs.count()

    def timed(fn) -> float:
        samples = []
        for rep in range(3):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        return round(statistics.median(samples), 3)

    out: dict = {"sf": sf, "rows": n, "k": 10, "num_tables": 16, "points": []}
    for nq in (16, 64, 256, 1024):
        e = timed(lambda: mips_topk(embs, num_queries=nq))
        a = timed(lambda: mips_topk_lsh(embs, num_queries=nq))
        out["points"].append(
            {"num_queries": nq, "exact_sec": e, "lsh_sec": a,
             "lsh_wins": a < e}
        )
        print(f"# |Q|={nq}: exact {e}s lsh {a}s", file=sys.stderr)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
