"""Numpy dry-run audit for the round-12 portable-plane conversion
(similarity_topk_lsh / ann_recall_eval / dedup_embedding_cosine).

Round-11 lesson (BASELINE.md §10): validate a randomized structure on
BUCKET BALANCE and candidate cost, not recall alone — the affine-only
recurrence had recall 0.98 while admitting 21x the Gaussian candidate
count. This script compares the seeded Gaussian draw against
similarity.portable_planes at dim 64 on the real fixture corpora
before any oracle is rewritten:

  - candidate pairs admitted per config (cost),
  - max/mean bucket occupancy (balance),
  - recall@10 vs exact cosine for the topk config (quality).

Usage: python tools/plane_audit_r12.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flight_events_flink_job_spark.operators.similarity import (  # noqa: E402
    portable_planes,
)


def load(sf_dir: str) -> np.ndarray:
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = np.asarray(t["vec_id"])
    order = np.argsort(ids)
    mat = np.vstack(t["embedding"].to_pylist()).astype(np.float64)
    return mat[order]


def codes(mat: np.ndarray, planes: np.ndarray, num_tables: int, num_planes: int):
    # dim-by-dim accumulation — the engine's exact summation order
    acc = np.zeros((len(mat), planes.shape[0]))
    for i in range(mat.shape[1]):
        acc += mat[:, i : i + 1] * planes[:, i]
    bits = (acc >= 0).astype(np.int64).reshape(len(mat), num_tables, num_planes)
    w = 1 << np.arange(num_planes - 1, -1, -1)
    return (bits * w).sum(axis=2) + (np.arange(num_tables) << num_planes)


def audit_topk(mat, planes, num_tables=16, num_planes=4, k=10, nq=16):
    c = codes(mat, planes, num_tables, num_planes)
    # candidate set per query: shares >= 1 (table, code) bucket
    cand_total = 0
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sims = norm[:nq] @ norm.T
    hits = total = 0
    occ_max = 0
    for t in range(num_tables):
        vals, cnt = np.unique(c[:, t], return_counts=True)
        occ_max = max(occ_max, int(cnt.max()))
    for q in range(nq):
        mask = (c == c[q]).any(axis=1)
        mask[q] = False
        cand = np.flatnonzero(mask)
        cand_total += len(cand)
        s = sims[q].copy()
        s[q] = -np.inf
        exact = set(np.argsort(-s)[:k].tolist())
        if len(cand):
            sc = s[cand]
            approx = set(np.asarray(cand)[np.argsort(-sc)[:k]].tolist())
        else:
            approx = set()
        hits += len(exact & approx)
        total += len(exact)
    return {
        "cand_per_query": round(cand_total / nq, 1),
        "recall_at_10": round(hits / total, 4),
        "max_bucket_occupancy": occ_max,
    }


def audit_dedup(mat, planes, num_tables=8, num_planes=4, max_bucket=128):
    c = codes(mat, planes, num_tables, num_planes)
    pairs = set()
    occ_max = 0
    for t in range(num_tables):
        vals, inv, cnt = np.unique(c[:, t], return_inverse=True, return_counts=True)
        occ_max = max(occ_max, int(cnt.max()))
        for b in np.flatnonzero(cnt <= max_bucket):
            members = np.flatnonzero(inv == b)
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    pairs.add((int(members[i]), int(members[j])))
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    n_verified = sum(
        1 for a, b in pairs if round(float(norm[a] @ norm[b]), 4) >= 0.4
    )
    return {
        "candidate_pairs": len(pairs),
        "verified_pairs": n_verified,
        "max_bucket_occupancy": occ_max,
    }


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    out = {}
    for sf_dir in dirs:
        mat = load(sf_dir)
        n, dim = mat.shape
        rng42 = np.random.default_rng(42)
        seeded_topk = rng42.standard_normal((16 * 4, dim))
        port_topk = portable_planes(16 * 4, dim)
        # dedup config: 8 tables, adaptive planes at this N
        import math

        npl = min(16, max(4, math.ceil(math.log2(max(n, 64) / 32))))
        rng42b = np.random.default_rng(42)
        seeded_ded = rng42b.standard_normal((8 * npl, dim))
        port_ded = portable_planes(8 * npl, dim)
        out[sf_dir] = {
            "n": n,
            "dedup_num_planes": npl,
            "topk_seeded": audit_topk(mat, seeded_topk),
            "topk_portable": audit_topk(mat, port_topk),
            "dedup_seeded": audit_dedup(mat, seeded_ded, num_planes=npl),
            "dedup_portable": audit_dedup(mat, port_ded, num_planes=npl),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
