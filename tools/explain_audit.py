"""Dump `.explain("formatted")` physical plans for representative
queries into a committed markdown file — the ".explain and iterate"
evidence backing the plan-shape claims in README.md §"How this runs at
100 TB" (broadcasts where claimed, pushed filters, pruned schemas, no
cartesian products, whole-stage codegen spans).

Usage: python tools/explain_audit.py [sf_dir] [out_md]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

# One representative per plan family.
AUDIT = [
    ("flights_raw", "parse/enrich: narrow, no shuffle, codegen-fused"),
    ("airline_delay_stats", "windowed aggregate: one exchange, partial agg"),
    ("forecast_revenue_change", "Q6 scan: all predicates in PushedFilters"),
    ("segment_revenue", "big-big join co-partitioned + broadcast dim"),
    ("min_cost_supplier", "Q2: window-min over one aggregate, no subtree reuse"),
    ("dedup_near_minhash", "LSH bucket equi-join, no CartesianProduct"),
    ("pq_topk", "fused Lloyd + broadcast ADC table over code triples"),
    ("corpus_shuffle", "distributed total order: range partition + offsets"),
    ("merge_upsert", "MERGE as co-partitioned full-outer rewrite"),
    ("customer_value_deciles", "global order without a single-partition window"),
    # round-5 additions, one per new plan family:
    ("gopher_quality_signals", "rule signals: single narrow map stage, no exchange"),
    ("weighted_sample_es", "weighted reservoir: TakeOrderedAndProject top-k"),
    ("similarity_radius", "radius search: broadcast queries, threshold gate, no rank state"),
    # round-5 late additions:
    ("cms_user_counts", "CMS: explode-to-cells, one groupBy-as-merge, broadcast sketch probe"),
    ("bloom_membership", "Bloom: distinct-position bit table broadcast to probes"),
    ("events_unpivot", "UNPIVOT: zero-shuffle Expand over one aggregate exchange"),
    ("ewma_daily_value", "EWMA: one aggregate + one 12-lag window pass, integer math"),
    ("dedup_edit_distance", "edit-distance: df-capped shingle block join + banded levenshtein"),
    ("source_overlap_minhash", "source MinHash: mergeable min signature, signature-space pairs"),
    ("rrf_retrieval", "RRF: two windows over one broadcast-pruned posting stream"),
    # round-6 plan-affecting changes:
    ("neardup_components", "CC over the linear pair source: LSH ∪ df-capped prefix, exact verify"),
    ("dedup_ngram_jaccard", "linear union (LSH + df-capped PPJoin prefix filter) + exact verify"),
    ("user_triangles", "bucket-occupancy-capped co-occurrence + fixed-size wedge join"),
    ("last_touch_attribution", "as-of lookup: one exchange + per-user sorted window, zero pair expansion"),
    # round-7 additions:
    ("ivf_pq_topk", "IVF gate (broadcast probes) -> code join -> broadcast ADC table -> k-window"),
    ("semdedup_scaled", "Arrow assignment vs driver-held centroids, one applyInPandas verdict pass"),
    ("user_triangles_exact", "uncapped audit tier: same wedge join, no occupancy gate"),
    # round-8 additions (hierarchical quantizer family + residual IVFADC):
    ("similarity_topk_ivf_hier", "two-level Arrow routing, same posting-list gate + exact re-rank"),
    ("ivf_pq_topk_hier", "hier cell gate -> code join -> broadcast ADC table -> k-window"),
    ("semdedup_hier", "hier assignment, broadcast cell-centroid d2, one applyInPandas pass"),
    ("ivf_pq_topk_residual", "r12 SERVE plan: InMemoryTableScans over persisted cells/codes + broadcast per-cell ADC — no Lloyd, no ranker in the query path"),
    # round-9 session additions:
    ("mips_topk", "broadcast 16 queries, ONE corpus scan, inner-product BNLJ + bounded top-k"),
    ("mips_topk_lsh", "norm-augmented sign-LSH bucket equi-join, exact dot re-rank, no corpus cross"),
    ("ccnet_lm_buckets", "bigram LM train/score + histogram cuts broadcast back — no per-doc sort"),
    ("exact_substring_strip", "window-frequency equi-join + gaps-and-islands span merge"),
    # round-10 additions:
    ("exact_substring_strip_hashed", "same plan, 8-byte xxhash64 keys through the three gram exchanges"),
    ("multimodal_png_dhash", "mapInPandas encode -> REAL PNG decode -> dhash; no shuffle, Arrow-batched"),
    ("mips_topk_lsh_auto", "derived (B, T) sign-LSH: bucket equi-join shape identical to the pinned config"),
    # round-11 additions:
    ("multimodal_png_dhash_rgb", "RGB PNG encode/decode + integer luma -> dhash; same no-shuffle Arrow tier"),
    ("incremental_neardup", "persisted prelude (pairs + shingle sets) feeding live verify + anti-join"),
    # round-12 additions (index/query split + paired-T promotion):
    ("mips_topk_lsh_paired", "pair-derived T sign-LSH: same bucket equi-join shape, T from the pair sample"),
    ("similarity_topk_lsh", "portable-recurrence planes: plan identical to the seeded draw (UDF closure swap)"),
]


def main() -> int:
    os.environ["TZ"] = "UTC"
    time.tzset()
    from flight_events_flink_job_spark.plans import QUERIES
    from flight_events_flink_job_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "tools/plans_r4.md"
    spark = get_spark("explain_audit")
    lines = [
        "# Physical plan audit (generated by tools/explain_audit.py)",
        "",
        f"sf_dir: `{sf_dir}` — one representative query per plan family;",
        "regenerate after any plan-affecting change.",
        "",
    ]
    import contextlib
    import io

    for name, why in AUDIT:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        lines += [f"## {name}", "", f"_{why}_", "", "```", plan.rstrip(), "```", ""]
    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_md} ({len(AUDIT)} plans)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
