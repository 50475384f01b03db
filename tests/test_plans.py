"""Plan-shape regression gate over EVERY registered query.

The scale contract (SURVEY.md §2.6, README design stance): no
all-pairs joins, no row-at-a-time Python UDFs, anywhere. A regression
that introduces either would still pass value-correctness at fixture
scale while being catastrophic at 100 TB — so the physical plans
themselves are asserted here.
"""

from __future__ import annotations

import pytest

from flight_events_flink_job_spark.plans import BENCH_SKIP, QUERIES

# BroadcastNestedLoopJoin is quadratic work (fine only when explicitly
# chosen for a bounded broadcast side, as in exact brute-force top-k or
# a handful-of-rows interval dimension).
BNLJ_ALLOWED = {
    "similarity_topk",
    # same 16-broadcast-queries shape with a map-side label gate.
    "hard_negatives",
    # same deliberate shape as similarity_topk: 16 broadcast query
    # vectors against one corpus scan, threshold gate instead of rank.
    "similarity_radius",
    "value_band_join",
    "knn_label_vote",
    "hash_embed_search",
    # 3 stage-count rows x 1 broadcast denominator row (the lazy
    # funnel's conversion divisor) — bounded by construction.
    "conversion_funnel",
    # k-row centroid table broadcast onto the vector scan per Lloyd
    # iteration — bounded by the k parameter.
    "kmeans_clusters",
    "semdedup",
    "cluster_balanced_sample",
    # per-subspace codebooks (k-row) and ADC distance tables
    # (|Q|*k*m-row) broadcast onto the vector/code scans.
    "pq_codes",
    "pq_topk",
    # 1-row vocabulary count broadcast onto the bigram stream.
    "bigram_lm_score",
    # reuses bigram_lm_score's 1-row vocab broadcast; the tier cuts
    # themselves ride a keyed BroadcastHashJoin (asserted separately in
    # tests/test_text.py).
    "ccnet_lm_buckets",
    # same deliberate shape as similarity_topk: 16 broadcast query
    # vectors against one corpus scan, inner-product rank.
    "mips_topk",
    # composes the exact tier (similarity_topk's broadcast-queries
    # BNLJ) with the LSH tier; the recall join itself is two
    # num_queries*k-row tables.
    "ann_recall_eval",
    # 1-row corpus-totals broadcast onto the <=1024-row bucket model.
    "dsir_importance",
    # two 1-row broadcasts: the (k+1)-th-largest merge threshold onto
    # the <=32k-row summary, and the stream total onto the exact side.
    "heavy_hitters",
    # 1-row (n_pos, sum_pos) stats broadcast onto the customer scan
    # (the cross-multiplied average cut).
    "idle_rich_customers",
    # 1-row max-revenue broadcast onto the per-supplier aggregate.
    "top_supplier_revenue",
    # 1-row (lo, hi) bounds broadcast onto the |types|-row grid seed.
    "events_gapfill_locf",
    # 1-row nation-total broadcast onto the per-part value table (the
    # Q11 cross-multiplied global-scalar HAVING cut).
    "important_part_stock",
    # 1-row corpus grand total broadcast onto the (source, token) profile.
    "source_kl_divergence",
    # 1-row global exact count broadcast onto the 1-row union sketch.
    "sketch_distinct_rollup",
    # 1-row (n_docs, sum_dl) corpus stats broadcast onto the
    # query-term postings (BM25 normalization constants).
    "bm25_topk",
    # same 1-row corpus-stats broadcast (shares bm25's scorer).
    "rrf_retrieval",
    # 1-row sum-of-weights broadcast onto the |langs|-row share table.
    "temperature_mix",
    # 1-row global key-count stats broadcast onto the top-10 heavy keys.
    "key_skew_profile",
    # 1-row corpus bigram total broadcast onto the pair table.
    "token_pmi",
    # |sources|^2 signature-space pair join on a `<` condition — both
    # sides are the catalog-size per-source signature table (20 rows at
    # fixture scale, bounded by the source catalog at any scale).
    "source_overlap_minhash",
}


@pytest.mark.parametrize(
    "name", [n for n in QUERIES if n not in BENCH_SKIP]
)
def test_plan_has_no_scale_antipatterns(spark, sf_dir, name):
    plan = (
        QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, name
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF on the data path "
        "(use Arrow: pandas_udf / mapInPandas)"
    )
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, name


# ---------------------------------------------------------------------------
# Pushdown / pruning gates: selected queries must keep their filters at
# the parquet scan and their projections pruned — a silent regression
# here (e.g. a cast or UDF wrapped around a filter column) would keep
# values correct while destroying the 100 TB scan profile.
# ---------------------------------------------------------------------------

import re

PUSHDOWN_EXPECTATIONS = {
    # query -> (regex that must appear inside some PushedFilters [...])
    # NOTE: plan toString truncates long PushedFilters lists mid-token
    # ("GreaterThanOrEqual(l_shipda...") — match truncation-safe prefixes.
    "forecast_revenue_change": r"IsNotNull\(l_shipdate\).*IsNotNull\(l_quantity\)",
    "top_supplier_revenue": r"GreaterThanOrEqual\(l_shipdate",
    "small_qty_order_revenue": r"EqualTo\(p_brand,Brand#23\)",
    "idle_rich_customers": r"GreaterThanOrEqual\(o_orderdate",
    "shipping_priority": r"(LessThan|GreaterThan)\(o_orderdate",
    "shipmode_priority": r"GreaterThanOrEqual\(l_shipdate",
    "excess_suppliers": r"GreaterThanOrEqual\(l_shipdate",
    "min_cost_supplier": r"EqualTo\(p_type,SMALL\)",
    "product_type_profit": r"StringContains\(p_name,gizmo\)",
    "merge_upsert": r"GreaterThanOrEqual\(o_orderdate",
    "delay_notifications": None,  # filter is post-parse (derived column)
}

# query -> (table column that must NOT be read: pruning proof)
PRUNING_EXPECTATIONS = {
    # Q6 touches 4 lineitem columns; the wide ones must not be scanned
    "forecast_revenue_change": ("l_returnflag", "l_linestatus"),
    # the histogram needs only keys: no acctbal/segment scan
    "customer_order_distribution": ("c_acctbal", "c_mktsegment"),
    # Q16 touches only the pair keys on lineitem: no money/qty scan
    "part_supplier_counts": ("l_extendedprice", "l_quantity"),
    # the KL audit never reads doc text metadata beyond source+text
    "source_kl_divergence": ("n_chars", "lang"),
}


@pytest.mark.parametrize(
    "name", [n for n, p in PUSHDOWN_EXPECTATIONS.items() if p]
)
def test_filter_reaches_the_scan(spark, sf_dir, name):
    plan = (
        QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*", plan))
    assert re.search(PUSHDOWN_EXPECTATIONS[name], pushed), (
        f"{name}: expected filter not pushed to the parquet scan; "
        f"PushedFilters were: {pushed[:400]}"
    )


@pytest.mark.parametrize("name", sorted(PRUNING_EXPECTATIONS))
def test_projection_is_pruned_at_the_scan(spark, sf_dir, name):
    plan = (
        QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    schemas = " ".join(re.findall(r"ReadSchema: [^,]*struct<[^>]*>", plan))
    for col in PRUNING_EXPECTATIONS[name]:
        assert col not in schemas, (
            f"{name}: column {col} is read by the scan but unused "
            f"(column pruning regressed); ReadSchema: {schemas[:400]}"
        )


def test_runtime_bloom_filter_prefilters_shuffle_join(spark, sf_dir):
    """The 100 TB shuffle-join knob: when a selective filter sits on one
    side of a big-big join, Spark's runtime bloom filter (on by default,
    spark.sql.optimizer.runtime.bloomFilter.enabled) pre-filters the
    probe side at its scan, cutting the shuffle before it happens. The
    local thresholds are tuned down only to reproduce the trigger at
    fixture scale; at real scale the defaults fire on their own.
    """
    from pyspark.sql import functions as F
    from flight_events_flink_job_spark.sources.fixtures import load_table

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        li = load_table(spark, sf_dir, "lineitem")
        urgent = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(urgent, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan or "BloomFilter" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    """The other half of the skew story: skew_salted_enrichment covers
    DETERMINISTIC salting; this pins Spark's RUNTIME answer — AQE
    detects the oversized shuffle partition at execution time and
    splits it (SortMergeJoin(skew=true), AQEShuffleRead skewed).
    Thresholds are tuned down only to reproduce the trigger at test
    scale; at 100 TB the defaults fire on real skew.
    """
    from pyspark.sql import functions as F

    conf = spark.conf
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    )
    saved = {k: conf.get(k, None) for k in keys}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 < 19, 0).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x"), F.col("id")).alias("payload"),
        )
        right = spark.range(0, 50_000).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        j = left.join(right, "k").groupBy().count()
        assert j.collect()[0][0] > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


@pytest.mark.parametrize("name", [n for n in QUERIES if n not in BENCH_SKIP])
def test_query_edges_are_scalar_typed(spark, sf_dir, name):
    """Engine-edge convention: registered queries emit only scalar
    columns. Array/struct/map/binary outputs render differently under
    the driver's stringified-value hash (pandas shows a Spark array as
    a Python list but a DuckDB list as a numpy array — pq_codes
    hash-failed exactly this way before its code tuple was serialized
    to a string key), so complex types must be serialized (joined
    string, long form, packed int) before the edge."""
    for col, dtype in QUERIES[name](spark, sf_dir).dtypes:
        assert not dtype.startswith(("array", "struct", "map", "binary")), (
            f"{name}.{col} is {dtype}: serialize complex types before "
            "the query edge (see pq_codes' code_key)"
        )


def test_bm25_topk_pushes_rank_limit_into_window(spark, sf_dir):
    """The per-term top-k must run as WindowGroupLimit (Spark's rank
    pushdown: partial per-partition top-k before the exchange, never a
    full sort of the postings), and the query-term/stats sides must
    ride broadcasts, keeping the corpus-side scan the only big input."""
    plan = (
        QUERIES["bm25_topk"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert "BroadcastExchange" in plan
