"""TPC-H decision-support shapes Q2/Q8/Q9/Q11/Q12/Q16/Q19/Q20/Q21
adapted to the fixture schema (no ``partsupp`` table exists, so the
four partsupp-dependent queries derive supply facts from ``lineitem``
— the join topology, correlation structure, and aggregate shapes are
preserved).

Completes the relational family: with these nine, every TPC-H query
shape (Q1-Q22) has a fixture adaptation in the repo. The reference
(FlightEventAggregator.java) has no joins at all — SURVEY.md §2.5
lists the whole join/subquery surface as "Spark built-in, add when
extending"; these are the remaining canonical shapes of that surface.

Cross-engine arithmetic conventions (same as operators/relational.py):
money accumulates in DECIMAL(18,4) and is rounded to 2dp then cast to
double only at the output edge; ratio outputs divide two exact sums as
doubles; threshold comparisons cross-multiply or compare exact
decimals so no boundary row can flip between engines.

Scale notes (100 TB): every dimension that is broadcast here is
bounded by construction (one brand, one region, a filtered part list);
fact-fact joins co-partition on their keys; correlated subqueries are
expressed as aggregate-then-join (never per-row subquery execution);
global top-k is orderBy+limit = TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _rev() -> F.Column:
    """Exact DECIMAL line revenue extendedprice*(1-discount)."""
    return F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )


def min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    p_type: str = "SMALL",
    max_size: int = 10,
    region_name: str = "EUROPE",
    k: int = 100,
) -> DataFrame:
    """TPC-H Q2 shape — for each qualifying part, the supplier(s) in
    one region offering it at the minimum observed cost.

    partsupp.ps_supplycost is derived as MIN(l_extendedprice) per
    (part, supplier) — a pure MIN, no accumulation, so the double is
    bit-identical cross-engine and the correlated "= (SELECT min …)"
    equality is exact.

    Plan: the part filter (type + size, both pushed to the scan) bounds
    the part list; supplier⋈nation⋈region collapses to a bounded
    broadcast dimension; the per-(part,supplier) MIN aggregates
    lineitem in one shuffle on integer keys only (supplier attributes
    join AFTER the aggregate, onto group-cardinality rows); the
    correlated per-part minimum is a window MIN over the SAME
    partitioning — no second evaluation of the aggregate subtree, no
    join-back (the naive agg-then-self-join form re-ran the whole
    scan+join+agg chain twice: 2x wall on the fixture bench); the
    global report is TakeOrderedAndProject.
    """
    parts = part.filter(
        (F.col("p_type") == p_type) & (F.col("p_size") <= max_size)
    ).select("p_partkey", "p_type", "p_size")
    regional_supp = (
        supplier.join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(regional_supp.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("p_partkey", "p_size", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("supply_cost"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        cost.withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .join(
            F.broadcast(regional_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_size",
            F.round(F.col("supply_cost").cast("decimal(18,4)"), 2)
            .cast("double")
            .alias("supply_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), F.col("n_name"), F.col("s_name"), F.col("p_partkey")
        )
        .limit(k)
    )


def nation_market_share(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    target_nation: str = "NATION_7",
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q8 shape — one supplier-nation's share of a region's
    market, per order year.

    Market = revenue on orders whose CUSTOMER sits in ``region_name``;
    the share numerator keeps only lines SUPPLIED by
    ``target_nation``. Both revenue sums accumulate in DECIMAL inside
    one aggregation (conditional + total — no second pass); the share
    is one double division of two exact sums, like Q14's
    promo_revenue_share.

    Plan: customer⋈nation⋈region and supplier⋈nation are bounded
    broadcast dimensions; orders⋈lineitem co-partitions on the order
    key — the single big-big join.
    """
    cust_region = (
        customer.join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = supplier.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    lines = (
        orders.join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.year("o_orderdate").alias("o_year"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("o_year", "supp_nation", _rev().alias("rev"))
    )
    target = F.when(F.col("supp_nation") == target_nation, F.col("rev")).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        lines.groupBy("o_year")
        .agg(
            F.sum(target).alias("nation_dec"),
            F.sum("rev").alias("total_dec"),
            F.count("*").alias("n_lineitems"),
        )
        .select(
            "o_year",
            F.round(
                F.col("nation_dec").cast("double") / F.col("total_dec").cast("double"),
                6,
            ).alias("mkt_share"),
            F.round(F.col("nation_dec"), 2).cast("double").alias("nation_revenue"),
            F.round(F.col("total_dec"), 2).cast("double").alias("total_revenue"),
            "n_lineitems",
        )
    )


def product_type_profit(
    part: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    name_fragment: str = "gizmo",
) -> DataFrame:
    """TPC-H Q9 shape — profit on one product line by supplier nation
    and order year.

    partsupp.ps_supplycost is proxied by 10% of the part's retail
    price: profit = rev − p_retailprice·l_quantity·0.1, all in exact
    DECIMAL (retail prices have one decimal, quantities are integral,
    so DECIMAL(9,2)·DECIMAL(9,2)·DECIMAL(2,1) is exactly
    representable — no double 0.1 anywhere).

    Plan: filtered part list and supplier⋈nation broadcast; the
    orders join co-partitions on the order key; one final (nation,
    year) aggregate.
    """
    parts = part.filter(F.col("p_name").contains(name_fragment)).select(
        "p_partkey", F.col("p_retailprice").cast("decimal(9,2)").alias("p_retail")
    )
    supp_nation = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    amount = _rev() - (
        F.col("p_retail")
        * F.col("l_quantity").cast("decimal(9,2)")
        * F.lit("0.1").cast("decimal(2,1)")
    )
    return (
        lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.select("o_orderkey", F.year("o_orderdate").alias("o_year")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("n_name", "o_year")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.round(F.sum(amount), 2).cast("double").alias("sum_profit"),
        )
    )


def important_part_stock(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_3",
    fraction_denom: int = 1000,
) -> DataFrame:
    """TPC-H Q11 shape — parts representing a significant fraction of
    one nation's total supplied value (group-HAVING against a global
    scalar).

    partsupp value is derived as the extendedprice sum over that
    nation's lineitems per part. The HAVING cut avoids decimal
    division: both sides are exact DECIMAL sums cast to double (all
    representable < 2^53) and compared as
    ``part_value · fraction_denom > total_value`` — cross-multiplied,
    boundary-stable.

    Plan: nation's suppliers broadcast; one shuffle on l_partkey for
    the per-part sum; the global total is a 1-row broadcast.
    """
    nat_supp = supplier.join(
        F.broadcast(
            nation.filter(F.col("n_name") == nation_name).select("n_nationkey")
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    vals = (
        lineitem.join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("value_dec"))
    )
    total = vals.agg(F.sum("value_dec").alias("total_dec"))
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_dec").cast("double") * F.lit(float(fraction_denom))
            > F.col("total_dec").cast("double")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("value_dec"), 2).cast("double").alias("part_value"),
        )
    )


def shipmode_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    year_start: str = "1997-01-01",
    year_end: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q12 shape — order-priority counts per line class for one
    ship year (l_linestatus stands in for the missing l_shipmode).

    Plan: the ship-date filter pushes to the lineitem scan before the
    join; orders⋈lineitem co-partitions on the order key; the final
    aggregate is two conditional counts in one pass.
    """
    lines = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(year_start).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(year_end).cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lines.join(
            orders.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


def part_supplier_counts(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    excluded_brand: str = "Brand#2",
    excluded_type: str = "PROMO",
    max_size: int = 15,
) -> DataFrame:
    """TPC-H Q16 shape — distinct supplier counts per part attribute
    triple, excluding complained-about suppliers (NOT IN).

    The partsupp relation is derived as the distinct (l_partkey,
    l_suppkey) pairs in lineitem; the complaint list (negative account
    balance) is a broadcast LEFT ANTI join — the NOT IN with a
    guaranteed-non-NULL build side.

    Plan: part filter pushes to the scan; the pair-distinct is one
    shuffle on the pair key; COUNT(DISTINCT) re-aggregates per
    attribute triple (Spark expands to a two-phase exact distinct).
    """
    parts = part.filter(
        (F.col("p_brand") != excluded_brand)
        & (F.col("p_type") != excluded_type)
        & (F.col("p_size") <= max_size)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    complainers = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = (
        lineitem.select("l_partkey", "l_suppkey")
        .distinct()
        .join(
            F.broadcast(complainers),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
    )
    return (
        pairs.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def disjunctive_revenue(
    part: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q19 shape — revenue under an OR-of-conjunctions predicate
    spanning both join sides (brand/size vs quantity bands).

    Catalyst extracts the common l_quantity<=30 / p_size>=1 bounds as
    pushed-down conjuncts and evaluates the residual disjunction after
    the broadcast hash join — the point of the Q19 shape.
    """
    joined = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return joined.filter(cond).agg(
        F.count("*").alias("n_lineitems"),
        F.round(F.sum(_rev()), 2).cast("double").alias("revenue"),
    )


def excess_suppliers(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    name_prefix: str = "small",
    year_start: str = "1996-01-01",
    year_end: str = "1997-01-01",
    qty_threshold: float = 30.0,
    region_name: str = "EUROPE",
) -> DataFrame:
    """TPC-H Q20 shape — suppliers in one region who shipped a large
    volume of a product line in one year (nested semi-join chain).

    partsupp.ps_availqty is derived as the (part, supplier) shipped
    quantity sum; quantities are integral doubles, so the HAVING
    threshold is exact. The part-name list is the inner IN subquery
    (broadcast LEFT SEMI), the qualifying supplier set is the outer IN
    (distinct keys, LEFT SEMI again) — three nested semi-joins, no
    row-level correlated execution anywhere.
    """
    parts = part.filter(F.col("p_name").startswith(name_prefix)).select("p_partkey")
    shipped = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(year_start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(year_end).cast("timestamp"))
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > qty_threshold)
        .select("l_suppkey")
        .distinct()
    )
    regional = (
        supplier.join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    return regional.join(
        shipped, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name", "n_name")


def waiting_orders_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q21 shape — suppliers who were the SOLE failing supplier
    on a multi-supplier finalized order (EXISTS + NOT EXISTS pair).

    Lateness is proxied by l_returnflag='R' (no receipt/commit dates
    in the fixture). The correlated EXISTS pair collapses into one
    per-order aggregate: distinct supplier count, distinct failing-
    supplier count, and (when unique) the failing supplier key — an
    aggregate-then-filter instead of two correlated probes over
    lineitem, which is the scalable rewriting of Q21.

    Plan: orders filter pushes down and broadcast-semi-joins lineitem;
    ONE shuffle on l_orderkey builds the per-order profile; the
    per-supplier count re-shuffles only qualifying orders (tiny);
    supplier/nation broadcast; TakeOrderedAndProject for the report.
    """
    final_orders = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    fail = F.col("l_returnflag") == "R"
    profile = (
        lineitem.join(
            F.broadcast(final_orders),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        )
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(fail, F.col("l_suppkey"))).alias("n_fail_supp"),
            F.max(F.when(fail, F.col("l_suppkey"))).alias("fail_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_fail_supp") == 1))
    )
    return (
        profile.groupBy("fail_supp")
        .agg(F.count("*").alias("numwait"))
        .join(
            F.broadcast(
                supplier.join(
                    F.broadcast(nation.select("n_nationkey", "n_name")),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                ).select("s_suppkey", "s_name", "n_name")
            ),
            F.col("fail_supp") == F.col("s_suppkey"),
        )
        .select("s_name", "n_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(k)
    )
