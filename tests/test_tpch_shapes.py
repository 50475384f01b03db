"""TPC-H shapes Q2/Q8/Q9/Q11/Q12/Q16/Q19/Q20/Q21: semantics on
constructed micro-fixtures + plan-shape assertions on the real tables.
(Oracle-differential coverage lives in the registry; these tests pin
the join topology and the engine-portable edge cases.)"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flight_events_flink_job_spark.operators.relational_tpch import (
    disjunctive_revenue,
    excess_suppliers,
    important_part_stock,
    min_cost_supplier,
    nation_market_share,
    part_supplier_counts,
    product_type_profit,
    shipmode_priority,
    waiting_orders_suppliers,
)
from flight_events_flink_job_spark.sources.fixtures import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _t(spark, sf_dir, *names):
    return [load_table(spark, sf_dir, n) for n in names]


def _micro(spark):
    """Tiny hand-built star: 2 suppliers in 2 nations/1 region, 2 parts."""
    region = spark.createDataFrame(
        [(0, "EUROPE"), (1, "ASIA")], "r_regionkey int, r_name string"
    )
    nation = spark.createDataFrame(
        [(0, "NATION_0", 0), (1, "NATION_1", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    supplier = spark.createDataFrame(
        [(1, "Supp#1", 0, 100.0), (2, "Supp#2", 1, 200.0)],
        "s_suppkey int, s_name string, s_nationkey int, s_acctbal double",
    )
    part = spark.createDataFrame(
        [
            (10, "small bolt", "Brand#12", "SMALL", 5, 900.0),
            (20, "large gear", "Brand#23", "LARGE", 30, 950.0),
        ],
        "p_partkey int, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    ship = dt.datetime(1996, 6, 1)
    lineitem = spark.createDataFrame(
        [
            # orderkey, partkey, suppkey, lineno, qty, extprice, disc, tax, rf, ls, shipdate
            (100, 10, 1, 1, 10.0, 500.0, 0.0, 0.0, "N", "O", ship),
            (100, 10, 2, 2, 10.0, 700.0, 0.0, 0.0, "R", "O", ship),
            (200, 20, 2, 1, 200.0, 900.0, 0.1, 0.0, "N", "F", ship),
        ],
        "l_orderkey int, l_partkey int, l_suppkey int, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    orders = spark.createDataFrame(
        [
            (100, 1, "F", 1200.0, dt.datetime(1996, 5, 1), "1-URGENT"),
            (200, 2, "O", 900.0, dt.datetime(1996, 5, 2), "5-LOW"),
        ],
        "o_orderkey int, o_custkey int, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    customer = spark.createDataFrame(
        [(1, "Cust#1", 1, 0.0, "BUILDING"), (2, "Cust#2", 0, 0.0, "AUTOMOBILE")],
        "c_custkey int, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    return region, nation, supplier, part, lineitem, orders, customer


def test_min_cost_supplier_picks_min_and_region(spark):
    region, nation, supplier, part, lineitem, orders, customer = _micro(spark)
    out = min_cost_supplier(
        part, supplier, lineitem, nation, region,
        p_type="SMALL", max_size=10, region_name="EUROPE",
    ).collect()
    # Part 10 is supplied at 500 (supp 1, EUROPE) and 700 (supp 2, ASIA);
    # the regional filter keeps only supp 1, whose 500 is the regional min.
    assert len(out) == 1
    assert out[0].s_name == "Supp#1" and out[0].supply_cost == 500.0


def test_min_cost_supplier_keeps_all_tied_minima(spark):
    region, nation, supplier, part, lineitem, orders, customer = _micro(spark)
    # Make supplier 2 European too and tie the cost: both rows survive.
    nation2 = spark.createDataFrame(
        [(0, "NATION_0", 0), (1, "NATION_1", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    li = lineitem.withColumn(
        "l_extendedprice",
        F.when(F.col("l_suppkey") == 2, 500.0).otherwise(F.col("l_extendedprice")),
    )
    out = min_cost_supplier(
        part, supplier, li, nation2, region,
        p_type="SMALL", max_size=10, region_name="EUROPE",
    ).collect()
    assert sorted(r.s_name for r in out) == ["Supp#1", "Supp#2"]


def test_market_share_conditional_over_total(spark):
    region, nation, supplier, part, lineitem, orders, customer = _micro(spark)
    out = nation_market_share(
        customer, orders, lineitem, supplier, nation, region,
        target_nation="NATION_1", region_name="ASIA",
    ).collect()
    # ASIA customer = Cust#1 -> order 100 (two lines: 500 by supp1/N0,
    # 700 by supp2/N1). Share of NATION_1 = 700/1200.
    assert len(out) == 1
    r = out[0]
    assert r.o_year == 1996 and r.n_lineitems == 2
    assert r.total_revenue == 1200.0 and r.nation_revenue == 700.0
    assert abs(r.mkt_share - 700.0 / 1200.0) < 1e-6


def test_product_profit_exact_decimal_cost(spark):
    region, nation, supplier, part, lineitem, orders, customer = _micro(spark)
    parts = part.withColumn("p_name", F.lit("red gizmo"))
    out = product_type_profit(
        parts, lineitem, orders, supplier, nation, name_fragment="gizmo"
    ).collect()
    by_key = {(r.n_name, r.o_year): r.sum_profit for r in out}
    # NATION_0 = supp1's line on part 10: rev 500, cost 900*10*0.1=900.
    assert by_key[("NATION_0", 1996)] == 500.0 - 900.0
    # NATION_1 = supp2: (rev 700, cost 900) + (rev 810, cost 950*200*0.1=19000).
    assert by_key[("NATION_1", 1996)] == (700.0 - 900.0) + (810.0 - 19000.0)


def test_important_stock_threshold_cut(spark):
    region, nation, supplier, part, lineitem, orders, customer = _micro(spark)
    out = important_part_stock(
        lineitem, supplier, nation, nation_name="NATION_1", fraction_denom=2
    ).collect()
    # NATION_1 = supp2: part 10 value 700, part 20 value 900, total 1600.
    # Cut value*2 > 1600 keeps only part 20.
    assert [(r.p_partkey, r.part_value) for r in out] == [(20, 900.0)]


def test_shipmode_priority_counts(spark):
    region, nation, supplier, part, lineitem, orders, customer = _micro(spark)
    out = shipmode_priority(
        orders, lineitem, year_start="1996-01-01", year_end="1997-01-01"
    ).collect()
    rows = {r.l_linestatus: (r.high_line_count, r.low_line_count) for r in out}
    assert rows == {"O": (2, 0), "F": (0, 1)}


def test_part_supplier_counts_excludes_complainers(spark):
    region, nation, supplier, part, lineitem, orders, customer = _micro(spark)
    bad_supp = supplier.withColumn(
        "s_acctbal", F.when(F.col("s_suppkey") == 2, -5.0).otherwise(F.col("s_acctbal"))
    )
    out = part_supplier_counts(
        part, bad_supp, lineitem,
        excluded_brand="Brand#99", excluded_type="NONE", max_size=50,
    ).collect()
    rows = {(r.p_brand, r.p_size): r.supplier_cnt for r in out}
    # Part 10 had supps {1,2}; supp 2 is excluded -> 1. Part 20 only supp 2 -> gone.
    assert rows == {("Brand#12", 5): 1}


def test_disjunctive_revenue_or_of_conjunctions(spark):
    region, nation, supplier, part, lineitem, orders, customer = _micro(spark)
    out = disjunctive_revenue(part, lineitem).collect()[0]
    # Brand#12/size5/qty10 matches branch 1 twice (rev 500 + 700);
    # Brand#23 line has qty 200 -> no branch.
    assert out.n_lineitems == 2 and out.revenue == 1200.0


def test_excess_suppliers_semi_join_chain(spark):
    region, nation, supplier, part, lineitem, orders, customer = _micro(spark)
    out = excess_suppliers(
        part, supplier, lineitem, nation, region,
        name_prefix="small", qty_threshold=5.0, region_name="EUROPE",
    ).collect()
    # "small bolt" = part 10, shipped >5 by both supps, but only supp 1
    # is European.
    assert [(r.s_suppkey, r.n_name) for r in out] == [(1, "NATION_0")]


def test_waiting_orders_sole_failing_supplier(spark):
    region, nation, supplier, part, lineitem, orders, customer = _micro(spark)
    out = waiting_orders_suppliers(supplier, lineitem, orders, nation).collect()
    # Order 100 is 'F', has 2 suppliers, exactly one (supp 2) failed.
    assert [(r.s_name, r.numwait) for r in out] == [("Supp#2", 1)]


def test_waiting_orders_requires_multi_supplier(spark):
    region, nation, supplier, part, lineitem, orders, customer = _micro(spark)
    solo = lineitem.filter(F.col("l_suppkey") == 2)  # order 100 now single-supplier
    out = waiting_orders_suppliers(supplier, solo, orders, nation).collect()
    assert out == []


def test_tpch_plan_shapes(spark, sf_dir):
    """Dimensions broadcast; no cartesian products anywhere."""
    part, supplier, lineitem, nation, region, orders, customer = _t(
        spark, sf_dir, "part", "supplier", "lineitem", "nation", "region",
        "orders", "customer",
    )
    for df in [
        min_cost_supplier(part, supplier, lineitem, nation, region),
        nation_market_share(customer, orders, lineitem, supplier, nation, region),
        product_type_profit(part, lineitem, orders, supplier, nation),
        disjunctive_revenue(part, lineitem),
        excess_suppliers(part, supplier, lineitem, nation, region),
        waiting_orders_suppliers(supplier, lineitem, orders, nation),
    ]:
        plan = _plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan
    # Q11's global-scalar compare is the one sanctioned 1-row
    # BroadcastNestedLoopJoin (crossJoin of a single aggregate row).
    plan = _plan(important_part_stock(lineitem, supplier, nation))
    assert "CartesianProduct" not in plan
