"""Registry for the nine remaining TPC-H shapes (Q2/Q8/Q9/Q11/Q12/
Q16/Q19/Q20/Q21) — see operators/relational_tpch.py for semantics and
the partsupp derivations.

Oracle notes: every oracle replays the partsupp derivation from
lineitem verbatim (MIN extendedprice for Q2 cost, distinct pair set
for Q16, shipped-quantity sum for Q20, per-order supplier profile for
Q21); money follows the repo DECIMAL conventions; year() casts to
INTEGER to match Spark's int.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.relational_tpch import (
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
from ..sources.fixtures import load_table
from .registry import register

_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,4))"
    " * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"
)


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


@register(
    "min_cost_supplier",
    oracle=f"""
    WITH parts AS (
        SELECT p_partkey, p_size FROM part
        WHERE p_type = 'SMALL' AND p_size <= 10
    ),
    regional AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    cost AS (
        SELECT p_partkey, p_size, s_suppkey, s_name, s_acctbal, n_name,
               min(l_extendedprice) AS supply_cost
        FROM lineitem
        JOIN parts ON l_partkey = p_partkey
        JOIN regional ON l_suppkey = s_suppkey
        GROUP BY ALL
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_size,
           CAST(round(CAST(supply_cost AS DECIMAL(18,4)), 2) AS DOUBLE)
               AS supply_cost
    FROM cost c
    WHERE supply_cost = (
        SELECT min(supply_cost) FROM cost m WHERE m.p_partkey = c.p_partkey
    )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: correlated per-part minimum supply cost, regional
    supplier dimension, TakeOrderedAndProject report."""
    part, supplier, lineitem, nation, region = _t(
        spark, sf_dir, "part", "supplier", "lineitem", "nation", "region"
    )
    return min_cost_supplier(part, supplier, lineitem, nation, region)


@register(
    "nation_market_share",
    oracle=f"""
    WITH lines AS (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               sn.n_name AS supp_nation,
               {_REV} AS rev
        FROM orders
        JOIN (
            SELECT c_custkey FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
        ) cr ON o_custkey = c_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev
                          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(sum(rev) AS DOUBLE), 6) AS mkt_share,
           CAST(round(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev
                          ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE)
               AS nation_revenue,
           CAST(round(sum(rev), 2) AS DOUBLE) AS total_revenue,
           count(*) AS n_lineitems
    FROM lines
    GROUP BY o_year
    """,
)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: conditional/total revenue share per order year."""
    customer, orders, lineitem, supplier, nation, region = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    return nation_market_share(customer, orders, lineitem, supplier, nation, region)


@register(
    "product_type_profit",
    oracle=f"""
    SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           count(*) AS n_lineitems,
           CAST(round(sum({_REV}
                 - CAST(p_retailprice AS DECIMAL(9,2))
                   * CAST(l_quantity AS DECIMAL(9,2))
                   * CAST('0.1' AS DECIMAL(2,1))), 2) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%gizmo%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: product-line profit by supplier nation and year,
    exact-decimal cost proxy."""
    part, lineitem, orders, supplier, nation = _t(
        spark, sf_dir, "part", "lineitem", "orders", "supplier", "nation"
    )
    return product_type_profit(part, lineitem, orders, supplier, nation)


@register(
    "important_part_stock",
    oracle="""
    WITH vals AS (
        SELECT l_partkey AS p_partkey,
               sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS value_dec
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
    )
    SELECT p_partkey,
           CAST(round(value_dec, 2) AS DOUBLE) AS part_value
    FROM vals
    WHERE CAST(value_dec AS DOUBLE) * 1000.0
          > (SELECT CAST(sum(value_dec) AS DOUBLE) FROM vals)
    """,
)
def q_important_part_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-part value vs a global-scalar HAVING cut."""
    lineitem, supplier, nation = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    return important_part_stock(lineitem, supplier, nation)


@register(
    "shipmode_priority",
    oracle="""
    SELECT l_linestatus,
           count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 END) AS high_line_count,
           count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                 THEN 1 END) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
)
def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional priority counts per line class."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    return shipmode_priority(orders, lineitem)


@register(
    "part_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#2' AND p_type <> 'PROMO' AND p_size <= 15
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct supplier counts with NOT-IN exclusion."""
    part, supplier, lineitem = _t(spark, sf_dir, "part", "supplier", "lineitem")
    return part_supplier_counts(part, supplier, lineitem)


@register(
    "disjunctive_revenue",
    oracle=f"""
    SELECT count(*) AS n_lineitems,
           CAST(round(sum({_REV}), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-conjunctions predicate over a join."""
    part, lineitem = _t(spark, sf_dir, "part", "lineitem")
    return disjunctive_revenue(part, lineitem)


@register(
    "excess_suppliers",
    oracle="""
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (
                    SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
                )
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l_partkey, l_suppkey
          HAVING sum(l_quantity) > 30.0
      )
    """,
)
def q_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested semi-join chain over derived availability."""
    part, supplier, lineitem, nation, region = _t(
        spark, sf_dir, "part", "supplier", "lineitem", "nation", "region"
    )
    return excess_suppliers(part, supplier, lineitem, nation, region)


@register(
    "waiting_orders_suppliers",
    oracle="""
    WITH profile AS (
        SELECT l_orderkey,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT CASE WHEN l_returnflag = 'R'
                     THEN l_suppkey END) AS n_fail_supp,
               max(CASE WHEN l_returnflag = 'R'
                   THEN l_suppkey END) AS fail_supp
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
        )
        GROUP BY l_orderkey
    )
    SELECT s_name, n_name, count(*) AS numwait
    FROM profile
    JOIN supplier ON fail_supp = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_supp > 1 AND n_fail_supp = 1
    GROUP BY s_name, n_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q_waiting_orders_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: sole-failing-supplier EXISTS/NOT-EXISTS pair as one
    per-order aggregate profile."""
    supplier, lineitem, orders, nation = _t(
        spark, sf_dir, "supplier", "lineitem", "orders", "nation"
    )
    return waiting_orders_suppliers(supplier, lineitem, orders, nation)
