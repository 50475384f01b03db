"""MERGE INTO (lakehouse upsert) semantics compiled to one
co-partitioned full-outer join — the missing DML shape between this
engine's append-only serving sinks and a Delta/Iceberg-style mutable
serving table. The reference has no DML at all (its sinks are
ClickHouse INSERTs, FlightEventAggregator.java:160); SURVEY.md §2.5
lists the whole non-append surface as Spark-extension territory.

Semantics follow ANSI/Delta MERGE exactly, with all four row fates:
  WHEN MATCHED AND <delete-cond>  THEN DELETE
  WHEN MATCHED                    THEN UPDATE
  WHEN NOT MATCHED (source-only)  THEN INSERT
  target rows never matched       -> carried through unchanged

Scale shape: this is precisely how Delta/Iceberg execute MERGE under
the hood — join target and source on the merge key and rewrite. Both
sides hash-partition on the key (one exchange each, co-partitioned
join); the source aggregates to one row per key BEFORE the join; no
broadcast hint (at 100 TB neither side of a serving-table merge is
small — AQE may still pick broadcast when the source batch is). The
``action`` column makes the rewrite auditable row-by-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_customer_snapshot(
    customer: DataFrame,
    orders: DataFrame,
    cutoff: str = "2000-01-01",
    purge_segment: str = "MACHINERY",
) -> DataFrame:
    """(c_custkey, balance, n_recent_orders, action): merge the recent
    order activity into the positive-balance customer snapshot.

    Target = customers with positive balance (the serving snapshot).
    Source = per-customer recent-order aggregate (orders since
    ``cutoff``). Branches:
      matched + target in ``purge_segment``  -> DELETE (quarantine)
      matched                                -> UPDATE balance += spend
      source-only (customer not in snapshot) -> INSERT with balance =
                                                 spend
      target-only                            -> KEEP unchanged

    Money: balances/spend accumulate in DECIMAL(18,2) (both columns
    carry 2-decimal values), one round+cast at the edge.
    """
    src = (
        orders.filter(F.col("o_orderdate") >= F.lit(cutoff).cast("timestamp"))
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_recent_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend"),
        )
    )
    tgt = customer.filter(F.col("c_acctbal") > 0).select(
        "c_custkey", "c_mktsegment", F.col("c_acctbal").cast("decimal(18,2)").alias("bal")
    )
    j = tgt.join(src, F.col("c_custkey") == F.col("o_custkey"), "full_outer")
    matched = F.col("c_custkey").isNotNull() & F.col("o_custkey").isNotNull()
    action = (
        F.when(matched & (F.col("c_mktsegment") == purge_segment), "delete")
        .when(matched, "update")
        .when(F.col("c_custkey").isNull(), "insert")
        .otherwise("keep")
    )
    merged = j.select(
        F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias("c_custkey"),
        action.alias("action"),
        F.coalesce(F.col("n_recent_orders"), F.lit(0)).alias("n_recent_orders"),
        (
            F.coalesce(F.col("bal"), F.lit(0).cast("decimal(18,2)"))
            + F.coalesce(F.col("spend"), F.lit(0).cast("decimal(18,2)"))
        ).alias("balance_dec"),
    )
    return merged.filter(F.col("action") != "delete").select(
        "c_custkey",
        F.round(F.col("balance_dec"), 2).cast("double").alias("balance"),
        "n_recent_orders",
        "action",
    )
