"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 16,
) -> DataFrame:
    """Inner equi-join that survives heavy key skew on the fact side.

    A hash join shuffles both sides by ``key``: one hot key = one
    straggler task. Salting splits each hot key across ``salt``
    sub-partitions: facts get a deterministic salt from a hash of the
    whole row (skew-spreading, reproducible — no rand()), the dim side
    is replicated ``salt`` times via a small explode, and the join runs
    on (key, salt). Result set is identical to ``facts.join(dim, key)``.

    Prefer AQE's skew-join splitting (on by default in this engine) for
    sort-merge joins; reach for explicit salting when the skew is in a
    shuffled hash join or the hot keys are known and extreme. Dim-side
    cost is x``salt`` rows — use on genuinely small dims.
    """
    from pyspark.sql import functions as F

    fact_cols = [c for c in facts.columns]
    salted_facts = facts.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in fact_cols])), F.lit(salt)),
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>"))
    )
    return salted_facts.join(salted_dim, [key, "_salt"]).drop("_salt")


def spread(df: DataFrame, by: Column | None = None) -> DataFrame:
    """Ensure at least ``defaultParallelism`` partitions before an
    expression-heavy narrow stage (signature folds, per-row hashing).

    Small inputs arrive as one file split, so all downstream per-row
    work lands on one core; one round-robin exchange of the RAW rows
    (cheapest point in the pipeline) unlocks the cluster. Gated: when
    the scan already has enough splits — every real 100 TB scan — this
    is a NO-OP and adds no shuffle.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, by) if by is not None else df.repartition(target)
