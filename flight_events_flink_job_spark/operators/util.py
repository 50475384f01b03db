"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


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
