"""Loaders for the driver-generated Parquet fixture tables.

At 100 TB the same code path applies unchanged: ``spark.read.parquet``
on a directory of many files gives split-per-rowgroup parallel scans
with column pruning + predicate pushdown; nothing here assumes a single
file or a single machine.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (parquet scan; Catalyst prunes columns).

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it surfaces as long nanos,
    which we convert to a microsecond TimestampType column JVM-side
    (integer div — no double round-trip, nanos exceed double's exact
    integer range).
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    ts_type = dict(df.dtypes).get("ts")
    if name == "events" and ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif name == "events" and ts_type == "timestamp_ntz":
        # Belt-and-braces for sessions where inferTimestampNTZ wasn't
        # disabled before the scan: NTZ wall-clock reinterpreted in the
        # (UTC) session TZ — identical instants, oracle-comparable type.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in FIXTURE_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
