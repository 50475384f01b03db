"""Serving-table writes: the ClickHouse MergeTree replacement.

The reference serves analytics from ClickHouse MergeTree tables whose
``ORDER BY (key, window_start)`` clustering (readme.txt:49,59,70) makes
key-range scans cheap. The Spark-native equivalent (SURVEY.md §4
storage row): Parquet tables partitioned by a coarse column (date
bucket — partition pruning) and sorted within partitions by the
clustering key (row-group min/max skipping inside each file).

At 100 TB: ``partitionBy`` bounds each file to one partition value so
readers prune entire directories; ``sortWithinPartitions`` runs as a
per-task sort before write (no extra shuffle beyond the optional
``repartition`` on the partition columns, which prevents the
small-files explosion of writing P partition values from T tasks).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Serving schemas (readme.txt:41-49, :51-59, :63-70, :18+73-74) keyed by
# table name: (partition expression name, sort columns).
SERVING_LAYOUT: dict[str, tuple[list[str], list[str]]] = {
    "flights": (["flight_date"], ["airline", "scheduled_time"]),
    "airline_delay_stats": (["window_date"], ["airline", "window_start"]),
    "route_delay_stats": (["window_date"], ["route", "window_start"]),
    "hourly_delay_stats": (["window_date"], ["hour_of_day", "window_start"]),
}


def with_partition_date(df: DataFrame, table: str) -> DataFrame:
    """Attach the coarse partition column for a serving table."""
    if table == "flights":
        return df.withColumn("flight_date", F.to_date("scheduled_time"))
    return df.withColumn("window_date", F.to_date("window_start"))


def write_serving_table(
    df: DataFrame, path: str, table: str, mode: str = "append"
) -> None:
    """Write one serving table with MergeTree-equivalent layout."""
    partition_cols, sort_cols = SERVING_LAYOUT[table]
    out = with_partition_date(df, table)
    (
        out.repartition(*[F.col(c) for c in partition_cols])
        # Sort must LEAD with the partition columns: FileFormatWriter
        # requires that prefix ordering and would otherwise inject its
        # own partition-column-only sort, destroying the clustering.
        .sortWithinPartitions(*partition_cols, *sort_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_serving_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Write a bucketed (hash-clustered) Parquet table.

    Bucketing persists the hash partitioning INTO the storage layout:
    two tables bucketed the same way join (and aggregate on the bucket
    key) with NO exchange — the classic 100 TB trick for a fact table
    repeatedly joined on the same key. Registered as an external table
    (data lives under ``path``); Spark's in-memory catalog carries the
    bucket spec for the session. On a cluster, back this with a real
    metastore — the write itself is identical.
    """
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def csv_roundtrip(df: DataFrame, path: str) -> DataFrame:
    """Write ``df`` as headered CSV and read it back with the ORIGINAL
    schema enforced (no inference) — the interchange-format twin of the
    Parquet serving layer (SURVEY.md §2.1 notes the reference has no
    file formats at all; our engine adds Parquet, JSON-lines staging,
    JDBC, and CSV).

    Losslessness contract: timestamps serialize as ISO-8601 with
    microseconds; doubles round-trip via Spark's Ryu shortest-repr
    writer and exact reader. The read enforces ``df.schema`` so column
    types survive identically (a header-infer read would widen ints
    and retype timestamps). NULL and empty string are distinct values
    that CSV cannot tell apart by default (both serialize to an empty
    field, and the reader maps both back to NULL) — an explicit
    ``nullValue`` sentinel on write AND read keeps an empty-string key
    an empty-string key through the trip (round-5 adversarial sweep:
    an '' group key silently merged into the NULL group without it).
    """
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    null_tok = "\\N"  # classic *nix dump sentinel, never a fixture value
    df.write.mode("overwrite").option("header", True).option(
        "timestampFormat", ts_fmt
    ).option("nullValue", null_tok).csv(path)
    return (
        df.sparkSession.read.schema(df.schema)
        .option("header", True)
        .option("timestampFormat", ts_fmt)
        .option("nullValue", null_tok)
        .csv(path)
    )


def json_roundtrip(df: DataFrame, path: str) -> DataFrame:
    """Write ``df`` as JSON-lines and read it back with the ORIGINAL
    schema enforced (no inference) — the text-interchange twin of the
    Parquet serving layer, completing the serving format matrix
    (Parquet / ORC / CSV / JDBC / JSON; SURVEY.md §2.1 notes the
    reference has no file formats at all, its only JSON surface being
    the Kafka event payloads of KafkaUtils.java:15-38).

    Losslessness contract: timestamps serialize as ISO-8601 with
    microseconds (Spark's default JSON timestamp pattern drops
    sub-millisecond digits, so the format is pinned explicitly, same
    as the CSV twin); doubles round-trip via Ryu shortest-repr write +
    exact read. Unlike CSV, JSON distinguishes ``""`` from NULL
    natively (empty string stays quoted; a NULL field is simply
    omitted by the writer and read back as NULL under the enforced
    schema), so no sentinel token is needed. The schema-enforced read
    also pins column TYPES — an inferred read would widen ints and
    retype timestamps as strings.

    At 100 TB this path is for interchange/staging only: JSON scans
    cannot column-prune or predicate-push, so the serving scan stays
    on Parquet/ORC and this writer feeds external consumers.
    """
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    df.write.mode("overwrite").option("timestampFormat", ts_fmt).json(path)
    return (
        df.sparkSession.read.schema(df.schema)
        .option("timestampFormat", ts_fmt)
        .json(path)
    )


def orc_roundtrip(df: DataFrame, path: str) -> DataFrame:
    """Write ``df`` as ORC and read it back — the columnar-format twin
    of the Parquet serving layer for warehouses standardized on ORC
    (Hive-lineage clusters). ORC is self-describing and typed, so the
    round trip is lossless by construction (zlib-compressed stripes,
    column statistics for predicate pushdown on read — the same scan
    properties the Parquet path gets at 100 TB); the schema is still
    enforced on read for parity with the other serving twins.
    """
    df.write.mode("overwrite").orc(path)
    return df.sparkSession.read.schema(df.schema).orc(path)


def compact_table(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_rows_per_file: int = 1_000_000,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Small-files compaction of an append-accumulated table (the
    maintenance pass every streaming partials/serving table needs: each
    micro-batch appends a few small parquet files, and after days of
    micro-batches the scan is metadata-bound, not IO-bound).

    Rewrites the table into ``ceil(rows / target_rows_per_file)``
    right-sized files (optionally re-clustered on ``sort_cols`` so
    min/max row-group pruning works again after compaction) and returns
    the compacted table's DataFrame. Content-preserving by
    construction: one narrow read, one exchange, one write — at 100 TB
    this runs per-partition-directory (each date partition compacts
    independently and incrementally; the row-count heuristic stands in
    for Spark's file-size-based maxRecordsPerFile knob, kept explicit
    here so the file count is deterministic for the tests).

    ``out_path`` must differ from ``path``: Spark reads lazily, so an
    in-place ``mode('overwrite')`` would delete the input mid-scan and
    lose the table. In-place compaction requires a temp-dir swap by
    the caller (write to a sibling dir, then atomically rename).
    """
    if os.path.abspath(out_path) == os.path.abspath(path):
        raise ValueError(
            "compact_table: out_path must differ from path — Spark's lazy "
            "read during overwrite would destroy the input; compact to a "
            "temp dir and swap instead"
        )
    df = spark.read.parquet(path)
    n = df.count()
    files = max(1, -(-n // target_rows_per_file))
    out = df.repartition(files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)


ZORDER_BITS = 8


def zorder_key(bx, by, bits: int = ZORDER_BITS):
    """Interleave the bits of two pre-bucketed integer columns (each in
    [0, 2^bits)) into one Morton/Z-order key — bx occupies the odd bit
    positions (so it leads the sort), by the even ones. Pure Catalyst
    bit arithmetic, codegen-fused."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(bx, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        terms.append(
            F.shiftleft(F.shiftright(by, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("bigint")


def write_zordered_table(
    spark: SparkSession,
    df: DataFrame,
    out_path: str,
    col_x,
    col_y,
    files: int = 8,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """Z-order-clustered write: the lakehouse data-layout optimization
    (Delta OPTIMIZE ZORDER BY / Hudi clustering analogue) that makes
    min/max row-group pruning effective on TWO filter dimensions at
    once, where linear sort-clustering serves only its leading key.

    ``col_x`` / ``col_y`` are integer-valued Column expressions; each
    is range-bucketed to ``bits`` bits against its own (min, max) —
    computed in one 1-row aggregate that rides a broadcast, all
    integer arithmetic — then bit-interleaved into a Morton key. The
    write range-partitions on the key (so files own contiguous Z
    ranges) and sorts within partitions (so row groups do too).
    Content-preserving by construction: the key is dropped after the
    write. At 100 TB the identical plan is the per-partition
    re-clustering maintenance pass: one narrow map, one range
    exchange, one write.
    """
    src = df.withColumn("_zx", col_x.cast("bigint")).withColumn(
        "_zy", col_y.cast("bigint")
    )
    bounds = src.agg(
        F.min("_zx").alias("xlo"),
        F.max("_zx").alias("xhi"),
        F.min("_zy").alias("ylo"),
        F.max("_zy").alias("yhi"),
    )
    n_buckets = 1 << bits
    bounded = src.crossJoin(F.broadcast(bounds))
    bx = (
        (F.col("_zx") - F.col("xlo"))
        * n_buckets
        / (F.col("xhi") - F.col("xlo") + 1)
    ).cast("bigint")
    by = (
        (F.col("_zy") - F.col("ylo"))
        * n_buckets
        / (F.col("yhi") - F.col("ylo") + 1)
    ).cast("bigint")
    keyed = bounded.withColumn("_z", zorder_key(bx, by, bits)).drop(
        "_zx", "_zy", "xlo", "xhi", "ylo", "yhi"
    )
    (
        keyed.repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return spark.read.parquet(out_path)
