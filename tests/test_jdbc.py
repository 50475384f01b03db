"""Real-JDBC serving path (sources/jdbc.py over embedded Derby)."""

from __future__ import annotations

from flight_events_flink_job_spark.operators.aggregates import airline_stats
from flight_events_flink_job_spark.sources.flight_adapter import shared_flights
from flight_events_flink_job_spark.sources.jdbc import (
    derby_url,
    read_jdbc_table,
    write_jdbc_table,
)


def _rows(df):
    return sorted(map(str, (tuple(r) for r in df.collect())))


def test_jdbc_round_trip_exact(spark, sf_dir, tmp_path):
    stats = airline_stats(shared_flights(spark, sf_dir))
    url = derby_url(str(tmp_path / "db"))
    write_jdbc_table(
        stats, url, "airline_delay_stats", column_types="airline VARCHAR(64)"
    )
    back = read_jdbc_table(spark, url, "airline_delay_stats").select(
        stats.columns
    )
    assert _rows(back) == _rows(stats)


def test_jdbc_partitioned_read_is_parallel_and_exact(spark, sf_dir, tmp_path):
    stats = airline_stats(shared_flights(spark, sf_dir))
    url = derby_url(str(tmp_path / "db"))
    write_jdbc_table(
        stats, url, "airline_delay_stats", column_types="airline VARCHAR(64)"
    )
    back = read_jdbc_table(
        spark, url, "airline_delay_stats",
        partition_column="total_flights",
        lower_bound=0, upper_bound=1_000_000, num_partitions=4,
    )
    # bounds-partitioned ranges are disjoint: parallel AND exactly-once
    assert back.rdd.getNumPartitions() == 4
    assert _rows(back.select(stats.columns)) == _rows(stats)
