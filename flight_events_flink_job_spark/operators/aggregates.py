"""A1-A3: the reference's three tumbling-window aggregations.

Reference shape: ``keyBy(k) → TumblingProcessingTimeWindows(n min) →
AggregateFunction`` with hand-written partial/final aggregation
(add/merge, FlightEventAggregator.java:219-308). In Spark the same
add/merge split falls out of Catalyst automatically: groupBy(window, k)
plans as HashAggregate(partial) → Exchange hashpartitioning →
HashAggregate(final) — map-side combine before the shuffle, which is
what keeps this scalable: the shuffle carries one row per (key, window)
per input partition, not one row per event.

Deliberate semantic upgrade (SURVEY.md §2.4, quirk Q3): windows are
EVENT-time over ``scheduled_time`` (deterministic, replayable,
oracle-testable) rather than processing-time, and window_start/end are
the real window bounds, not wall-clock stamps fabricated at sink time
(FlightEventAggregator.java:103-104). Window sizes stay parameters —
the reference's 2/3/5 min defaults are commented "for testing"
(FlightEventAggregator.java:89,112,135).

Doubles are rounded to 4 dp at the output edge so results are stable
under partial-aggregation reordering (FP association) — the incremental
running mean in the reference (FlightEventAggregator.java:228,243) is
algebraically plain AVG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.flight import hour_of_day, route_key
from ..schemas import (
    AIRLINE_STATS_COLUMNS,
    HOURLY_STATS_COLUMNS,
    ROUTE_STATS_COLUMNS,
)

ROUND_DP = 4


def _base_aggs():
    return [
        F.count("*").alias("total_flights"),
        F.sum(F.when(F.col("is_delayed") == 1, 1).otherwise(0)).alias(
            "delayed_flights"
        ),
        F.round(F.avg("delay_minutes"), ROUND_DP).alias("avg_delay_minutes"),
    ]


def airline_stats(flights: DataFrame, window_size: str = "2 minutes") -> DataFrame:
    """Per-airline delay stats per tumbling window (A1).

    Columns per the ClickHouse sink DDL readme.txt:41-49 / INSERT
    FlightEventAggregator.java:95. delay_rate = delayed/total*100
    (FlightEventAggregator.java:229, quirk Q5 — the total>0 guard is
    vacuous since a group has ≥1 row).
    """
    w = F.window("scheduled_time", window_size)
    out = (
        flights.groupBy(w.alias("w"), F.col("airline"))
        .agg(*_base_aggs())
        .withColumn(
            "delay_rate",
            F.round(F.col("delayed_flights") * 100.0 / F.col("total_flights"), ROUND_DP),
        )
        .select(
            "airline",
            "total_flights",
            "delayed_flights",
            "avg_delay_minutes",
            "delay_rate",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
        )
    )
    assert out.columns == AIRLINE_STATS_COLUMNS
    return out


def route_stats(flights: DataFrame, window_size: str = "3 minutes") -> DataFrame:
    """Per-route delay stats per tumbling window (A2).

    The reference keys by the concatenated route string and carries
    origin/destination in the accumulator
    (FlightEventAggregator.java:114,256-258); grouping by the two
    columns is exactly equivalent and avoids first()-style carries.
    Columns per readme.txt:51-59 / FlightEventAggregator.java:118.
    """
    w = F.window("scheduled_time", window_size)
    out = (
        flights.groupBy(w.alias("w"), F.col("origin"), F.col("destination"))
        .agg(
            F.count("*").alias("total_flights"),
            F.round(F.avg("delay_minutes"), ROUND_DP).alias("avg_delay_minutes"),
        )
        .select(
            route_key(F.col("origin"), F.col("destination")).alias("route"),
            "origin",
            "destination",
            "total_flights",
            "avg_delay_minutes",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
        )
    )
    assert out.columns == ROUTE_STATS_COLUMNS
    return out


def hourly_stats(flights: DataFrame, window_size: str = "5 minutes") -> DataFrame:
    """Delay trends keyed by hour-of-day per tumbling window (A3).

    Mixed-domain grouping preserved from the reference: the key is an
    event-time attribute hour(scheduled_time) 0-23
    (FlightEventAggregator.java:137,287) while the window buckets the
    stream. Columns per readme.txt:63-70 / FlightEventAggregator.java:141.
    """
    w = F.window("scheduled_time", window_size)
    out = (
        flights.groupBy(w.alias("w"), hour_of_day(F.col("scheduled_time")).alias("hour_of_day"))
        .agg(*_base_aggs())
        .select(
            "hour_of_day",
            "total_flights",
            "delayed_flights",
            "avg_delay_minutes",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
        )
    )
    assert out.columns == HOURLY_STATS_COLUMNS
    return out
