"""P1-P4: JSON parse + enrich (the reference's map operator).

Reference: one Jackson ``readTree`` per record plus per-field getters
(FlightEventAggregator.java:39-72). Here the whole thing is a single
``from_json`` + derived columns — one Catalyst expression tree, fused
into whole-stage codegen, vectorized over the batch. At 100 TB this is
a narrow map stage: no shuffle, scales linearly with input splits.

Quirk Q1 upgrade: the reference NPEs on malformed/missing-field input;
we parse PERMISSIVE with a ``_corrupt_record`` column and split the
stream into valid rows and rejected rows (dead-letter) instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.flight import delay_flag, delay_minutes
from ..schemas import FLIGHT_COLUMNS, FLIGHT_EVENT_SCHEMA, REQUIRED_FIELDS


def _valid_predicate() -> Column:
    ok = F.col("_corrupt_record").isNull()
    for name in REQUIRED_FIELDS:
        ok = ok & F.col(name).isNotNull()
    # Timestamps must actually parse (reference would throw in
    # LocalDateTime.parse, FlightEventAggregator.java:48-49).
    ok = ok & F.col("scheduled_time").isNotNull() & F.col("actual_time").isNotNull()
    return ok


def parse_flight_events(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse raw JSON strings into the enriched flight-event table.

    Input: any DataFrame with a string column ``value_col`` holding one
    flight-event JSON object per row (the Kafka message shape).
    Output: FLIGHT_SCHEMA columns + ``_valid`` + ``_raw`` (for the
    dead-letter stream). Works identically on batch and streaming
    DataFrames — it is a pure narrow transformation.
    """
    parsed = raw.withColumn(
        "_j",
        F.from_json(
            F.col(value_col),
            FLIGHT_EVENT_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    ).select(F.col(value_col).alias("_raw"), F.col("_j.*"))

    enriched = (
        parsed
        # ISO-8601 local datetime, optional fractional seconds
        # (FlightEventAggregator.java:48-49) — string->timestamp cast
        # accepts both; try_cast yields NULL (→ rejected row) instead of
        # an ANSI runtime error on garbage input.
        .withColumn(
            "scheduled_time", F.expr("try_cast(scheduledArrival AS TIMESTAMP)")
        )
        .withColumn("actual_time", F.expr("try_cast(actualArrival AS TIMESTAMP)"))
        .withColumn(
            "is_delayed",
            delay_flag(F.col("delayed"), F.col("status"), raw=F.col("_raw")),
        )
        .withColumn(
            "delay_minutes",
            delay_minutes(F.col("scheduled_time"), F.col("actual_time")),
        )
    )
    return enriched.select(
        F.col("flightId").alias("flight_id"),
        F.col("flightNumber").alias("flight_number"),
        F.col("airline"),
        F.col("origin"),
        F.col("destination"),
        F.col("scheduled_time"),
        F.col("actual_time"),
        F.col("is_delayed"),
        F.col("userId").alias("user_id"),
        F.col("delay_minutes"),
        _valid_predicate().alias("_valid"),
        F.col("_raw"),
    )


def valid_flights(parsed: DataFrame) -> DataFrame:
    """The clean stream: FLIGHT_SCHEMA columns only."""
    return parsed.filter(F.col("_valid")).select(*FLIGHT_COLUMNS)


def rejected_rows(parsed: DataFrame) -> DataFrame:
    """Dead-letter stream: raw payloads the reference would crash on."""
    return parsed.filter(~F.col("_valid")).select(F.col("_raw").alias("raw"))
