"""Schemas: the flight-event input contract and sink-table schemas.

Input JSON contract derives from the reference parser
(FlightEventAggregator.java:43-59): eight required fields plus the two
*alternative* delay encodings — a ``delayed`` boolean OR a ``status``
string compared case-insensitively to "DELAYED"
(FlightEventAggregator.java:50-58). Timestamps arrive as ISO-8601 local
datetimes with optional fractional seconds
(FlightEventAggregator.java:48-49), so we parse them as strings and
cast — Spark's string->timestamp cast accepts both variants.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw JSON event schema. `scheduledArrival`/`actualArrival` stay strings
# here (flexible ISO parse happens in operators/parse.py); `delayed` and
# `status` are both optional — precedence handled by delay_flag().
FLIGHT_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("flightId", T.StringType()),
        T.StructField("flightNumber", T.StringType()),
        T.StructField("airline", T.StringType()),
        T.StructField("origin", T.StringType()),
        T.StructField("destination", T.StringType()),
        T.StructField("scheduledArrival", T.StringType()),
        T.StructField("actualArrival", T.StringType()),
        T.StructField("delayed", T.BooleanType()),
        T.StructField("status", T.StringType()),
        T.StructField("userId", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)

# Required input fields — the reference NPEs when any is absent
# (unguarded node.get(), FlightEventAggregator.java:43-49,59). We route
# such rows to a rejected stream instead (SURVEY.md quirk Q1).
REQUIRED_FIELDS = [
    "flightId",
    "flightNumber",
    "airline",
    "origin",
    "destination",
    "scheduledArrival",
    "actualArrival",
    "userId",
]

# Parsed/enriched flight table — the raw-archive sink schema
# (readme.txt:18 + ALTERs readme.txt:73-74, INSERT FlightEventAggregator.java:160).
FLIGHT_SCHEMA = T.StructType(
    [
        T.StructField("flight_id", T.StringType()),
        T.StructField("flight_number", T.StringType()),
        T.StructField("airline", T.StringType()),
        T.StructField("origin", T.StringType()),
        T.StructField("destination", T.StringType()),
        T.StructField("scheduled_time", T.TimestampType()),
        T.StructField("actual_time", T.TimestampType()),
        T.StructField("is_delayed", T.IntegerType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("delay_minutes", T.LongType()),
    ]
)

FLIGHT_COLUMNS = [f.name for f in FLIGHT_SCHEMA.fields]

# Aggregation sink schemas (readme.txt:41-49, :51-59, :63-70).
AIRLINE_STATS_COLUMNS = [
    "airline",
    "total_flights",
    "delayed_flights",
    "avg_delay_minutes",
    "delay_rate",
    "window_start",
    "window_end",
]
ROUTE_STATS_COLUMNS = [
    "route",
    "origin",
    "destination",
    "total_flights",
    "avg_delay_minutes",
    "window_start",
    "window_end",
]
HOURLY_STATS_COLUMNS = [
    "hour_of_day",
    "total_flights",
    "delayed_flights",
    "avg_delay_minutes",
    "window_start",
    "window_end",
]

# Driver fixture tables (TESTDATA.md / FIXTURES.md §3).
FIXTURE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
