"""Scalar expressions for the flight-event domain (SURVEY.md §2.2).

Every function returns a native Column expression — JVM-side, fused by
whole-stage codegen; no Python UDFs anywhere on this path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact notification shape from the reference
# (KafkaUtils.java:41-44; sample readme.txt:77-86). Key order is part of
# the contract (SURVEY.md quirk Q7), hence a format string rather than
# to_json over an unordered map.
NOTIFICATION_FORMAT = (
    '{"flightId":"%s","userId":"%s","flightNumber":"%s","airline":"%s",'
    '"route":"%s-%s","delayMinutes":%d,'
    '"message":"Your flight %s is delayed by %d minutes"}'
)


def delay_flag(delayed: Column, status: Column, raw: Column | None = None) -> Column:
    """Normalize the dual delay encodings to int 0/1.

    Reference semantics (FlightEventAggregator.java:50-58, quirk Q2):
    a present ``delayed`` boolean wins; else ``status`` equal to
    "DELAYED" case-insensitively; else not delayed. Unknown status
    values are NOT delayed.

    The reference checks key *presence* (``node.has("delayed")``,
    FlightEventAggregator.java:52), so an explicit ``"delayed": null``
    is present and ``asBoolean()`` on a JSON null yields false — NOT
    delayed, even when ``status`` says "DELAYED". ``from_json`` maps
    absent and explicit-null identically to NULL, so when the raw JSON
    payload is supplied we recover key presence with
    ``json_object_keys`` — evaluated lazily only on the delayed-IS-NULL
    branch (CaseWhen short-circuits per row), so the common
    boolean-present path pays nothing extra.
    """
    status_delayed = F.upper(F.coalesce(status, F.lit(""))) == F.lit("DELAYED")
    expr = F.when(delayed.isNotNull(), delayed.cast("int"))
    if raw is not None:
        has_key = F.array_contains(F.json_object_keys(raw), "delayed")
        expr = expr.when(F.coalesce(has_key, F.lit(False)), F.lit(0))
    return expr.otherwise(status_delayed.cast("int"))


def delay_minutes(scheduled: Column, actual: Column) -> Column:
    """Signed whole minutes between scheduled and actual arrival.

    Matches java.time.Duration.toMinutes (FlightEventAggregator.java:60,
    quirk Q4): truncation toward zero, so a 4.5-minute-early arrival is
    -4, not -5 — CAST(double AS BIGINT) truncates toward zero, floor()
    would not.
    """
    seconds = actual.cast("long") - scheduled.cast("long")
    return (seconds / 60).cast("long")


def route_key(origin: Column, destination: Column) -> Column:
    """Route key ``origin-destination`` (FlightEventAggregator.java:114)."""
    return F.concat_ws("-", origin, destination)


def hour_of_day(scheduled: Column) -> Column:
    """Hour 0-23 of the scheduled time (FlightEventAggregator.java:137)."""
    return F.hour(scheduled)


def notification_json(
    flight_id: Column,
    user_id: Column,
    flight_number: Column,
    airline: Column,
    origin: Column,
    destination: Column,
    delay_minutes_col: Column,
) -> Column:
    """Delay-notification JSON string, byte-for-byte the reference shape."""
    return F.format_string(
        NOTIFICATION_FORMAT,
        flight_id,
        user_id,
        flight_number,
        airline,
        origin,
        destination,
        delay_minutes_col,
        flight_number,
        delay_minutes_col,
    )
