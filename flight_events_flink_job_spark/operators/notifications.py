"""P5-P6: delay-notification branch.

Reference: filter(isDelayed==1) → format JSON string → Kafka sink
(FlightEventAggregator.java:76-85, KafkaUtils.java:40-45). Narrow
filter + projection — whole-stage codegen fuses this with the parse
stage into a single loop; zero shuffles at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.flight import notification_json


def delay_notifications(flights: DataFrame) -> DataFrame:
    """Delayed flights → exact-format notification payloads.

    Output carries ``flight_id`` (stable join/sort key) plus the
    ``notification`` JSON string whose shape — including key order
    (quirk Q7) — matches KafkaUtils.createDelayNotification.
    """
    return flights.filter(F.col("is_delayed") == 1).select(
        F.col("flight_id"),
        notification_json(
            F.col("flight_id"),
            F.col("user_id"),
            F.col("flight_number"),
            F.col("airline"),
            F.col("origin"),
            F.col("destination"),
            F.col("delay_minutes"),
        ).alias("notification"),
    )
