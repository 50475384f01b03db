"""Golden notification test: exact JSON string, including key order
(quirk Q7), against the reference sample readme.txt:77-86."""

from __future__ import annotations

import json

from flight_events_flink_job_spark.operators.notifications import delay_notifications
from flight_events_flink_job_spark.operators.parse import (
    parse_flight_events,
    valid_flights,
)


def test_golden_notification_string(spark):
    payload = json.dumps(
        {
            "flightId": "ABC123",
            "flightNumber": "AA100",
            "airline": "American",
            "origin": "NYC",
            "destination": "LAX",
            "scheduledArrival": "2024-01-01T10:00:00",
            "actualArrival": "2024-01-01T10:45:00",
            "delayed": True,
            "userId": "user456",
        }
    )
    raw = spark.createDataFrame([(payload,)], "value string")
    flights = valid_flights(parse_flight_events(raw))
    out = delay_notifications(flights).collect()
    assert len(out) == 1
    expected = (
        '{"flightId":"ABC123","userId":"user456","flightNumber":"AA100",'
        '"airline":"American","route":"NYC-LAX","delayMinutes":45,'
        '"message":"Your flight AA100 is delayed by 45 minutes"}'
    )
    assert out[0].notification == expected
    # valid JSON with the reference's exact key order
    assert list(json.loads(out[0].notification)) == [
        "flightId",
        "userId",
        "flightNumber",
        "airline",
        "route",
        "delayMinutes",
        "message",
    ]


def test_on_time_flights_filtered_out(spark):
    payload = json.dumps(
        {
            "flightId": "F2",
            "flightNumber": "UA1",
            "airline": "United",
            "origin": "SFO",
            "destination": "ORD",
            "scheduledArrival": "2024-01-01T10:00:00",
            "actualArrival": "2024-01-01T10:00:00",
            "status": "ON_TIME",
            "userId": "u1",
        }
    )
    raw = spark.createDataFrame([(payload,)], "value string")
    flights = valid_flights(parse_flight_events(raw))
    assert delay_notifications(flights).count() == 0
