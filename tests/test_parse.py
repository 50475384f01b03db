"""Unit tests for P1-P4: every SURVEY.md §2.4 quirk (Q1-Q4) and the
FIXTURES.md §1 required edge rows (a)-(h)."""

from __future__ import annotations

import json

from flight_events_flink_job_spark.operators.parse import (
    parse_flight_events,
    rejected_rows,
    valid_flights,
)


def _event(**over):
    base = {
        "flightId": "F1",
        "flightNumber": "AA100",
        "airline": "American",
        "origin": "NYC",
        "destination": "LAX",
        "scheduledArrival": "2024-01-01T10:30:00",
        "actualArrival": "2024-01-01T11:15:00",
        "userId": "user456",
    }
    base.update(over)
    return json.dumps({k: v for k, v in base.items() if v is not None})


def _parse(spark, payloads):
    raw = spark.createDataFrame([(p,) for p in payloads], "value string")
    return parse_flight_events(raw)


def _one(spark, payload):
    return valid_flights(_parse(spark, [payload])).collect()[0]


def test_basic_parse_and_delay_minutes(spark):
    row = _one(spark, _event(delayed=True))
    assert row.flight_id == "F1"
    assert row.airline == "American"
    assert row.is_delayed == 1
    assert row.delay_minutes == 45
    assert row.scheduled_time.hour == 10


def test_delayed_bool_takes_precedence_over_status(spark):
    # edge row (a): contradictory fields — `delayed` wins (FEA:50-58)
    row = _one(spark, _event(delayed=True, status="ON_TIME"))
    assert row.is_delayed == 1
    row = _one(spark, _event(delayed=False, status="DELAYED"))
    assert row.is_delayed == 0


def test_status_case_insensitive(spark):
    # edge row (b): lowercase status matches (equalsIgnoreCase, FEA:56)
    assert _one(spark, _event(status="delayed")).is_delayed == 1
    assert _one(spark, _event(status="DeLaYeD")).is_delayed == 1


def test_unknown_status_not_delayed(spark):
    # edge row (c)
    assert _one(spark, _event(status="CANCELLED")).is_delayed == 0


def test_neither_field_not_delayed(spark):
    # edge row (d)
    assert _one(spark, _event()).is_delayed == 0


def test_negative_delay_truncates_toward_zero(spark):
    # edge rows (e): early arrival → negative, truncated toward zero
    # like Duration.toMinutes (Q4): -4.5 min → -4 (not floor's -5).
    row = _one(
        spark,
        _event(
            scheduledArrival="2024-01-01T10:30:00",
            actualArrival="2024-01-01T10:25:30",
        ),
    )
    assert row.delay_minutes == -4


def test_subminute_delay_is_zero(spark):
    # edge row (f): 59 s → 0 minutes
    row = _one(
        spark,
        _event(
            scheduledArrival="2024-01-01T10:30:00",
            actualArrival="2024-01-01T10:30:59",
        ),
    )
    assert row.delay_minutes == 0


def test_fractional_second_timestamps(spark):
    # edge row (g)
    row = _one(
        spark,
        _event(
            scheduledArrival="2024-01-01T10:30:00.250",
            actualArrival="2024-01-01T10:35:00.750",
        ),
    )
    assert row.delay_minutes == 5
    assert row.scheduled_time.microsecond == 250000


def test_malformed_rows_rejected_not_crash(spark):
    # edge row (h) + Q1: reference NPEs; we dead-letter instead.
    payloads = [
        _event(delayed=True),
        json.dumps({"flightNumber": "AA1"}),  # missing flightId etc.
        "not json at all {{{",
        _event(scheduledArrival="garbage"),  # unparseable timestamp
    ]
    parsed = _parse(spark, payloads)
    assert valid_flights(parsed).count() == 1
    bad = [r.raw for r in rejected_rows(parsed).collect()]
    assert len(bad) == 3
    assert "not json at all {{{" in bad


def test_explicit_null_delayed_forces_not_delayed(spark):
    # node.has("delayed") is true for an explicit JSON null, and
    # asBoolean() on NullNode is false — so {"delayed": null,
    # "status": "DELAYED"} is NOT delayed in the reference
    # (FlightEventAggregator.java:52-53). from_json can't see the
    # difference; the raw-payload json_object_keys branch can.
    explicit_null = _event().replace('"userId"', '"delayed":null,"userId"')
    assert '"delayed":null' in explicit_null
    row = _one(spark, explicit_null.replace("}", ',"status":"DELAYED"}'))
    assert row.is_delayed == 0
    # absent key still falls through to status (FEA:55-57)
    row = _one(spark, _event(status="DELAYED"))
    assert row.is_delayed == 1


def test_datagen_source_partitions_and_encodings(spark):
    """The custom Python DataSource must produce partitioned,
    deterministic payloads covering BOTH delay encodings and negative
    delays (Q2/Q4 paths), and survive the real parse pipeline with
    zero rejects."""
    from flight_events_flink_job_spark.operators.parse import (
        parse_flight_events,
        rejected_rows,
        valid_flights,
    )
    from flight_events_flink_job_spark.sources.datagen import (
        GEN_FORMAT,
        register_datagen,
    )

    register_datagen(spark)
    raw = spark.read.format(GEN_FORMAT).option("rows", 600).load()
    assert raw.rdd.getNumPartitions() > 1
    parsed = parse_flight_events(raw)
    assert rejected_rows(parsed).count() == 0
    flights = valid_flights(parsed)
    assert flights.count() == 600
    raws = raw.collect()
    assert any('"delayed":' in r.value for r in raws)
    assert any('"status":"delayed"' in r.value for r in raws)  # lowercase
    assert flights.filter("delay_minutes < 0").count() > 0
    again = spark.read.format(GEN_FORMAT).option("rows", 600).load().collect()
    assert sorted(r.value for r in raws) == sorted(r.value for r in again)


def test_streaming_datagen_incremental_and_equal_to_batch(spark, tmp_path):
    """The streaming generator must drain in multiple offset-tracked
    micro-batches and produce exactly the batch generator's corpus."""
    import os

    from flight_events_flink_job_spark.operators.parse import (
        parse_flight_events,
        valid_flights,
    )
    from flight_events_flink_job_spark.sources.datagen import (
        GEN_FORMAT,
        drain_datagen_stream,
        register_datagen,
    )

    ckpt = str(tmp_path / "ckpt")
    streamed = drain_datagen_stream(
        spark, ckpt, rows=2500, rows_per_batch=800
    )
    register_datagen(spark)
    batch = valid_flights(
        parse_flight_events(
            spark.read.format(GEN_FORMAT).option("rows", 2500).load()
        )
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )
    commits = [
        f for f in os.listdir(os.path.join(ckpt, "commits"))
        if not f.startswith(".")
    ]
    assert len(commits) >= 4  # ceil(2500/800) = 4 non-empty batches
