"""Property-based differential tests (hypothesis).

Each property batches all generated rows into ONE DataFrame per
example (a Spark job per example, not per row) and checks the engine
against an independent reference: a literal Python transcription of
the reference Java semantics, a DuckDB replay, or an algebraic
invariant. Deterministic: hypothesis derandomized per test, fixed
example budget sized for suite runtime.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

PROP_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# ---------------------------------------------------------------------------
# Q2 delay-flag normalization vs a literal FEA:50-58 transcription
# ---------------------------------------------------------------------------

_status_values = st.one_of(
    st.just("DELAYED"),
    st.just("delayed"),
    st.just("Delayed"),
    st.just("ON_TIME"),
    st.just("CANCELLED"),
    st.just(""),
)
_delay_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.booleans()),  # `delayed` key (None = absent)
        st.one_of(st.none(), _status_values),  # `status` key (None = absent)
    ),
    min_size=1,
    max_size=24,
)


def _reference_is_delayed(delayed, status) -> int:
    """Literal transcription of FlightEventAggregator.java:50-58:
    `delayed` (if the key is present) takes precedence; else a
    case-insensitive status == "DELAYED"; else not delayed."""
    if delayed is not None:
        return 1 if delayed else 0
    if status is not None:
        return 1 if status.upper() == "DELAYED" else 0
    return 0


@given(rows=_delay_rows)
@settings(**PROP_SETTINGS)
def test_delay_flag_matches_reference_semantics(spark, rows):
    from flight_events_flink_job_spark.operators.parse import (
        parse_flight_events,
        valid_flights,
    )

    payloads = []
    for i, (delayed, status) in enumerate(rows):
        obj = {
            "flightId": f"F{i}",
            "flightNumber": f"N{i}",
            "airline": "AL",
            "origin": "AAA",
            "destination": "BBB",
            "scheduledArrival": "2024-01-01T10:00:00",
            "actualArrival": "2024-01-01T10:30:00",
            "userId": f"U{i}",
        }
        if delayed is not None:
            obj["delayed"] = delayed
        if status is not None:
            obj["status"] = status
        payloads.append((json.dumps(obj),))
    df = spark.createDataFrame(payloads, "value STRING")
    got = {
        r.flight_id: r.is_delayed
        for r in valid_flights(parse_flight_events(df)).collect()
    }
    want = {
        f"F{i}": _reference_is_delayed(d, s) for i, (d, s) in enumerate(rows)
    }
    assert got == want


# ---------------------------------------------------------------------------
# Portable poly-hash: Catalyst fold == Arrow UDF == DuckDB == Python
# ---------------------------------------------------------------------------

_ascii_token = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1,
    max_size=24,
)


def _py_poly_hash(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % 1_000_000_007
    return acc


@given(tokens=st.lists(_ascii_token, min_size=1, max_size=16, unique=True))
@settings(**PROP_SETTINGS)
def test_poly_hash_is_engine_portable(spark, tokens):
    import duckdb

    from flight_events_flink_job_spark.functions.textual import (
        poly_hash,
        poly_hash_arrow,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(t,) for t in tokens], "t STRING")
    out = df.select(
        "t",
        poly_hash(F.col("t")).alias("h_fold"),
        poly_hash_arrow(F.col("t")).alias("h_arrow"),
    ).collect()
    duck = dict(
        duckdb.sql(
            "SELECT t, list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "[CAST(unicode(t[i]) AS BIGINT) for i in range(1, len(t)+1)]), "
            "(a, c) -> (a * 31 + c) % 1000000007) FROM (SELECT unnest(?) t)",
            params=[tokens],
        ).fetchall()
    )
    for r in out:
        expect = _py_poly_hash(r.t)
        assert r.h_fold == expect
        assert r.h_arrow == expect
        assert duck[r.t] == expect


# ---------------------------------------------------------------------------
# Sequence packing invariants under arbitrary corpora
# ---------------------------------------------------------------------------

_doc_text = st.lists(_ascii_token, min_size=1, max_size=40).map(" ".join)


@given(texts=st.lists(_doc_text, min_size=1, max_size=20))
@settings(**PROP_SETTINGS)
def test_pack_sequences_conserves_tokens_and_respects_offsets(spark, texts):
    from flight_events_flink_job_spark.operators.pipeline import pack_sequences

    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    budget = 16
    packs = pack_sequences(docs, budget=budget).collect()
    total_tokens = sum(len(t.split(" ")) for t in texts)
    assert sum(p.pack_tokens for p in packs) == total_tokens
    assert sum(p.n_docs for p in packs) == len(texts)
    # offset packing contract: a pack overflows the budget by at most
    # one document's tokens (the documented distributed-packing trade)
    max_doc = max(len(t.split(" ")) for t in texts)
    assert all(p.pack_tokens <= budget + max_doc for p in packs)
    # pack ids are unique per source and start at 0 (NOT dense: a doc
    # longer than the budget legitimately skips ids — pack_id is
    # floor(offset/budget))
    ids = sorted(p.pack_id for p in packs)
    assert len(set(ids)) == len(ids)
    assert ids[0] == 0
