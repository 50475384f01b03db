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


# ---------------------------------------------------------------------------
# MERGE upsert: the four row fates partition the key space exactly
# ---------------------------------------------------------------------------

_merge_customers = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=30),          # custkey
        st.sampled_from(["BUILDING", "MACHINERY"]),       # segment
        st.floats(min_value=-50, max_value=50).map(lambda x: round(x, 2)),
    ),
    min_size=1,
    max_size=20,
    unique_by=lambda t: t[0],
)
_merge_orders = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=30),          # custkey
        st.integers(min_value=0, max_value=1),           # recent?
        st.floats(min_value=0.5, max_value=99.5).map(lambda x: round(x, 2)),
    ),
    min_size=0,
    max_size=30,
)


@given(custs=_merge_customers, ords=_merge_orders)
@settings(**PROP_SETTINGS)
def test_merge_upsert_fates_partition_keyspace(spark, custs, ords):
    """For ANY inputs: snapshot keys and recent-source keys are fully
    accounted for — update = snapshot∩source (minus purged), insert =
    source-only, keep = snapshot-only, delete = purged matches; and the
    output never contains a purged or unknown key."""
    import datetime as dt

    from flight_events_flink_job_spark.operators.merge import (
        merge_customer_snapshot,
    )

    customer = spark.createDataFrame(
        [(k, f"c{k}", 0, bal, seg) for k, seg, bal in custs],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
        " c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [
            (
                i,
                k,
                "O",
                price,
                dt.datetime(2000, 6, 1) if recent else dt.datetime(1999, 1, 1),
                "5-LOW",
            )
            for i, (k, recent, price) in enumerate(ords)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = {r.c_custkey: r for r in merge_customer_snapshot(customer, orders).collect()}

    snapshot = {k: seg for k, seg, bal in custs if bal > 0}
    source = {k for k, recent, _ in ords if recent}
    purged = {k for k in snapshot if k in source and snapshot[k] == "MACHINERY"}
    expect_update = (snapshot.keys() & source) - purged
    expect_insert = source - snapshot.keys()
    expect_keep = snapshot.keys() - source

    assert {k for k, r in out.items() if r.action == "update"} == expect_update
    assert {k for k, r in out.items() if r.action == "insert"} == expect_insert
    assert {k for k, r in out.items() if r.action == "keep"} == expect_keep
    assert purged.isdisjoint(out.keys())


# ---------------------------------------------------------------------------
# Incremental dedup: admitted keys are disjoint from the corpus, unique
# within the batch, and cover every fresh key
# ---------------------------------------------------------------------------

_dedup_texts = st.lists(
    st.text(alphabet="ab ", min_size=1, max_size=12).map(
        lambda t: " ".join(t.split()) or "a"
    ),
    min_size=1,
    max_size=16,
)


@given(old_texts=_dedup_texts, new_texts=_dedup_texts)
@settings(**PROP_SETTINGS)
def test_incremental_dedup_admits_exactly_fresh_keys(spark, old_texts, new_texts):
    from flight_events_flink_job_spark.operators.pipeline import incremental_dedup

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    existing = spark.createDataFrame(
        [(i, t, "en", "old", len(t)) for i, t in enumerate(old_texts)], schema
    )
    incoming = spark.createDataFrame(
        [(1000 + i, t, "en", "new", len(t)) for i, t in enumerate(new_texts)],
        schema,
    )
    out = incremental_dedup(existing, incoming).collect()

    def key(t):
        return " ".join(sorted(set(t.split())))

    old_keys = {key(t) for t in old_texts}
    fresh = {key(t) for t in new_texts} - old_keys
    got_keys = {key(new_texts[r.doc_id - 1000]) for r in out}
    assert got_keys == fresh                      # coverage + corpus-disjoint
    assert len(out) == len(fresh)                 # one representative per key
    for r in out:                                 # lowest doc_id representative
        k = key(new_texts[r.doc_id - 1000])
        first = min(
            1000 + i for i, t in enumerate(new_texts) if key(t) == k
        )
        assert r.doc_id == first


# ---------------------------------------------------------------------------
# Portable poly hash: Catalyst fold == Arrow twin == Python reference,
# over arbitrary Unicode (the Arrow path used to be ASCII-only and
# crashed on anything else — round-5 adversarial sweep)
# ---------------------------------------------------------------------------

_uni_strings = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",)  # no lone surrogates
        ),
        max_size=40,
    ),
    min_size=1,
    max_size=16,
)


def _reference_poly_hash(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % 1_000_000_007
    return acc


@given(strings=_uni_strings)
@settings(**PROP_SETTINGS)
def test_poly_hash_paths_agree_on_unicode(spark, strings):
    from pyspark.sql import functions as F

    from flight_events_flink_job_spark.functions.textual import (
        poly_hash,
        poly_hash_arrow,
    )

    df = spark.createDataFrame([(s,) for s in strings], "s STRING")
    got = df.select(
        "s",
        poly_hash(F.col("s")).alias("slow"),
        poly_hash_arrow(F.col("s")).alias("fast"),
    ).collect()
    for r in got:
        expect = _reference_poly_hash(r.s)
        assert r.slow == expect, (r.s, r.slow, expect)
        assert r.fast == expect, (r.s, r.fast, expect)


# ---------------------------------------------------------------------------
# Integer half-up centroid mean == Python Decimal reference
# (round(double, 4) is engine-specific at .xxxx5 boundaries; the
# integer path in label_centroids must equal decimal HALF_UP exactly)
# ---------------------------------------------------------------------------

_vec_lists = st.lists(
    st.lists(
        st.one_of(
            st.floats(
                min_value=-1000.0,
                max_value=1000.0,
                allow_nan=False,
                width=32,
            ),
            st.sampled_from([0.00005, -0.00005, 1000.0, -1000.0, 0.0]),
        ),
        min_size=2,
        max_size=2,
    ),
    min_size=1,
    max_size=12,
)


@given(vecs=_vec_lists)
@settings(**PROP_SETTINGS)
def test_label_centroid_mean_matches_decimal_half_up(spark, vecs):
    from decimal import ROUND_HALF_UP, Decimal

    from flight_events_flink_job_spark.operators.vectors_agg import (
        label_centroids,
    )

    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    embs = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )
    got = {r.dim: r.centroid for r in label_centroids(embs).collect()}
    import numpy as np

    for dim in (1, 2):
        vals = [np.float32(v[dim - 1]) for v in vecs]
        s = sum(
            Decimal(repr(float(x))).quantize(
                Decimal("1.0000000000"), rounding=ROUND_HALF_UP
            )
            for x in vals
        )
        expect = float(
            (s / len(vals)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
        )
        assert abs(got[dim] - expect) < 1e-12, (dim, got[dim], expect, s)
