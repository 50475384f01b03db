"""Round-5 adversarial hardening regressions.

Each test pins a corner the adversarial oracle sweep
(tools/gen_adversarial.py + tools/parity_r5_adversarial.log) caught:
bronze-boundary sanitization, zero-vector cosine/quantization, the
pointer-jumping connected-components diameter bound, and the
unicode-safe Arrow poly-hash.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_bronze_contract_is_identity_on_benign_and_total_on_garbage(
    spark, tmp_path
):
    """load_table('events'): untimed rows dropped; NaN/Inf/|v|>1e9
    measures NULLed; finite in-domain rows untouched."""
    from flight_events_flink_job_spark.sources.fixtures import load_table

    rows = [
        (0, "2024-01-01T00:00:00", 1, "view", 12.5),
        (1, None, 1, "view", 1.0),  # untimed -> dropped
        (2, "2024-01-01T00:01:00", 1, "view", float("nan")),
        (3, "2024-01-01T00:02:00", 1, "view", float("inf")),
        (4, "2024-01-01T00:03:00", 1, "view", -1e15),
        (5, "2024-01-01T00:04:00", 1, "view", None),
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, ts STRING, user_id LONG, event_type STRING, value DOUBLE"
    ).withColumn("ts", F.to_timestamp("ts")).withColumn("props", F.lit(None).cast("string"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.event_id: r.value for r in load_table(spark, str(tmp_path), "events").collect()}
    assert set(out) == {0, 2, 3, 4, 5}  # row 1 dropped
    assert out[0] == 12.5
    assert out[2] is None and out[3] is None and out[4] is None and out[5] is None


def test_embedding_clamp_and_zero_vector_quantization(spark, tmp_path):
    """Embedding bronze clamp to +-1e3; all-zero vector quantizes to
    scale 0 / all-zero codes instead of raising 0/0 under ANSI."""
    from flight_events_flink_job_spark.operators.vectors_agg import (
        quantize_embeddings,
    )
    from flight_events_flink_job_spark.sources.fixtures import load_table

    rows = [
        (0, [0.0] * 4, 0),
        (1, [1e30, -1e30, float("nan"), 2.0], 1),
        (2, [1.0, -2.0, 3.0, -4.0], 2),
    ]
    spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    embs = load_table(spark, str(tmp_path), "embeddings")
    got = {r.vec_id: list(r.embedding) for r in embs.collect()}
    assert got[1] == [1000.0, -1000.0, 0.0, 2.0]  # clamped, NaN->0
    q = {r.vec_id: r for r in quantize_embeddings(embs).collect()}
    assert q[0].scale == 0.0
    assert all(v == 0 for v in q[0].q_vec)
    assert q[0].q_l1 == 0
    assert q[2].q_l1 > 0


def test_cosine_safe_zero_norm_is_zero(spark):
    from flight_events_flink_job_spark.functions.vectors import cosine_safe

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
    )
    got = df.select(cosine_safe(F.col("a"), F.col("b")).alias("c")).collect()
    assert got[0].c == 0.0
    assert abs(got[1].c - 1.0) < 1e-12


def test_connected_components_long_chain_converges_logarithmically(spark):
    """A 300-link path graph has diameter 300; naive min-label
    propagation needs 300 rounds and used to blow the max_iter=25
    bound. Pointer jumping must label the whole chain with node 0
    well inside the bound."""
    from flight_events_flink_job_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "doc_a LONG, doc_b LONG"
    )
    labels = {r.node: r.component for r in connected_components(edges).collect()}
    assert len(labels) == 301
    assert set(labels.values()) == {0}


def test_poly_hash_arrow_matches_catalyst_on_unicode(spark):
    """The Arrow twin must fold CODEPOINTS (like F.ascii / DuckDB
    unicode()), not ASCII bytes — it used to crash on non-ASCII."""
    from flight_events_flink_job_spark.functions.textual import (
        poly_hash,
        poly_hash_arrow,
    )

    df = spark.createDataFrame(
        [("hello",), ("日本語 テキスト",), ("",), ("mixed 日本 ascii",)],
        "s STRING",
    )
    got = df.select(
        poly_hash(F.col("s")).alias("slow"),
        poly_hash_arrow(F.col("s")).alias("fast"),
    ).collect()
    for r in got:
        assert r.slow == r.fast


def test_compact_table_rejects_in_place(spark, tmp_path):
    import pytest

    from flight_events_flink_job_spark.streaming.sinks import compact_table

    p = str(tmp_path / "t")
    spark.range(10).write.parquet(p)
    with pytest.raises(ValueError, match="out_path must differ"):
        compact_table(spark, p, p)


def test_csv_roundtrip_preserves_empty_string_vs_null(spark, tmp_path):
    from flight_events_flink_job_spark.streaming.sinks import csv_roundtrip

    df = spark.createDataFrame(
        [("", 1), (None, 2), ("x", 3)], "k STRING, v INT"
    )
    out = sorted(
        [(r.k, r.v) for r in csv_roundtrip(df, str(tmp_path / "c")).collect()],
        key=lambda t: t[1],
    )
    assert out == [("", 1), (None, 2), ("x", 3)]


def test_flight_adapter_total_over_garbage_values(spark):
    """The events->flight-event mapping is total: NULL/NaN value -> no
    delay info (v_norm 0), +-huge clamps, untimed rows excluded — the
    payload builder must not raise and delay flags must be defined."""
    from flight_events_flink_job_spark.operators.parse import (
        parse_flight_events,
    )
    from flight_events_flink_job_spark.sources.flight_adapter import (
        flight_event_json,
    )

    rows = [
        (0, "2024-01-01T00:00:00", 1, "AA", float("nan")),
        (1, "2024-01-01T00:01:00", 1, "AA", float("inf")),
        (2, "2024-01-01T00:02:00", 1, "AA", -1e15),
        (3, None, 1, "AA", 20.0),
        (4, "2024-01-01T00:04:00", 1, "AA", 20.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id LONG, ts STRING, user_id LONG, event_type STRING, value DOUBLE"
    ).withColumn("ts", F.to_timestamp("ts"))
    payloads = flight_event_json(ev)
    assert payloads.count() == 4  # untimed row excluded
    parsed = parse_flight_events(payloads)
    flags = {
        r.flight_id: r.is_delayed
        for r in parsed.filter(F.col("flight_id").isNotNull()).collect()
    }
    assert flags["F0"] == 0  # NaN -> v_norm 0 -> not delayed
    assert flags["F1"] == 1  # +inf -> clamp 1e6 -> delayed
    assert flags["F2"] == 0  # -1e15 -> clamp -1e6 -> not delayed
    assert flags["F4"] == 1
    assert not math.isnan(sum(flags.values()))
