"""Semi-structured JSON property mining over ``events.props``.

The reference's only JSON handling is the flight-event payload parse
(FlightEventAggregator.java:41-59); this extends the same capability to
ad-hoc JSON property columns — the "opaque JSON bag" shape ubiquitous in
event pipelines. ``get_json_object`` is a narrow JVM-side expression;
the rollup is one hash aggregation. DuckDB twin: ``json_extract_string``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUND_DP = 4


def props_value(events: DataFrame, path: str = "$.k") -> DataFrame:
    """Extract one JSON property as a typed column (narrow map)."""
    return events.select(
        "event_id",
        "event_type",
        "user_id",
        F.get_json_object(F.col("props"), path).cast("bigint").alias("prop_k"),
    )


def props_mining(events: DataFrame) -> DataFrame:
    """Per-event-type stats over the JSON property ``$.k``.

    Output: event_type, n_events, n_users (distinct), min/max/avg of the
    extracted property. Exactly the groupBy-after-extract pattern a
    pipeline uses to profile unfamiliar event payloads.
    """
    return (
        props_value(events)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.min("prop_k").alias("min_k"),
            F.max("prop_k").alias("max_k"),
            F.round(F.avg("prop_k"), ROUND_DP).alias("avg_k"),
        )
    )


def props_variant_profile(events: DataFrame) -> DataFrame:
    """Per-event-type payload profile through Spark 4's VARIANT type:
    ``parse_json`` once into the shredded binary-JSON representation,
    then typed path extraction (``try_variant_get``) and schema
    inference (``schema_of_variant``) — the modern engine path for
    semi-structured columns at scale (columnar shredding, no repeated
    string parsing), vs :func:`props_mining`'s classic
    ``get_json_object`` string path.

    Columns: (event_type, n_events, n_valid, variant_schema,
    min_k, max_k). ``n_valid`` counts payloads whose ``$.k`` extracts
    as BIGINT; ``variant_schema`` is the (single) inferred object
    schema — a literal golden value in the oracle.
    """
    v = events.select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    ).select(
        "event_type",
        F.try_variant_get(F.col("v"), "$.k", "bigint").alias("k"),
        F.schema_of_variant(F.col("v")).alias("sch"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count("k").alias("n_valid"),
        F.max("sch").alias("variant_schema"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )
