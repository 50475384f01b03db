"""Vector/statistical aggregation operators.

- :func:`label_centroids` — element-wise mean vector per label over the
  ``embeddings`` table: the bulk "compute class centroids" step of an
  embedding pipeline (and the aggregation half of a k-means iteration).
- :func:`event_value_quantiles` — exact interpolated percentiles per
  event type over ``events.value``.

Scale shapes: centroids go long-form (explode to (label, dim, x) then
hash-aggregate) — the shuffle carries partial sums only, one row per
(label, dim) per partition, and no row ever holds more than one
coordinate; percentiles use Spark's exact ``percentile`` aggregate
(switch to ``percentile_approx`` when a single-pass sketch is wanted
at extreme scale — kept exact here so the oracle can hash-match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import spread

ROUND_DP = 4


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """(label, dim, centroid, n_vectors): element-wise mean embedding
    per label, long form (dim is the 1-based coordinate index)."""
    exploded = spread(embeddings).select(
        "label", F.posexplode(F.col("embedding")).alias("dim0", "x")
    )
    # Exact mean: double `avg` is summation-order-dependent, so two
    # engines disagree in the last ulps and a 4-dp round flips on
    # boundary values. Summing in DECIMAL is exact and associative;
    # the single double division + round afterwards is deterministic.
    sum_dec = F.sum(F.col("x").cast("decimal(20,10)"))
    return (
        exploded.groupBy("label", (F.col("dim0") + 1).alias("dim"))
        .agg(
            # `+ 0.0` folds IEEE negative zero to +0.0 (round(-1e-9, 4)
            # stringifies as "-0.0" in one engine and "0.0" in the other).
            (F.round(sum_dec.cast("double") / F.count("*"), ROUND_DP) + F.lit(0.0)).alias(
                "centroid"
            ),
            F.count("*").alias("n_vectors"),
        )
        .select("label", F.col("dim").cast("int").alias("dim"), "centroid", "n_vectors")
    )


def event_value_quantiles(events: DataFrame) -> DataFrame:
    """(event_type, n_events, p50, p95, p99) — exact linear-interpolated
    percentiles of ``value`` per event type (DuckDB twin:
    ``quantile_cont``)."""
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.expr("percentile(value, 0.5)"), ROUND_DP).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), ROUND_DP).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), ROUND_DP).alias("p99"),
    )


def quantize_embeddings(embeddings: DataFrame) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the
    storage/serving compression step of an embedding pipeline (float32
    -> int8 cuts vector bytes 4x before an ANN index build).

    Per-vector scale = max|x| / 127; quantized value = floor(x / scale)
    — floor, not round, because float->int truncation/rounding rules
    differ across engines while floor is unambiguous. Output range is
    the asymmetric int8 [-128, 127]: the negative extreme floors to
    -128 when x/scale computes as -127-epsilon. All math in
    float64 after an explicit float32->float64 widening. Narrow
    per-row projection, no shuffle; the quantized array is BIGINT only
    for oracle-type portability (an int8 cast is a storage detail).
    """
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, F.abs))
    scale = maxabs / F.lit(127.0)
    q = F.transform(v, lambda x: F.floor(x / scale))
    return embeddings.select(
        "vec_id",
        "label",
        F.round(scale, 6).alias("scale"),
        q.alias("q_vec"),
        F.aggregate(
            F.transform(q, F.abs), F.lit(0).cast("bigint"), lambda a, b: a + b
        ).alias("q_l1"),
    )
