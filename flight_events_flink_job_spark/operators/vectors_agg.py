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
    # boundary values. Summing in DECIMAL is exact and associative.
    # The 4-dp round itself runs in INTEGER arithmetic (half-up,
    # away-from-zero on the scaled sum) because round(double, 4) is
    # engine-specific at exact .xxxx5 boundaries — which identical
    # clamped inputs (bronze contract) produce (round-5 adversarial):
    #   q = round_half_up(S / n at 1e-4) computed on T = S*1e10 (exact
    #   BIGINT — decimal(20,10) * 10^10 keeps precision 32 < 38) as
    #   (2|T| + n*1e6) DIV (2*n*1e6), re-signed; centroid = q / 1e4
    # (q <= 1e7, so the final double division is exact-and-agreed).
    # `+ 0.0` folds IEEE negative zero to +0.0.
    sum_dec = F.sum(F.col("x").cast("decimal(20,10)"))
    g = exploded.groupBy("label", (F.col("dim0") + 1).alias("dim")).agg(
        sum_dec.alias("s"), F.count("*").alias("n_vectors")
    )
    half_up = (
        "CAST(CASE WHEN s >= 0"
        " THEN (2 * CAST(s * CAST(10000000000 AS DECIMAL(11,0)) AS BIGINT)"
        "       + n_vectors * 1000000) DIV (2 * n_vectors * 1000000)"
        " ELSE -((2 * CAST((-s) * CAST(10000000000 AS DECIMAL(11,0)) AS BIGINT)"
        "       + n_vectors * 1000000) DIV (2 * n_vectors * 1000000))"
        " END AS DOUBLE) / 10000.0 + 0.0"
    )
    return g.select(
        "label",
        F.col("dim").cast("int").alias("dim"),
        F.expr(half_up).alias("centroid"),
        "n_vectors",
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


def event_value_quantiles_sketch_checked(
    events: DataFrame, accuracy: int = 1000
) -> DataFrame:
    """Single-pass quantile sketch (``approx_percentile``) with an
    in-plan rank-bracket assertion, making the sketch driver-checkable.

    ``approx_percentile`` guarantees a rank error of at most
    ``n / accuracy``: the returned element's rank must land within
    ``p*n ± n/accuracy``. The sketch values themselves are
    partition-merge-order dependent (no cross-engine twin), so the
    comparable surface is (event_type, n_events, pXX_ok): each verdict
    recomputes the element's true rank bracket by re-scanning the group
    (count of values < v and <= v — a broadcast join of the 5-row sketch
    result back onto events, one extra aggregate, verification-tier
    only) and the oracle asserts literal TRUE. A sketch regression
    (merge bug, accuracy plumbing) flips a verdict and hash-fails the
    driver row. The raw sketch stays the 100 TB shape: fixed-size
    mergeable state, no sort, no distinct expansion.
    """
    q = F.expr(
        f"approx_percentile(value, array(0.5, 0.95, 0.99), {accuracy})"
    )
    sketch = events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        # the sketch sees only non-NULL measures, so the rank bracket
        # must target p * count(value), NOT p * count(*) — with NULLs
        # present the inflated target walks out of the sketch's rank
        # tolerance and every verdict goes false (round-5 adversarial)
        F.count("value").alias("_n_valid"),
        F.element_at(q, 1).alias("_p50"),
        F.element_at(q, 2).alias("_p95"),
        F.element_at(q, 3).alias("_p99"),
    )
    joined = events.select("event_type", "value").join(
        F.broadcast(sketch), "event_type"
    )

    def ok(col: str, p: float):
        v = F.col(col)
        n = F.col("_n_valid").cast("double")
        # ranks occupied by the returned element: (lt, le]; the target
        # rank p*n must fall within tolerance of that interval
        lt = F.sum((F.col("value") < v).cast("long")).cast("double")
        le = F.sum((F.col("value") <= v).cast("long")).cast("double")
        tol = n / accuracy + F.lit(1.0)
        target = F.lit(p) * n
        return (lt <= target + tol) & (le >= target - tol)

    return (
        joined.groupBy(
            "event_type", "n_events", "_n_valid", "_p50", "_p95", "_p99"
        )
        .agg(
            ok("_p50", 0.5).alias("p50_ok"),
            ok("_p95", 0.95).alias("p95_ok"),
            ok("_p99", 0.99).alias("p99_ok"),
        )
        .select("event_type", "n_events", "p50_ok", "p95_ok", "p99_ok")
    )


def embedding_norm_outliers(
    embeddings: DataFrame, z_cut: float = 3.0
) -> DataFrame:
    """(label, n_vectors, mean_norm, n_norm_outliers): per-label L2-norm
    audit — the broken-embedding detector of a vector pipeline (a
    truncated/zeroed/double-scaled vector shows up as a norm outlier
    long before any similarity query goes wrong).

    Same two-pass shape as :func:`value_anomalies`: per-label DECIMAL
    norm moments, tiny stats row broadcast back over the scan, z-score
    per vector, zero-variance labels guarded (``std > 0``) identically
    to the oracle. The norm is a sequential left fold over dimensions
    (bit-identical to DuckDB's ``list_reduce``), so the whole audit is
    hash-exact.
    """
    from ..functions.vectors import to_double

    v = to_double(F.col("embedding"))
    norm = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, b: a + b
        )
    )
    base = spread(embeddings).select("label", norm.alias("norm"))
    stats = base.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.sum(F.col("norm").cast("decimal(27,10)")).alias("s"),
        F.sum((F.col("norm") * F.col("norm")).cast("decimal(27,10)")).alias(
            "ss"
        ),
    )
    mean = F.col("s").cast("double") / F.col("n_vectors")
    var = F.col("ss").cast("double") / F.col("n_vectors") - mean * mean
    stats = stats.select(
        F.col("label").alias("lb"),
        "n_vectors",
        mean.alias("mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("std"),
    )
    flag = F.when(
        (F.col("std") > 0)
        & (F.abs(F.col("norm") - F.col("mean")) / F.col("std") > z_cut),
        1,
    ).otherwise(0)
    return (
        base.join(F.broadcast(stats), F.col("label") == F.col("lb"))
        .groupBy("label", "n_vectors", "mean", "std")
        .agg(F.sum(flag).cast("bigint").alias("n_norm_outliers"))
        .select(
            "label",
            "n_vectors",
            F.round(F.col("mean"), ROUND_DP).alias("mean_norm"),
            "n_norm_outliers",
        )
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

    The all-zero vector has max|x| = 0: it quantizes to all zeros at
    scale 0 by definition (guarded — an unguarded x/scale is 0/0,
    which raises under ANSI mode; round-5 adversarial sweep).
    """
    # _maxabs/_v are materialized in a first projection so the guard
    # and the per-element division reference a per-row COLUMN: putting
    # a when(array_max(...) == 0) inside the element lambda re-inlines
    # the aggregate into every element's expression tree — O(d^2) per
    # row, measured 1.7x at sf0.1 before this was staged.
    staged = embeddings.select(
        "vec_id",
        "label",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("_v"),
    ).withColumn("_maxabs", F.array_max(F.transform(F.col("_v"), F.abs)))
    scale = F.col("_maxabs") / F.lit(127.0)
    q = F.when(
        F.col("_maxabs") == 0.0,
        F.transform(F.col("_v"), lambda x: F.lit(0).cast("bigint")),
    ).otherwise(F.transform(F.col("_v"), lambda x: F.floor(x / scale)))
    return staged.select(
        "vec_id",
        "label",
        F.round(scale, 6).alias("scale"),
        q.alias("q_vec"),
        F.aggregate(
            F.transform(q, F.abs), F.lit(0).cast("bigint"), lambda a, b: a + b
        ).alias("q_l1"),
    )


def label_centroid_similarity(embeddings: DataFrame) -> DataFrame:
    """Pairwise cosine similarity between label centroids (l1 < l2) —
    the class-confusability matrix of an embedding space (which labels
    are near-duplicates of each other).

    Built on the long-form centroids: one self-join on the coordinate
    index, then ONE aggregation per pair computes dot product and both
    norms together (sum(c1*c2), sum(c1^2), sum(c2^2)) — no separate
    norm pass. All three accumulate in DECIMAL (products of the 4-dp
    centroid doubles are exact per-row; decimal addition is
    associative) so partial-aggregation order can never flip the
    rounded output. Pair cardinality is |labels|^2/2 — centroid-sized,
    not corpus-sized; at 100 TB the centroids are a few KB and the
    whole pairwise stage is a broadcast-scale computation.
    """
    c = label_centroids(embeddings).select("label", "dim", "centroid")
    a = c.select(F.col("label").alias("l1"), "dim", F.col("centroid").alias("c1"))
    b = c.select(F.col("label").alias("l2"), "dim", F.col("centroid").alias("c2"))
    dec = lambda col: col.cast("decimal(24,12)")
    pairs = (
        a.join(b, "dim")
        .filter(F.col("l1") < F.col("l2"))
        .groupBy("l1", "l2")
        .agg(
            F.sum(dec(F.col("c1") * F.col("c2"))).alias("dot"),
            F.sum(dec(F.col("c1") * F.col("c1"))).alias("s1"),
            F.sum(dec(F.col("c2") * F.col("c2"))).alias("s2"),
        )
    )
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("s1").cast("double")) * F.sqrt(F.col("s2").cast("double"))
    )
    # UNROUNDED at the edge: the decimal sums are identical on both
    # engines and the divide/sqrt sequence is IEEE-deterministic, so
    # the raw double is bit-equal cross-engine — while round(double, 4)
    # is NOT (Spark rounds the exact BigDecimal of the double, DuckDB
    # multiplies-and-nearbyints; a cos landing on a .xxxx5 boundary
    # flips between them — round-5 adversarial sweep).
    return pairs.select("l1", "l2", (cos + F.lit(0.0)).alias("cosine"))


def value_anomalies(events: DataFrame, z_cut: float = 3.0) -> DataFrame:
    """Events whose value is a >|z_cut|-sigma outlier within their event
    type — the classic two-pass distributed z-score (pass 1: per-type
    moments; pass 2: broadcast the tiny stats row back over the scan).

    Moments accumulate in DECIMAL (value and value^2 are deterministic
    per-row doubles; the decimal sums are exact and associative), then
    mean/std/z are a fixed sequence of double ops — bit-identical in
    any engine evaluating the same formula, so the oracle hash-matches.
    """
    val = F.col("value")
    stats = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(val.cast("decimal(27,10)")).alias("s"),
        F.sum((val * val).cast("decimal(27,10)")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = F.col("ss").cast("double") / F.col("n") - mean * mean
    stats = stats.select(
        F.col("event_type").alias("et"),
        mean.alias("mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("std"),
    # Zero-variance groups are filtered from the stats side (not left
    # to the division): Spark's non-ANSI x/0.0 yields NULL while DuckDB
    # yields inf/nan, so the std > 0 guard must sit identically on both
    # engines for the oracle to hash-match the degenerate case.
    ).filter(F.col("std") > 0)
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        events.join(F.broadcast(stats), F.col("event_type") == F.col("et"))
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > z_cut)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(F.col("z"), ROUND_DP).alias("z_score"),
        )
    )


def robust_value_anomalies(events: DataFrame, z_cut: float = 3.5) -> DataFrame:
    """(event_type, n_valid, med, mad, n_outliers): MAD-based robust
    outlier detection — the modified z-score 0.6745*(x - median)/MAD
    with the Iglewicz-Hoaglin 3.5 cut. The robust twin of
    :func:`value_anomalies`: a moment-based z-score lets a single
    extreme value inflate sigma and mask every other outlier
    (masking), while median/MAD have a 50% breakdown point — the
    estimator a telemetry stream with fat tails actually needs.

    Portability: medians are Spark's exact interpolated ``percentile``
    (DuckDB twin ``quantile_cont`` — the :func:`event_value_quantiles`
    contract); the score itself is IEEE-deterministic double
    arithmetic on those medians with the literal 0.6745 spelled
    identically on both sides; only the emitted med/mad are rounded.

    Plan: two grouped aggregates (the second over |type| broadcast-
    joined deviations) + one counting aggregate — three exchanges on
    the same small key, no window, no sort. At 100 TB swap the exact
    percentile for the sketch tier (event_value_quantiles_sketch) and
    keep the identical shape.
    """
    med = events.groupBy("event_type").agg(
        F.count("value").alias("n_valid"),
        F.expr("percentile(value, 0.5)").alias("med"),
    )
    dev = events.select("event_type", "value").join(
        F.broadcast(med), "event_type"
    ).withColumn("adev", F.abs(F.col("value") - F.col("med")))
    mad = dev.groupBy("event_type", "n_valid", "med").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    scored = dev.select("event_type", "value").join(
        F.broadcast(mad), "event_type"
    )
    is_out = (
        (F.col("mad") > 0)
        & (
            F.abs(
                F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")
            )
            > F.lit(z_cut)
        )
    )
    return scored.groupBy(
        "event_type",
        "n_valid",
        F.round("med", ROUND_DP).alias("med"),
        F.round("mad", ROUND_DP).alias("mad"),
    ).agg(
        # when/otherwise (not a bare cast) so NULL measures count as 0
        # and an all-NULL group sums to 0, matching the oracle's CASE
        F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers")
    )
