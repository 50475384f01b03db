"""Relational extension operators: joins, rollups, ranking, sliding and
session windows.

The reference has none of these (SURVEY.md §2.5 — "joins of any kind",
"sorts / limits / top-k", "ranking/analytic window functions",
"grouping sets / cube / rollup" are all explicitly absent and flagged
as Spark built-ins to add when extending). Each operator here is the
§2.5 checklist item expressed as the plan you'd want at 100 TB:

- dimension joins broadcast the small side (no shuffle of the fact);
- rollup is one pass (Spark expands grouping sets inside the
  aggregate, partial-aggregated before the exchange);
- top-k per group is partial-ranked inside each shuffle partition by
  the window operator (no global sort);
- session windows use Spark's native ``session_window`` (state-store
  mergeable in streaming, gaps-and-islands in batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .aggregates import ROUND_DP
from .util import spread


def dec_sum(col: str = "value", dp: int = ROUND_DP):
    """Exact associative sum of a double column: accumulate in
    DECIMAL(27,10) (cast once at the scan), round the decimal, cast to
    double at the edge. A plain double sum's association order depends
    on partitioning — and for streaming twins on micro-batch file
    assignment and state-store merge order — so a .xxxx5-boundary value
    can round differently between engines/runs. The DuckDB twin is
    ``CAST(round(sum(CAST(value AS DECIMAL(27,10))), dp) AS DOUBLE)``.
    """
    return F.round(F.sum(F.col(col).cast("decimal(27,10)")), dp).cast("double")


def user_event_enrichment(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Enrich the event stream with the customer dimension and aggregate
    per (market segment, event type).

    The stream-static enrichment join the reference implies but never
    implements (its ``users`` ClickHouse table, readme.txt:16, is joined
    only at the serving layer). The dimension is broadcast — the event
    fact table never shuffles for the join; the only exchange is the
    final low-cardinality aggregate.
    """
    dim = customer.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment", "c_nationkey"
    )
    return (
        events.join(F.broadcast(dim), "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.count_distinct("c_nationkey").alias("n_nations"),
            dec_sum().alias("sum_value"),
        )
    )


def sliding_airline_stats(
    flights: DataFrame, window_size: str = "4 minutes", slide: str = "2 minutes"
) -> DataFrame:
    """Airline delay stats over SLIDING event-time windows.

    Same aggregate contract as operators/aggregates.py airline_stats
    (FlightEventAggregator.java:219-248) but each event lands in
    ``size/slide`` overlapping windows — the Spark ``window(ts, size,
    slide)`` generalization the reference's tumbling-only surface lacks
    (SURVEY.md §2.4 "window kinds"). Plan shape is identical to the
    tumbling case: the window expression expands rows narrowly
    (size/slide per event) before the partial aggregate, so shuffle
    volume stays one row per (key, window) per partition.
    """
    w = F.window("scheduled_time", window_size, slide)
    return (
        flights.groupBy(w.alias("w"), "airline")
        .agg(
            F.count("*").alias("total_flights"),
            F.sum(F.when(F.col("is_delayed") == 1, 1).otherwise(0)).alias(
                "delayed_flights"
            ),
            F.round(F.avg("delay_minutes"), ROUND_DP).alias("avg_delay_minutes"),
        )
        .select(
            "airline",
            "total_flights",
            "delayed_flights",
            "avg_delay_minutes",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
        )
    )


def user_sessions(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Sessionize the event stream per user with a ``gap`` inactivity
    timeout (native ``session_window``; merge semantics: an event
    extends the session iff it arrives strictly before last_ts + gap,
    session_end = last_ts + gap).

    Batch twin of the streaming sessionization a training-data pipeline
    uses for user-activity segmentation; in streaming the same
    expression runs over the state store with watermark-based session
    close. Oracle: classic gaps-and-islands (lag + cumulative sum).
    """
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("event_type").alias("n_event_types"),
            dec_sum().alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "n_event_types",
            "sum_value",
        )
    )


def events_rollup(events: DataFrame) -> DataFrame:
    """Multi-grain event totals via ROLLUP (event_type, hour-of-day).

    One pass: Spark expands the grouping sets inside the aggregate
    (partial-aggregated before the single exchange) — three GROUP BYs
    for the price of one scan. Grand-total/subtotal rows surface the
    rollup level via ``grouping_id``; null grouping keys are coalesced
    to sentinels so the contract is null-free (and hash-stable).
    """
    return (
        events.withColumn("hour_of_day", F.hour("ts"))
        .rollup("event_type", "hour_of_day")
        .agg(
            F.grouping_id().cast("bigint").alias("level"),
            F.count("*").alias("n_events"),
            dec_sum().alias("sum_value"),
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("(all)")).alias("event_type"),
            F.coalesce(F.col("hour_of_day"), F.lit(-1)).alias("hour_of_day"),
            "level",
            "n_events",
            "sum_value",
        )
    )


def segment_revenue(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Revenue per market segment and order year across the TPC-H-ish
    star schema — the multi-join shape the reference never has
    (SURVEY.md §2.5 "joins of any kind").

    Join strategy at scale: lineitem ⋈ orders is big-big — a shuffle
    join co-partitioned on the order key (Catalyst picks SMJ/SHJ, AQE
    re-plans on runtime sizes and handles key skew); the customer
    dimension is then broadcast onto the joined fact. Aggregation is
    partial before the final low-cardinality exchange.
    """
    # Revenue accumulates in DECIMAL: double sums are association-order
    # dependent (a distributed partial-sum once landed a group exactly
    # on a rounding quantum vs the oracle); decimal addition is exact
    # and associative, so the result is partition-count independent.
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    fact = lineitem.select(
        "l_orderkey",
        rev.alias("rev"),
    ).join(
        orders.select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return (
        fact.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment", "o_year")
        .agg(
            F.round(F.sum("rev"), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_lineitems"),
            F.count_distinct("o_orderkey").alias("n_orders"),
        )
    )


def inactive_customers(customer: DataFrame, events: DataFrame) -> DataFrame:
    """Customers with NO events, counted per market segment — the
    anti-join (SURVEY §2.5 set-ops/joins family).

    LEFT ANTI join: the build side is the DISTINCT event user ids (far
    smaller than the event stream), broadcast onto the customer scan —
    no shuffle of either full table.
    """
    active = events.select(F.col("user_id").alias("c_custkey")).distinct()
    return (
        customer.join(F.broadcast(active), "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_inactive"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


def user_event_gaps(events: DataFrame) -> DataFrame:
    """Inter-event gap statistics per user (lag analytic, SURVEY §2.5
    ranking/analytic family).

    Gaps are computed in integer microseconds (exact in both engines),
    aggregated, and converted to seconds at the edge. One hash exchange
    by user_id shared by the window sort and the final aggregate.
    """
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts", 1).over(w))
    return (
        events.withColumn("gap_us", gap_us)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.count("gap_us").alias("n_gaps"),
            F.round(F.avg("gap_us") / 1e6, 4).alias("avg_gap_sec"),
            F.round(F.max("gap_us") / 1e6, 4).alias("max_gap_sec"),
        )
    )


def orders_asof_join(events: DataFrame, orders: DataFrame) -> DataFrame:
    """AS-OF join: each event picks the customer's most recent order
    with ``o_orderdate <= ts`` (LEFT semantics — events with no prior
    order keep nulls).

    Spark has no asof-join operator; the scalable formulation is the
    union trick: tag order rows side=0 at their effective time and
    event rows side=1, union, then ``last(..., ignorenulls)`` over
    (key ORDER BY time, side) carries the latest order attributes
    forward onto each event row. ONE hash exchange by user + one
    in-partition sort — same cost as a sort-merge join, no range
    explosion, no per-key driver loop. Equal timestamps: the order
    sorts first (side 0), so an order placed exactly at the event
    time matches — `<=` semantics, like DuckDB/kdb ASOF JOIN.

    Orders are pre-thinned to one row per (customer, date) — the max
    orderkey wins, making the tie deterministic in both engines.
    """
    one_per_day = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.col("o_orderkey").desc()
    )
    o = (
        orders.withColumn("_rn", F.row_number().over(one_per_day))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("t"),
            F.lit(0).alias("side"),
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
        )
    )
    e = events.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("side"),
        "event_id",
        "ts",
    )
    u = o.unionByName(e, allowMissingColumns=True)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(c, ignorenulls=True).over(w).alias(f"last_{c}")
        for c in ("o_orderkey", "o_orderdate", "o_totalprice")
    ]
    return (
        u.select("user_id", "side", "event_id", "ts", *carried)
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("last_o_orderkey").alias("o_orderkey"),
            # parquet NTZ → session-TZ timestamp (session pinned UTC)
            F.col("last_o_orderdate").cast("timestamp").alias("o_orderdate"),
            F.round("last_o_totalprice", 4).alias("o_totalprice"),
        )
    )


def approx_distinct_users(events: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Per-event-type cardinality via HyperLogLog++ sketches
    (``approx_count_distinct``), alongside the exact event count.

    The sketch path for 100 TB cardinality questions: the shuffle
    carries one fixed-size HLL register block per (group, partition)
    instead of every distinct user id — constant memory per group, no
    distinct-expansion exchange, mergeable across partitions (and
    across time, the streaming rollup case). rsd=2% default. Driver
    check is rows-only (the estimate is engine-specific by design);
    the accuracy bound vs exact count_distinct is pytest-asserted.
    """
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.approx_count_distinct("user_id", rsd).alias("approx_users"),
    )


def approx_distinct_users_checked(
    events: DataFrame, rsd: float = 0.02, sigmas: float = 5.0
) -> DataFrame:
    """:func:`approx_distinct_users` with an in-plan error-bound
    assertion, making the HLL estimate driver-checkable.

    The estimate itself is engine-specific (no DuckDB twin), so the
    comparable surface is (exact count, bound verdict): ``within_bound``
    is |approx - exact| <= max(sigmas * rsd * exact, 1), which the
    oracle asserts as literal TRUE against DuckDB's exact
    COUNT(DISTINCT). A sketch regression (wrong merge, wrong rsd
    plumbing) flips the boolean and hash-fails the driver row. The
    exact COUNT(DISTINCT) here is verification-tier only — the sketch
    path in :func:`approx_distinct_users` stays the 100 TB shape.
    """
    bound = F.greatest(
        F.lit(sigmas * rsd) * F.col("n_users_exact").cast("double"), F.lit(1.0)
    )
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users_exact"),
            F.approx_count_distinct("user_id", rsd).alias("_approx"),
        )
        .select(
            "event_type",
            "n_events",
            "n_users_exact",
            (
                F.abs(F.col("_approx") - F.col("n_users_exact")).cast("double")
                <= bound
            ).alias("within_bound"),
        )
    )


CMS_DEPTH = 4
CMS_WIDTH = 256
# Fixed pairwise-independent-style hash coefficients, one (a, b) pair
# per sketch row; small literals so ((x % P) * a + b) never leaves
# BIGINT range in either engine (max ~1e9 * 1e4 = 1e13 << 2^63).
CMS_A = (31, 131, 1031, 10007)
CMS_B = (7, 17, 47, 97)
_CMS_P = 1_000_000_007


def _cms_cells(item, width: int = CMS_WIDTH):
    """The d (row, bucket) probe cells for one item column — pure
    Catalyst integer math; DuckDB twin:
    ``((item % P) * a + b) % P % width`` per params row."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (((item % _CMS_P) * a + b) % _CMS_P % width).alias("bucket"),
            )
            for j, (a, b) in enumerate(zip(CMS_A, CMS_B))
        ]
    )


def cms_user_counts(events: DataFrame, width: int = CMS_WIDTH) -> DataFrame:
    """(user_id, n_exact, cms_est, no_undercount): per-user event
    frequency estimated from a Count-Min Sketch (Cormode &
    Muthukrishnan 2005), alongside the exact count.

    The sketch is the d x w counter matrix itself, built with zero
    Python: each event expands to its d probe cells (a narrow codegen
    map), and one ``groupBy(j, bucket).count()`` materializes the
    matrix. That aggregate IS the merge — partial aggregation caps
    every task's contribution at d*w = 1024 rows, so the shuffle
    carries O(partitions * 1024) rows no matter how many events were
    scanned; the same groupBy merges sketches across files, days, or
    streams (counters are sum-mergeable by construction). Point
    queries probe the d cells per key and take the min; CMS never
    undercounts, so ``no_undercount`` is a theorem the oracle asserts
    by recomputing the identical deterministic sketch (portable
    affine hashes — no engine-specific hashing anywhere).

    At 100 TB the exact per-user GROUP BY here is verification-tier
    only (it shuffles every distinct key — exactly what the sketch
    exists to avoid); production keeps the 1024-row sketch and probes
    it broadcast-side, as this plan does (``F.broadcast(sketch)``).
    Estimate error is bounded by e/w * N with probability 1 - e^-d.
    """
    cells = events.select(
        F.explode(_cms_cells(F.col("user_id"), width)).alias("c")
    ).select("c.j", "c.bucket")
    sketch = cells.groupBy("j", "bucket").agg(F.count("*").alias("cell_count"))
    exact = events.groupBy("user_id").agg(F.count("*").alias("n_exact"))
    probes = exact.select(
        "user_id",
        "n_exact",
        F.explode(_cms_cells(F.col("user_id"), width)).alias("c"),
    ).select("user_id", "n_exact", "c.j", "c.bucket")
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id", "n_exact")
        .agg(F.min("cell_count").alias("cms_est"))
        .select(
            "user_id",
            "n_exact",
            "cms_est",
            (F.col("cms_est") >= F.col("n_exact")).alias("no_undercount"),
        )
    )


BLOOM_BITS = 4096
BLOOM_A = (31, 131, 1031)
BLOOM_B = (7, 17, 47)


def _bloom_positions(item, bits: int = BLOOM_BITS):
    """The k bit positions one key sets/probes — portable affine
    hashes, DuckDB twin ``((item % P) * a + b) % P % bits``."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (((item % _CMS_P) * a + b) % _CMS_P % bits).alias("pos"),
            )
            for j, (a, b) in enumerate(zip(BLOOM_A, BLOOM_B))
        ]
    )


def bloom_membership(
    events: DataFrame, member_type: str = "purchase", bits: int = BLOOM_BITS
) -> DataFrame:
    """(user_id, is_member, in_bloom, no_false_negative): approximate
    set membership via a Bloom filter (Bloom 1970) over the purchaser
    set, probed for every active user, beside the exact tier.

    The filter is relational: the bit ARRAY is a distinct-position
    table (k = 3 portable affine hashes into m = 4096 bits), built by
    one explode + distinct — and that distinct IS the merge, the same
    way the CMS groupBy is (bit-set union across files/streams/days is
    just more rows into the same distinct). Probing joins each key's k
    positions against the broadcast bit table and demands all k
    present. Deterministic hashes end-to-end, so the oracle rebuilds
    filter and probes cell-for-cell and every output column is
    value-exact; ``no_false_negative`` (member -> in_bloom) is the
    Bloom theorem the oracle asserts by reconstruction.

    At 100 TB this is the semi-join pre-filter shape: the bit table is
    O(m) no matter the member count, rides a broadcast, and prunes a
    fact scan before any shuffle — the hand-rolled, engine-checkable
    twin of the runtime bloom-filter join the AQE plan gate covers.
    The exact membership tier here is verification-only.
    """
    k = len(BLOOM_A)
    users = events.select("user_id").distinct()
    members = (
        events.filter(F.col("event_type") == member_type)
        .select("user_id")
        .distinct()
    )
    bloom_bits = (
        members.select(F.explode(_bloom_positions(F.col("user_id"), bits)).alias("c"))
        .select("c.pos")
        .distinct()
        .withColumn("present", F.lit(1))
    )
    probes = users.select(
        "user_id", F.explode(_bloom_positions(F.col("user_id"), bits)).alias("c")
    ).select("user_id", "c.pos")
    hits = (
        probes.join(F.broadcast(bloom_bits), "pos", "left")
        .groupBy("user_id")
        .agg(F.sum(F.coalesce(F.col("present"), F.lit(0))).alias("n_hits"))
    )
    return (
        hits.join(members.withColumn("is_member", F.lit(True)), "user_id", "left")
        .select(
            "user_id",
            F.coalesce(F.col("is_member"), F.lit(False)).alias("is_member"),
            (F.col("n_hits") == k).alias("in_bloom"),
        )
        .withColumn("no_false_negative", ~F.col("is_member") | F.col("in_bloom"))
    )


VALUE_BANDS: list[tuple[str, float, float]] = [
    ("p00_tiny", 0.0, 10.0),
    ("p10_low", 10.0, 25.0),
    ("p25_mid", 25.0, 50.0),
    ("p50_high", 50.0, 100.0),
    ("p75_big", 100.0, 250.0),
    ("p90_huge", 250.0, float("inf")),
]


def value_band_join(events: DataFrame) -> DataFrame:
    """Range (band) join: classify each event's ``value`` into static
    half-open bands [lo, hi) and aggregate per (band, event_type).

    The non-equi join SURVEY §2.5 lists as absent from the reference.
    The band table is tiny → broadcast; Catalyst plans a
    BroadcastNestedLoopJoin whose inner side is the handful of band
    rows — effectively a codegen'd CASE per event, with zero shuffle
    of the fact side (the only exchange is the final aggregate). At
    100 TB the same shape holds for any small interval dimension
    (IP-range geo lookup, SLA tiers); big-big interval joins need the
    bucketing decomposition instead, which dedup.py's banded LSH
    demonstrates.
    """
    spark = events.sparkSession
    bands = spark.createDataFrame(
        [(n, lo, hi) for n, lo, hi in VALUE_BANDS], "band STRING, lo DOUBLE, hi DOUBLE"
    )
    joined = events.join(
        F.broadcast(bands),
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
    )
    return joined.groupBy("band", "event_type").agg(
        F.count("*").alias("n_events"),
        dec_sum().alias("sum_value"),
    )


def pricing_summary(lineitem: DataFrame, ship_before: str = "1998-09-01") -> DataFrame:
    """TPC-H Q1-shape pricing summary over lineitem: one scan, one
    low-cardinality aggregate, every money sum in DECIMAL (exact,
    association-order independent — see segment_revenue) cast to
    double at the edge. The ship-date filter reaches the parquet scan
    as a pushed predicate (row-group pruning at scale).
    """
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    one = F.lit(1).cast("decimal(18,4)")
    return (
        lineitem.filter(F.col("l_shipdate") < F.lit(ship_before).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")), 2).cast("double").alias(
                "sum_base_price"
            ),
            F.round(
                F.sum(dec("l_extendedprice") * (one - dec("l_discount"))), 2
            ).cast("double").alias("sum_disc_price"),
            F.round(
                F.sum(
                    dec("l_extendedprice")
                    * (one - dec("l_discount"))
                    * (one + dec("l_tax"))
                ),
                2,
            ).cast("double").alias("sum_charge"),
            F.round(
                F.sum(dec("l_quantity")).cast("double") / F.count("*"), 4
            ).alias("avg_qty"),
            F.round(
                F.sum(dec("l_discount")).cast("double") / F.count("*"), 4
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_routes_per_airline(flights: DataFrame, k: int = 3) -> DataFrame:
    """Top-k routes by traffic per airline (ranking window function,
    SURVEY.md §2.5 "ranking/analytic").

    Aggregate first (shrinks the input to one row per airline-route),
    then rank within airline partitions — the rank shuffle moves only
    the aggregated rows, never the fact table. Deterministic ordering:
    ties broken by route key.
    """
    per_route = flights.groupBy("airline", "origin", "destination").agg(
        F.count("*").alias("total_flights"),
        F.round(F.avg("delay_minutes"), ROUND_DP).alias("avg_delay_minutes"),
    )
    w = Window.partitionBy("airline").orderBy(
        F.col("total_flights").desc(), F.col("origin"), F.col("destination")
    )
    return (
        per_route.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "airline",
            F.concat_ws("-", "origin", "destination").alias("route"),
            "total_flights",
            "avg_delay_minutes",
            "rank",
        )
    )


def rolling_user_value(events: DataFrame, trailing: str = "1 hour") -> DataFrame:
    """Trailing time-range window aggregate (RANGE frame): for every
    event, the count and value-sum of the SAME user's events in the
    preceding ``trailing`` interval (inclusive of the current row).

    The frame is a RANGE over exact integer microseconds — event-time
    math, portable across engines. One hash exchange on user_id; the
    in-partition frame scan is incremental (Spark maintains a sliding
    frame, not O(n^2) re-aggregation).
    """
    us = {"1 hour": 3_600_000_000}[trailing]
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-us, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).alias("n_trailing"),
        F.round(F.sum("value").over(w), 2).alias("sum_trailing_value"),
    )


def user_event_type_pivot(events: DataFrame) -> DataFrame:
    """PIVOT: one row per user, one count column per event type.

    The type list is declared statically (the relational PIVOT contract
    — output schema must be known at plan time); Spark plans this as a
    single hash aggregation with conditional counts, no extra shuffle
    over a plain groupBy."""
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        events.groupBy("user_id")
        .pivot("event_type", types)
        .count()
        .select(
            "user_id",
            *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}") for t in types],
        )
    )


UNPIVOT_METRICS = ("n_events", "total_value", "max_value", "min_value")


def user_metrics_unpivot(events: DataFrame) -> DataFrame:
    """UNPIVOT / melt — the inverse of :func:`user_event_type_pivot`:
    one wide per-user metrics row relationally unpivoted to
    (user_id, metric, metric_value) long format, the shape feature
    stores and metric warehouses ingest.

    Uses the native ``DataFrame.unpivot`` (Spark 3.4+ Expand operator
    — a zero-shuffle projection multiplying each row by the metric
    count, exactly like the grouping-sets expansion). The only
    exchange in the plan is the upstream per-user aggregate. Metric
    values are double-homogeneous by contract (UNPIVOT requires one
    value type): counts cast, the sum decimal-rounded
    (:func:`dec_sum`), min/max exact doubles. Spark's unpivot KEEPS
    NULL measure values (a user whose measures are all NULL still
    yields its metric rows) — the oracle replays as UNION ALL rather
    than DuckDB UNPIVOT, which silently excludes NULLs.
    """
    wide = events.groupBy("user_id").agg(
        F.count("*").cast("double").alias("n_events"),
        dec_sum("value").alias("total_value"),
        F.max("value").alias("max_value"),
        F.min("value").alias("min_value"),
    )
    return wide.unpivot(
        ["user_id"], list(UNPIVOT_METRICS), "metric", "metric_value"
    )


def converted_users_without_errors(events: DataFrame) -> DataFrame:
    """Relational set operations: (purchasers INTERSECT signups)
    EXCEPT errorers — distinct-set semantics end to end.

    Set ops plan as hash semi/anti joins over exchanges on the key —
    same cost class as explicit joins but expressed in the relational
    algebra the reference's SQL users expect to exist."""

    def users_of(t: str) -> DataFrame:
        return events.filter(F.col("event_type") == t).select("user_id")

    return (
        users_of("purchase")
        .intersect(users_of("signup"))
        .subtract(users_of("error"))
    )


def regional_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """Revenue shipped by suppliers to same-nation customers within one
    region — the classic local-supplier-volume shape (five-way star
    join, SURVEY.md §2.5 "joins of any kind" absent from the reference).

    Plan at 100 TB: region ⋈ nation is tiny and broadcast everywhere;
    lineitem ⋈ orders is the one unavoidable big-big shuffle join,
    co-partitioned on the order key; the supplier and customer sides
    are joined declaratively (Catalyst broadcasts under threshold, AQE
    re-plans to shuffle join with skew handling when they outgrow it —
    at real scale both legs are hash joins on their keys). The
    same-nation predicate (c_nationkey = s_nationkey) is applied as a
    join condition, never as a post-join filter over the blow-up.

    The lineitem leg is ``spread`` BEFORE the revenue projection
    (round-10 adjudication of the r9 watch item, BASELINE.md §9): the
    regenerated driver fixtures are single-row-group parquet, so the
    scan → decimal project → broadcast-probe pipeline ran as ONE task
    until the first exchange — measured 1.53 → 1.05 s at sf0.1.
    ``spread`` is gated on split count, so a real many-split scan pays
    no extra exchange.
    """
    nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    cust = customer.join(
        F.broadcast(nations),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", F.col("c_nationkey").alias("cn"), "n_name")
    supp = supplier.join(
        F.broadcast(nations.select("n_nationkey")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("s_nationkey").alias("sn"))
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    fact = (
        spread(lineitem).select("l_orderkey", "l_suppkey", rev.alias("rev"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, (F.col("o_custkey") == F.col("c_custkey"))
              & (F.col("cn") == F.col("sn")))
    )
    return fact.groupBy("n_name").agg(
        F.round(F.sum("rev"), 2).cast("double").alias("revenue"),
        F.count("*").alias("n_lineitems"),
        F.count_distinct("o_orderkey").alias("n_orders"),
    )


def returned_items_top_customers(
    customer: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    k: int = 20,
) -> DataFrame:
    """Top-k customers by revenue lost to returned items (the
    returned-item-report shape): filter returns at the scan, join up
    the star, rank, keep k.

    Scale notes: the `l_returnflag = 'R'` predicate is pushed into the
    parquet scan (row-group pruning); aggregation happens per customer
    BEFORE ranking so the global top-k sort sees one row per customer
    with a returned item, not the fact table; the final rank is a
    TakeOrderedAndProject (per-partition top-k then k-way merge of k
    rows on the driver side of the exchange), never a full global sort.
    Ordering is total (revenue desc, custkey) so k is deterministic.
    """
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    per_cust = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", rev.alias("rev"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.sum("rev").alias("lost_revenue_dec"),
            F.count("*").alias("n_returned_items"),
        )
    )
    # nation (25 rows) is genuinely bounded -> broadcast hint; customer
    # scales with SF, so its join gets NO hint: Catalyst/AQE picks
    # broadcast at fixture scale and a co-partitioned shuffle join at
    # 100 TB (a forced broadcast of an unbounded dimension would OOM).
    dim = customer.select("c_custkey", "c_name", "c_nationkey").join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return (
        per_cust.join(dim, F.col("o_custkey") == F.col("c_custkey"))
        .orderBy(F.col("lost_revenue_dec").desc(), "c_custkey")
        .limit(k)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round(F.col("lost_revenue_dec"), 2).cast("double")
            .alias("lost_revenue"),
            "n_returned_items",
        )
    )


def customer_value_deciles(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Customers bucketed into spend deciles, with per-decile stats.

    Scale design: decile assignment needs a global rank over per-
    customer spend. A bare ``ntile(10) OVER (ORDER BY spend)`` collapses
    every row into ONE partition — the same trap corpus_shuffle avoids —
    so this reuses the distributed total order: range-repartition on the
    (already aggregated, one row per customer) spend key, rank within
    partitions in parallel, add broadcast prefix-sum offsets, then
    ``decile = floor((rank-1) * 10 / n) + 1`` (a pure function of rank
    and the total count, mirrored literally by the oracle — no reliance
    on engine-specific NTILE tie rules).
    """
    spend = (
        orders.groupBy("o_custkey")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double").alias("spend"),
            F.count("*").alias("n_orders"),
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_acctbal")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    n_parts = spend.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint pins the pid assignment: counts/offsets and the
    # rank join must read the SAME range boundaries, and a re-evaluated
    # exchange re-samples them (see corpus_shuffle for the full note).
    ranged = (
        spend.repartitionByRange(n_parts, F.col("spend").desc(), F.col("o_custkey"))
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_part = Window.partitionBy("pid").orderBy(
        F.col("spend").desc(), F.col("o_custkey")
    )
    counts = ranged.groupBy("pid").count()
    w_prefix = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "pid",
        F.coalesce(F.sum("count").over(w_prefix), F.lit(0)).alias("offset"),
        F.sum("count").over(
            Window.orderBy("pid").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_total"),
    )
    ranked = (
        ranged.withColumn("rn", F.row_number().over(w_part))
        .join(F.broadcast(offsets), "pid")
        .withColumn("rank", F.col("offset") + F.col("rn"))
    )
    decile = (((F.col("rank") - 1) * 10) / F.col("n_total")).cast("bigint") + 1
    return (
        ranked.withColumn("decile", decile)
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            # spend is already rounded to 2 dp, so decimal(18,2) holds it
            # exactly — the sum is associative (partition-order safe).
            F.round(F.sum(F.col("spend").cast("decimal(18,2)")), 2)
            .cast("double").alias("total_spend"),
            F.round(F.min("spend"), 2).alias("min_spend"),
            F.round(F.max("spend"), 2).alias("max_spend"),
            # exact decimal sum, then ONE double division — avoids the
            # association-order dependence of a plain double avg().
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
                / F.count("*"),
                4,
            ).alias("avg_acctbal"),
            F.sum("n_orders").alias("n_orders"),
        )
    )


def events_multigrain_rollup(events: DataFrame) -> DataFrame:
    """Hypertable-style continuous aggregate: event counts/value-sums at
    5-minute, 1-hour, and 1-day grains in one logical pass.

    Scale design — hierarchical re-aggregation, the continuous-
    aggregate trick: only the FINEST grain aggregates the raw stream;
    each coarser grain re-aggregates the previous grain's (tiny)
    output. The raw table is scanned once and shuffled once at 5-minute
    cardinality; the 1h and 1d exchanges move pre-aggregated rows only.
    Compare the naive alternative (explode ×grains or grouping sets):
    every grain would shuffle the full stream.

    Values accumulate in DECIMAL(18,6) (cast once at the scan) so the
    two re-aggregation levels stay exact and associative — a double
    sum-of-sums would drift from the oracle's flat per-grain sums.
    """
    base = events.select(
        (F.floor(F.unix_timestamp("ts") / 300) * 300).cast("long").alias("b"),
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    g5 = base.groupBy("b", "event_type").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv")
    )

    def coarsen(df: DataFrame, seconds: int) -> DataFrame:
        return (
            df.withColumn("b", (F.floor(F.col("b") / seconds) * seconds).cast("long"))
            .groupBy("b", "event_type")
            .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
        )

    g1h = coarsen(g5, 3600)
    g1d = coarsen(g1h, 86400)
    out = None
    for grain, df in (("5m", g5), ("1h", g1h), ("1d", g1d)):
        part = df.select(
            F.lit(grain).alias("grain"),
            F.timestamp_seconds(F.col("b")).alias("bucket_start"),
            "event_type",
            F.col("n").cast("bigint").alias("n_events"),
            F.round(F.col("sv"), 4).cast("double").alias("sum_value"),
        )
        out = part if out is None else out.unionAll(part)
    return out


def conversion_funnel(events: DataFrame) -> DataFrame:
    """Ordered conversion funnel signup → view → purchase: how many
    users complete each prefix of the journey IN ORDER (a later-stage
    event only counts if it happens after the user's first
    previous-stage event) — the CEP/sequential-pattern shape (Flink
    MATCH_RECOGNIZE territory) expressed relationally.

    Plan: one conditional aggregation per user computes the first
    signup ts, the first view ts AFTER that signup, and the first
    purchase ts after that view — min(ts) FILTER(...) over windowed
    self-references would need three passes; instead stage timestamps
    are derived with two chained conditional mins over ONE per-user
    aggregate pair (min signup, then a second aggregate over events
    joined back). Exchanges: two hash aggs + one broadcast join of the
    per-user stage-1 table; the event table is scanned twice, never
    cross-joined.
    """
    first_signup = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    # Stage 2/3 relative to the user's first signup: one more pass with
    # the (small) per-user stage table broadcast onto the scan.
    staged = events.join(F.broadcast(first_signup), "user_id")
    first_view = (
        staged.filter(
            (F.col("event_type") == "view") & (F.col("ts") >= F.col("t_signup"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    staged2 = staged.join(F.broadcast(first_view), "user_id")
    first_purchase = (
        staged2.filter(
            (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("t_view"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    # One lazy plan: per-stage counts as 1-row aggregates unioned, the
    # stage-1 denominator broadcast onto all 3 rows (a 3x1 broadcast
    # nested loop — trivially bounded). No driver-side .count() actions:
    # the heavy work stays inside the returned plan, visible to any
    # timing/explain of it. Zero-signup corpora yield NULL conversions
    # (WHEN n1 > 0), mirrored in the oracle, instead of a NaN-vs-error
    # engine divergence.
    def stage_count(df: DataFrame, stage: str) -> DataFrame:
        return df.agg(F.count("*").alias("n_users")).select(
            F.lit(stage).alias("stage"), "n_users"
        )

    counts = (
        stage_count(first_signup, "1_signup")
        .unionAll(stage_count(first_view, "2_view_after_signup"))
        .unionAll(stage_count(first_purchase, "3_purchase_after_view"))
    )
    denom = first_signup.agg(F.count("*").alias("_n1"))
    return counts.crossJoin(F.broadcast(denom)).select(
        "stage",
        "n_users",
        F.round(
            F.when(
                F.col("_n1") > 0,
                F.col("n_users").cast("double") / F.col("_n1"),
            ),
            4,
        ).alias("conversion_from_start"),
    )


def weekly_cohort_retention(events: DataFrame) -> DataFrame:
    """Cohort retention: users grouped by first-activity week; for each
    (cohort_week, activity_week) the distinct active users and the
    retention fraction vs the cohort's size — the standard growth-
    analytics matrix.

    Plan: per-user first week via one aggregate; (user, week) activity
    via a distinct aggregate; one join on user_id (the per-user cohort
    table is broadcast); final count per (cohort, week). All exchanges
    carry user-id-sized rows.
    """
    # TIMESTAMP weeks on both engines: DuckDB's date_trunc('week', ts)
    # yields DATE, which the driver's pandas canonicalizer renders as
    # Timestamp while Spark DateType collects as datetime.date — the
    # stringified values never match. Keeping both sides TIMESTAMP
    # (oracle CASTs) makes the hash engine-portable.
    week = lambda c: F.date_trunc("week", c)  # noqa: E731
    cohorts = events.groupBy("user_id").agg(
        week(F.min("ts")).alias("cohort_week")
    )
    activity = events.select(
        "user_id", week(F.col("ts")).alias("activity_week")
    ).distinct()
    joined = activity.join(F.broadcast(cohorts), "user_id")
    per_cell = joined.groupBy("cohort_week", "activity_week").agg(
        F.count_distinct("user_id").alias("n_active")
    )
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    return (
        per_cell.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "activity_week",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size"), 4
            ).alias("retention"),
        )
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order event-type transition matrix: for each consecutive
    pair of events per user (event-time order, event_id tiebreak), the
    transition count and its share of all transitions out of the source
    type — the Markov-chain view of user behavior.

    Plan: lag window per user (one hash exchange on user_id), then a
    transition-pair aggregate at |types|^2 cardinality; the share is a
    tiny window over the aggregated matrix, not the event stream.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    w_src = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w_src),
            4,
        ).alias("share_from_source"),
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """Shipping-priority report (the classic Q3 shape): revenue still in
    flight as of ``cutoff`` — orders placed before it with lineitems
    shipping after it, for one market segment; top-k orders by revenue.

    Plan: both date predicates and the segment filter push into the
    parquet scans (row-group pruning on o_orderdate / l_shipdate);
    lineitem ⋈ orders co-partitions on the order key; the filtered
    customer dim broadcasts; per-order aggregation happens BEFORE the
    deterministic top-k (TakeOrderedAndProject — never a global sort).
    """
    cut = F.lit(cutoff).cast("timestamp")
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = lineitem.filter(F.col("l_shipdate") > cut).select(
        "l_orderkey", rev.alias("rev")
    )
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev").alias("rev_dec"))
        .orderBy(F.col("rev_dec").desc(), "l_orderkey")
        .limit(k)
        .select(
            "l_orderkey",
            F.round(F.col("rev_dec"), 2).cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


def priority_orders_with_returns(
    orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Order counts per priority class, restricted to orders having at
    least one returned lineitem — the EXISTS / LEFT SEMI join shape
    (Catalyst decorrelates the SQL EXISTS into exactly this plan).

    The semi-join probes on the order key only — the lineitem side is
    pre-filtered at the scan and reduced to keys, no payload columns
    move; output cardinality is |priority classes|.
    """
    returned = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.join(
            returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def promo_revenue_share(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Monthly share of revenue from PROMO-type parts (the promotion-
    effect report): conditional revenue over total revenue per
    ship-month.

    Plan: the part dimension is broadcast (two columns only) onto one
    lineitem scan; both the conditional and total revenue accumulate in
    DECIMAL inside ONE aggregation — no second pass, no join back. The
    share is a single double division of two exact sums.
    """
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    month = F.date_trunc("month", F.col("l_shipdate"))
    joined = lineitem.select(
        "l_partkey", month.alias("ship_month"), rev.alias("rev")
    ).join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    promo = F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        joined.groupBy("ship_month")
        .agg(
            F.sum(promo).alias("promo_dec"),
            F.sum("rev").alias("total_dec"),
            F.count("*").alias("n_lineitems"),
        )
        .select(
            "ship_month",
            F.round(
                F.lit(100.0)
                * F.col("promo_dec").cast("double")
                / F.col("total_dec").cast("double"),
                4,
            ).alias("promo_share_pct"),
            F.round(F.col("total_dec"), 2).cast("double").alias("total_revenue"),
            "n_lineitems",
        )
    )


def nation_trade_volume(
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Cross-nation trade volume (the Q7 shape): revenue shipped
    between DIFFERENT customer/supplier nations, by nation pair and
    ship year.

    Plan: both nation-annotated dims broadcast; lineitem ⋈ orders is
    the single big-big co-partitioned join; the inequality
    (supp_nation <> cust_nation) rides on the already-joined row — it
    is a filter, never a join blow-up. Aggregation is partial before
    the |nations|^2 x years exchange.
    """
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")
    )
    supp = supplier.join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("sk")
    ).select("s_suppkey", "supp_nation")
    cust = customer.join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("ck")
    ).select("c_custkey", "cust_nation")
    fact = (
        lineitem.select(
            "l_orderkey",
            "l_suppkey",
            F.year("l_shipdate").alias("ship_year"),
            rev.alias("rev"),
        )
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return fact.groupBy("supp_nation", "cust_nation", "ship_year").agg(
        F.round(F.sum("rev"), 2).cast("double").alias("revenue"),
        F.count("*").alias("n_lineitems"),
    )


def error_rate_windows(
    events: DataFrame, window_seconds: int = 300, threshold: float = 0.3
) -> DataFrame:
    """Alerting-shape query: 5-minute windows whose error share exceeds
    ``threshold`` — the batch twin of a streaming monitor (same
    epoch-aligned buckets as the multigrain rollup; in streaming this
    exact aggregate runs windowed+watermarked and the filter drives the
    alert sink).

    One scan, one hash aggregation at (bucket) cardinality; the share
    is an integer-ratio double division (exact, engine-portable), and
    the HAVING-style filter runs on the aggregated rows only.
    """
    bucket = (
        F.floor(F.unix_timestamp("ts") / window_seconds) * window_seconds
    ).cast("long")
    agg = (
        events.select(
            bucket.alias("b"),
            (F.col("event_type") == "error").cast("int").alias("is_err"),
        )
        .groupBy("b")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("is_err").cast("bigint").alias("n_errors"),
        )
    )
    share = F.col("n_errors").cast("double") / F.col("n_events").cast("double")
    return (
        agg.filter(share > threshold)
        .select(
            F.timestamp_seconds(F.col("b")).alias("window_start"),
            "n_events",
            "n_errors",
            F.round(share, 4).alias("error_share"),
        )
    )


def event_pagerank(
    events: DataFrame, damping: str = "0.85", iterations: int = 3
) -> DataFrame:
    """(node, pagerank): fixed-``iterations`` PageRank power iteration
    over the event-type transition graph (Page et al. 1999) — the
    third iterative-algorithm shape in the engine next to
    dedup.connected_components (unbounded + convergence flag) and
    clustering.kmeans_assign (fixed rounds over vectors).

    Graph: nodes = event types; edge weights = consecutive-pair counts
    per user (the event_transitions matrix); transition probabilities
    are the row-normalized weights ROUNDED ONCE to an 8dp DECIMAL.
    From there every operation is exact decimal arithmetic — products,
    sums, the damping blend, and the per-iteration re-quantization to
    10dp — so the result is identical on any partitioning and in the
    DuckDB oracle (no double appears anywhere until the final edge
    cast). Dangling mass (types with no outgoing edge) leaks, as in
    the classic formulation.

    Scale shape: the edge aggregate is |types|^2; each iteration is a
    join of the edge table with the |types|-row rank vector + one hash
    aggregate — at real graph scale the same plan co-partitions edges
    and ranks on src (edges never re-shuffle across iterations when
    pre-partitioned), ranks being the only per-iteration exchange.
    """
    from decimal import Decimal

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        events.select(
            "user_id",
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .filter(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("c"))
    )
    out_deg = edges.groupBy("src").agg(F.sum("c").alias("tot"))
    p = edges.join(out_deg, "src").select(
        "src",
        "dst",
        F.round(F.col("c").cast("decimal(19,9)") / F.col("tot"), 8)
        .cast("decimal(9,8)")
        .alias("p"),
    ).coalesce(1).persist()  # |types|^2 rows, referenced by every
    # iteration — without the persist the per-user lag window
    # re-executes once per power iteration; coalesce(1) keeps the
    # per-iteration joins single-task (the graph is tiny; at real
    # graph scale drop the coalesce and co-partition edges on src)
    nodes = (
        events.select(F.col("event_type").alias("node"))
        .distinct()
        .coalesce(1)
        .persist()
    )
    # |types| is a bounded model scalar (the tf_idf_top_terms N
    # pattern): one count embedded as a literal, never per-row work.
    n_nodes = nodes.count()
    base = str(Decimal(1).scaleb(-10) * (10**10 // n_nodes))  # round-down 1/N
    d = Decimal(damping)
    offset = str((1 - d) * Decimal(base))
    ranks = nodes.select(
        "node", F.lit(base).cast("decimal(12,10)").alias("r")
    )
    for _ in range(iterations):
        contrib = p.join(ranks, p["src"] == ranks["node"]).select(
            F.col("dst").alias("node"), (F.col("r") * F.col("p")).alias("x")
        )
        summed = contrib.groupBy("node").agg(F.sum("x").alias("s"))
        ranks = nodes.join(summed, "node", "left").select(
            "node",
            F.round(
                F.lit(offset).cast("decimal(14,12)")
                + F.lit(damping).cast("decimal(3,2)")
                * F.coalesce(F.col("s"), F.lit(0).cast("decimal(30,18)")),
                10,
            )
            .cast("decimal(12,10)")
            .alias("r"),
        )
    return ranks.select(
        "node", F.round(F.col("r"), 6).cast("double").alias("pagerank")
    )


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """(c_count, n_customers): TPC-H Q13 shape — the histogram of
    orders-per-customer including zero-order customers.

    Aggregate-before-join: order counts collapse to one row per
    customer key BEFORE touching the customer table, so the join
    carries |customers| rows, not |orders| (at 100 TB the counts
    aggregate and the join co-partition on the customer key — one
    exchange each); the final histogram is a tiny second aggregate.
    """
    ocounts = orders.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    return (
        customer.select("c_custkey")
        .join(ocounts, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0).cast("bigint")).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("n_customers"))
    )


def top_supplier_revenue(
    supplier: DataFrame,
    lineitem: DataFrame,
    start: str = "1996-01-01",
    end: str = "1996-04-01",
) -> DataFrame:
    """(s_suppkey, s_name, total_revenue): TPC-H Q15 shape — the
    supplier(s) achieving maximum revenue in one ship-date quarter.

    The revenue view is one filtered aggregate (date filter pushed to
    the scan); the max is a 1-row broadcast compared against DECIMAL
    revenue — exact equality, so "all suppliers tied at max" is
    well-defined cross-engine. Supplier dimension is broadcast.
    """
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    per_supp = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
        )
        .select("l_suppkey", rev.alias("rev"))
        .groupBy("l_suppkey")
        .agg(F.sum("rev").alias("total_rev"))
    )
    top = per_supp.agg(F.max("total_rev").alias("max_rev"))
    return (
        per_supp.crossJoin(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev"), 2).cast("double").alias("total_revenue"),
        )
    )


def small_qty_order_revenue(
    part: DataFrame, lineitem: DataFrame, brand: str = "Brand#23"
) -> DataFrame:
    """(n_small_lineitems, small_qty_revenue): TPC-H Q17 shape —
    revenue in small-quantity orders of one brand's parts
    (lineitems below 20% of their part's average quantity).

    The brand part list and the per-part quantity thresholds are both
    bounded (one brand ~ 1/25 of parts) and broadcast; the lineitem
    fact never shuffles. Quantities are integral doubles, so avg() is
    an exact double (integer sums < 2^53 are exact and associative) —
    the 0.2*avg threshold is partitioning- and engine-independent.
    """
    parts = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(
        F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
    )
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("limit_qty")
    )
    return (
        li.join(
            F.broadcast(thresholds), F.col("l_partkey") == F.col("t_partkey")
        )
        .filter(F.col("l_quantity") < F.col("limit_qty"))
        .agg(
            F.count("*").alias("n_small_lineitems"),
            # Total, not /7-annualized: decimal division result
            # scale/rounding rules differ across engines, while the
            # decimal SUM is exact — keep the edge engine-portable.
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("small_qty_revenue"),
        )
    )


def large_order_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    threshold: float = 300.0,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q18 shape — customers who placed orders totaling more than
    ``threshold`` units, top-``k`` by order value.

    The HAVING aggregate runs on lineitem alone (quantities are
    integral doubles — exact associative sums), producing a tiny
    qualifying-order set that then joins orders (co-partitioned on the
    order key) and the broadcast customer dimension; the global top-k
    is orderBy+limit (TakeOrderedAndProject).
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > threshold)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(k)
    )


def idle_rich_customers(
    customer: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    cutoff: str = "2000-01-01",
) -> DataFrame:
    """(n_name, n_customers, total_acctbal): TPC-H Q22 shape — above-
    average-balance customers with no recent orders, rolled up by
    nation.

    The "above average" cut avoids cross-engine division entirely by
    cross-multiplying: ``c_acctbal * n_pos > sum_pos`` with the sum
    carried in exact DECIMAL (1-row broadcast) — no double division
    whose last-ulp could flip a boundary customer. The recent-order
    key set is a LEFT ANTI join (orders filtered by the pushed-down
    date predicate first); nation is broadcast.
    """
    stats = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.count("*").alias("n_pos"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("sum_pos"),
    )
    rich = customer.crossJoin(F.broadcast(stats)).filter(
        F.col("c_acctbal") * F.col("n_pos") > F.col("sum_pos").cast("double")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(cutoff).cast("timestamp")
    ).select("o_custkey")
    idle = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return (
        idle.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_acctbal"),
        )
    )


def forecast_revenue_change(
    lineitem: DataFrame,
    year_start: str = "1996-01-01",
    year_end: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """(n_lineitems, revenue_increase): TPC-H Q6 shape — revenue that
    would be recovered by dropping small discounts in one ship year.

    The canonical pure scan-filter-aggregate: ALL three predicates push
    to the parquet scan (date range, discount band, quantity cap — the
    `.explain` shows them in PushedFilters), no join, no shuffle beyond
    the single 1-row aggregate exchange; revenue accumulates in exact
    DECIMAL. At 100 TB this is the query shape that measures pure scan
    bandwidth — row-group pruning on l_shipdate does most of the work.
    """
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(year_start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(year_end).cast("timestamp"))
            & (F.col("l_discount") >= disc_lo)
            & (F.col("l_discount") <= disc_hi)
            & (F.col("l_quantity") < max_qty)
        )
        .agg(
            F.count("*").alias("n_lineitems"),
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * F.col("l_discount").cast("decimal(18,4)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue_increase"),
        )
    )


EWMA_LAGS = 12


def ewma_daily_value(events: DataFrame) -> DataFrame:
    """(event_type, day, daily_total, ewma): exponentially-weighted
    moving average (alpha = 1/2) of the daily value total per event
    type — the standard time-series smoothing / trend-detection pass
    next to the gapfill and forecast ops.

    Engine-exactness: alpha = 1/2 makes every weight a power of two,
    so the whole recursion unrolls to INTEGER arithmetic — the daily
    total is decimal-rounded to 4 dp and scaled to a BIGINT ``m``;
    ewma_t = sum_k(m_{t-k} * 2^(K-1-k)) / sum_present(2^(K-1-k)) over
    the K = 12 most recent observed days, with sign-safe half-up
    integer division. No double accumulates anywhere; the only
    int -> double casts at the edge are exact (scaled-integer / 1e4).
    The truncation error vs the infinite recursion is 2^-12 of one
    observation — below the 4 dp edge rounding.

    Scale shape: one aggregate exchange builds the daily series, then
    a single window operator evaluates all 12 lags in one pass over
    each type's partition (a bounded series — days, not events; for
    high-cardinality keys the identical plan shards by key). Weights
    renormalize over the PRESENT lags so series heads and NULL-measure
    days (bronze contract) are unbiased, matching the oracle's CASE
    replay lag-for-lag.
    """
    # The 4dp-rounded decimal is NARROWED to (18,4) before the 1e4
    # scale-up: DuckDB's decimal * integer silently promotes to DOUBLE
    # past 38 digits, so the twin must multiply a narrow operand — the
    # Spark side mirrors the cast to keep the integer m bit-identical.
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        (
            F.round(F.sum(F.col("value").cast("decimal(27,10)")), 4)
            .cast("decimal(18,4)")
            * 10000
        )
        .cast("bigint")
        .alias("m")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lags = [F.lag("m", k).over(w) for k in range(EWMA_LAGS)]
    weights = [1 << (EWMA_LAGS - 1 - k) for k in range(EWMA_LAGS)]
    num = sum(
        (F.when(lg.isNotNull(), lg * wt).otherwise(F.lit(0)) for lg, wt in zip(lags, weights)),
        F.lit(0),
    )
    den = sum(
        (F.when(lg.isNotNull(), F.lit(wt)).otherwise(F.lit(0)) for lg, wt in zip(lags, weights)),
        F.lit(0),
    )
    # `div`: Spark's integral division (LONG, truncates toward zero —
    # identical to DuckDB's `//` for the non-negative operands each
    # CASE branch guarantees). Stays exact far past 2^53, where a
    # float-division round trip would silently misround.
    scaled = F.expr(
        "CASE WHEN num >= 0 THEN (2*num + den) div (2*den)"
        " ELSE -((2*(-num) + den) div (2*den)) END"
    )
    d = F.col("den")
    return daily.select(
        "event_type", "day", "m", num.alias("num"), den.alias("den")
    ).select(
        "event_type",
        "day",
        (F.col("m") / F.lit(10000.0)).alias("daily_total"),
        F.when(d > 0, scaled / F.lit(10000.0)).alias("ewma"),
    )


def key_skew_profile(events: DataFrame, key: str = "user_id", k: int = 10) -> DataFrame:
    """(rank, user_id, cnt, share_ppm, n_keys, total_rows, skew_x1000):
    join-key skew diagnostics — the pre-flight check a 100 TB pipeline
    runs before shuffling on a key (should this join be salted? is AQE
    skew handling going to fire?). Emits the k heaviest keys with their
    integer-exact traffic share (parts per million) and the global
    skew ratio max_cnt/avg_cnt scaled to x1000 — the factor by which
    the hottest shuffle partition exceeds the average.

    All arithmetic is BIGINT (ppm/x1000 scaling + floor division), so
    the profile hash-matches across engines with no float rounding.

    Scale shape: one map-side-combined count aggregate on the key; the
    global stats reduce to ONE row (the single sanctioned broadcast);
    the top-k is TakeOrderedAndProject (per-partition heap, no global
    sort), ties broken by key so the boundary is deterministic. The
    final rank window orders k rows — constant work.
    """
    counts = events.groupBy(key).agg(F.count("*").alias("cnt"))
    stats = counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col(key).asc()).limit(k)
    wr = Window.orderBy(F.col("cnt").desc(), F.col(key).asc())
    return (
        top.crossJoin(F.broadcast(stats))
        .withColumn("rank", F.row_number().over(wr).cast("long"))
        .select(
            "rank",
            key,
            "cnt",
            F.expr("cnt * 1000000 div total_rows").alias("share_ppm"),
            "n_keys",
            "total_rows",
            F.expr("max_cnt * 1000 * n_keys div total_rows").alias(
                "skew_x1000"
            ),
        )
    )


def cusum_changepoint(events: DataFrame) -> DataFrame:
    """(event_type, n_days, cp_day, cusum_abs_scaled, mean_before,
    mean_after): offline CUSUM changepoint detection over the per-type
    daily value series — the standard "where did this metric's level
    shift" pass (Page's cumulative-sum statistic; the day maximizing
    |S_i| = |sum_{j<=i}(x_j - mean)| is the estimated changepoint).

    Engine-exactness: the daily total is decimal-rounded to 4 dp and
    scaled to BIGINT ``m`` (the ewma_daily_value contract). The CUSUM
    statistic is then multiplied through by n so it stays INTEGER:
    n * S_i = n * prefix_i - i * total. No double accumulates; the
    argmax and its tie-break (earliest day) compare exact integers, so
    both engines pick the identical changepoint even when two days tie.
    Magnitude bound: |m| <= 1e13 (bronze |value| <= 1e9, 4 dp scale),
    so |n * prefix| <= n^2 * 1e13 — safe in BIGINT to ~900 days per
    type; beyond that widen to DECIMAL(38,0).
    The only doubles are the two edge means, each a single IEEE
    division of exactly-representable operands (|prefix| < 2^53):
    mean_before = prefix_cp / (1e4 * i_cp), mean_after =
    (total - prefix_cp) / (1e4 * (n - i_cp)) — bit-identical across
    engines; NULL when the changepoint is the last day.

    Scale shape: one aggregate exchange builds the bounded daily
    series (days x types, not events); every window function —
    ordered prefix/index, unbounded total/count, and the argmax
    rank — evaluates over the SAME event_type partitioning, so
    Catalyst plans a single exchange for all of them. The final
    rn = 1 filter is a per-partition scan, no global sort.
    """
    daily = (
        events.filter(F.col("value").isNotNull())
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            (
                F.round(F.sum(F.col("value").cast("decimal(27,10)")), 4)
                .cast("decimal(18,4)")
                * 10000
            )
            .cast("bigint")
            .alias("m")
        )
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    wa = Window.partitionBy("event_type")
    scored = daily.select(
        "event_type",
        "day",
        F.sum("m").over(wo).alias("prefix"),
        F.row_number().over(wo).alias("i"),
        F.sum("m").over(wa).alias("total"),
        F.count("*").over(wa).alias("n_days"),
    ).withColumn(
        "cusum_scaled",
        F.col("n_days") * F.col("prefix") - F.col("i") * F.col("total"),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum_scaled")).desc(), F.col("day").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "n_days",
            F.col("day").alias("cp_day"),
            F.abs(F.col("cusum_scaled")).alias("cusum_abs_scaled"),
            (
                F.col("prefix").cast("double")
                / (F.lit(10000.0) * F.col("i"))
            ).alias("mean_before"),
            F.when(
                F.col("n_days") > F.col("i"),
                (F.col("total") - F.col("prefix")).cast("double")
                / (F.lit(10000.0) * (F.col("n_days") - F.col("i"))),
            ).alias("mean_after"),
        )
    )


def events_gapfill_locf(events: DataFrame, bucket_s: int = 300) -> DataFrame:
    """(window_start, event_type, n_events, sum_value, locf_sum_value,
    is_gap): the hypertable ``time_bucket_gapfill`` + LOCF shape — a
    dense per-type 5-minute series where silent buckets materialize as
    zero-count rows carrying the last observed value forward (the
    missing piece between a plain windowed aggregate and a
    dashboard-ready continuous series; TimescaleDB's gapfill/locf
    analogue, built from explode(sequence) + LEFT JOIN + an
    ignorenulls window).

    Portability: per-bucket sums are ROUNDED DECIMALS (never a
    double mean — cross-engine division); the LOCF window is
    ``last(ignorenulls)`` over the bucket order, cast to double only at
    the edge. Scale shape: the aggregate is one exchange; the dense
    grid is |types| x time-span/bucket rows generated from a 1-row
    bounds broadcast (never a scan blow-up); the LOCF window partitions
    by type — at production span, sub-partition by coarse time segment
    and seed each segment with its predecessor's closing value.
    """
    b = (
        events.groupBy(
            "event_type",
            (
                F.floor(F.unix_timestamp("ts") / bucket_s).cast("bigint")
                * bucket_s
            ).alias("b"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(27,10)")), 4).alias("s"),
        )
    )
    bounds = b.agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
    types = events.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(bucket_s))
        ).alias("b"),
    )
    joined = grid.join(b, ["event_type", "b"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.timestamp_seconds(F.col("b")).alias("window_start"),
        "event_type",
        F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n_events"),
        F.col("s").cast("double").alias("sum_value"),
        F.last("s", ignorenulls=True).over(w).cast("double").alias(
            "locf_sum_value"
        ),
        F.col("n").isNull().alias("is_gap"),
    )


def pattern_match_funnel(
    events: DataFrame, window_hours: int = 6
) -> DataFrame:
    """(user_id, signup_event, purchase_event, gap_seconds): the CEP /
    MATCH_RECOGNIZE sequential pattern with NEGATION — per user, the
    FIRST signup followed by the FIRST purchase within ``window_hours``,
    matched only if NO error event falls strictly between the two.
    (conversion_funnel counts staged populations; the interval join
    emits every pair — this is the third CEP shape, one match per
    partition with a negative condition, Flink's
    ``A followedBy B, notFollowedBy C`` / SQL MATCH_RECOGNIZE.)

    Plan: three slim event-type slices of one scan (type filter pushes
    down), each aggregated or joined ON user_id — all co-partitioned
    hash joins, no window over raw events; the negation is a LEFT ANTI
    range join against the error slice. Ties at identical timestamps
    break by event_id (min_by struct), so the match is deterministic.
    ``gap_seconds`` is exact integer microseconds divided at the edge.
    """
    first_signup = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(
            F.min_by(
                F.struct(F.col("ts").alias("s_ts"), F.col("event_id").alias("s_id")),
                F.struct("ts", "event_id"),
            ).alias("s")
        )
        .select("user_id", F.col("s.s_ts").alias("s_ts"), F.col("s.s_id").alias("s_id"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    first_purchase = (
        first_signup.join(purchases, F.col("user_id") == F.col("p_user"))
        .filter(
            (F.col("p_ts") >= F.col("s_ts"))
            & (
                F.col("p_ts")
                <= F.col("s_ts") + F.expr(f"INTERVAL {window_hours} HOURS")
            )
        )
        .groupBy("user_id", "s_ts", "s_id")
        .agg(
            F.min_by(
                F.struct(F.col("p_ts").alias("p_ts"), F.col("p_id").alias("p_id")),
                F.struct("p_ts", "p_id"),
            ).alias("p")
        )
        .select(
            "user_id", "s_ts", "s_id",
            F.col("p.p_ts").alias("p_ts"), F.col("p.p_id").alias("p_id"),
        )
    )
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    matched = first_purchase.join(
        errors,
        (F.col("user_id") == F.col("e_user"))
        & (F.col("e_ts") > F.col("s_ts"))
        & (F.col("e_ts") < F.col("p_ts")),
        "left_anti",
    )
    return matched.select(
        "user_id",
        F.col("s_id").alias("signup_event"),
        F.col("p_id").alias("purchase_event"),
        (
            (
                F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("s_ts"))
            )
            / F.lit(1_000_000)
        ).alias("gap_seconds"),
    )


def sketch_distinct_rollup(
    events: DataFrame, rel_err: float = 0.05
) -> DataFrame:
    """(grain, event_type, n_exact, within_bound): two-grain distinct
    users via Apache DataSketches HLL (Spark 3.5 ``hll_sketch_agg`` /
    ``hll_union_agg``) — the MERGEABLE cardinality sketch: per-type
    sketches roll up to the global grain by register-max UNION, exactly
    how a 100 TB tiered aggregation re-uses fine-grain sketches instead
    of rescanning raw ids (what ``approx_count_distinct`` partials
    cannot do across grains — they are query-internal).

    Driver-checkable via the approx_distinct_users pattern: estimates
    are engine-specific, so the output carries the exact count
    (verification tier) and a bound verdict the oracle asserts TRUE —
    for BOTH grains, which specifically catches a broken union (a
    register-loss bug inflates the global estimate and flips the
    global row's verdict). HLL union is order/partitioning-independent
    (register max), so the verdicts are deterministic.
    """
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("n_exact"),
    )
    def verdict(est, exact):
        bound = F.greatest(F.lit(rel_err) * exact.cast("double"), F.lit(1.0))
        return (F.abs(est - exact).cast("double") <= bound).alias("within_bound")

    fine = per_type.select(
        F.lit("event_type").alias("grain"),
        "event_type",
        "n_exact",
        verdict(F.hll_sketch_estimate("sk"), F.col("n_exact")),
    )
    global_exact = events.agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    global_row = (
        per_type.agg(F.hll_union_agg("sk").alias("u"))
        .crossJoin(F.broadcast(global_exact))
        .select(
            F.lit("all").alias("grain"),
            F.lit("(all)").alias("event_type"),
            "n_exact",
            verdict(F.hll_sketch_estimate("u"), F.col("n_exact")),
        )
    )
    return fine.unionByName(global_row)


def events_grouping_sets(events: DataFrame) -> DataFrame:
    """(event_type, hour_of_day, dow, level, n_events, sum_value):
    explicit non-hierarchical GROUPING SETS — three unrelated grains
    ((type), (hour), (type, day-of-week)) in ONE aggregate pass,
    completing the grouping trio beside events_rollup (hierarchical)
    and corpus_stats_cube (powerset). Spark 4's
    ``DataFrame.groupingSets`` expands the sets inside the aggregate
    (partial-aggregated before the single exchange) exactly like
    rollup/cube; ``grouping_id`` disambiguates the grain and null keys
    coalesce to sentinels so the edge is null-free and hash-stable.
    Day-of-week is 1..7 Sunday=1 (the oracle's dayofweek()+1).
    """
    e = events.select(
        "event_type",
        F.hour("ts").alias("hour_of_day"),
        F.dayofweek("ts").alias("dow"),
        "value",
    )
    return (
        e.groupingSets(
            [["event_type"], ["hour_of_day"], ["event_type", "dow"]],
            "event_type",
            "hour_of_day",
            "dow",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("level"),
            F.count("*").alias("n_events"),
            dec_sum().alias("sum_value"),
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("(all)")).alias("event_type"),
            F.coalesce(F.col("hour_of_day"), F.lit(-1)).alias("hour_of_day"),
            F.coalesce(F.col("dow"), F.lit(-1)).alias("dow"),
            "level",
            "n_events",
            "sum_value",
        )
    )


def value_histogram(
    events: DataFrame, lo: float = 0.0, hi: float = 500.0, bins: int = 20
) -> DataFrame:
    """(event_type, bin, bin_lo, bin_hi, n_events): equi-width
    histogram of the value measure per event type — the one-pass
    distribution profile dashboards and drift monitors read (the
    binned complement of the exact/sketch percentile ops).

    Bin -1 collects out-of-range measures (below lo or >= hi), bin -2
    NULL measures — both emitted explicitly so totals reconcile to
    count(*) and the bronze-contract NULLs stay visible. Bucket
    arithmetic is floor((v - lo) / width) with width an exact binary
    double (25.0), identical in DuckDB; bin edges are bin * width
    reconstructed from the integer bin, so no rounding anywhere.

    Plan: one narrow projection + one partial-aggregated exchange of
    at most |types| * (bins + 2) keys — the same mergeable-histogram
    shape a streaming drift monitor keeps as state.
    """
    width = (hi - lo) / bins
    v = F.col("value")
    bin_col = (
        F.when(v.isNull(), F.lit(-2))
        .when((v < lo) | (v >= hi), F.lit(-1))
        .otherwise(F.floor((v - lo) / width))
        .cast("bigint")
    )
    ge0 = F.col("bin") >= 0
    return (
        events.groupBy("event_type", bin_col.alias("bin"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "event_type",
            "bin",
            F.when(ge0, F.col("bin") * width + lo).alias("bin_lo"),
            F.when(ge0, (F.col("bin") + 1) * width + lo).alias("bin_hi"),
            "n_events",
        )
    )


def last_touch_attribution(
    events: DataFrame, window_days: int = 7
) -> DataFrame:
    """(channel, n_purchases, attributed_value): last-touch marketing
    attribution — every purchase is credited to the user's most recent
    non-purchase event within the trailing ``window_days``; purchases
    with no touch in the window land on channel 'none'. The standard
    funnel-economics query a clickstream warehouse serves.

    Determinism under timestamp ties: the winning touch is the maximum
    (ts, event_id) — a total order — encoded in the scan's sort key,
    never a bare frame-position `last_value` among equal peers.
    Attributed value is the decimal-exact sum contract.

    Plan — an AS-OF lookup, NOT an interval join: the naive
    purchases ⋈ touches equi-join on user_id alone produces
    O(purchases × touches) raw rows PER USER (the window predicate is
    only a post-join residual), which measured QUADRATIC on the
    skewed-head scale fixture (0.8 → 115 s across sf0.1→2.0, round 6).
    Since last-touch needs exactly one predecessor per purchase, the
    whole query is one sorted scan instead: shuffle once on user_id,
    sort by (ts, purchase-before-touch, event_id), and take
    last(touch, ignorenulls) over the unbounded-preceding frame — each
    purchase row sees precisely the latest strictly-earlier touch with
    ZERO pair expansion. The tie order puts a purchase BEFORE touches
    at the same timestamp, enforcing t_ts < p_ts strictly inside the
    sort itself; the trailing-window bound becomes a scalar post-check
    on the captured touch timestamp. Cost: one exchange + one
    per-user sort, linear at any key skew (a heavy user is one big
    sorted run, not a quadratic blowup).
    """
    is_p = F.col("event_type") == "purchase"
    no_ts = events.filter(is_p & F.col("ts").isNull()).select(
        F.lit("none").alias("channel"), "value"
    )
    stream = events.filter(F.col("ts").isNotNull()).select(
        "user_id",
        "ts",
        "event_id",
        "value",
        is_p.alias("is_purchase"),
        F.when(
            ~is_p,
            F.struct(
                F.col("ts").alias("t_ts"),
                F.col("event_type").alias("touch_type"),
            ),
        ).alias("touch"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            "ts",
            # purchases sort before same-ts touches: the frame up to a
            # purchase row therefore contains only STRICTLY earlier
            # touches (t_ts < p_ts), and among touches the last row in
            # (ts, event_id) order is exactly max_by(type, (ts, id)).
            F.when(F.col("is_purchase"), F.lit(0)).otherwise(F.lit(1)),
            "event_id",
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lt = F.last("touch", ignorenulls=True).over(w)
    per_purchase = (
        stream.withColumn("lt", lt)
        .filter("is_purchase")
        .select(
            F.when(
                F.col("lt").isNotNull()
                & (
                    F.col("lt.t_ts")
                    >= F.col("ts") - F.expr(f"INTERVAL {window_days} DAYS")
                ),
                F.col("lt.touch_type"),
            )
            .otherwise(F.lit("none"))
            .alias("channel"),
            "value",
        )
    )
    return (
        per_purchase.unionByName(no_ts)
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum(F.col("value").cast("decimal(27,10)")), 4)
            .cast("double")
            .alias("attributed_value"),
        )
    )


def events_debounced(events: DataFrame, gap_s: int = 60) -> DataFrame:
    """(user_id, event_type, n_raw, n_kept): telemetry debounce — a
    burst of same-key events closer than ``gap_s`` apart collapses to
    its first event (duplicate click / retry-storm suppression, the
    standard cleaning pass before funnel or attribution analytics).

    A burst is a gaps-and-islands run: an event starts a new burst iff
    it is the key's first or arrives STRICTLY more than ``gap_s``
    after its predecessor (chained semantics: a long storm of events
    each 1 s apart is ONE burst no matter how long it runs, because
    suppression keys off the previous raw event, not the previous
    kept one — exact microsecond comparisons, no bucketing
    artifacts). NULL timestamps cannot be debounced and count only
    into n_raw.

    Plan: one window over the (user, type) key partitions + one
    aggregate on the same key — the window exchange is reused by the
    groupBy (no second shuffle).
    """
    w = Window.partitionBy("user_id", "event_type").orderBy("ts")
    prev = F.lag("ts").over(w)
    is_kept = F.when(
        F.col("ts").isNotNull(),
        prev.isNull()
        | (F.col("ts") > prev + F.expr(f"INTERVAL {gap_s} SECONDS")),
    ).otherwise(F.lit(False))
    return (
        events.withColumn("_kept", is_kept)
        .groupBy("user_id", "event_type")
        .agg(
            F.count("*").alias("n_raw"),
            F.sum(F.col("_kept").cast("long")).alias("n_kept"),
        )
    )


def user_triangles(
    events: DataFrame, top_edges: int = 2000, bucket_cap: int | None = 256
) -> DataFrame:
    """(user_id, n_triangles): triangle participation counts over the
    user co-occurrence graph — the classic cohesion/community signal
    (clustering-coefficient numerator), and the canonical
    distributed-graph shape beyond the repo's connected components and
    PageRank: build edges, orient, one wedge join, one closing join.

    Graph construction is bounded by design: an edge is a user pair
    co-active in the same (event_type, day) bucket, weighted by the
    number of shared buckets, and only the globally strongest
    ``top_edges`` edges (ties broken by the pair itself — a total
    order) form the graph. The top-k gate means the triangle joins
    run on a FIXED-size edge list at any corpus scale — the same
    "kNN-graph then analyze" recipe production co-visitation graphs
    use — and the co-occurrence stage caps bucket occupancy at
    ``bucket_cap``: only each bucket's ``bucket_cap`` most-active
    users (per-bucket event count, ties to the lower user_id — a
    total order, so the cap is deterministic) enter the pair
    expansion. Without the cap, per-bucket pair fan-out is
    O(occupancy²) and distinct-users-per-bucket grows linearly with
    corpus size, so the stage is quadratic by construction — the
    round-5 verdict's named risk for this operator. With it, pair
    output is <= n_buckets * C(bucket_cap, 2): linear in the TIME
    span, flat in corpus rows. The heaviest users are precisely the
    ones that survive the cap, so the strongest edges — the only
    ones the top_edges gate keeps anyway — are unaffected at the
    fixture scales (cap inactive below ~bucket_cap users/bucket;
    verified against the uncapped oracle). Pass ``bucket_cap=None``
    for the UNCAPPED audit semantics — true triangle participation
    with unbounded per-bucket fan-out, the same escape hatch the
    dedup tier keeps via ``candidates="exact"`` (round-6 ADVICE
    item 4); run it on samples to audit the capped tier, not on a
    full-scale corpus.

    Edges are already oriented (ua < ub), so each triangle a<b<c is
    found exactly once: wedge join E(a,b) x E(a,c) on a with b < c,
    then the closing probe for (b, c). Per-user counts credit all
    three corners.
    """
    activity = (
        events.filter(F.col("ts").isNotNull())
        .groupBy(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            "user_id",
        )
        .agg(F.count("*").alias("n_ev"))
    )
    if bucket_cap is None:
        pairs = activity.select("user_id", "event_type", "day")
    else:
        pairs = (
            activity.withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("event_type", "day").orderBy(
                        F.col("n_ev").desc(), "user_id"
                    )
                ),
            )
            .filter(F.col("rk") <= bucket_cap)
            .select("user_id", "event_type", "day")
        )
    # Output-sized parallelism for the quadratic pair expansion (r12
    # optimization, guide §2.5/§2.2): the join's INPUT is a few MB of
    # (user, bucket) rows, so AQE sizes the exchanges feeding it by
    # input bytes and coalesces them to ~1 partition — serializing the
    # O(occupancy²) probe+partial-agg work that dominates this operator
    # (measured at sf0.1: exact tier 12.6 s single-task vs 2.0 s
    # spread; capped tier 3.1 s vs 1.4 s). An explicit join-key
    # repartition pins the expansion's parallelism (user-specified
    # shuffles are exempt from AQE coalescing) while staying
    # co-partitioned on the equi-join key. Two subtleties:
    # - 2x defaultParallelism (scale-adaptive, not a constant): finer
    #   tasks smooth the per-bucket occupancy² skew;
    # - the count must differ from spark.sql.shuffle.partitions, or
    #   the capped path's window exchange already carries the exact
    #   same HashPartitioning and Catalyst elides this repartition as
    #   redundant — handing the expansion back to the AQE-coalesced
    #   (single-partition) window stage.
    # r13: the count arithmetic lives in util.pinned_partitions
    # (shared with simhash_near_pairs; the plan keeps the pin —
    # asserted by tests/test_r13_optimizations.py).
    from .util import pinned_partitions

    pairs = pairs.repartition(
        pinned_partitions(pairs.sparkSession), "event_type", "day"
    )
    co = (
        pairs.alias("x")
        .join(
            pairs.alias("y"),
            (F.col("x.event_type") == F.col("y.event_type"))
            & (F.col("x.day") == F.col("y.day"))
            & (F.col("x.user_id") < F.col("y.user_id")),
        )
        .groupBy(
            F.col("x.user_id").alias("ua"), F.col("y.user_id").alias("ub")
        )
        .agg(F.count("*").alias("w"))
    )
    edges = (
        co.orderBy(F.col("w").desc(), "ua", "ub")
        .limit(top_edges)
        .select("ua", "ub")
    )
    # The wedge/closing stage consumes `edges` through THREE join
    # branches (e1 probe, e2 broadcast, closing broadcast) whose plans
    # differ past the co-occurrence exchange, so only the exchange is
    # deduplicated — the expensive top-k over the co-occurrence
    # aggregate would run once per branch (r12 optimization, guide
    # §2.4/§5: measured 5.2 s → 3.1 s on the exact tier at sf0.1).
    # localCheckpoint materializes the <= top_edges rows once (same
    # intra-query pattern as connected_components' _persist_round);
    # the checkpointed frame is a few KB at ANY corpus scale because
    # the top-k gate precedes it.
    edges = edges.localCheckpoint(eager=True)
    e1 = edges.select(F.col("ua").alias("a"), F.col("ub").alias("b"))
    e2 = edges.select(F.col("ua").alias("a"), F.col("ub").alias("c"))
    wedges = e1.join(e2, "a").where(F.col("b") < F.col("c"))
    closing = edges.select(
        F.col("ua").alias("b"), F.col("ub").alias("c")
    )
    tri = wedges.join(closing, ["b", "c"])
    corners = (
        tri.select(F.col("a").alias("user_id"))
        .unionAll(tri.select(F.col("b").alias("user_id")))
        .unionAll(tri.select(F.col("c").alias("user_id")))
    )
    return corners.groupBy("user_id").agg(
        F.count("*").alias("n_triangles")
    )
