"""Deterministic scale-factor table generator for scaling-curve
benchmarks (VERDICT r4 item 2).

The driver ships fixtures only up to sf0.1; the 100 TB design claims
for the expensive dedup/ANN tier are argued from plan shape but were
never *measured* against data growth. This module generates the same
table shapes at arbitrary sf so ``tools/scale_bench.py`` can fit a
wall-time-vs-rows exponent per query (near-linear = the claim holds;
quadratic = an all-pairs leak).

Design constraints, in priority order:

1. **Deterministic and layout-independent** — every value is a pure
   function of (seed, row id) via xxhash64/splitmix arithmetic; no
   rand(), no Date.now, so two runs or two partitionings generate the
   identical corpus.
2. **Distributed generation** — ``spark.range`` + JVM expressions for
   the TPC-H-ish tables (6M lineitem rows at sf1 in seconds),
   Arrow-batched ``mapInPandas`` for text/vector payloads. Nothing is
   built on the driver.
3. **Scale-honest near-dup structure** — the point of the curve. Each
   block of 10 documents draws 40% of its tokens from a BLOCK-LOCAL
   vocabulary (models the hapax-heavy Zipf tail of a real corpus), so
   cross-block similarity stays near zero as N grows and the TRUE
   near-dup pairs grow O(N) (ids ...8/...9 are a perturbed/exact copy
   of their block base). Without the block-local tokens a tiny shared
   vocabulary makes *every* pair collide in LSH bands at large N and
   the measured curve would show the corpus going quadratic, not the
   algorithm.

Row counts mirror the driver fixtures' ratios per unit sf (TESTDATA.md;
lineitem ~6M/sf like TPC-H): supplier 10k, part 200k, customer 150k,
orders 1.5M, documents 50k, embeddings 20k.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
LANGS = ["en", "en", "en", "en", "de", "fr", "es", "zh"]  # ~50% en, like sf0.1
COMMON_VOCAB = (
    "spark table query hash line slow fast stream value key group scan "
    "order window join part vector row data customer batch agg filter "
    "sort column small big merge the a"
).split()
EMB_DIM = 64
N_LABELS = 10
BASE_DATE = "1995-01-01"
DATE_SPAN_DAYS = 2400  # ~1995-2001, like the driver fixture

_MASK = (1 << 64) - 1


def _splitmix(x: int) -> int:
    """SplitMix64 — the standard 64-bit finalizer; portable, seedable."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


def _u(expr, salt: str, n):
    """Uniform integer in [0, n) as a JVM-side expression."""
    return F.pmod(F.xxhash64(expr, F.lit(salt)), F.lit(n))


def _gen_region(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(enumerate(REGIONS)), "r_regionkey INT, r_name STRING"
    )


def _gen_nation(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(25)],
        "n_nationkey INT, n_name STRING, n_regionkey INT",
    )


def _gen_supplier(spark: SparkSession, n: int) -> DataFrame:
    return spark.range(n).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.col("id")).alias("s_name"),
        _u(F.col("id"), "s_nat", 25).cast("int").alias("s_nationkey"),
        (
            F.round(_u(F.col("id"), "s_bal", 1_100_000) / 100.0 - 1000.0, 2)
        ).alias("s_acctbal"),
    )


def _gen_customer(spark: SparkSession, n: int) -> DataFrame:
    segs = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
    seg = F.array(*[F.lit(s) for s in segs])[
        _u(F.col("id"), "c_seg", len(segs)).cast("int")
    ]
    return spark.range(n).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.col("id")).alias("c_name"),
        _u(F.col("id"), "c_nat", 25).cast("int").alias("c_nationkey"),
        (
            F.round(_u(F.col("id"), "c_bal", 1_100_000) / 100.0 - 1000.0, 2)
        ).alias("c_acctbal"),
        seg.alias("c_mktsegment"),
    )


def _gen_part(spark: SparkSession, n: int) -> DataFrame:
    t1 = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
    t2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
    t3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
    pick = lambda xs, salt: F.array(*[F.lit(x) for x in xs])[  # noqa: E731
        _u(F.col("id"), salt, len(xs)).cast("int")
    ]
    return spark.range(n).select(
        F.col("id").alias("p_partkey"),
        F.concat(F.lit("part_"), F.col("id")).alias("p_name"),
        F.concat(
            F.lit("Brand#"), _u(F.col("id"), "p_brand", 25).cast("int")
        ).alias("p_brand"),
        F.concat_ws(
            " ", pick(t1, "p_t1"), pick(t2, "p_t2"), pick(t3, "p_t3")
        ).alias("p_type"),
        (_u(F.col("id"), "p_size", 50) + 1).cast("int").alias("p_size"),
        F.round(900.0 + _u(F.col("id"), "p_rp", 110_000) / 100.0, 2).alias(
            "p_retailprice"
        ),
    )


def _gen_orders(spark: SparkSession, n: int, n_cust: int) -> DataFrame:
    prio = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    return spark.range(n).select(
        F.col("id").alias("o_orderkey"),
        _u(F.col("id"), "o_cust", n_cust).alias("o_custkey"),
        F.array(F.lit("O"), F.lit("F"), F.lit("P"))[
            _u(F.col("id"), "o_st", 3).cast("int")
        ].alias("o_orderstatus"),
        F.round(1000.0 + _u(F.col("id"), "o_tp", 45_000_000) / 100.0, 2).alias(
            "o_totalprice"
        ),
        F.timestamp_add(
            "DAY",
            _u(F.col("id"), "o_date", DATE_SPAN_DAYS).cast("int"),
            F.to_timestamp(F.lit(BASE_DATE)),
        ).alias("o_orderdate"),
        F.array(*[F.lit(p) for p in prio])[
            _u(F.col("id"), "o_pr", 5).cast("int")
        ].alias("o_orderpriority"),
    )


def _gen_lineitem(
    spark: SparkSession, n_orders: int, n_part: int, n_supp: int
) -> DataFrame:
    # 1-7 lines per order (avg 4 -> ~6M rows at sf1), exploded JVM-side.
    lines = spark.range(n_orders).select(
        F.col("id").alias("l_orderkey"),
        F.posexplode(
            F.sequence(F.lit(1), (_u(F.col("id"), "l_n", 7) + 1).cast("int"))
        ).alias("pos", "l_linenumber"),
    )
    lk = F.xxhash64("l_orderkey", "l_linenumber", F.lit("li"))
    u = lambda salt, n: F.pmod(F.xxhash64(lk, F.lit(salt)), F.lit(n))  # noqa: E731
    qty = (u("l_qty", 50) + 1).cast("double")
    price = F.round(901.0 + u("l_px", 9_900_000) / 100.0, 2)
    return lines.select(
        "l_orderkey",
        u("l_part", n_part).alias("l_partkey"),
        u("l_supp", n_supp).alias("l_suppkey"),
        F.col("l_linenumber").cast("int"),
        qty.alias("l_quantity"),
        F.round(qty * price, 2).alias("l_extendedprice"),
        (u("l_disc", 11) / 100.0).alias("l_discount"),
        (u("l_tax", 9) / 100.0).alias("l_tax"),
        F.array(F.lit("A"), F.lit("N"), F.lit("R"))[
            u("l_rf", 3).cast("int")
        ].alias("l_returnflag"),
        F.array(F.lit("O"), F.lit("F"))[u("l_ls", 2).cast("int")].alias(
            "l_linestatus"
        ),
        F.timestamp_add(
            "DAY",
            (u("l_ship", DATE_SPAN_DAYS + 120)).cast("int"),
            F.to_timestamp(F.lit(BASE_DATE)),
        ).alias("l_shipdate"),
    )


def _gen_events(spark: SparkSession, n: int, n_users: int) -> DataFrame:
    """Driver-fixture-shaped events stream (event_id, ts, user_id,
    event_type, value, props) over the same 30-day January-2024 span,
    with a DELIBERATE production-shaped key skew the driver fixture
    lacks: 20% of all events belong to 10 heavy users (the remaining
    80% draw uniformly over ``n_users``). The heavy head is what makes
    the events-family scale curves honest — co-occurrence pair
    expansion (user_triangles), per-key windows (events_debounced),
    and the skew diagnostics themselves (key_skew_profile) all hit
    their worst case on exactly this distribution (VERDICT r5 item 4).
    """
    types = ["view", "click", "purchase", "error", "signup"]
    heavy = min(10, n_users)
    user = F.when(
        _u(F.col("id"), "e_skew", 5) == 0, _u(F.col("id"), "e_heavy", heavy)
    ).otherwise(_u(F.col("id"), "e_user", n_users))
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_add(
            "SECOND",
            _u(F.col("id"), "e_ts", 30 * 86400).cast("int"),
            F.to_timestamp(F.lit("2024-01-01")),
        ).alias("ts"),
        user.alias("user_id"),
        F.array(*[F.lit(t) for t in types])[
            _u(F.col("id"), "e_type", len(types)).cast("int")
        ].alias("event_type"),
        (_u(F.col("id"), "e_val", 10_000) / 100.0).alias("value"),
        F.concat(
            F.lit('{"k": '), _u(F.col("id"), "e_k", 100), F.lit("}")
        ).alias("props"),
    )


def _doc_words(doc_id: int, seed: int) -> list[str]:
    """Token list for one document: 60% Zipf-ish common vocab, 40%
    block-local tokens (see module docstring for why that mix is what
    keeps the LSH candidate count linear in N, as in a real corpus)."""
    block = doc_id // 10
    n_words = 8 + _splitmix(seed ^ (doc_id * 2654435761)) % 92
    words = []
    for j in range(n_words):
        h = _splitmix((seed << 1) ^ (doc_id * 1_000_003 + j))
        if h % 10 < 6:
            # Zipf-ish: square the draw so low ranks dominate
            r = (h >> 8) % (len(COMMON_VOCAB) ** 2)
            words.append(COMMON_VOCAB[int(math.isqrt(r))])
        else:
            words.append(f"b{block}w{(h >> 8) % 40}")
    return words


def _gen_documents(spark: SparkSession, n: int, seed: int) -> DataFrame:
    n_parts = max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["id"]:
                doc_id = int(doc_id)
                r = doc_id % 10
                if r == 9:  # exact duplicate of the block base
                    words = _doc_words(doc_id - 9, seed)
                elif r == 8:  # near-duplicate: one token swapped
                    words = list(_doc_words(doc_id - 8, seed))
                    if words:
                        words[len(words) // 2] = "swapped"
                else:
                    words = _doc_words(doc_id, seed)
                text = " ".join(words)
                h = _splitmix(seed ^ (doc_id * 97))
                out.append(
                    (
                        doc_id,
                        text,
                        LANGS[h % len(LANGS)],
                        f"src{(h >> 8) % 20}",
                        len(text),
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "text", "lang", "source", "n_chars"]
            )

    return spark.range(n, numPartitions=n_parts).mapInPandas(
        gen,
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )


def _gen_embeddings(
    spark: SparkSession, n: int, seed: int, mode: str = "uniform"
) -> DataFrame:
    """``mode="uniform"``: labels round-robin over ids, moderate noise —
    every blob the same size (the original curve fixture).
    ``mode="clustered"``: the adversarial occupancy fixture (VERDICT r6
    item 2) — Gaussian-ish blobs with ONE DOMINANT cluster (label 0
    owns ~50% of vectors, the rest Zipf-thinned) and 2.4x tighter
    noise, so hyperplane-LSH buckets, IVF posting lists, and PQ
    codeword cells all go head-heavy instead of uniform. Uniform
    vectors under-stress bucket occupancy: a structure whose cost is
    sum-of-squares over bucket sizes looks linear on them and
    quadratic on a real head-heavy corpus."""
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    clustered = mode == "clustered"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        # label centroids: deterministic unit-ish anchors per label
        cents = np.array(
            [
                [
                    (_splitmix(seed ^ (lb * 131 + d)) % 2001 - 1000) / 1000.0
                    for d in range(EMB_DIM)
                ]
                for lb in range(N_LABELS)
            ]
        )
        noise_div = 6000.0 if clustered else 2500.0
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if clustered:
                # ~50% label 0, remainder Zipf-thinned across 1..9:
                # P(label=j) ~ 0.5/H * 1/j. Pure function of id.
                u = np.array(
                    [_splitmix((seed * 31 + 7) ^ int(i)) % 10000 for i in ids]
                )
                hz = sum(1.0 / j for j in range(1, N_LABELS))
                bounds = np.cumsum(
                    [5000]
                    + [int(5000 / hz / j) for j in range(1, N_LABELS - 1)]
                )
                labels = np.searchsorted(bounds, u, side="right")
            else:
                labels = ids % N_LABELS
            # per-(vec, dim) noise from splitmix over a flat counter
            noise = np.array(
                [
                    [
                        (_splitmix((seed << 2) ^ (int(i) * EMB_DIM + d)) % 2001
                         - 1000)
                        / noise_div
                        for d in range(EMB_DIM)
                    ]
                    for i in ids
                ]
            )
            vecs = cents[labels] + noise
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "embedding": [
                        row.astype("float32") for row in vecs
                    ],
                    "label": labels.astype("int32"),
                }
            )

    return spark.range(n, numPartitions=n_parts).mapInPandas(
        gen, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )


def gen_scale_tables(
    spark: SparkSession,
    out_dir: str,
    sf: float,
    seed: int = 42,
    tables: list[str] | None = None,
    emb_mode: str = "uniform",
) -> dict[str, int]:
    """Write the requested tables at scale factor ``sf`` as one parquet
    file-tree per table under ``out_dir`` (same layout the driver
    fixtures use, so registry queries run on it unchanged). Returns
    {table: rows written}."""
    n_supp = max(int(10_000 * sf), 10)
    n_part = max(int(200_000 * sf), 200)
    n_cust = max(int(150_000 * sf), 150)
    n_ord = max(int(1_500_000 * sf), 1500)
    n_docs = max(int(50_000 * sf), 100)
    n_vecs = max(int(20_000 * sf), 100)
    n_events = max(int(1_000_000 * sf), 1000)
    n_users = max(int(15_000 * sf), 15)
    builders = {
        "region": lambda: _gen_region(spark),
        "nation": lambda: _gen_nation(spark),
        "supplier": lambda: _gen_supplier(spark, n_supp),
        "customer": lambda: _gen_customer(spark, n_cust),
        "part": lambda: _gen_part(spark, n_part),
        "orders": lambda: _gen_orders(spark, n_ord, n_cust),
        "lineitem": lambda: _gen_lineitem(spark, n_ord, n_part, n_supp),
        "documents": lambda: _gen_documents(spark, n_docs, seed),
        "embeddings": lambda: _gen_embeddings(spark, n_vecs, seed, emb_mode),
        "events": lambda: _gen_events(spark, n_events, n_users),
    }
    written = {}
    for name in tables or list(builders):
        df = builders[name]()
        path = f"{out_dir}/{name}.parquet"
        df.write.mode("overwrite").parquet(path)
        written[name] = spark.read.parquet(path).count()
    return written
