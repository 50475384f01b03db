"""Similarity search over the ``embeddings`` table (ARRAY<FLOAT> dim=64).

Extension surface beyond the reference (SURVEY.md §2.6) — the reference
has no vector operations at all. Two strategies:

- :func:`cosine_topk` — exact brute-force top-k for a bounded query set.
  The query side is broadcast, so the plan is a BroadcastNestedLoopJoin
  over a single scan of the corpus: O(|Q| * N) work with NO shuffle of
  the corpus and no CartesianProduct exchange. This is the correct
  *exact* plan at 100 TB when |Q| is small (the common "embed a prompt,
  find neighbors" shape).
- :func:`cosine_topk_lsh` — approximate scale path: random-hyperplane
  LSH buckets on both sides, candidates only from matching buckets,
  exact re-rank within. Corpus-side work drops to the matching buckets;
  recall is tunable via tables x hyperplanes (pytest measures it).

All vector math is double-precision Catalyst higher-order functions
(functions/vectors.py); cosine is bit-identical to DuckDB's
``list_cosine_similarity`` on DOUBLE[], making the exact variant fully
oracle-hashable.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot, to_double


def _prepared(embeddings: DataFrame, prefix: str) -> DataFrame:
    return embeddings.select(
        F.col("vec_id").alias(f"{prefix}_id"),
        to_double(F.col("embedding")).alias(f"{prefix}_vec"),
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    num_queries: int = 16,
) -> DataFrame:
    """Exact cosine top-k neighbors per query vector.

    ``queries`` defaults to the first ``num_queries`` corpus vectors
    (vec_id < num_queries). Self-matches are excluded. Ties broken by
    neighbor id for determinism. Output: (q_id, n_id, cosine, rank).
    """
    if queries is None:
        queries = embeddings.filter(F.col("vec_id") < num_queries)
    q = _prepared(queries, "q")
    c = _prepared(embeddings, "n")
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            cosine(F.col("q_vec"), F.col("n_vec")).alias("_cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("_cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "n_id",
            F.round(F.col("_cos"), 4).alias("cosine"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def hyperplane_buckets(
    vec_col, num_tables: int = 16, num_planes: int = 4, dim: int = 64, seed: int = 42
):
    """ARRAY of ``num_tables`` LSH bucket codes from random hyperplanes.

    Hyperplanes are a fixed-seed numpy draw embedded as literals — the
    plan is deterministic across runs and executors (no RNG at execute
    time). Bucket code t = sign bits of <v, H[t*P+j]> for j < P.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables * num_planes, dim))
    codes = []
    for t in range(num_tables):
        acc = F.lit(0)
        for j in range(num_planes):
            h = F.array(*[F.lit(float(x)) for x in planes[t * num_planes + j]])
            acc = acc * 2 + F.when(dot(vec_col, h) >= 0, 1).otherwise(0)
        # Disambiguate tables: same sign pattern in different tables
        # must not collide.
        codes.append(acc + t * (1 << num_planes))
    return F.array(*codes)


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    num_queries: int = 16,
    num_tables: int = 16,
    num_planes: int = 4,
) -> DataFrame:
    """Approximate cosine top-k: candidates share >=1 hyperplane-LSH
    bucket with the query, exact re-rank within candidates.

    Same output contract as :func:`cosine_topk` minus the guarantee of
    perfect recall (rows-only driver check; pytest measures recall
    against the exact operator). At scale the bucket join replaces the
    full corpus scan per query with the matching buckets only.
    """
    if queries is None:
        queries = embeddings.filter(F.col("vec_id") < num_queries)

    def bucketed(df: DataFrame, prefix: str) -> DataFrame:
        p = _prepared(df, prefix)
        return p.select(
            f"{prefix}_id",
            f"{prefix}_vec",
            F.explode(
                hyperplane_buckets(
                    F.col(f"{prefix}_vec"), num_tables, num_planes
                )
            ).alias("bucket"),
        )

    qb = bucketed(queries, "q")
    cb = bucketed(embeddings, "n")
    cands = (
        cb.join(F.broadcast(qb), "bucket")
        .where(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", "q_vec", "n_vec")
        .dropDuplicates(["q_id", "n_id"])
    )
    w = Window.partitionBy("q_id").orderBy(F.col("_cos").desc(), F.col("n_id"))
    return (
        cands.withColumn("_cos", cosine(F.col("q_vec"), F.col("n_vec")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "n_id",
            F.round(F.col("_cos"), 4).alias("cosine"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate nearest neighbors
# ---------------------------------------------------------------------------

def ivf_centroids(embeddings: DataFrame, stride: int = 61) -> list:
    """Deterministic centroid sample: every ``stride``-th vector by id.

    This is the "train" step of IVF. Like spark.ml KMeans, the trained
    centroid set is a bounded, driver-held model parameter (|C| ~ N/stride
    here; a real deployment caps |C| at a few thousand regardless of N) —
    the one sanctioned collect in this module. A k-means refinement would
    slot in here without touching the plan topology below.
    """
    rows = (
        embeddings.filter(F.col("vec_id") % stride == 0)
        .select("vec_id", to_double(F.col("embedding")).alias("v"))
        .orderBy("vec_id")
        .collect()
    )
    return [(int(r["vec_id"]), list(r["v"])) for r in rows]


def _centroid_rank_structs(vec, centroids) -> object:
    """ARRAY<STRUCT<d2, cid>> sorted by (squared L2 distance, cid).

    Distance folds left-to-right in double (zip_with + aggregate), the
    same sequential order as the DuckDB oracle's list_reduce — distances
    are bit-identical cross-engine, so assignment and probe order are
    exactly reproducible. Struct sort = lexicographic (d2, cid): ties
    break deterministically on centroid id.
    """
    structs = []
    for cid, vals in centroids:
        c = F.array(*[F.lit(float(x)) for x in vals])
        d2 = F.aggregate(
            F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        structs.append(
            F.struct(d2.alias("d2"), F.lit(cid).cast("bigint").alias("cid"))
        )
    return F.array_sort(F.array(*structs))


def cosine_topk_ivf(
    embeddings: DataFrame,
    k: int = 10,
    num_queries: int = 16,
    stride: int = 61,
    nprobe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are assigned to their
    nearest centroid's posting list (a NARROW expression — no shuffle);
    each query probes its ``nprobe`` nearest lists; candidates come from
    an equi-join on centroid id; exact cosine re-rank within.

    At 100 TB: assignment adds O(|C|) flops per row inside the scan,
    the candidate join touches ~nprobe/|C| of the corpus per query, and
    the only shuffles are the (small) candidate set by q_id. Unlike the
    hyperplane-LSH variant the whole operator is deterministic, so the
    driver check is value-exact (the DuckDB oracle replays the same
    assignment/probing).
    """
    cents = ivf_centroids(embeddings, stride)
    e = _prepared(embeddings, "n").withColumn(
        "cid", F.element_at(_centroid_rank_structs(F.col("n_vec"), cents), 1)["cid"]
    )
    q = (
        _prepared(embeddings.filter(F.col("vec_id") < num_queries), "q")
        .withColumn(
            "probes",
            F.slice(_centroid_rank_structs(F.col("q_vec"), cents), 1, nprobe),
        )
        .select("q_id", "q_vec", F.explode("probes.cid").alias("cid"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("_cos").desc(), F.col("n_id"))
    return (
        e.join(F.broadcast(q), "cid")
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn("_cos", cosine(F.col("q_vec"), F.col("n_vec")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "n_id",
            F.round(F.col("_cos"), 4).alias("cosine"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )
