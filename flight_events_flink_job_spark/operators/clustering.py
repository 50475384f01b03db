"""Bounded-iteration Lloyd k-means over the ``embeddings`` table.

Extension surface (SURVEY.md §2.6): the clustering step of an
embedding-pipeline (corpus topic bucketing, IVF index training,
diversity-aware sampling). Complements the two existing iterative /
model-ish operators:

- ``dedup.connected_components`` — iterative, no model, hash joins;
- ``similarity.cosine_topk_ivf`` — a driver-held CAPPED centroid model
  (the module's one sanctioned collect);
- this operator — iterative AND model-free on the driver: centroids
  live in a k-row DataFrame that is broadcast per iteration, so NOTHING
  is ever collected and the plan is one lazy chain.

Scale shape per iteration: assignment is a broadcast nested-loop join
of the k-row centroid table onto one linear scan of the vectors
(O(N*k) distance work, embarrassingly parallel, no shuffle of the
corpus); the centroid update is a long-form (cid, dim) hash aggregate
— the shuffle carries k*dim partial-sum rows per partition, never
vectors. Iterations are a fixed small constant (the contract is
"run c iterations deterministically", not "until convergence" — the
unbounded-convergence variant belongs to the CC-style loop with a
per-round driver boolean).

Engine-portability (what makes the oracle hash-exact): squared-L2 is a
sequential left fold over dimensions (Catalyst ``aggregate`` over
``zip_with`` here, ``list_reduce`` over a comprehension in DuckDB —
the same bit-exact pairing the IVF oracle uses); centroid means
accumulate in DECIMAL (exact, associative) with ONE double division at
the edge; assignment ties break by (d2, cid) row_number on both sides;
inertia sums d2 in DECIMAL. Arrow swap-in note: at production scale the
per-row fold would move into a pandas_udf matmul like
``similarity._ranked_centroids`` (same plan topology, faster math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, to_double
from .util import spread


def kmeans_assign(
    embeddings: DataFrame, k: int = 8, iterations: int = 2, stride: int = 7
) -> DataFrame:
    """(vec_id, v, cid, d2): the final-iteration Lloyd assignment.

    The shared core of :func:`kmeans_clusters` and
    :func:`semdedup` — fixed-``iterations`` Lloyd with deterministic
    stride init (centroid ``i`` = vector ``i * stride``), broadcast
    k-row centroid table per iteration, nothing collected. Each
    iteration assigns every vector to its nearest centroid (ties by
    centroid id) and recomputes centroids as per-dimension
    decimal-exact means; the last iteration's assignment is returned
    un-reassigned (``iterations`` assign steps, ``iterations - 1``
    update steps).
    """
    assigned, _ = lloyd_chain(embeddings, k=k, iterations=iterations, stride=stride)
    return assigned


def lloyd_chain(
    embeddings: DataFrame, k: int = 8, iterations: int = 2, stride: int = 7
) -> tuple[DataFrame, DataFrame]:
    """(assignment, codebook): the Lloyd loop of :func:`kmeans_assign`,
    additionally returning the k-row centroid table the FINAL
    assignment was computed against (what ADC distance tables need —
    :func:`pq_topk`)."""
    e = spread(embeddings).select(
        "vec_id", to_double(F.col("embedding")).alias("v")
    )
    cent = e.filter(
        (F.col("vec_id") % stride == 0) & (F.col("vec_id") < stride * k)
    ).select(
        (F.col("vec_id") / stride).cast("bigint").alias("cid"),
        F.col("v").alias("cv"),
    )
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    assigned = None
    for it in range(iterations):
        # argmin via min_by over a (d2, cid) struct, NOT a row_number
        # window: the hash aggregate partial-combines each partition's
        # k candidates per vector to one row BEFORE the exchange, so
        # the shuffle carries N rows, not N*k window-sort input. Ties
        # break by cid (struct comparison is lexicographic; cid is
        # unique per vec_id candidate set -> deterministic).
        assigned = (
            e.crossJoin(F.broadcast(cent))
            .withColumn("d2", d2)
            .groupBy("vec_id")
            .agg(
                F.min_by(
                    F.struct("v", "cid", "d2"), F.struct("d2", "cid")
                ).alias("m")
            )
            .select(
                "vec_id",
                F.col("m.v").alias("v"),
                F.col("m.cid").alias("cid"),
                F.col("m.d2").alias("d2"),
            )
        )
        if it < iterations - 1:
            cent = (
                assigned.select("cid", F.posexplode("v").alias("dim0", "x"))
                .groupBy("cid", "dim0")
                .agg(
                    (
                        F.sum(F.col("x").cast("decimal(20,10)")).cast("double")
                        / F.count("*")
                    ).alias("cx")
                )
                .groupBy("cid")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("dim0", "cx"))),
                        lambda s: s["cx"],
                    ).alias("cv")
                )
            )
    return assigned, cent


def kmeans_clusters(
    embeddings: DataFrame, k: int = 8, iterations: int = 2, stride: int = 7
) -> DataFrame:
    """(cluster_id, n_vectors, inertia): fixed-``iterations`` Lloyd
    k-means, reporting the final assignment's cluster sizes and exact
    decimal-summed inertia (rounded 4dp). See :func:`kmeans_assign`
    for the iteration/init contract.
    """
    assigned = kmeans_assign(embeddings, k=k, iterations=iterations, stride=stride)
    return (
        assigned.groupBy("cid")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.sum(F.col("d2").cast("decimal(27,10)")), 4)
            .cast("double")
            .alias("inertia"),
        )
        .select(F.col("cid").alias("cluster_id"), "n_vectors", "inertia")
    )


def semdedup(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 2,
    stride: int = 7,
    threshold: float = 0.4,
) -> DataFrame:
    """(cluster_id, n_vectors, n_dropped, n_kept): SemDedup-style
    semantic deduplication — k-means-bucketed cosine pruning over the
    embedding space (Abbas et al. 2023, arXiv:2303.09540).

    Rule (deterministic, oracle-replayable): within each final k-means
    cluster, embedding ``v`` is DROPPED iff some same-cluster embedding
    ``u`` with keep-precedence is ≥ ``threshold`` cosine-similar to it.
    Precedence keeps the member farthest from its centroid (the paper's
    low-centroid-similarity keeper): ``u`` precedes ``v`` iff
    ``u.d2 > v.d2``, ties broken by lower ``vec_id``.

    Scale shape: candidate pairs come from an equi-join on the cluster
    id — NEVER a corpus cross join — so pair work is bounded by cluster
    occupancy; at production scale ``k`` grows with the corpus to hold
    expected cluster size constant (the paper runs k ~ sqrt(N)).
    Assignment itself is the broadcast-k Lloyd chain of
    :func:`kmeans_assign`; the dedup verdict never moves raw vectors
    through more than one shuffle. Cosine and d2 are left-to-right
    double folds, bit-identical to the DuckDB oracle's ``list_reduce``
    / ``list_cosine_similarity``, so the threshold and precedence
    comparisons agree across engines exactly. The 0.4 default is tuned
    to the synthetic fixture corpus (isotropic vectors: max pairwise
    cosine ~0.51, no planted duplicates); real embedding corpora run
    this at ~0.95+.
    """
    assigned = kmeans_assign(
        embeddings, k=k, iterations=iterations, stride=stride
    ).persist()
    x, y = assigned.alias("x"), assigned.alias("y")
    precedence = (F.col("y.d2") > F.col("x.d2")) | (
        (F.col("y.d2") == F.col("x.d2")) & (F.col("y.vec_id") < F.col("x.vec_id"))
    )
    dropped = (
        x.join(
            y,
            (F.col("x.cid") == F.col("y.cid"))
            & (F.col("x.vec_id") != F.col("y.vec_id"))
            & precedence
            & (cosine(F.col("x.v"), F.col("y.v")) >= F.lit(threshold)),
            "left_semi",
        )
        .select(F.col("x.vec_id").alias("vec_id"))
        .withColumn("is_dropped", F.lit(1).cast("bigint"))
    )
    return (
        assigned.join(dropped, "vec_id", "left")
        .groupBy("cid")
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum(F.coalesce(F.col("is_dropped"), F.lit(0).cast("bigint"))).alias(
                "n_dropped"
            ),
        )
        .select(
            F.col("cid").alias("cluster_id"),
            "n_vectors",
            "n_dropped",
            (F.col("n_vectors") - F.col("n_dropped")).alias("n_kept"),
        )
    )


def pq_encode(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 8,
    iterations: int = 2,
    stride: int = 7,
    dim: int = 64,
) -> DataFrame:
    """(vec_id, codes, q_error): Product Quantization encoding — the
    compression half of the IVF-PQ index family (Jégou et al. 2011,
    "Product Quantization for Nearest Neighbor Search"), completing the
    repo's ANN scale path (exact → LSH → IVF → PQ codes).

    The vector splits into ``m`` contiguous subspaces of ``dim/m``
    dimensions; each subspace trains its own ``k``-codeword codebook
    with the shared fixed-iteration Lloyd chain (:func:`kmeans_assign`
    over the sliced vectors — broadcast codebooks, no driver collect);
    a vector's code is its per-subspace nearest-codeword id and its
    quantization error is the decimal-summed squared-L2 residual across
    subspaces. A 64-dim float vector (256 B) compresses to m=4 byte
    codes — the 64× shrink that lets a 100 TB corpus's index live in
    executor memory while the ADC distance table (k*m entries per
    query) reconstructs approximate distances.

    Scale shape: the ``m`` Lloyd chains are independent narrow scans of
    the same source (re-read per subspace, never cross-joined); the
    final code assembly is ONE hash aggregate on vec_id over the
    m-tagged union — codes never ride a window sort.
    """
    width = dim // m
    parts = []
    for s in range(m):
        sub = embeddings.select(
            "vec_id", F.slice("embedding", s * width + 1, width).alias("embedding")
        )
        a = kmeans_assign(sub, k=k, iterations=iterations, stride=stride)
        parts.append(
            a.select(
                "vec_id",
                F.lit(s).cast("bigint").alias("subspace"),
                "cid",
                "d2",
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("subspace", "cid"))),
            lambda st: st["cid"],
        ).alias("codes"),
        F.round(F.sum(F.col("d2").cast("decimal(27,10)")), 4)
        .cast("double")
        .alias("q_error"),
    )


def pq_topk(
    embeddings: DataFrame,
    m: int = 4,
    k_codes: int = 8,
    iterations: int = 2,
    stride: int = 7,
    dim: int = 64,
    num_queries: int = 16,
    k: int = 10,
) -> DataFrame:
    """(q_id, n_id, adc_d2, rank): PQ search by Asymmetric Distance
    Computation — approximate squared-L2 top-``k`` per query, where a
    corpus vector's distance is looked up from its codes, never from
    the vector itself (Jégou et al. 2011, the query half of IVF-PQ).

    Per subspace, the query is compared against the k_codes-row
    codebook once (the ADC distance table: |Q|·k_codes·m rows, tiny);
    a corpus vector's approximate distance is the sum of its m table
    entries. This is why PQ scales: after encoding, a 100 TB corpus
    scan touches only (vec_id, subspace, code) triples joined against
    a BROADCAST distance table — the raw vectors never participate.

    Determinism: each per-subspace d2 is the standard left-to-right
    double fold (bit-exact cross-engine); the cross-subspace sum
    accumulates in DECIMAL (associative — micro-partitioning cannot
    reorder it into a different double); ranks tie-break by neighbor
    id. Self-matches are excluded like cosine_topk.
    """
    width = dim // m
    queries = embeddings.filter(F.col("vec_id") < num_queries)
    code_parts, dt_parts = [], []
    d2q = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    for s in range(m):
        sub = embeddings.select(
            "vec_id", F.slice("embedding", s * width + 1, width).alias("embedding")
        )
        assigned, cent = lloyd_chain(
            sub, k=k_codes, iterations=iterations, stride=stride
        )
        code_parts.append(
            assigned.select(
                "vec_id", F.lit(s).cast("bigint").alias("subspace"), "cid"
            )
        )
        qs = queries.select(
            F.col("vec_id").alias("q_id"),
            to_double(
                F.slice("embedding", s * width + 1, width)
            ).alias("qv"),
        )
        dt_parts.append(
            qs.crossJoin(cent)
            .select(
                "q_id",
                F.lit(s).cast("bigint").alias("subspace"),
                "cid",
                d2q.alias("d2"),
            )
        )
    codes = code_parts[0]
    for p in code_parts[1:]:
        codes = codes.unionByName(p)
    dtable = dt_parts[0]
    for p in dt_parts[1:]:
        dtable = dtable.unionByName(p)
    adc = (
        codes.join(F.broadcast(dtable), ["subspace", "cid"])
        .filter(F.col("q_id") != F.col("vec_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum(F.col("d2").cast("decimal(27,10)")).alias("adc_dec"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc_dec"), F.col("vec_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            F.round(F.col("adc_dec"), 4).cast("double").alias("adc_d2"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )
