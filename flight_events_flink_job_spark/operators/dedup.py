"""Deduplication operators over the ``documents`` table.

The reference engine has no dedup surface (SURVEY.md §2.5 — its whole
operator set is the flight-event stream job, FlightEventAggregator.java);
these are the extension operators a 100 TB training-data pipeline needs
(SURVEY.md §2.6). Every variant is built bucket-first: candidate pairs
come from an equi-join on a bucket key (band hash, prefix token, sign
bucket), NEVER from an all-pairs cross join — the plan must contain no
CartesianProduct at any scale.

Scale notes (100 TB):
- Signatures/fingerprints are narrow per-row expressions (no shuffle).
- Candidate generation shuffles on the bucket key only; bucket sizes are
  bounded by LSH banding / prefix rarity, so the join stays sparse.
- Verification joins the (small) candidate-pair set back to per-doc
  state — two hash joins keyed by doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textual import jaccard, token_set_key, word_shingles
from ..functions.vectors import cosine, sign_bucket, to_double
from .util import spread

LONG_MAX = (1 << 63) - 1


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact dedup on the canonical bag-of-words key, keeping the lowest
    doc_id per group (deterministic representative).

    ``dropDuplicates(["text"])`` is the trivial byte-exact variant; this
    normalizes to sorted distinct tokens first so reordered/repeated-word
    copies collapse too. One shuffle (window partition by key); at scale
    this is the plain hash-partitioned first-row-per-key pattern.
    """
    w = Window.partitionBy("key")
    return (
        docs.withColumn("key", token_set_key(F.col("text")))
        .withColumn("rn", F.row_number().over(w.orderBy("doc_id")))
        .withColumn("n_members", F.count("*").over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars", "n_members")
    )


# ---------------------------------------------------------------------------
# MinHash + banded LSH near-dup
# ---------------------------------------------------------------------------

def shingle_sets(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingles) with distinct word n-gram shingles."""
    return spread(docs).select(
        "doc_id", word_shingles(F.col("text"), n).alias("shingles")
    ).filter(F.size("shingles") > 0)


def minhash_signatures(docs: DataFrame, num_hashes: int = 64, n: int = 3) -> DataFrame:
    """(doc_id, sig ARRAY<BIGINT>[num_hashes]) MinHash signatures.

    sig[i] = min over shingles of xxhash64(shingle, i) — computed as one
    narrow fold over the shingle array (aggregate+zip_with), no explode,
    no shuffle. xxhash64 is Spark's deterministic 64-bit hash.
    """
    def per_shingle(s):
        return F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda i: F.xxhash64(s, i),
        )

    sig = F.aggregate(
        F.col("shingles"),
        F.array_repeat(F.lit(LONG_MAX), num_hashes),
        lambda acc, s: F.zip_with(acc, per_shingle(s), lambda a, b: F.least(a, b)),
    )
    return shingle_sets(docs, n).select("doc_id", sig.alias("sig"))


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 16) -> DataFrame:
    """Banded LSH: signature split into ``bands`` bands, docs sharing any
    band hash become a candidate pair.

    Shuffle key = (band index, band hash): the classic sparse LSH
    self-join. With b=16, r=4 the capture probability at jaccard j is
    1-(1-j^4)^16 (≈0.9998 at j=0.8) — tune bands/rows per threshold.
    """
    # Materialization barrier: without it Catalyst inlines the (expensive
    # O(shingles x hashes) fold) `sig` alias into every per-band slice,
    # recomputing the signature `bands` times per row. The exchange also
    # spreads the fold across cores when the input is a single split.
    sigs = sigs.repartition(F.col("doc_id"))
    rows = F.size(F.col("sig")) / bands
    band_hashes = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda j: F.xxhash64(F.slice(F.col("sig"), (j * rows + 1).cast("int"), rows.cast("int"))),
    )
    banded = sigs.select(
        "doc_id", F.posexplode(band_hashes).alias("band", "band_hash")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band", "band_hash"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def verify_jaccard(pairs: DataFrame, shingles: DataFrame, threshold: float) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs (two doc_id joins)."""
    sa = shingles.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa")
    )
    sb = shingles.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(jaccard(F.col("sa"), F.col("sb")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def dedup_near_minhash(
    docs: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by MinHash+LSH candidates, exact-verified.

    Output: (doc_a, doc_b, jaccard) for verified pairs with trigram-set
    Jaccard >= threshold. The oracle is the exact all-pairs computation
    (feasible at oracle scale); LSH parameters are sized so capture
    probability at the threshold is ~1, making the approximate plan
    exact on the fixture distribution (near-dups cluster at j>=0.85,
    background mass at j~0).
    """
    sh = shingle_sets(docs, n)
    cands = lsh_candidate_pairs(minhash_signatures(docs, num_hashes, n), bands)
    return verify_jaccard(cands, sh, threshold)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard join via prefix filtering (AllPairs-style)
# ---------------------------------------------------------------------------

def prefix_filter_pairs(shingles: DataFrame, threshold: float) -> DataFrame:
    """COMPLETE candidate pairs for Jaccard >= threshold via prefix
    filtering (Bayardo et al., WWW'07 "Scaling Up All Pairs Similarity
    Search").

    Shingles are globally ordered by (document frequency, value); each
    doc exposes only its first ``|S| - ceil(t*|S|) + 1`` shingles (the
    prefix). Any pair with J >= t must share a prefix shingle, so the
    equi-join on prefix shingles loses nothing while joining only on the
    rarest tokens — this is what keeps the join sparse at scale.
    """
    exploded = shingles.select("doc_id", F.explode("shingles").alias("shingle"))
    freq = exploded.groupBy("shingle").agg(F.count("*").alias("df"))
    prefix_len = (
        F.col("set_size")
        - F.ceil(F.lit(threshold) * F.col("set_size")).cast("int")
        + 1
    )
    ordered = (
        exploded.join(freq, "shingle")
        .withColumn("set_size", F.count("*").over(Window.partitionBy("doc_id")))
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "shingle")
            ),
        )
        .filter(F.col("pos") <= prefix_len)
        .select("doc_id", "shingle")
    )
    a, b = ordered.alias("a"), ordered.alias("b")
    return (
        a.join(b, "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def dedup_ngram_jaccard(
    docs: DataFrame, threshold: float = 0.7, n: int = 3
) -> DataFrame:
    """EXACT all-pairs n-gram Jaccard join: complete candidates from
    prefix filtering + exact verification. Same output contract as
    :func:`dedup_near_minhash` but deterministic-complete by theorem,
    hence always oracle-exact at any threshold.
    """
    sh = shingle_sets(docs, n)
    return verify_jaccard(prefix_filter_pairs(sh, threshold), sh, threshold)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

# NOTE: references `counters` exactly ONCE. A formulation that indexes
# `counters` inside the fold lambda (element_at(counters, j+1) per
# iteration) gets the counters alias inlined by Catalyst and recomputes
# the full O(tokens x 64) counters fold on EVERY one of the 64
# iterations — observed 64x slowdown (minutes -> seconds at sf0.1).
_SIMHASH = """
aggregate(
  zip_with(counters, sequence(0, 63),
           (c, j) -> IF(c > 0, shiftleft(1L, j), 0L)),
  0L,
  (acc, b) -> acc | b
)
"""

_COUNTERS = """
aggregate(
  transform(array_distinct(split(text, ' ')), t -> xxhash64(t)),
  array_repeat(0L, 64),
  (acc, h) -> zip_with(
      acc,
      transform(sequence(0, 63), j -> IF(((h >> j) & 1) = 1, 1L, -1L)),
      (a, b) -> a + b)
)
"""


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash BIGINT): 64-bit SimHash over the token set.

    Bit j of the fingerprint is the sign of the sum over tokens of
    ±1 according to bit j of xxhash64(token) — Charikar's scheme with
    unit weights, folded entirely in Catalyst expressions.
    """
    return spread(docs).select(
        "doc_id",
        F.expr(_COUNTERS).alias("counters"),
    ).select("doc_id", F.expr(_SIMHASH).alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    COMPLETE via the pigeonhole block trick: the 64-bit fingerprint is
    split into ``max_hamming + 1`` blocks; any pair within the Hamming
    radius must agree exactly on at least one block, so candidates come
    from an equi-join on (block index, block value) — no cross join.
    """
    blocks = max_hamming + 1
    width = 64 // blocks
    block_vals = F.array(
        *[
            F.shiftright(F.col("simhash"), j * width).bitwiseAND(
                F.lit((1 << width) - 1)
            )
            for j in range(blocks)
        ]
    )
    # Barrier: materialize the fingerprint once per doc (see
    # lsh_candidate_pairs) instead of letting the simhash fold inline
    # into all `blocks` block-value expressions and the join keys.
    fp = simhash_fingerprints(docs).repartition(F.col("doc_id"))
    banded = fp.select(
        "doc_id", "simhash", F.posexplode(block_vals).alias("block", "block_val")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["block", "block_val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (bucketed)
# ---------------------------------------------------------------------------

def embedding_neardup_cosine(
    embeddings: DataFrame, threshold: float = 0.4, sign_bits: int = 4
) -> DataFrame:
    """Near-dup vector pairs within coordinate-sign LSH buckets.

    Semantics (and the oracle mirrors this exactly): pairs whose first
    ``sign_bits`` coordinate signs agree AND cosine >= threshold. The
    sign bucket is the deterministic stand-in for random-hyperplane LSH
    (same plan shape: bucket equi-join then verify); production recall
    tuning swaps the bucket function, not the topology.
    """
    e = embeddings.select(
        "vec_id",
        to_double(F.col("embedding")).alias("vec"),
        sign_bucket(F.col("embedding"), sign_bits).alias("bucket"),
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, "bucket")
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
