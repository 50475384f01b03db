"""Round-12 optimization internals: the perf changes must be
value-invisible (every registered query is also oracle-checked by
tools/parity.py, but these pins catch regressions at unit scale).

Covered here:
- util.spread_by (keyed spread) preserves rows and pins >= 2x
  defaultParallelism partitions;
- util.spread's stats-based gate still spreads non-file-backed frames
  (unknown-size sentinel falls back to the RDD gate, round-12 fix for
  the Long.MaxValue default estimate);
- the `exploded=` prelude-sharing parameter on shingle_sets /
  minhash_signatures / linear_candidate_pairs yields exactly the
  frames the derive-it-yourself path produces;
- user_triangles' pinned co-occurrence repartition picks a partition
  count different from spark.sql.shuffle.partitions (the elision guard
  — equal counts let Catalyst drop the repartition as redundant on the
  capped path, handing the quadratic expansion back to an
  AQE-coalesced single task).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flight_events_flink_job_spark.operators.dedup import (
    exploded_shingles,
    linear_candidate_pairs,
    minhash_signatures,
    shingle_sets,
)
from flight_events_flink_job_spark.operators.util import spread, spread_by

DOCS = [
    (0, "spark scan filter join spark scan filter", "en", "s0", 1),
    (1, "join filter scan spark scan filter join", "en", "s1", 2),
    (2, "a b c d e f g h i j k l", "en", "s2", 3),
    (3, "a b c d e f g h i j k m", "en", "s3", 4),
    (4, "totally different content here now indeed", "en", "s4", 5),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        DOCS, ["doc_id", "text", "lang", "source", "n_chars"]
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_spread_by_preserves_rows_and_pins_parallelism(spark, docs):
    out = spread_by(docs, "doc_id")
    assert _rows(out) == _rows(docs)
    assert (
        out.rdd.getNumPartitions()
        >= 2 * spark.sparkContext.defaultParallelism
    )


def test_spread_falls_back_for_unknown_size_frames(spark):
    # createDataFrame plans carry the unknown-size sentinel
    # (spark.sql.defaultSizeInBytes = Long.MaxValue): the stats gate
    # must fall back to the RDD gate instead of treating the frame as
    # huge and silently skipping the spread.
    few = spark.createDataFrame([(i,) for i in range(10)], ["x"]).coalesce(1)
    out = spread(few)
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    assert sorted(r.x for r in out.collect()) == list(range(10))


def test_shared_exploded_prelude_is_value_identical(docs):
    exploded = exploded_shingles(docs, 3)
    assert _rows(shingle_sets(docs, 3, exploded=exploded).select("doc_id")) == _rows(
        shingle_sets(docs, 3).select("doc_id")
    )
    # full set equality per doc (array order unspecified -> sort)
    a = {
        r.doc_id: sorted(r.shingles)
        for r in shingle_sets(docs, 3, exploded=exploded).collect()
    }
    b = {r.doc_id: sorted(r.shingles) for r in shingle_sets(docs, 3).collect()}
    assert a == b
    assert _rows(minhash_signatures(docs, 16, 3, exploded=exploded)) == _rows(
        minhash_signatures(docs, 16, 3)
    )
    assert _rows(
        linear_candidate_pairs(docs, 0.7, 3, exploded=exploded)
    ) == _rows(linear_candidate_pairs(docs, 0.7, 3))


def test_triangle_repartition_elision_guard(spark):
    # The operator pins 2x defaultParallelism and bumps by one when
    # that collides with spark.sql.shuffle.partitions; replicate the
    # arithmetic against the live session so a conf change that
    # re-enables the elision fails loudly here.
    dp = spark.sparkContext.defaultParallelism
    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    par = 2 * dp
    if par == shuffle:
        par += 1
    assert par != shuffle
