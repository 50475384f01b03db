"""Local mirror of the driver's t2 gate: every registered query with an
oracle must match DuckDB on row count, schema, and values."""

from __future__ import annotations

import duckdb
import pytest

from flight_events_flink_job_spark.plans import ORACLES, QUERIES
from flight_events_flink_job_spark.schemas import FIXTURE_TABLES

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from parity import compare  # noqa: E402


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")
    return con


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check (driver does the same)
        return
    rel = duck.sql(ORACLES[name])
    errors = compare(name, df, rel)
    assert not errors, f"{name}: {errors}"
