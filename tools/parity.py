"""Local oracle-differential harness — mimics the driver's t2 check.

Runs every query in the registry at a given sf dir on Spark AND its
DuckDB oracle, then compares row count, column names, and
order-insensitive values. Usage:

    python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")


def compare(name: str, spark_df, duck_rows, duck_cols) -> list[str]:
    errors: list[str] = []
    spark_cols = sorted(spark_df.columns)
    if spark_cols != sorted(duck_cols):
        errors.append(f"schema: spark={spark_cols} duck={sorted(duck_cols)}")
        return errors

    s_rows = [tuple(row[c] for c in spark_cols) for row in spark_df.collect()]
    idx = [duck_cols.index(c) for c in spark_cols]
    d_rows = [tuple(r[i] for i in idx) for r in duck_rows]
    if len(s_rows) != len(d_rows):
        errors.append(f"rowcount: spark={len(s_rows)} duck={len(d_rows)}")
        return errors

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, 6)
        if hasattr(v, "isoformat"):
            return v.isoformat().replace("+00:00", "")
        return v

    s_sorted = sorted(map(str, [tuple(norm(v) for v in r) for r in s_rows]))
    d_sorted = sorted(map(str, [tuple(norm(v) for v in r) for r in d_rows]))
    mismatches = [
        (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
    ]
    if mismatches:
        errors.append(f"values: {len(mismatches)} mismatched rows")
        for a, b in mismatches[:3]:
            errors.append(f"  spark={a}")
            errors.append(f"  duck ={b}")
    return errors


def main() -> int:
    import duckdb

    from flight_events_flink_job_spark.plans import ORACLES, QUERIES
    from flight_events_flink_job_spark.schemas import FIXTURE_TABLES
    from flight_events_flink_job_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("parity")
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failed = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        if name not in ORACLES:
            n = QUERIES[name](spark, sf_dir).count()
            print(f"{name:32s} rows-only: {n} rows")
            continue
        sdf = fn(spark, sf_dir)
        rel = con.sql(ORACLES[name])
        errors = compare(name, sdf, rel.fetchall(), list(rel.columns))
        status = "OK" if not errors else "FAIL"
        print(f"{name:32s} {status}")
        for e in errors:
            print(f"    {e}")
        if errors:
            failed.append(name)

    print(f"\n{'ALL OK' if not failed else 'FAILED: ' + ', '.join(failed)}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
