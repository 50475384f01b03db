"""Per-increment cost soak for KEYED incremental near-dedup (round-8
VERDICT item 6): incremental_neardup was the r8 addition with the least
scale evidence — it recomputes signatures/shingles over the UNION per
call, so its per-increment cost grows with the ingested corpus. The
100 TB shape its docstring promises persists the index side's banded
signatures and shingle sets BUCKETED on their join keys
(operators/dedup.incremental_neardup_keyed); this soak measures that
operator the way incremental_dedup_keyed was soaked in round 8:

- ``n_increments`` equal doc_id-range batches of a scalegen corpus;
- index seeded with batch 0 as two bucketed catalog tables
  (bands BUCKETED(32, band, band_hash); sets BUCKETED(32, doc_id));
- per increment, time ONE call of incremental_neardup_keyed against
  the current index, then append the increment's own bands/sets
  (untimed bookkeeping, exactly like ingest would);
- assert per increment from the executed plan: BOTH index scans are
  bucketed reads (SelectedBucketsCount present twice) and the
  exchange count equals the first timed increment's (the plan shape
  must not change as the index grows — no index-side re-shuffle can
  appear);
- PASS = last-quarter median wall <= 2x first-quarter median (the
  same flatness bar as incremental_dedup_soak).

``--audit`` additionally re-runs every increment through the
recompute-everything operator (incremental_neardup over the
accumulated corpus) and asserts ADMISSION EQUALITY — the keyed
variant's LSH-only cross tier must admit exactly the same documents
(timings from an audit run are contaminated by the heavy audit jobs;
use the default mode's JSON for the cost series).

Usage: python tools/incremental_neardup_soak.py [n_increments] [sf] [--audit]
Prints one JSON line; committed as bench/incremental_neardup_soak_r9.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    os.environ["TZ"] = "UTC"
    time.tzset()
    args = [a for a in sys.argv[1:] if a != "--audit"]
    audit = "--audit" in sys.argv
    n_inc = int(args[0]) if len(args) > 0 else 20
    sf = float(args[1]) if len(args) > 1 else 1.0

    from pyspark.sql import functions as F

    from flight_events_flink_job_spark.operators.dedup import (
        banded_signatures,
        incremental_neardup,
        incremental_neardup_keyed,
        minhash_signatures,
        shingle_sets,
    )
    from flight_events_flink_job_spark.session import get_spark
    from flight_events_flink_job_spark.sources.fixtures import load_table
    from flight_events_flink_job_spark.sources.scalegen import gen_scale_tables

    spark = get_spark("incremental_neardup_soak")
    spark.sparkContext.setLogLevel("ERROR")
    # the realistic big-index plan: the index side must never broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sf_dir = f"/tmp/scalefix_r6/sf{sf}"
    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        gen_scale_tables(spark, sf_dir, sf, tables=["documents"])
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    step = n_docs // n_inc

    bands_tbl, sets_tbl = "inc_neardup_bands", "inc_neardup_sets"
    work = f"/tmp/inc_neardup_soak_{os.getpid()}"

    def write_index(df, table, path, keys, mode):
        (
            df.write.format("parquet")
            .mode(mode)
            .option("path", path)
            .bucketBy(32, *keys)
            .sortBy(*keys)
            .saveAsTable(table)
        )

    for t in (bands_tbl, sets_tbl):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    first = docs.filter(F.col("doc_id") < step)
    write_index(
        banded_signatures(minhash_signatures(first)),
        bands_tbl, f"{work}/bands", ["band", "band_hash"], "overwrite",
    )
    write_index(
        shingle_sets(first), sets_tbl, f"{work}/sets", ["doc_id"], "overwrite",
    )

    series = []
    pinned_exchanges = None
    for i in range(1, n_inc):
        lo, hi = i * step, (i + 1) * step
        batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        t0 = time.perf_counter()
        admitted = incremental_neardup_keyed(
            spark.table(bands_tbl), spark.table(sets_tbl), batch
        )
        n_admitted = admitted.count()
        wall = time.perf_counter() - t0

        plan = admitted._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        n_bucketed = final.count("SelectedBucketsCount")
        n_ex = final.count("Exchange hashpartitioning")
        assert n_bucketed >= 2, (
            f"inc {i}: expected both index scans bucketed, got "
            f"{n_bucketed}\n{final}"
        )
        if pinned_exchanges is None:
            pinned_exchanges = n_ex
        assert n_ex == pinned_exchanges, (
            f"inc {i}: exchange count drifted {pinned_exchanges} -> "
            f"{n_ex} as the index grew\n{final}"
        )
        if i == 10:
            print("# PLAN SNAPSHOT (increment 10):\n" + final, file=sys.stderr)

        row = {
            "increment": i,
            "batch_rows": step,
            "admitted": n_admitted,
            "wall_s": round(wall, 2),
        }
        if audit:
            generic = incremental_neardup(
                docs.filter(F.col("doc_id") < lo), batch
            )
            a = {r.doc_id for r in admitted.select("doc_id").collect()}
            g = {r.doc_id for r in generic.select("doc_id").collect()}
            row["matches_generic"] = a == g
            assert a == g, (
                f"inc {i}: keyed admissions diverge from generic "
                f"(keyed-only={sorted(a - g)[:5]}, "
                f"generic-only={sorted(g - a)[:5]})"
            )
        # untimed bookkeeping: ingest the increment into the index
        write_index(
            banded_signatures(minhash_signatures(batch)),
            bands_tbl, f"{work}/bands", ["band", "band_hash"], "append",
        )
        write_index(
            shingle_sets(batch), sets_tbl, f"{work}/sets", ["doc_id"],
            "append",
        )
        series.append(row)
        print(f"# inc {i}: {wall:.2f}s admitted={n_admitted}", file=sys.stderr)

    walls = [s["wall_s"] for s in series]
    q = max(len(walls) // 4, 1)
    head = sorted(walls[:q])[q // 2]
    tail = sorted(walls[-q:])[q // 2]
    out = {
        "soak": "incremental_neardup_keyed",
        "sf": sf,
        "n_increments": len(series),
        "index": "bands BUCKETED(32, band, band_hash) + sets "
        "BUCKETED(32, doc_id) catalog tables, broadcast disabled; "
        "bucketed scans + stable exchange count asserted per increment",
        "rows_per_increment": step,
        "exchanges_per_call": pinned_exchanges,
        "median_wall_first_quarter_s": head,
        "median_wall_last_quarter_s": tail,
        "flat": tail <= 2.0 * head,
        "audited_equal_to_generic": audit and all(
            s.get("matches_generic") for s in series
        ),
        "series": series,
    }
    print(json.dumps(out))
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return 0 if out["flat"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
