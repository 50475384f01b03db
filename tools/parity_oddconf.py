"""Full parity sweep under adversarial execution conf: 5 cores, 7
shuffle partitions, AQE OFF — catches partition-count- or
AQE-dependent nondeterminism the default local[32] sweep can't see."""
import os, sys, time
os.environ["TZ"]="UTC"; time.tzset()
sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession
from flight_events_flink_job_spark.protobuf_compat import ensure_protobuf
ensure_protobuf()
spark = (SparkSession.builder.master("local[5]")
    .config("spark.sql.shuffle.partitions", "7")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from flight_events_flink_job_spark.plans import ORACLES, QUERIES
from flight_events_flink_job_spark.schemas import FIXTURE_TABLES
from flight_events_flink_job_spark.sources.fixtures import (
    EMBEDDINGS_VIEW_SQL, EVENTS_VIEW_SQL)
import hashlib
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
special = {"events": EVENTS_VIEW_SQL, "embeddings": EMBEDDINGS_VIEW_SQL}
for t in FIXTURE_TABLES:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        body = special.get(t, "SELECT * FROM read_parquet('{path}')")
        con.execute(f"CREATE OR REPLACE VIEW {t} AS {body.format(path=p)}")

def canon(df):
    df = df[sorted(df.columns)]
    rows = sorted("\x1f".join(str(v) for v in r) for r in df.itertuples(index=False, name=None))
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest(), len(df)

bad = []
for i, (name, fn) in enumerate(QUERIES.items()):
    try:
        sp = fn(spark, sf).toPandas()
        oc = con.execute(ORACLES[name]).df()
        h1, r1 = canon(sp); h2, r2 = canon(oc)
        ok = h1 == h2 and r1 == r2 and sorted(sp.columns) == sorted(oc.columns)
        print(f"{i+1:3d} {name:35s} {'OK' if ok else 'FAIL'} rows={r1}/{r2}", flush=True)
        if not ok: bad.append(name)
    except Exception as e:
        print(f"{i+1:3d} {name:35s} ERR {type(e).__name__}: {str(e)[:160]}", flush=True)
        bad.append(name)
print("BAD:", bad)
sys.exit(1 if bad else 0)
