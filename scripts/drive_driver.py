"""Simulates the spark-graft driver: vanilla session, sf0.01 oracle check.
Usage: drive_driver.py [start_idx] [end_idx]"""
import sys, hashlib, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]").appName("driver-sim")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e

import duckdb
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs, os_ = e.queries(), e.oracle_sql()
names = list(qs)
lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
hi = int(sys.argv[2]) if len(sys.argv) > 2 else len(names)
if lo == 0:
    df = e.entry(spark)
    rows = df.collect()
    print(f"entry(): {len(rows)} rows, schema={df.columns}")

def norm(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted([tuple(str(r[i]) for i in idx) for r in rows])
ok = True
for name in names[lo:hi]:
    t0 = time.perf_counter()
    sdf = qs[name](spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in os_:
        print(f"{name}: rows-only, {len(srows)} rows [{time.perf_counter()-t0:.1f}s]", flush=True); continue
    rel = con.execute(os_[name]); ocols=[d[0] for d in rel.description]; orows=rel.fetchall()
    s, o = norm(srows, sdf.columns), norm(orows, ocols)
    match = s == o and sorted(sdf.columns) == sorted(ocols) and len(srows) == len(orows)
    ok &= match
    h = hashlib.md5(str(s).encode()).hexdigest()[:10]
    print(f"{name}: {len(srows)} rows, HASH-{'MATCH' if match else 'MISMATCH'} {h} [{time.perf_counter()-t0:.1f}s]", flush=True)
print(f"CHUNK[{lo}:{hi}] " + ("ALL MATCH" if ok else "FAILURES PRESENT"))
