"""Simulates the spark-graft driver: vanilla session, sf0.01 oracle check.

Canonicalization is driver-faithful: BOTH results go through pandas
(Spark via toPandas(), DuckDB via .df()), columns are sorted by name,
rows are sorted via DataFrame.sort_values over all columns, and the hash
is taken over per-cell repr of the pandas values. This reproduces the
two failure classes the old str(tuple) comparator masked:
  * list cells  -> sort_values raises TypeError (driver records err)
  * dtype skew  -> DuckDB HUGEINT (SUM over BIGINT) becomes float64 in
    pandas, so "123.0" hashes differently from Spark's int64 "123"
    even though the values are numerically equal.

Usage: drive_driver.py [start_idx] [end_idx]
"""
import sys, hashlib, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]").appName("driver-sim")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e

import duckdb
import pandas as pd
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs, os_ = e.queries(), e.oracle_sql()
names = list(qs)
run_entry = True
if len(sys.argv) > 1 and not sys.argv[1].isdigit():
    names, run_entry = [n for n in names if n in sys.argv[1:]], False
    lo, hi = 0, len(names)
else:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else len(names)
if lo == 0 and run_entry:
    df = e.entry(spark)
    rows = df.collect()
    print(f"entry(): {len(rows)} rows, schema={df.columns}")

def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

import datetime as _dt

def _cell(v) -> str:
    # timestamps stringify to ISO on both engines regardless of ns/us unit;
    # Spark DATE collects as datetime.date while DuckDB DATE becomes
    # datetime64 midnight — normalize both to the same ISO instant (the
    # real driver was green on q_date_funcs in r3, so it tolerates this).
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, _dt.datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat() + "T00:00:00"
    if v is None or (isinstance(v, float) and v != v):
        return "<NA>"
    return repr(v)

def _hash(df: pd.DataFrame) -> str:
    body = "\n".join(
        ",".join(_cell(v) for v in row) for row in df.itertuples(index=False)
    )
    return hashlib.md5(body.encode()).hexdigest()[:10]

def _first_diff(s: pd.DataFrame, o: pd.DataFrame):
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if _cell(a) != _cell(b):
                return f"col {c} row {i}: spark={_cell(a)} ({s[c].dtype}) oracle={_cell(b)} ({o[c].dtype})"
    return "no cell diff (dtype/row-count only)"

ok = True
for name in names[lo:hi]:
    t0 = time.perf_counter()
    sdf = qs[name](spark, SF)
    if name not in os_:
        # Driver-faithful weak check: the real driver pulls rows-only
        # results through the same pandas canonicalizer before recording
        # the row count, so an unhashable cell type (list/map/struct)
        # crashes there — reproduce that here instead of a bare count()
        # (round 4's q_multimodal_decode burned a driver slot on exactly
        # this; the old sim's count() path couldn't see it).
        try:
            spdf = sdf.toPandas()
            s = _canon(spdf)
            hs = _hash(s)
        except Exception as ex:
            ok = False
            print(f"{name}: ERROR in weak check {type(ex).__name__}: {str(ex)[:160]}", flush=True)
            continue
        print(f"{name}: rows-only, {len(spdf)} rows, weak-hash {hs} [{time.perf_counter()-t0:.1f}s]", flush=True); continue
    try:
        spdf = sdf.toPandas()
        opdf = con.execute(os_[name]).df()
        s, o = _canon(spdf), _canon(opdf)
    except Exception as ex:
        ok = False
        print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:160]}", flush=True)
        continue
    hs, ho = _hash(s), _hash(o)
    match = (hs == ho and sorted(spdf.columns) == sorted(opdf.columns)
             and len(spdf) == len(opdf))
    ok &= match
    extra = "" if match else f"  !! {_first_diff(s, o) if len(s)==len(o) and list(s.columns)==list(o.columns) else 'rows/cols differ'}"
    print(f"{name}: {len(spdf)} rows, HASH-{'MATCH' if match else 'MISMATCH'} {hs}/{ho} [{time.perf_counter()-t0:.1f}s]{extra}", flush=True)
print(f"CHUNK[{lo}:{hi}] " + ("ALL MATCH" if ok else "FAILURES PRESENT"))
