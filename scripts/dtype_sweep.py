"""Sweep every oracle-paired query for pandas-dtype class mismatches
between the Spark result schema and the DuckDB oracle result schema.

Why this exists: the external driver canonicalizes BOTH results through
pandas before hashing. DuckDB returns HUGEINT for SUM(BIGINT) (agg and
window), which pandas renders as float64 — so a Spark int64 column and a
numerically-identical DuckDB column stringify differently ("123" vs
"123.0") and the driver records hash_match=false even though every value
matches. This is exactly what sank q_token_count / q_pack_sequences in
rounds 2 and 3. The fix is CAST(SUM(...) AS BIGINT) in the oracle; this
sweep finds every such site without executing the queries (oracle runs
under LIMIT 0, Spark plans are never executed).

Usage: python scripts/dtype_sweep.py
"""
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession, types as T

SF = "/root/testdata/sf0.01"


def spark_class(dt) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "datetime"
    if isinstance(dt, T.ArrayType):
        return "list"
    return type(dt).__name__


def pandas_class(dtype, series=None) -> str:
    k = dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "M":
        return "datetime"
    if k == "b":
        return "bool"
    return "obj"  # strings, decimals, lists all land here under LIMIT 0


def main() -> int:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("dtype-sweep")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )

    qs, os_ = e.queries(), e.oracle_sql()
    flagged = []
    for name in qs:
        try:
            sdf = qs[name](spark, SF)
            sclasses = {f.name: spark_class(f.dataType) for f in sdf.schema.fields}
        except Exception as ex:  # noqa: BLE001
            flagged.append((name, f"SPARK BUILD ERROR: {ex}"))
            continue
        if name not in os_:
            # rows-only entries still go through the driver's pandas
            # canonicalizer (weak check) — list/map/struct cells crash its
            # sort_values (round 4's q_multimodal_decode), so flag them
            # here before they burn a driver slot.
            for c, sc in sclasses.items():
                if sc in ("list", "decimal") or sc.endswith("Type"):
                    flagged.append(
                        (name, f"{c}: rows-only but spark-side {sc} "
                               "(driver weak-check canonicalizer cannot hash)")
                    )
            continue
        try:
            odf = con.execute(
                f"SELECT * FROM ({os_[name]}) __q LIMIT 0"
            ).df()
        except Exception as ex:  # noqa: BLE001
            flagged.append((name, f"ORACLE ERROR: {str(ex)[:200]}"))
            continue
        oclasses = {c: pandas_class(odf[c].dtype) for c in odf.columns}
        if set(sclasses) != set(oclasses):
            flagged.append(
                (name, f"COLUMN SET: spark={sorted(sclasses)} oracle={sorted(oclasses)}")
            )
            continue
        for c in sclasses:
            sc, oc = sclasses[c], oclasses[c]
            # obj on the oracle side is fine for str/list/decimal; the
            # dangerous class is numeric-kind disagreement (int vs float)
            # because the stringified values differ ("123" vs "123.0").
            if {sc, oc} == {"int", "float"}:
                flagged.append((name, f"{c}: spark={sc} oracle={oc}  <-- HASH BREAKER"))
            elif sc in ("int", "float", "datetime", "bool") and oc not in (sc, "obj"):
                flagged.append((name, f"{c}: spark={sc} oracle={oc}"))
            elif sc in ("list", "decimal"):
                flagged.append((name, f"{c}: spark-side {sc} (driver canonicalizer cannot hash)"))
    for name, msg in flagged:
        print(f"{name}: {msg}")
    print(f"\n{len(flagged)} flags across {len(os_)} oracle-paired queries")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
