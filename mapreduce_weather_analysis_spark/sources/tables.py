"""Parquet fixture-table loaders (the engine's canonical columnar source).

The reference's only source is line-oriented CSV text on HDFS
(``Job1.java:143-144`` — SURVEY.md §2 O1); parquet is this engine's
equivalent canonical storage: columnar, predicate pushdown, column pruning,
and (at 100 TB) partition pruning on a month/key directory layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import ensure_session_conf

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # TIMESTAMP(NANOS) read as int64 nanos (see session.py): rebuild a
        # µs timestamp — floor division matches DuckDB's ns→µs truncation.
        # integer `div`, not `/`: ns values (~1.7e18) exceed double precision
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}
