"""Parquet fixture-table loaders (the engine's canonical columnar source).

The reference's only source is line-oriented CSV text on HDFS
(``Job1.java:143-144`` — SURVEY.md §2 O1); parquet is this engine's
equivalent canonical storage: columnar, predicate pushdown, column pruning,
and (at 100 TB) partition pruning on a month/key directory layout.
"""

from __future__ import annotations

import os
from weakref import WeakKeyDictionary

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

# Relation-handle memo — CATALOG METADATA, not data (r16, guide §1/§5:
# the suite is per-query constant-overhead-bound at sf0.1, and profiling
# put ~0.15-0.2 s of every query build inside spark.read.parquet's
# schema inference + relation setup; a catalog caches exactly this).
# The value is the LAZY resolved DataFrame — immutable plan metadata; no
# rows, no results, nothing is computed until the caller's own action,
# so every bench/oracle invocation still computes from the parquet
# inputs. Keyed by the live session (weakly — a stopped session drops
# its entries) and the file identity (path, size, mtime_ns), so a
# changed fixture file re-infers instead of serving a stale schema.
_RELATION_CACHE: "WeakKeyDictionary[SparkSession, dict]" = (
    WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_conf(spark)
    path = f"{sf_dir}/{name}.parquet"
    st = os.stat(path)
    key = (path, st.st_size, st.st_mtime_ns)
    per_session = _RELATION_CACHE.setdefault(spark, {})
    df = per_session.get(key)
    if df is not None:
        return df
    df = spark.read.parquet(path)
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # TIMESTAMP(NANOS) read as int64 nanos (see session.py): rebuild a
        # µs timestamp — floor division matches DuckDB's ns→µs truncation.
        # integer `div`, not `/`: ns values (~1.7e18) exceed double precision
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    per_session[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}
