"""Parquet fixture-table loaders (the engine's canonical columnar source).

The reference's only source is line-oriented CSV text on HDFS
(``Job1.java:143-144`` — SURVEY.md §2 O1); parquet is this engine's
equivalent canonical storage: columnar, predicate pushdown, column pruning,
and (at 100 TB) partition pruning on a month/key directory layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}
