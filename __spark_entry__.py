"""Driver contract for the spark-graft builder (PySpark target).

Backed by ``mapreduce_weather_analysis_spark.plans.registry`` — every
implemented operator from SURVEY.md §2 (plus the training-data-pipeline
extensions) registers there with its Spark plan and DuckDB oracle SQL.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from mapreduce_weather_analysis_spark.plans.registry import (  # noqa: E402
    all_oracles,
    all_queries,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Job1 analog: star join + per-month aggregation) on
    the sf0.001 smoke fixtures; driver checks rows>0 and a stable schema."""
    return all_queries()["q_city_month"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + extensions).

    Each callable takes (spark, sf_dir) and returns a DataFrame; every
    computed column is aliased identically to its oracle twin.
    """
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query (same column names).

    Queries absent here (subset of ``queries()``) are non-SQL-expressible
    (e.g. true streaming) → driver records the weaker rows-only check.
    """
    return all_oracles()
