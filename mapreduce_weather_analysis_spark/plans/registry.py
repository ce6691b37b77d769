"""Named-query registry: the single source of truth for the driver contract.

Every implemented operator (SURVEY.md §2 + extensions) registers here as a
(name, spark_fn, oracle_sql) triple. ``__spark_entry__.queries()`` /
``oracle_sql()`` and the local pytest oracle harness all read this registry,
so an operator is "done" exactly when it has an entry (and tests pass).

Oracle SQL is ANSI SQL runnable by DuckDB over the same parquet tables
(pre-registered views). Queries whose semantics SQL can't express
(e.g. true streaming) register with ``oracle=None`` → the driver records a
weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_session_conf
from ..sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_conf(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        REGISTRY[name] = QuerySpec(name, wrapped, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand fixture-table loader for query bodies."""
    return load_table(spark, sf_dir, name)


def all_queries() -> dict[str, QueryFn]:
    _import_plans()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _import_plans()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


def _import_plans() -> None:
    """Import every module that registers queries (idempotent)."""
    from . import analog  # noqa: F401

    _OPTIONAL = (
        "relational",
        "functions_suite",
        "temporal_suite",
        "arrays_suite",
        "sql_suite",
        "pandas_suite",
        "udtf_suite",
        "events_suite",
        "dedup_suite",
        "similarity_suite",
        "text_suite",
        "multimodal_suite",
        "streaming_suite",
    )
    import importlib

    for mod in _OPTIONAL:
        try:
            importlib.import_module(f"{__package__}.{mod}")
        except ModuleNotFoundError as e:
            # tolerate only *our own* not-yet-written plan modules
            if f"plans.{mod}" not in str(e):
                raise
