"""Grouped-map (applyInPandas) operator — the sanctioned slow path for
per-group logic no builtin expresses (here: per-group OLS trend fitting,
a real numpy job). Rows-only driver check; tests cross-validate against
the closed-form solution computed with builtin aggregates."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import register, t

TREND_SCHEMA = "event_type string, n bigint, slope double, intercept double"


@register("q_group_trend_pandas", oracle=None)
def q_group_trend_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value trend via applyInPandas (Arrow batch per group).

    Scale note: groups must fit in one executor's memory — correct here
    (5 event types × bounded projection); for huge groups, pre-aggregate
    the sufficient statistics (Σx, Σy, Σxy, Σx²) with builtins instead —
    that closed form is exactly what the tests verify this against.

    NB: the pandas function is a NESTED def on purpose — cloudpickle ships
    closures by value, so executors need no importable copy of this package
    (a module-level function pickles by reference and breaks any driver
    whose Python workers can't import the repo)."""
    from pyspark.sql import functions as F

    def fit_group_trend(pdf):
        import numpy as np
        import pandas as pd

        x = pdf["ts_us"].to_numpy(dtype=np.float64)
        y = pdf["value"].to_numpy(dtype=np.float64)
        x = (x - x.mean()) / 1e6  # seconds, centered — conditioning
        a = np.vstack([x, np.ones_like(x)]).T
        (slope, intercept), *_ = np.linalg.lstsq(a, y, rcond=None)
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [len(pdf)],
                "slope": [float(slope)],
                "intercept": [float(intercept)],
            }
        )

    e = t(spark, sf_dir, "events")
    base = e.select("event_type", F.unix_micros("ts").alias("ts_us"), "value")
    return base.groupBy("event_type").applyInPandas(fit_group_trend, TREND_SCHEMA)


@register(
    "q_pandas_udaf",
    oracle="""
    SELECT l_returnflag AS flag,
           SUM(CAST(l_quantity AS BIGINT) * l_linenumber)
             / CAST(SUM(l_linenumber) AS DOUBLE) AS weighted_qty
    FROM lineitem
    GROUP BY 1
    """,
)
def q_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (the UDAF surface): linenumber-weighted
    mean quantity per returnflag, computed in one Arrow batch per group.

    The arithmetic is integer-valued until the final division (quantity and
    linenumber are whole numbers, products < 2^53), so the result is exact
    and order-independent — which is what lets a Python UDAF oracle-match
    DuckDB bit-for-bit. Same nested-def shipping rule as above. Scale note:
    a grouped-agg UDF gets whole columns per group in memory; for
    unbounded groups express the same thing with builtin SUMs (shown in
    the oracle) — this query exists to cover the API surface."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit GROUPED_AGG functionType: hint-based inference can't see the
    # locally-imported pandas under `from __future__ import annotations`
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def weighted_qty(qty, w):
        num = (qty.astype("int64") * w.astype("int64")).sum()
        return float(num) / float(w.astype("int64").sum())

    li = t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        weighted_qty("l_quantity", "l_linenumber").alias("weighted_qty")
    )
