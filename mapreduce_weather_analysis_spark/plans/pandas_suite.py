"""Grouped-map (applyInPandas) operator — the sanctioned slow path for
per-group logic no builtin expresses (here: per-group OLS trend fitting).

Bit-reproducibility design: the fit is the closed-form OLS over integer
sufficient statistics — x = µs since the group's first event (int64),
y = value·1000 (the fixture values are exact 3-decimal doubles, so this
is an exact integer). Σx, Σy, Σxy, Σx² accumulate in arbitrary-precision
Python ints / DuckDB HUGEINT, so they are EXACT and order-independent;
slope and intercept are then a fixed, mirrored sequence of scalar IEEE
double ops on identical operands. That is what lets a Python grouped-map
carry a full hash-checked DuckDB oracle (plain lstsq — SVD, pairwise
sums — could never hash-match). Tests cross-validate against lstsq
within float tolerance."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import register, t

TREND_SCHEMA = "event_type string, n bigint, slope double, intercept double"

# slope: value-units per SECOND (x is µs → ×1e6, y is milli-units → ÷1e3,
# net ×1000.0); intercept: fitted value at the group's first event time.
_TREND_ORACLE = """
WITH b AS (
  SELECT event_type, epoch_us(ts) AS ts_us,
         CAST(round(value * 1000) AS HUGEINT) AS ym
  FROM events
), c AS (
  SELECT event_type,
         CAST(ts_us - MIN(ts_us) OVER (PARTITION BY event_type) AS HUGEINT)
           AS x,
         ym
  FROM b
), s AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(ym) AS sy,
         SUM(x * ym) AS sxy, SUM(x * x) AS sxx
  FROM c GROUP BY 1
)
SELECT event_type, n,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) * 1000.0 END AS slope,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE (CAST(sy AS DOUBLE) / 1000.0
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                      / CAST(n * sxx - sx * sx AS DOUBLE)
                      * CAST(sx AS DOUBLE) / 1000.0) / n END AS intercept
FROM s
"""


@register("q_group_trend_pandas", oracle=_TREND_ORACLE)
def q_group_trend_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value trend via applyInPandas (Arrow batch per group).

    Scale note: groups must fit in one executor's memory — correct here
    (5 event types × bounded projection); for huge groups, pre-aggregate
    the sufficient statistics (Σx, Σy, Σxy, Σx²) with builtins instead —
    the same closed form this computes exactly (see module docstring).

    NB: the pandas function is a NESTED def on purpose — cloudpickle ships
    closures by value, so executors need no importable copy of this package
    (a module-level function pickles by reference and breaks any driver
    whose Python workers can't import the repo)."""
    from pyspark.sql import functions as F

    def fit_group_trend(pdf):
        import pandas as pd

        ts = [int(v) for v in pdf["ts_us"].tolist()]
        ts0 = min(ts)
        x = [v - ts0 for v in ts]
        y = [int(round(v * 1000)) for v in pdf["value"].tolist()]
        n = len(x)
        sx, sy = sum(x), sum(y)
        sxy = sum(a * b for a, b in zip(x, y))
        sxx = sum(a * a for a in x)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        if den == 0:
            # degenerate but legal group (single row, or all-identical
            # timestamps): no defined slope — NULL, mirrored in the oracle's
            # CASE guard (nullable Float64 so Arrow emits a true null, not NaN)
            slope = intercept = None
        else:
            # mirror the oracle's double op order exactly (one op at a time)
            slope = float(num) / float(den) * 1000.0
            intercept = (float(sy) / 1000.0
                         - float(num) / float(den) * float(sx) / 1000.0) / n
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [n],
                "slope": pd.array([slope], dtype="Float64"),
                "intercept": pd.array([intercept], dtype="Float64"),
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
