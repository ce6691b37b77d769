"""Temporal suite: as-of join, range join (operators the reference lacks
and Spark has no native form for — operators/asof.py), and calendar
gap-fill/resample with forward fill."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.asof import asof_join, range_join_bands
from .registry import register, t

PRICE_BANDS = [
    ("P0_LOW", 0.0, 20_000.0),
    ("P1_MID", 20_000.0, 60_000.0),
    ("P2_HIGH", 60_000.0, 120_000.0),
    ("P3_TOP", 120_000.0, 1e18),
]


@register(
    "q_asof_join",
    oracle="""
    WITH l AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, ts
      FROM events WHERE event_type = 'click'
    ),
    r AS (
      SELECT user_id, event_id AS purchase_event_id, epoch_us(ts) AS purchase_ts_us, ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT l.user_id, l.event_id, l.ts_us,
           r.purchase_event_id AS r_event_id,
           r.purchase_ts_us AS r_ts_us,
           l.ts_us - r.purchase_ts_us AS gap_us
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every click, the user's most recent prior (or
    simultaneous) purchase. Spark impl: union + window carry-forward
    (one user_id shuffle); oracle: DuckDB's native ASOF LEFT JOIN."""
    e = t(spark, sf_dir, "events")
    ts_us = F.unix_micros("ts")
    left = e.where(F.col("event_type") == "click").select(
        "user_id", "event_id", ts_us.alias("ts_us")
    )
    right = e.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", ts_us.alias("ts_us")
    )
    joined = asof_join(
        left,
        right,
        key="user_id",
        ts="ts_us",
        left_cols=["event_id"],
        right_cols=["event_id", "ts_us"],
    )
    return joined.select(
        "user_id",
        "event_id",
        "ts_us",
        "r_event_id",
        "r_ts_us",
        (F.col("ts_us") - F.col("r_ts_us")).alias("gap_us"),
    )


@register(
    "q_range_join",
    oracle=f"""
    WITH bands(band, lo, hi) AS (
      VALUES {', '.join(f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)}
    )
    SELECT b.band,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders o
    JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY 1
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (point-in-interval) join of orders onto broadcast price bands
    + grouped rollup — the banding pattern for histograms/tiering."""
    o = t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(PRICE_BANDS, ["band", "lo", "hi"])
    joined = range_join_bands(o, bands, "o_totalprice")
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


@register(
    "q_gapfill_daily",
    oracle="""
    WITH src AS (
      SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS d, o_totalprice
      FROM orders WHERE o_totalprice > 400000
    ),
    daily AS (
      SELECT pri, d, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS daily_total
      FROM src GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
    spine AS (
      SELECT CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
                                         CAST(hi AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds
    ),
    grid AS (
      SELECT k.pri, s.d FROM (SELECT DISTINCT pri FROM daily) k CROSS JOIN spine s
    )
    SELECT g.pri, strftime(g.d, '%Y-%m-%d') AS day,
           COALESCE(daily.n_orders, 0) AS n_orders,
           last_value(daily.daily_total IGNORE NULLS) OVER (
             PARTITION BY g.pri ORDER BY g.d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_total
    FROM grid g LEFT JOIN daily ON daily.pri = g.pri AND daily.d = g.d
    """,
)
def q_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap-fill: sparse per-priority daily totals
    (only high-value orders) densified onto a continuous daily calendar
    spine (``sequence`` + ``explode``), missing days forward-filled with
    the last observed total (``last(..., ignorenulls=True)`` running
    window). The spine and key list are tiny → both sides of the grid
    cross-join broadcast; the only real shuffle is the window's key
    partition, which scales by key cardinality, not by calendar length."""
    o = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400_000)
        .select(
            F.col("o_orderpriority").alias("pri"),
            F.to_date("o_orderdate").alias("d"),
            "o_totalprice",
        )
    )
    daily = o.groupBy("pri", "d").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("daily_total"),
    )
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d")
    )
    grid = daily.select("pri").distinct().crossJoin(F.broadcast(spine))
    filled = grid.join(daily, ["pri", "d"], "left")
    w = W.partitionBy("pri").orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    return filled.select(
        "pri",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.last("daily_total", ignorenulls=True).over(w).alias("filled_total"),
    )
