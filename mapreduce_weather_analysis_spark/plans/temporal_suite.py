"""Temporal join suite: as-of join and range join (operators the reference
lacks and Spark has no native form for — operators/asof.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
