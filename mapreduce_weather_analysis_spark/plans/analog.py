"""Reference-query analogs over the driver fixture tables (FIXTURES.md §B).

The reference's weather fact table is absent from its own checkout
(.MISSING_LARGE_BLOBS:1), and the driver's oracle runs over the TPC-H-ish
fixtures — so the two flagship jobs are expressed here over the analog role
mapping (FIXTURES.md): ``lineitem``/``l_shipdate`` stands in for the weather
fact/date, ``supplier→nation`` for the ``location`` dimension
(location_id→city_name becomes l_suppkey→n_name).

The *shape* of each plan — and every reference quirk Q1/Q4/Q5 — is identical
to plans/weather.py, which runs the same operators over true weather-shaped
data in the pytest golden tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.datetime_fns import month_of
from .registry import register, t

# ---------------------------------------------------------------------------
# Q-MAX-MONTH analog (Job2.java): global argmax month by summed metric.
# Operators: O1 scan, O3 projection, O8 month bucket, O12 grouped sum,
# O13 global top-1 with earliest-month tie-break (quirk Q5, Job2.java:65).
# Scale: month-sum is a distributed partial+final hash agg (vs. the
# reference's single reducer, Job2.java:100); the argmax sorts ~dozens of
# month rows in a trivial final stage.
# ---------------------------------------------------------------------------


@register(
    "q_max_month",
    oracle="""
    SELECT strftime(l_shipdate, '%Y-%m') AS year_month,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem
    WHERE l_quantity IS NOT NULL
    GROUP BY 1
    ORDER BY total_qty DESC, year_month ASC
    LIMIT 1
    """,
)
def q_max_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job2 end-to-end analog: month with the highest total quantity shipped.

    Job2 semantics: rows whose metric fails to parse are dropped, not zeroed
    (quirk Q1, Job2.java:38-45) → IS NOT NULL filter; ties go to the
    earliest month (quirk Q5, Job2.java:65) → secondary ascending sort.
    """
    li = t(spark, sf_dir, "lineitem")
    monthly = (
        li.where(F.col("l_quantity").isNotNull())
        .select(
            month_of("l_shipdate").alias("year_month"),
            F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
        )
        .groupBy("year_month")
        .agg(F.sum("qty").cast("double").alias("total_qty"))
    )
    return monthly.orderBy(F.desc("total_qty"), F.asc("year_month")).limit(1)


# ---------------------------------------------------------------------------
# Q-CITY-MONTH analog (Job1.java): fact ⋈ dimension → per (name, month) agg.
# Operators: O5 non-null keys, O7 inner equi-join (broadcast here — the
# reference shuffles every fact row to reducers instead, Job1.java:36-49),
# O8 month bucket, O9 SUM+AVG with null→0.0-counted-in-AVG (quirk Q1),
# O10 null coercion.
# Scale: both dimensions broadcast (≤10k rows at any SF of interest);
# the single shuffle is the groupBy on (n_name, year_month) — low
# cardinality (25 nations × ~80 months), so AQE coalesces it tight.
# ---------------------------------------------------------------------------


@register(
    "q_city_month",
    oracle="""
    SELECT n.n_name AS name,
           strftime(l.l_shipdate, '%Y-%m') AS year_month,
           CAST(SUM(CAST(coalesce(l.l_quantity, 0.0) AS DECIMAL(18,2))) AS DOUBLE)
               AS total_qty,
           CAST(SUM(CAST(coalesce(l.l_extendedprice, 0.0) AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_price
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE l.l_suppkey IS NOT NULL AND l.l_shipdate IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q_city_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job1 end-to-end analog: per (nation, month) total quantity and mean
    price over the lineitem⋈supplier⋈nation star join.

    Job1 semantics: inner join drops unmatched keys both ways (quirk Q4,
    Job1.java:80); null metrics coerce to 0.0 AND count in the AVG
    denominator (quirk Q1, Job1.java:89-105) — hence sum/COUNT(*), not
    null-skipping avg().
    """
    li = (
        t(spark, sf_dir, "lineitem")
        .where(F.col("l_suppkey").isNotNull() & F.col("l_shipdate").isNotNull())
        .select(
            "l_suppkey",
            month_of("l_shipdate").alias("year_month"),
            F.coalesce(F.col("l_quantity"), F.lit(0.0))
            .cast("decimal(18,2)")
            .alias("qty"),
            F.coalesce(F.col("l_extendedprice"), F.lit(0.0))
            .cast("decimal(18,2)")
            .alias("price"),
        )
    )
    sup = F.broadcast(t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    nat = F.broadcast(t(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    joined = li.join(sup, li.l_suppkey == sup.s_suppkey, "inner").join(
        nat, sup.s_nationkey == nat.n_nationkey, "inner"
    )
    return joined.groupBy(F.col("n_name").alias("name"), "year_month").agg(
        F.sum("qty").cast("double").alias("total_qty"),
        (F.sum("price").cast("double") / F.count(F.lit(1))).alias("avg_price"),
    )


# Java's %.3f (Job1.java:107) rounds HALF_UP over the double's SHORTEST decimal
# repr (Double.toString digits) — not over the exact binary value like C/DuckDB
# printf. DuckDB emulation: VARCHAR (shortest repr) → DECIMAL(28,3) (parses +
# rounds half-away-from-zero) → VARCHAR (always 3 fraction digits).
_FMT3 = "CAST(CAST(CAST({v} AS VARCHAR) AS DECIMAL(28,3)) AS VARCHAR)"


@register(
    "q_city_month_formatted",
    oracle=f"""
    SELECT name || ',' || year_month || chr(9) ||
           {_FMT3.format(v='total_qty')} || ',' ||
           {_FMT3.format(v='avg_price')} AS line
    FROM (
      SELECT n.n_name AS name,
             strftime(l.l_shipdate, '%Y-%m') AS year_month,
             CAST(SUM(CAST(coalesce(l.l_quantity, 0.0) AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_qty,
             CAST(SUM(CAST(coalesce(l.l_extendedprice, 0.0) AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) AS avg_price
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE l.l_suppkey IS NOT NULL AND l.l_shipdate IS NOT NULL
      GROUP BY 1, 2
    )
    """,
)
def q_city_month_formatted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O11 formatted text sink (Job1.java:106-107): the Q-CITY-MONTH analog
    rendered as the reference's ``key,ym<TAB>%.3f,%.3f`` output lines."""
    agg = q_city_month(spark, sf_dir)
    return agg.select(
        F.format_string(
            "%s,%s\t%.3f,%.3f", "name", "year_month", "total_qty", "avg_price"
        ).alias("line")
    )


# ---------------------------------------------------------------------------
# Quirk Q2 compat (VERDICT r10 ask #7): Job1's lenient SimpleDateFormat
# ROLLOVER, driver-certified. The fixture dates are all valid (SURVEY.md
# §2.1 pins it so strict and lenient coincide), so this query STRESSES the
# rollover deliberately: it renders each l_shipdate as an out-of-range
# "M+12/d+31/yyyy" string and buckets it with month_bucket(lenient=True).
# The oracle derives the expected bucket through an INDEPENDENT formulation
# (date_trunc + interval arithmetic on the original date — no string
# parsing), so a driver green certifies the affine rollover rule itself:
# Calendar.set(y, m-1, d) == make_date(y,1,1) + (m-1) months + (d-1) days.
# ---------------------------------------------------------------------------


@register(
    "q_month_bucket_lenient",
    oracle="""
    SELECT strftime(
             date_trunc('month', l_shipdate)
             + to_months(12)
             + to_days(CAST(strftime(l_shipdate, '%d') AS INT) + 30),
             '%Y-%m'
           ) AS year_month,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate IS NOT NULL
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_month_bucket_lenient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quirk Q2 compat mode, end-to-end: every shipdate re-rendered as the
    out-of-range string "M+12/d+31/yyyy" (guaranteed double rollover —
    13..24 months, 32..62 days) and bucketed via the lenient Calendar
    arithmetic (functions/datetime_fns.py month_bucket(lenient=True);
    Job1.java:61's setLenient-default SimpleDateFormat). The DuckDB oracle
    computes the same bucket from the ORIGINAL date with interval
    arithmetic — two independent formulations, one affine rollover rule."""
    from ..functions.datetime_fns import month_bucket

    li = t(spark, sf_dir, "lineitem").where(F.col("l_shipdate").isNotNull())
    stressed = F.concat_ws(
        "/",
        (F.month("l_shipdate") + F.lit(12)).cast("string"),
        (F.dayofmonth("l_shipdate") + F.lit(31)).cast("string"),
        F.year("l_shipdate").cast("string"),
    )
    return (
        li.select(month_bucket(stressed, lenient=True).alias("year_month"))
        .groupBy("year_month")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("year_month")
    )
