"""Scalar-function suite (SURVEY.md §2.2: string/date/math rows, plus the
array/JSON family the reference lacks).

The reference's scalar surface is split/trim/startsWith/substring/concat/
format (Job1.java:23-107, Job2.java:25-36) and parse+truncate dates (O8).
Each family generalizes here with a DuckDB oracle; cross-engine hazards
(rounding provenance, libm ulp drift, regex dialect) are noted per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, t


@register(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey AS partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           substr(p_name, 1, 8) AS name_prefix,
           length(p_name) AS name_len,
           concat_ws('|', p_brand, p_type) AS brand_type,
           trim(p_type) AS type_trim,
           replace(p_type, ' ', '_') AS type_snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           reverse(p_brand) AS brand_rev,
           CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS has_green,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           CAST(strpos(p_name, ' ') AS INTEGER) AS first_space
    FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function battery over ``part`` (O3/O11 scalar family:
    Job1.java:23,27,30,34-35,73,75,95,106-107 uses split/trim/startsWith/
    substring/concat/format — generalized to the full built-in set)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.col("p_type")).alias("type_trim"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.when(F.col("p_name").like("%green%"), 1).otherwise(0).alias("has_green"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.instr(F.col("p_name"), " ").cast("int").alias("first_space"),
    )


@register(
    "q_split_explode",
    oracle="""
    SELECT partkey, word, COUNT(*) AS n
    FROM (
      SELECT p_partkey AS partkey, unnest(string_split(p_name, ' ')) AS word
      FROM part
    )
    WHERE word <> ''
    GROUP BY 1, 2
    """,
)
def q_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode (lateral unnest) + re-aggregate — the tokenize
    pattern (reference tokenizes with split(",",-1), Job1.java:30)."""
    p = t(spark, sf_dir, "part")
    return (
        p.select(
            F.col("p_partkey").alias("partkey"),
            F.explode(F.split("p_name", " ", -1)).alias("word"),
        )
        .where(F.col("word") != "")
        .groupBy("partkey", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey AS orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(day(o_orderdate) AS INTEGER) AS dom,
           strftime(o_orderdate, '%Y-%m') AS year_month,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(last_day(o_orderdate) AS DATE) AS month_end,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')
                AS INTEGER) AS days_to_y2k,
           CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function battery over ``orders`` (O8 generalized: the reference
    only parses M/d/yyyy and truncates to month — Job1.java:61,92-95)."""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.quarter(d).alias("qtr"),
        F.dayofmonth(d).alias("dom"),
        F.date_format(d, "yyyy-MM").alias("year_month"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date")).alias(
            "days_to_y2k"
        ),
        F.date_add(d.cast("date"), 90).alias("due_date"),
    )


@register(
    "q_math_funcs",
    oracle="""
    SELECT p_partkey AS partkey,
           abs(p_retailprice - 1000.0) AS abs_diff,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           CAST(CAST(CAST(p_retailprice * 1.1 AS VARCHAR) AS DECIMAL(28,2)) AS DOUBLE)
               AS price_bumped,
           round(sqrt(p_retailprice), 6) AS price_sqrt,
           round(ln(p_retailprice), 6) AS price_ln,
           round(pow(p_size, 2.0), 6) AS size_sq,
           CAST(p_size % 7 AS INTEGER) AS size_mod,
           greatest(p_size, 25) AS size_floor25,
           least(p_size, 25) AS size_cap25,
           CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS price_sign
    FROM part
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery over ``part``. Hazards handled: ROUND over a double is
    engine-divergent (Java rounds the shortest repr) → portable dround for
    the 2-dec product; sqrt is IEEE-exact cross-engine; ln/pow can drift a
    ulp between libm and java.lang.Math → rounded to 6dp where a boundary
    hit is ~1e-10 probable."""
    from ..functions.compat import dround

    p = t(spark, sf_dir, "part")
    price, size = F.col("p_retailprice"), F.col("p_size")
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.abs(price - 1000.0).alias("abs_diff"),
        F.ceil(price).alias("price_ceil"),
        F.floor(price).alias("price_floor"),
        dround(price * 1.1, 2).alias("price_bumped"),
        F.round(F.sqrt(price), 6).alias("price_sqrt"),
        F.round(F.log(price), 6).alias("price_ln"),
        F.round(F.pow(size, 2.0), 6).alias("size_sq"),
        (size % 7).cast("int").alias("size_mod"),
        F.greatest(size, F.lit(25)).alias("size_floor25"),
        F.least(size, F.lit(25)).alias("size_cap25"),
        F.signum(price - 1000.0).alias("price_sign"),
    )


@register(
    "q_case_coalesce",
    oracle="""
    SELECT c_custkey AS custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS balance_band,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_masked,
           CASE WHEN c_acctbal IS NULL THEN 0.0 ELSE c_acctbal END AS acctbal_filled
    FROM customer
    """,
)
def q_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar family: CASE/NULLIF/COALESCE (O10's null→0.0
    coercion, Job1.java:116-123, generalized)."""
    c = t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.when(bal < 0, "debt").when(bal < 5000, "low").otherwise("high").alias(
            "balance_band"
        ),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")
        ).alias("segment_masked"),
        F.when(bal.isNull(), 0.0).otherwise(bal).alias("acctbal_filled"),
    )


@register(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(CAST(props ->> '$.k' AS DOUBLE) AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_k,
           CAST(MIN(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    WHERE props IS NOT NULL
    GROUP BY 1
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction over the ``events.props`` payload (the
    reference declares org.json in pom.xml:34-38 but never uses it —
    SURVEY.md §2.2 array/JSON row: engine extension)."""
    e = t(spark, sf_dir, "events").where(F.col("props").isNotNull())
    k = F.get_json_object("props", "$.k")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k.cast("double").cast("decimal(18,2)")).cast("double").alias("sum_k"),
        F.min(k.cast("bigint")).alias("min_k"),
        F.max(k.cast("bigint")).alias("max_k"),
    )
