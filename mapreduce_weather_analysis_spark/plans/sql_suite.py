"""SQL-surface suite: explicit scan/filter/projection, subquery shapes, and
a query written through ``spark.sql`` itself (the engine exposes both the
DataFrame API and SQL over temp views — SURVEY.md §3.3: the reference's
Hive/Spark compose stacks imply a SQL twin for every job)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, t


@register(
    "q_scan_filter_project",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           l_quantity AS quantity, l_extendedprice AS price
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity >= 30
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    """,
)
def q_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2+O3+O5 in isolation: scan → predicate → projection. All three
    predicates and the 4-column projection reach the parquet reader
    (PushedFilters/ReadSchema — the reference instead reads every byte of
    every line and filters in the mapper, Job1.java:23-46)."""
    li = t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_returnflag") == "R")
        & (F.col("l_quantity") >= 30)
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
    ).select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("price"),
    )


@register(
    "q_subquery_scalar",
    oracle="""
    SELECT o.o_orderkey AS orderkey, o.o_custkey AS custkey,
           o.o_totalprice AS totalprice
    FROM orders o
    JOIN (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(o_totalprice) AS avg_price
      FROM orders GROUP BY 1
    ) a ON a.o_custkey = o.o_custkey
    WHERE o.o_totalprice > 2 * a.avg_price
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-aggregate shape: orders priced above 2× their own
    customer's average (decorrelated to an aggregate+self-join — the plan
    Catalyst produces for the correlated form, written explicitly so the
    oracle matches bit-for-bit)."""
    o = t(spark, sf_dir, "orders")
    avg_per_cust = o.groupBy("o_custkey").agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count("o_totalprice")
        ).alias("avg_price")
    )
    return (
        o.join(avg_per_cust.withColumnRenamed("o_custkey", "ac_custkey"),
               F.col("o_custkey") == F.col("ac_custkey"))
        .where(F.col("o_totalprice") > 2 * F.col("avg_price"))
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


@register(
    "q_having_cte",
    oracle="""
    WITH monthly AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS year_month,
             o_orderpriority AS priority,
             COUNT(*) AS n
      FROM orders
      GROUP BY 1, 2
    )
    SELECT year_month, priority, n
    FROM monthly
    WHERE n >= 20
    """,
)
def q_having_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + HAVING shape (post-aggregation predicate)."""
    o = t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return monthly.where(F.col("n") >= 20)


@register(
    "q_sql_api_shipping",
    oracle="""
    SELECT o.o_orderkey AS orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(SUM(CAST(CAST(l.l_extendedprice * (1 - l.l_discount) AS VARCHAR)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2
    """,
)
def q_sql_api_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped query expressed through ``spark.sql`` over temp views
    — the engine's SQL entry path (same Catalyst plan as the DataFrame
    form; the reference's Hive stack offered SQL the same way)."""
    for name in ("customer", "orders", "lineitem"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"v_{name}")
    return spark.sql(
        """
        SELECT o.o_orderkey AS orderkey,
               date_format(o.o_orderdate, 'yyyy-MM-dd') AS orderdate,
               CAST(SUM(CAST(CAST(l.l_extendedprice * (1 - l.l_discount) AS STRING)
                             AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM v_customer c
        JOIN v_orders o ON c.c_custkey = o.o_custkey
        JOIN v_lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1, 2
        """
    )


@register(
    "q_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           strftime(o.o_orderdate, '%Y') AS yr,
           CAST(SUM(CAST(CAST(l.l_extendedprice * (1 - l.l_discount) AS VARCHAR)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND c.c_nationkey = s.s_nationkey
    GROUP BY 1, 2
    """,
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: 6-table join where customer and supplier share a
    nation, restricted to one region — the deepest join in the suite.
    lineitem⋈orders is the only fact-fact join (shuffle on orderkey; at
    100 TB both sides bucket on orderkey); all dims broadcast."""
    from ..functions.compat import psum

    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = F.broadcast(t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    s = F.broadcast(t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    n = F.broadcast(t(spark, sf_dir, "nation"))
    r = F.broadcast(t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_format("o_orderdate", "yyyy").alias("yr"),
        )
        .agg(psum(rev, alias="revenue"))
    )


@register(
    "q_order_priority_count",
    oracle="""
    SELECT o.o_orderpriority AS priority, COUNT(*) AS n_orders
    FROM orders o
    WHERE strftime(o.o_orderdate, '%Y') = '1996'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
      )
    GROUP BY 1
    """,
)
def q_order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped: EXISTS semi-join from a fact against a fact
    (lineitem probe never widens the orders side), then a tiny grouped
    count."""
    o = t(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1996)
    li = t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q_grouping_sets",
    oracle="""
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube, §2.2
    aggregations): four simultaneous groupings in one pass with GROUPING()
    flags disambiguating the all-rows NULL from a genuine NULL key. One
    shuffle; Spark expands sets map-side then partial-aggregates, so the
    shuffle carries pre-combined groups, not raw rows."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM v_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority), ())
        """
    )
