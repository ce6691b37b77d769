"""Relational operator suite (SURVEY.md §2.2 generalization — slice 2).

The reference's single join (O7), grouped aggs (O9/O12), and top-1 (O13)
generalize here to the full checklist over the TPC-H-ish fixtures: inner/
left/semi/anti joins, multi-agg groupBy, distinct aggs, rollup, pivot,
windows (rank / running sum / lag), global top-k, and set operations.

Every query carries its DuckDB oracle; all double aggregates go through the
portable-determinism helpers (functions/compat.py) so the driver's value
hash matches bit-for-bit.

Scale posture: dimensions broadcast; fact-side shuffles are single-key
hash aggs or AQE-coalesced joins. Window queries partition on high-
cardinality keys (customer / supplier) so no single partition dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .registry import register, t

# ---------------------------------------------------------------------------
# Joins (O7 generalized). Reference has only the reduce-side inner equi-join
# (Job1.java:66-80); the engine adds the outer/semi/anti family.
# ---------------------------------------------------------------------------


@register(
    "q_join_inner",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-table star join (orders→customer→nation→region) + grouped agg.

    All three dimensions broadcast (Job1's equivalent dimension was 27 rows;
    here ≤ SF×150k customers — still far under the 10MB default threshold at
    bench SFs; at true 100TB the customer join becomes a shuffle join on
    o_custkey and AQE handles skew)."""
    o = t(spark, sf_dir, "orders")
    c = F.broadcast(t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    n = F.broadcast(t(spark, sf_dir, "nation"))
    r = F.broadcast(t(spark, sf_dir, "region"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(SUM(CAST(coalesce(o.o_totalprice, 0.0) AS DECIMAL(18,2))) AS DOUBLE)
               AS total_spent
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (the case the
    reference's inner-join gate drops, quirk Q4 — Job1.java:80)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0)).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spent"),
        )
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_mktsegment AS segment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
    )
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with ≥1 big order (EXISTS). The probe side
    never widens — at scale this shuffles only keys, not payloads."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("segment")
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with NO orders since 2001-01-01
    (NOT EXISTS with a pushed-down filter on the right side). The
    recency cutoff keeps the result NONEMPTY at every fixture SF — the
    original "no orders at all" matched zero customers on every
    fixture, so the anti-join semantics were only ever certified
    against an empty relation (the q_local_supplier_volume lesson:
    a hash-match on empty is a vacuous row)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= "2001-01-01"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name")
    )


# ---------------------------------------------------------------------------
# Aggregations (O9/O12 generalized).
# ---------------------------------------------------------------------------


@register(
    "q_agg_pricing_summary",
    oracle="""
    SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS VARCHAR)
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS VARCHAR)
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity)
               AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount)
               AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY 1, 2
    """,
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: 2-key groupBy, 8 aggregates.

    The classic partial+final hash-agg benchmark — the reference ships every
    raw row to reducers instead (no combiner, SURVEY.md §4.1); Spark's
    map-side partial agg reduces the shuffle to |groups|×|aggs|."""
    from ..functions.compat import davg, dsum, psum

    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
    ).agg(
        dsum("l_quantity", alias="sum_qty"),
        dsum("l_extendedprice", alias="sum_base_price"),
        psum(disc_price, alias="sum_disc_price"),
        psum(charge, alias="sum_charge"),
        davg("l_quantity", alias="avg_qty"),
        davg("l_extendedprice", alias="avg_price"),
        davg("l_discount", alias="avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT strftime(o_orderdate, '%Y-%m')) AS n_months,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregates (absent from the reference — SURVEY.md §2.2):
    two COUNT(DISTINCT) over different keys in one grouped agg (Spark
    expands+re-aggregates under the hood)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct(F.date_format("o_orderdate", "yyyy-MM")).alias("n_months"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "q_agg_rollup",
    oracle="""
    SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (subtotals + grand total) with GROUPING
    indicators to disambiguate rolled-up NULLs from data NULLs."""
    from ..functions.compat import dsum

    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        dsum("l_quantity", alias="sum_qty"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
        "g_flag",
        "g_status",
        "sum_qty",
        "n",
    )


@register(
    "q_pivot",
    oracle="""
    SELECT l_returnflag AS returnflag,
           CAST(SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0.0 END
                         AS DECIMAL(18,2))) AS DOUBLE) AS "O",
           CAST(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0.0 END
                         AS DECIMAL(18,2))) AS DOUBLE) AS "F"
    FROM lineitem
    GROUP BY 1
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus values into columns. The value list is pinned so
    Spark skips the extra distinct-values job — the scale-safe form."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("returnflag"))
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            F.sum(
                F.coalesce(F.col("l_quantity"), F.lit(0.0)).cast("decimal(18,2)")
            ).cast("double")
        )
    )


# ---------------------------------------------------------------------------
# Windows (absent from the reference — SURVEY.md §2.2; Q-MAX-MONTH's windowed
# formulation is the only brush, O13 alt).
# ---------------------------------------------------------------------------


@register(
    "q_window_topk_per_group",
    oracle="""
    SELECT custkey, o_orderkey AS orderkey, o_totalprice AS totalprice, rn
    FROM (
      SELECT o_custkey AS custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC
             ) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via ROW_NUMBER (deterministic tie-break on
    orderkey). The distributed top-k-per-group idiom: one shuffle on the
    partition key, no global sort."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            "rn",
        )
    )


@register(
    "q_window_running_sum",
    oracle="""
    SELECT l_suppkey AS suppkey, l_orderkey AS orderkey, l_linenumber AS linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_qty
    FROM lineitem
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-supplier quantity in ship order. Decimal-routed window
    sum: exact accumulation ⇒ engine-independent values even though window
    implementations group additions differently."""
    li = t(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        F.col("l_suppkey").alias("suppkey"),
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_qty"),
    )


@register(
    "q_window_lag_delta",
    oracle="""
    SELECT year_month,
           total_qty,
           total_qty - lag(total_qty) OVER (ORDER BY year_month) AS qty_delta
    FROM (
      SELECT strftime(l_shipdate, '%Y-%m') AS year_month,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY 1
    )
    """,
)
def q_window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month change via LAG over the monthly rollup — the
    windowed sibling of Q-MAX-MONTH's time bucketing (O8+O13 alt)."""
    li = t(spark, sf_dir, "lineitem")
    monthly = (
        li.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("year_month"))
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty")
        )
    )
    from ..functions.compat import bounded_rank_window

    w = bounded_rank_window("year_month")
    return monthly.select(
        "year_month",
        "total_qty",
        (F.col("total_qty") - F.lag("total_qty").over(w)).alias("qty_delta"),
    )


# ---------------------------------------------------------------------------
# Sort / top-k (O13 generalized) and set operations (O1/O4's union, plus the
# intersect/except family the reference lacks).
# ---------------------------------------------------------------------------


@register(
    "q_topk_global",
    oracle="""
    SELECT o_orderkey AS orderkey, o_custkey AS custkey, o_totalprice AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by price (deterministic tie-break). Spark plans
    TakeOrderedAndProject — per-partition heaps + tiny driver merge, the
    distributed generalization of Job2's single-reducer streaming max
    (Job2.java:53-69)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


@register(
    "q_union_all",
    oracle="""
    SELECT c_name AS name, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_name AS name, 'supplier' AS kind FROM supplier
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union of heterogeneous relations — the declarative form of the
    reference's multi-input-path single mapper (O1/O4, Job1.java:143-144)."""
    c = t(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"), F.lit("customer").alias("kind")
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.lit("supplier").alias("kind")
    )
    return c.unionByName(s)


@register(
    "q_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
      WHERE strftime(o_orderdate, '%Y') = '1995'
    INTERSECT
    SELECT o_custkey FROM orders
      WHERE strftime(o_orderdate, '%Y') = '1996'
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers active in both 1995 and 1996."""
    o = t(spark, sf_dir, "orders")
    y95 = o.where(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("custkey")
    )
    y96 = o.where(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("custkey")
    )
    return y95.intersect(y96)


@register(
    "q_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
      WHERE strftime(o_orderdate, '%Y') = '1995'
    EXCEPT
    SELECT o_custkey FROM orders
      WHERE strftime(o_orderdate, '%Y') = '1996'
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers active in 1995 but not 1996."""
    o = t(spark, sf_dir, "orders")
    y95 = o.where(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("custkey")
    )
    y96 = o.where(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("custkey")
    )
    return y95.subtract(y96)


@register(
    "q_agg_cube",
    oracle="""
    SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping-set combinations (rollup's sibling — both
    expand to a union of grouping sets over ONE shuffle)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
            "g_flag",
            "g_status",
            "n",
        )
    )


@register(
    "q_join_full_outer",
    oracle="""
    SELECT coalesce(a.custkey, b.custkey) AS custkey,
           coalesce(a.n95, 0) AS n95, coalesce(b.n96, 0) AS n96
    FROM (SELECT o_custkey AS custkey, COUNT(*) AS n95 FROM orders
          WHERE strftime(o_orderdate, '%Y') = '1995' GROUP BY 1) a
    FULL OUTER JOIN
         (SELECT o_custkey AS custkey, COUNT(*) AS n96 FROM orders
          WHERE strftime(o_orderdate, '%Y') = '1996' GROUP BY 1) b
    ON a.custkey = b.custkey
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: per-customer order counts across two years with
    zero-fill on either side."""
    o = t(spark, sf_dir, "orders")

    def year_counts(year: int, out: str) -> DataFrame:
        return (
            o.where(F.year("o_orderdate") == year)
            .groupBy(F.col("o_custkey").alias(f"ck_{out}"))
            .agg(F.count(F.lit(1)).alias(out))
        )

    a, b = year_counts(1995, "n95"), year_counts(1996, "n96")
    return a.join(b, a.ck_n95 == b.ck_n96, "full_outer").select(
        F.coalesce("ck_n95", "ck_n96").alias("custkey"),
        F.coalesce("n95", F.lit(0)).alias("n95"),
        F.coalesce("n96", F.lit(0)).alias("n96"),
    )


@register(
    "q_window_rank_family",
    oracle="""
    SELECT custkey, orderkey,
           CAST(rnk AS INTEGER) AS rnk,
           CAST(drnk AS INTEGER) AS drnk,
           CAST(tile AS INTEGER) AS tile,
           first_price, next_price
    FROM (
      SELECT o_custkey AS custkey, o_orderkey AS orderkey,
             RANK() OVER w AS rnk,
             DENSE_RANK() OVER w AS drnk,
             NTILE(4) OVER w AS tile,
             FIRST_VALUE(o_totalprice) OVER w AS first_price,
             LEAD(o_totalprice) OVER w AS next_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC)
    )
    """,
)
def q_window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking/navigation window functions in one pass:
    rank, dense_rank, ntile, first_value, lead — one shuffle, one sort."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("tile"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@register(
    "q_salted_agg",
    oracle="""
    SELECT l_returnflag AS returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY 1
    """,
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted two-phase aggregation (operators/skew.py): the hot-key
    mitigation for 100 TB groupBys. The oracle is the PLAIN group-by — the
    salted plan must be result-identical (decimal sums commute), proving
    the rewrite is semantics-preserving."""
    from ..operators.skew import salted_agg

    li = t(spark, sf_dir, "lineitem")
    return salted_agg(
        li,
        ["l_returnflag"],
        [
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_sq"),
            F.count(F.lit(1)).alias("_n"),
        ],
        [
            F.sum("_sq").cast("double").alias("sum_qty"),
            F.sum("_n").alias("n"),
        ],
        # deterministic per-row salt: stable unique row identity, so task
        # recomputes re-bucket identically (see operators/skew.py)
        salt_cols=["l_orderkey", "l_linenumber"],
    ).select(F.col("l_returnflag").alias("returnflag"), "sum_qty", "n")


@register(
    "q_latest_per_key",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      ) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-state-per-key (the CDC/upsert compaction primitive: collapse
    an event log to each key's newest record). Window row_number desc —
    one shuffle; at scale this is the MERGE-emulation building block
    (anti-join + union for incremental variants)."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type",
            "value",
        )
    )


@register(
    "q_window_range_frame",
    oracle="""
    SELECT o_orderkey AS orderkey, o_custkey AS custkey, o_totalprice AS totalprice,
           COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW
           ) AS n_within_10k,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS sum_within_10k
    FROM orders
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (value-based, not row-based): per customer, how
    many/much of their orders fall within $10k below each order's price —
    the frame type rows-frames can't express (peers enter by value)."""
    o = t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, W.currentRow)
    )
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").alias("totalprice"),
        F.count(F.lit(1)).over(w).alias("n_within_10k"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("sum_within_10k"),
    )


@register(
    "q_unpivot",
    oracle="""
    SELECT p_partkey AS partkey, metric, CAST(value AS DOUBLE) AS value
    FROM (
      SELECT p_partkey, p_retailprice, CAST(p_size AS DOUBLE) AS p_size_d
      FROM part
    ) UNPIVOT (value FOR metric IN (p_retailprice, p_size_d))
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide→long) via stack() — the inverse of q_pivot."""
    p = t(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.expr(
            "stack(2, 'p_retailprice', p_retailprice,"
            " 'p_size_d', CAST(p_size AS DOUBLE)) AS (metric, value)"
        ),
    ).select("partkey", "metric", "value")


_PROFILE_COLS = (
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate",
)


def _profile_oracle() -> str:
    arms = [
        f"""SELECT '{c}' AS column_name,
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               TRUE AS approx_ok
        FROM lineitem"""
        for c in _PROFILE_COLS
    ]
    return "\nUNION ALL\n".join(arms)


@register("q_table_profile", oracle=_profile_oracle())
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-statistics profiler over the fact table — the relation a
    cost-based optimizer's ANALYZE step and a data-quality monitor both
    consume: per column, row count, null count, exact distinct count, and
    a self-checking flag that the engine's HLL estimate
    (approx_count_distinct, rsd=0.05) lands within 3·rsd of the exact
    value. The oracle computes the exact stats and literal TRUE, so the
    driver hash asserts the sketch accuracy in-plan — same posture as the
    sketch family.

    Scale shape: one independent single-column aggregate per column,
    unioned — each scan PRUNES to exactly one parquet column and its
    distinct pre-aggregates map-side on a narrow key. (The tempting
    single-pass multi-distinct aggregate plans as Expand → a |cols|·N-row
    shuffle keyed on ALL columns at once — measured 23.6 s vs 2.6 s for
    this form at sf0.1; per-column narrow jobs are also what ANALYZE
    actually runs.) At 100 TB you drop the exact arm and keep only the
    HLL column — one constant-memory pass; the exact arm here exists to
    certify the sketch."""
    li = t(spark, sf_dir, "lineitem")
    arms = []
    for c in _PROFILE_COLS:
        arms.append(
            li.select(c)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                F.approx_count_distinct(c, 0.05).alias("na"),
            )
            .select(
                F.lit(c).alias("column_name"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                (
                    F.abs(F.col("na") - F.col("n_distinct"))
                    <= 0.15 * F.col("n_distinct")
                ).alias("approx_ok"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


def _spread16_sql(expr: str) -> str:
    """DuckDB twin of functions/zorder._spread16 (nested mask-shift)."""
    x = f"(CAST({expr} AS BIGINT) & 65535)"
    for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


@register(
    "q_zorder_key",
    oracle=f"""
    SELECT l_orderkey AS orderkey,
           l_linenumber AS linenumber,
           l_partkey AS partkey,
           days,
           ({_spread16_sql('l_partkey')}
             | ({_spread16_sql('days')} << 1)) AS z
    FROM (
      SELECT l_orderkey, l_linenumber, l_partkey,
             CAST(date_diff('day', DATE '1990-01-01',
                            CAST(l_shipdate AS DATE)) AS BIGINT) AS days
      FROM lineitem
      WHERE l_partkey BETWEEN 500 AND 520
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    )
    """,
)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering keys for a fact slice — the write-side
    expression behind multi-dimensional data skipping (Delta OPTIMIZE
    ZORDER's core): interleave the bits of two dimension keys so
    range-partitioning on z makes every parquet row group a bounded box
    in BOTH dimensions. SCALE.md's measured experiment: the z-ordered
    layout reads 1% of row groups on a 2-D predicate box where each
    single-dimension sort reads 100% in its blind dimension.

    Plan: one narrow scan (filters pushed), pure shift/mask arithmetic —
    fuses into whole-stage codegen, no UDF anywhere; the oracle mirrors
    the bit chain with DuckDB's native bitwise operators."""
    from ..functions.zorder import zvalue2

    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_partkey").between(500, 520)
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    days = F.datediff(
        F.col("l_shipdate").cast("date"), F.lit("1990-01-01").cast("date")
    ).cast("long")
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.col("l_partkey").alias("partkey"),
        days.alias("days"),
        zvalue2(F.col("l_partkey"), days).alias("z"),
    )


@register(
    "q_constraint_audit",
    oracle="""
    SELECT 'lineitem_orphan_orderkey' AS check_name,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
             AS n_violations
    UNION ALL
    SELECT 'orders_orphan_custkey',
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'lineitem_nonpositive_quantity',
           (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
    UNION ALL
    SELECT 'lineitem_discount_out_of_range',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_discount < 0 OR l_discount > 1)
    UNION ALL
    SELECT 'lineitem_null_shipdate',
           (SELECT COUNT(*) FROM lineitem WHERE l_shipdate IS NULL)
    UNION ALL
    SELECT 'orders_null_orderdate',
           (SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL)
    """,
)
def q_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential/domain constraint audit over the star schema — the
    data-quality contract a warehouse checks after every load: FK
    orphans (anti-join counts) and domain violations (range/null
    predicates). One row per check with its violation count; a clean
    load is all-zeros, and any nonzero row names exactly what broke.

    Scale shape: each FK check is a LEFT ANTI join counting survivors —
    keys-only build sides, bucketable on the FK at 100 TB; domain checks
    are pushed-filter scans. Checks are independent single-pass jobs
    unioned (the q_table_profile lesson: narrow independent scans beat
    one wide fused pass), and each count is an exact integer."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")

    def cnt(df) -> F.Column:
        return df.agg(F.count(F.lit(1)).alias("n_violations"))

    checks = [
        (
            "lineitem_orphan_orderkey",
            cnt(
                li.select("l_orderkey").join(
                    o.select("o_orderkey"),
                    F.col("l_orderkey") == F.col("o_orderkey"),
                    "left_anti",
                )
            ),
        ),
        (
            "orders_orphan_custkey",
            cnt(
                o.select("o_custkey").join(
                    c.select("c_custkey"),
                    F.col("o_custkey") == F.col("c_custkey"),
                    "left_anti",
                )
            ),
        ),
        ("lineitem_nonpositive_quantity", cnt(li.where(F.col("l_quantity") <= 0))),
        (
            "lineitem_discount_out_of_range",
            cnt(li.where((F.col("l_discount") < 0) | (F.col("l_discount") > 1))),
        ),
        ("lineitem_null_shipdate", cnt(li.where(F.col("l_shipdate").isNull()))),
        ("orders_null_orderdate", cnt(o.where(F.col("o_orderdate").isNull()))),
    ]
    out = None
    for name, df in checks:
        arm = df.select(
            F.lit(name).alias("check_name"), F.col("n_violations")
        )
        out = arm if out is None else out.unionByName(arm)
    return out
