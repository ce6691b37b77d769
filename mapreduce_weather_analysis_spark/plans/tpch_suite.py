"""Classic decision-support query pack (TPC-H shapes Q3/Q7/Q10/Q14/Q18/Q19
adapted to the fixture schema).

The reference engine's relational surface is two fixed MapReduce jobs
(Job1.java / Job2.java); this suite demonstrates the same engine primitives
(scan→filter→join→agg→top-k) composed into the standard warehouse query
shapes a user migrating from the reference would write next. Each query
states its 100 TB plan posture in the docstring: the only fact-fact join is
lineitem⋈orders (shuffle on orderkey; bucketable), every dim is broadcast,
and all double aggregates run through the deterministic decimal-accumulate
helpers (`functions/compat.py`) so the DuckDB oracle hash-matches bit-for-bit.

Fixture-schema adaptations (TESTDATA.md): no partsupp table and no
l_shipmode/l_shipinstruct/l_commitdate/l_receiptdate/c_phone columns.
Q19's shipmode conjuncts are replaced by size/quantity bands; commit/
receipt lateness is proxied as shipdate > orderdate + 90 days (Q4/Q21);
Q9's supply cost is proxied from p_retailprice; Q22's phone country code
becomes the customer's nation; Q12 (shipmode split) stays out of reach.
Every adaptation keeps the query's REASON to exist: the plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.compat import dround_sql, dsum, dsum_sql, psum, psum_sql
from .registry import register, t


@register(
    "q_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey AS orderkey,
           {psum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority AS priority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, orderdate ASC, orderkey ASC
    LIMIT 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 highest-revenue orders not yet shipped at the
    cutoff date, for one market segment.

    Plan: customer is a broadcast dim (segment filter applied before the
    broadcast, so only the matching ~1/5 ships to executors); lineitem⋈orders
    is the fact-fact shuffle join on orderkey (bucket both on orderkey at
    scale and it becomes shuffle-free); grouped psum then a global
    TakeOrderedAndProject — the top-10 never materializes the full group list
    on the driver. Tie-break (revenue desc, orderdate, orderkey) is total, so
    the LIMIT is deterministic across partitionings."""
    cutoff = F.lit("1997-03-15").cast("timestamp")
    c = F.broadcast(
        t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = t(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(psum(rev, alias="revenue"))
        .orderBy(F.desc("revenue"), F.asc("orderdate"), F.asc("orderkey"))
        .limit(10)
        .select("orderkey", "revenue", "orderdate", "priority")
    )


@register(
    "q_nation_volume",
    oracle=f"""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           strftime(l.l_shipdate, '%Y') AS yr,
           {psum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    """,
)
def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.

    Plan: the disjunctive nation-pair predicate lands *after* the dim joins
    (it references both sides), but both nation joins are broadcasts, so the
    only shuffle is the lineitem⋈orders fact join; the pair filter then cuts
    ~(2/N)^2 of rows before the grouped agg. At 100 TB the same plan holds —
    nation/supplier/customer are all broadcast-size."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = F.broadcast(t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    s = F.broadcast(t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    n = t(spark, sf_dir, "nation")
    ns = F.broadcast(n.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")))
    nc = F.broadcast(n.select(F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(ns, F.col("s_nationkey") == F.col("ns_key"))
        .join(nc, F.col("c_nationkey") == F.col("nc_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.date_format("l_shipdate", "yyyy").alias("yr"),
        )
        .agg(psum(rev, alias="revenue"))
    )


@register(
    "q_returned_items",
    oracle=f"""
    SELECT c.c_custkey AS custkey,
           c.c_name AS name,
           {psum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           n.n_name AS nation
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 4
    ORDER BY revenue DESC, custkey ASC
    LIMIT 20
    """,
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in one
    quarter.

    Plan: quarter filter prunes orders before the fact join (at scale, with
    orders partitioned by month, this is partition pruning — SCALE.md);
    returnflag filter pushes to the lineitem scan; customer/nation broadcast;
    deterministic top-20 via total order (revenue desc, custkey)."""
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    c = F.broadcast(t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey"))
    n = F.broadcast(t(spark, sf_dir, "nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
        )
        .agg(psum(rev, alias="revenue"))
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
        .select("custkey", "name", "revenue", "nation")
    )


@register(
    "q_promo_revenue",
    oracle=f"""
    SELECT CAST(CAST(CAST(
             100.0 * {psum_sql("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END")}
             / {psum_sql('l.l_extendedprice * (1 - l.l_discount)')}
           AS VARCHAR) AS DECIMAL(28,6)) AS DOUBLE) AS promo_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
    """,
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue from promo parts.

    Plan: month filter pushes to the lineitem scan; part is a broadcast dim;
    a single global agg computes both the conditional and total sums in one
    pass (no second scan, no self-join). Both sums are decimal-exact, so the
    final ratio is one deterministic double division — hash-stable vs the
    oracle; the last round through DECIMAL(28,6) normalizes the division
    result across engines."""
    from ..functions.compat import dround

    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    p = F.broadcast(t(spark, sf_dir, "part").select("p_partkey", "p_type"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * psum(promo) / psum(rev)).alias("raw"),
        )
        .select(dround(F.col("raw"), 6).alias("promo_pct"))
    )


@register(
    "q_big_orders",
    oracle="""
    SELECT c.c_custkey AS custkey,
           c.c_name AS name,
           o.o_orderkey AS orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2, 3, 4, 5
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 300
    """,
)
def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a threshold,
    with their customers.

    Plan: aggregate lineitem by orderkey FIRST (map-side combine shrinks the
    shuffle to |orders|), filter on the HAVING threshold, then join the
    surviving ~1% of orderkeys to orders — at 100 TB this ordering is the
    difference between shuffling 60 B rows and 15 B pre-combined groups.
    The oracle's join-then-group form is semantically identical (orderkey is
    the lineitem group key and joins are 1:N on it)."""
    li_qty = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity", alias="total_qty"))
        .where(F.col("total_qty") > 300)
    )
    o = t(spark, sf_dir, "orders")
    c = F.broadcast(t(spark, sf_dir, "customer").select("c_custkey", "c_name"))
    return (
        li_qty.join(o, li_qty.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
            "total_qty",
        )
    )


@register(
    "q_brand_revenue",
    oracle=f"""
    SELECT {psum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 30 AND l.l_quantity <= 50)
    """,
)
def q_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a disjunction of brand/size/quantity
    band predicates (shipmode conjuncts dropped — column absent from the
    fixture schema).

    Plan: the OR-of-ANDs references both join sides, so it evaluates post-
    join — but part is broadcast, so there is no shuffle at all; Catalyst
    additionally derives the single-side implied filters (quantity ∈ [10,50],
    brand ∈ {{1,2}} ∧ size ∈ [1,50]) and pushes them into both scans, which
    is the entire point of this query shape."""
    li = t(spark, sf_dir, "lineitem")
    p = F.broadcast(t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(30, 50)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(psum(rev, alias="revenue"))
    )


# --- Round-5 widening: the subquery/exists/anti-join TPC-H shapes ----------
#
# Q13/Q15/Q17/Q4/Q21/Q22 adapted to the fixture schema (TESTDATA.md: no
# partsupp table, no c_phone/o_comment/l_commitdate/l_receiptdate columns —
# each adaptation keeps the query's REASON to exist: the plan shape).
# "late" stands in for commit/receipt lateness as shipdate > orderdate+90d.


@register(
    "q_cust_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY 1
    ) t
    GROUP BY 1
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_cust_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count (including
    zero-order customers via the left join).

    Plan: aggregate the orders FACT by custkey first (map-side combine →
    the shuffle carries one pre-combined row per customer, not |orders|),
    then LEFT join customer on custkey — both sides keyed on custkey, so
    bucketed layouts make it exchange-free at 100 TB. The second agg groups
    a |customer|-sized relation by a small-cardinality count value; the
    final sort is O(distinct counts) on the driver-bound result."""
    o_counts = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    c = t(spark, sf_dir, "customer").select("c_custkey")
    per_cust = c.join(
        o_counts, c.c_custkey == o_counts.o_custkey, "left"
    ).select(F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l.l_suppkey,
             {psum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS total_revenue
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '1996-10-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS name, rev.total_revenue
    FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY suppkey
    """,
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in one quarter
    (scalar agg subquery over a derived view).

    Plan: one lineitem scan with the quarter filter pushed down, grouped by
    suppkey (map-side combined, |supplier|-sized result); the MAX is a 1-row
    agg of that small relation, broadcast back for the equality filter, and
    supplier is a broadcast dim — no second fact scan, no shuffle beyond
    the one grouped agg. Revenue uses psum (exact decimal accumulation), so
    the MAX-equality predicate is deterministic cross-engine — with plain
    double sums, ties at the top would be engine-dependent."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    rev_expr = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = li.groupBy("l_suppkey").agg(psum(rev_expr, alias="total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = F.broadcast(t(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            "total_revenue",
        )
        .orderBy("suppkey")
    )


@register(
    "q_small_qty_revenue",
    oracle=f"""
    WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'),
    li AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l JOIN bp ON l.l_partkey = bp.p_partkey
    ),
    av AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(l_quantity) AS avg_qty
      FROM li GROUP BY 1
    )
    SELECT {dround_sql(f"{dsum_sql('li.l_extendedprice')} / 7.0", 6)} AS avg_yearly
    FROM li JOIN av USING (l_partkey)
    WHERE li.l_quantity < 0.2 * av.avg_qty
    """,
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost if small-quantity orders (below 20% of
    the part's average order quantity) for one brand moved to bulk.

    Plan: the brand filter makes part a tiny broadcast semi-filter BEFORE
    the correlated-subquery work, so the per-part AVG runs over only the
    brand's lineitems (identical semantics — the correlation key is
    partkey). The per-part averages are |brand parts|-sized → broadcast
    back for the threshold predicate; the fact table is scanned once and
    shuffled once (the partkey agg). Both the AVG (decimal sum / count) and
    the final SUM (dsum) are order-independent, so the threshold comparison
    and the result hash cross-engine."""
    from ..functions.compat import davg, dround

    bp = F.broadcast(
        t(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .join(bp, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    av = li.groupBy("l_partkey").agg(davg("l_quantity", alias="avg_qty"))
    return (
        li.join(F.broadcast(av), "l_partkey")
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(dround(dsum("l_extendedprice") / 7.0, 6).alias("avg_yearly"))
    )


@register(
    "q_late_shipment_priority",
    oracle="""
    SELECT o.o_orderpriority AS priority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: count of one quarter's orders, by priority, having at
    least one late lineitem ("late" = shipped >90 days after order date —
    the fixture has no commit/receipt dates, TESTDATA.md).

    Plan: LEFT SEMI join — the exists probe never duplicates orders however
    many lineitems are late, and Spark keeps only the join keys of the
    probe side in the hash relation. The equi-key is orderkey (bucketable
    fact-fact at scale) with the lateness range predicate evaluated as a
    residual join condition; the quarter filter prunes orders before the
    join (partition pruning on an orderdate-partitioned layout)."""
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("priority")
    )


@register(
    "q_solo_late_supplier",
    oracle="""
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    po AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
      FROM li GROUP BY 1
    ),
    solo AS (
      SELECT DISTINCT li.l_orderkey, li.l_suppkey
      FROM li JOIN po USING (l_orderkey)
      WHERE li.late AND po.n_supp >= 2 AND po.n_late = 1
    )
    SELECT s.s_name AS name, COUNT(*) AS numwait
    FROM solo JOIN supplier s ON solo.l_suppkey = s.s_suppkey
    GROUP BY 1
    ORDER BY numwait DESC, name
    LIMIT 20
    """,
)
def q_solo_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on
    multi-supplier finished orders ("waiting suppliers").

    Plan: the textbook form is two correlated self-joins on lineitem
    (EXISTS other-supplier + NOT EXISTS other-late-supplier) — two extra
    fact-fact shuffles. The equivalent aggregate formulation used here
    (and mirrored verbatim in the oracle) groups the fact ONCE per
    orderkey, counting distinct suppliers and distinct LATE suppliers:
    a row is a "solo late" exactly when it is late, n_supp >= 2, and
    n_late = 1 (the late set is only the supplier itself). That turns O(fact²-join) into
    one grouped agg + one orderkey re-join — the same shuffle the join
    already needs, so at 100 TB it is strictly cheaper than the EXISTS
    pair. Top-20 via TakeOrdered on a total order (numwait desc, name)."""
    o = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ).alias("late"),
        )
    )
    po = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "n_late"
        ),
    )
    solo = (
        li.where(F.col("late"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(po.where((F.col("n_supp") >= 2) & (F.col("n_late") == 1)), "l_orderkey")
    )
    s = F.broadcast(t(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        solo.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_name").alias("name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("name"))
        .limit(20)
    )


@register(
    "q_idle_customers",
    oracle=f"""
    WITH ab AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(c_acctbal) AS ab
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n.n_name AS nation,
           COUNT(*) AS numcust,
           {dsum_sql('c.c_acctbal')} AS totacctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey, ab
    WHERE c.c_acctbal > ab.ab
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy-but-idle customers — above-average positive
    account balance and no orders since a cutoff — grouped by nation (the
    fixture has no c_phone, so nation replaces the phone-prefix country
    code; the recency cutoff replaces Q22's "no orders at all", which is
    vacuous on the fixture where every customer has ordered).

    Plan: the global average is a 1-row agg broadcast into the filter (the
    scalar subquery); the NOT EXISTS is a LEFT ANTI join of customer
    against the DISTINCT custkeys of recent orders — the cutoff prunes the
    orders scan first, pre-distincting shrinks the build side to one row
    per active customer, and both sides key on custkey (bucketable).
    nation broadcasts. dsum/davg keep the threshold and the output sums
    order-independent."""
    from ..functions.compat import davg

    c = t(spark, sf_dir, "customer")
    ab = c.where(F.col("c_acctbal") > 0).agg(davg("c_acctbal", alias="ab"))
    buyers = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    n = F.broadcast(t(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    return (
        c.crossJoin(F.broadcast(ab))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(buyers, c.c_custkey == buyers.o_custkey, "left_anti")
        .join(n, c.c_nationkey == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", alias="totacctbal"),
        )
        .orderBy("nation")
    )


@register(
    "q_forecast_revenue",
    oracle=f"""
    SELECT {psum_sql('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue change from dropping small-quantity
    mid-discount lineitems for one year — the canonical pure
    filter-and-aggregate probe.

    Plan: every predicate pushes to the parquet scan (`PushedFilters`
    carries the date range, discount band, and quantity bound), the scan
    reads exactly three columns, and the single global agg partial-
    aggregates map-side — at 100 TB this query IS the scan, which is the
    point of its shape. The discount band compares the same stored
    doubles in both engines (no arithmetic before the comparison)."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        psum(F.col("l_extendedprice") * F.col("l_discount"), alias="revenue")
    )


@register(
    "q_market_share",
    oracle=f"""
    WITH rev AS (
      SELECT strftime(o.o_orderdate, '%Y') AS yr,
             ns.n_name AS supp_nation,
             {psum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS volume
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = nc.n_regionkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
      GROUP BY 1, 2
    )
    SELECT yr,
           {dround_sql(
               psum_sql(
                   "CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0.0 END"
               )
               + " / " + psum_sql("volume"), 6)} AS mkt_share
    FROM rev
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a part type's revenue
    within one customer region, by year.

    Plan: five broadcast dims around the single lineitem⋈orders fact-fact
    shuffle; the region/type filters push into the customer-side and part
    broadcasts BEFORE they ship. The share divides two exact decimal sums
    grouped on (year, supplier nation) — a ≤|years·nations|-row relation —
    so the second agg is driver-trivial and the ratio deterministic
    (psum both sides, dround after the one division)."""
    from ..functions.compat import dround

    li = t(spark, sf_dir, "lineitem")
    p = F.broadcast(
        t(spark, sf_dir, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    s = F.broadcast(t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    n = t(spark, sf_dir, "nation")
    ns = F.broadcast(
        n.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation"))
    )
    r = F.broadcast(
        t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA").select("r_regionkey")
    )
    nc = F.broadcast(
        n.join(r, n.n_regionkey == F.col("r_regionkey")).select(
            F.col("n_nationkey").alias("nc_key")
        )
    )
    c = F.broadcast(t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = (
        li.join(p, li.l_partkey == F.col("p_partkey"))
        .join(s, li.l_suppkey == F.col("s_suppkey"))
        .join(ns, F.col("s_nationkey") == F.col("ns_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(nc, c.c_nationkey == F.col("nc_key"))
        .groupBy(
            F.date_format("o_orderdate", "yyyy").alias("yr"),
            "supp_nation",
        )
        .agg(psum(vol, alias="volume"))
    )
    # both share sums route through psum like every other money aggregate:
    # the grouped relation is tiny, but plain double SUM order still varies
    # across engines/partitionings — decimal accumulation keeps the ratio's
    # operands bit-identical before the one division
    share = psum(
        F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(0.0)
    ) / psum(F.col("volume"))
    return (
        rev.groupBy("yr")
        .agg(dround(share, 6).alias("mkt_share"))
        .orderBy("yr")
    )


@register(
    "q_product_profit",
    oracle=f"""
    SELECT ns.n_name AS nation,
           strftime(o.o_orderdate, '%Y') AS yr,
           {psum_sql(
               "l.l_extendedprice * (1 - l.l_discount)"
               " - 0.6 * p.p_retailprice * l.l_quantity")} AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    ORDER BY 1, 2 DESC
    """,
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a product line by supplier nation and
    year. The fixture has no partsupp table, so supply cost is proxied as
    60% of the part's retail price (TESTDATA.md adaptation) — the shape
    (name-pattern part filter, four dims around the fact, signed profit
    aggregate) is what the query exists to exercise.

    Plan: the LIKE filter prunes part before its broadcast; supplier/
    nation broadcast; lineitem⋈orders is the one fact-fact shuffle. The
    profit expression is one product-difference per row through psum's
    exact accumulation, so the signed sums hash cross-engine."""
    li = t(spark, sf_dir, "lineitem")
    p = F.broadcast(
        t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    s = F.broadcast(t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    ns = F.broadcast(
        t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("nation")
        )
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(p, li.l_partkey == F.col("p_partkey"))
        .join(s, li.l_suppkey == F.col("s_suppkey"))
        .join(ns, F.col("s_nationkey") == F.col("ns_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "nation",
            F.date_format("o_orderdate", "yyyy").alias("yr"),
        )
        .agg(psum(profit, alias="profit"))
        .orderBy(F.asc("nation"), F.desc("yr"))
    )


@register(
    "q_parts_supplier_breadth",
    oracle="""
    SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_size IN (1, 2, 3, 4, 5)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, brand ASC, type ASC, size ASC
    """,
)
def q_parts_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can furnish each
    (brand, type, size) bucket, excluding one brand and restricted to a
    size band — the supplier-diversity report. Fixture adaptation: no
    partsupp table, so the supplier-part relationship is taken from the
    FACT (every (l_partkey, l_suppkey) pair that actually shipped) —
    Q16's plan reason survives intact: a distinct-aggregate over a
    fact⋈dim join with a dim-side filter.

    Plan: part (dim) broadcasts with both predicates pushed into its
    scan; the distinct-agg is the interesting part at 100 TB — Spark
    plans COUNT(DISTINCT) as a two-level expand/partial-agg (first
    de-dup (group, suppkey) pairs map-side, then count), so the shuffle
    carries de-duplicated pairs, never raw fact rows, and a hot bucket
    adds distinct keys rather than bytes on one task. Cited: TPC-H
    spec Q16; partsupp absence per TESTDATA.md."""
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = F.broadcast(
        t(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#13")
            & F.col("p_size").isin(1, 2, 3, 4, 5)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"),
            F.asc("brand"),
            F.asc("type"),
            F.asc("size"),
        )
    )


@register(
    "q_mincost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS supplycost
      FROM lineitem
      GROUP BY 1, 2
    ),
    eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    cand AS (
      SELECT ps.l_partkey, ps.l_suppkey, ps.supplycost,
             eu.s_name, eu.s_acctbal, eu.n_name, p.p_name
      FROM ps
      JOIN eu ON eu.s_suppkey = ps.l_suppkey
      JOIN part p ON p.p_partkey = ps.l_partkey
      WHERE p.p_type = 'ECONOMY' AND p.p_size IN (10, 15, 20)
    ),
    mn AS (
      SELECT l_partkey, MIN(supplycost) AS min_cost
      FROM cand GROUP BY 1
    )
    SELECT c.s_acctbal AS acctbal, c.s_name AS sname, c.n_name AS nname,
           c.l_partkey AS partkey, c.p_name AS pname,
           c.supplycost AS supplycost
    FROM cand c JOIN mn ON mn.l_partkey = c.l_partkey
    WHERE c.supplycost = mn.min_cost
    ORDER BY acctbal DESC, sname ASC, partkey ASC
    LIMIT 20
    """,
)
def q_mincost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each ECONOMY part in a size band, the EUROPE
    supplier offering it at the minimum unit cost. Fixture adaptation
    (TESTDATA.md: no partsupp): the supplier-part catalog is derived from
    the FACT — supplycost(part, supp) = MIN(l_extendedprice/l_quantity)
    over every line that supplier actually shipped for that part. Q2's
    plan reason survives: a correlated min-cost subquery, rewritten the
    scalable way — per-part MIN + join back (no per-part window, no
    correlated re-scan).

    Plan: one shuffle builds the derived catalog (groupBy composite
    (partkey, suppkey); map-side MIN combines first, so the shuffle
    carries one row per pair, not raw fact rows). Supplier⋈nation⋈region
    and the filtered part dim all broadcast — the region and size/type
    predicates prune BEFORE the min-cost race, exactly like Q2's WHERE
    placement. The per-part min relation is |qualifying parts| rows;
    joining it back is skew-free (one row per key build side). The double
    equality supplycost = min_cost is exact: MIN returns one of the
    already-computed IEEE values, bit-identical in both engines. Total
    ORDER BY incl. unique (sname, partkey) makes LIMIT deterministic.
    Cited: TPC-H spec Q2; reference has no relational surface beyond
    Job1/Job2 (SURVEY.md §2)."""
    li = t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "supplycost"
        )
    )
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu = F.broadcast(
        t(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = F.broadcast(
        t(spark, sf_dir, "part")
        .where(
            (F.col("p_type") == "ECONOMY")
            & F.col("p_size").isin(10, 15, 20)
        )
        .select("p_partkey", "p_name")
    )
    cand = (
        ps.join(eu, ps.l_suppkey == eu.s_suppkey)
        .join(p, ps.l_partkey == p.p_partkey)
        .select(
            "l_partkey", "supplycost", "s_name", "s_acctbal", "n_name",
            "p_name",
        )
    )
    mn = cand.groupBy("l_partkey").agg(
        F.min("supplycost").alias("min_cost")
    )
    return (
        cand.join(mn, "l_partkey")
        .where(F.col("supplycost") == F.col("min_cost"))
        .select(
            F.col("s_acctbal").alias("acctbal"),
            F.col("s_name").alias("sname"),
            F.col("n_name").alias("nname"),
            F.col("l_partkey").alias("partkey"),
            F.col("p_name").alias("pname"),
            "supplycost",
        )
        .orderBy(F.desc("acctbal"), F.asc("sname"), F.asc("partkey"))
        .limit(20)
    )


@register(
    "q_important_parts",
    oracle=f"""
    WITH v AS (
      SELECT l.l_partkey AS partkey,
             {psum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
      GROUP BY 1
    ),
    tot AS (SELECT {psum_sql('val')} AS total FROM v)
    SELECT v.partkey, v.val
    FROM v, tot
    WHERE v.val > CAST(0.0008 AS DOUBLE) * tot.total
    ORDER BY v.val DESC, v.partkey ASC
    """,
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose discounted revenue through EUROPE
    suppliers exceeds a fixed fraction of the region's total — the
    "important stock" report. Fixture adaptation (no partsupp/availqty):
    value(part) = revenue actually shipped via the region's suppliers,
    which keeps Q11's reason intact — a grouped aggregate filtered
    against a GLOBAL scalar aggregate of itself.

    Plan: supplier⋈nation⋈region broadcasts (region predicate prunes the
    supplier list before the fact scan touches it); one shuffle groups
    the fact by partkey with map-side decimal partials. The global total
    re-aggregates the per-part relation (|parts| rows, not a second fact
    scan) and comes back as a 1-row broadcast cross join — Spark plans
    the threshold as a BroadcastNestedLoopJoin over |parts| rows, never
    a second pass over 100 TB. Determinism: both sums route through
    shortest-string decimal (psum), and the per-part values are exact
    decimal(18,6) round-trips, so re-summing them is exact in both
    engines; the 0.0008·total product is one IEEE multiply of identical
    doubles. Cited: TPC-H spec Q11."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu = F.broadcast(
        t(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    v = (
        li.join(eu, li.l_suppkey == eu.s_suppkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(psum(rev, alias="val"))
    )
    tot = F.broadcast(v.agg(psum(F.col("val"), alias="total")))
    return (
        v.crossJoin(tot)
        .where(F.col("val") > F.lit(0.0008) * F.col("total"))
        .select("partkey", "val")
        .orderBy(F.desc("val"), F.asc("partkey"))
    )


@register(
    "q_lateness_priority_split",
    oracle="""
    SELECT CASE
             WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30
               THEN 'FAST'
             WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 90
               THEN 'NORMAL'
             ELSE 'LATE'
           END AS ship_bucket,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_lateness_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: for one year of shipments, how many high- vs
    low-priority lines fall in each shipping-speed class. Fixture
    adaptation (no l_shipmode, TESTDATA.md): the group key is the
    ship-latency band (<=30d FAST / <=90d NORMAL / else LATE), which
    preserves Q12's plan reason — a fact-fact join whose aggregate is a
    pair of CONDITIONAL counts over a derived line attribute.

    Plan: the year filter prunes lineitem at the scan (pushed predicate;
    partition pruning on a shipdate-partitioned layout); the only
    shuffle is the orderkey equi-join (bucketable fact-fact at 100 TB —
    the same key as Q3/Q18, so one bucketed layout serves all three).
    The conditional SUMs are integer partial aggregates — map-side
    combine reduces each task to <=3 rows before the final 3-row
    exchange. All-integer outputs: no float determinism surface at all.
    Cited: TPC-H spec Q12."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(lag <= 30, "FAST").when(lag <= 90, "NORMAL").otherwise("LATE")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    one = F.lit(1)
    zero = F.lit(0)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(is_high, one).otherwise(zero)).alias(
                "high_line_count"
            ),
            F.sum(F.when(~is_high, one).otherwise(zero)).alias(
                "low_line_count"
            ),
        )
        .orderBy("ship_bucket")
    )


@register(
    "q_dominant_supplier",
    oracle="""
    WITH sq AS (
      SELECT l.l_partkey, l.l_suppkey,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE '%bolt%'
        AND l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT l_partkey,
             CAST(SUM(CAST(CAST(qty AS VARCHAR) AS DECIMAL(18,2))) AS DOUBLE)
               AS total_qty
      FROM sq GROUP BY 1
    ),
    dominant AS (
      SELECT DISTINCT sq.l_suppkey
      FROM sq JOIN tot ON tot.l_partkey = sq.l_partkey
      WHERE sq.qty > CAST(0.35 AS DOUBLE) * tot.total_qty
    )
    SELECT s.s_name AS sname, n.n_name AS nname
    FROM dominant d
    JOIN supplier s ON s.s_suppkey = d.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'AFRICA'
    ORDER BY sname
    """,
)
def q_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: AFRICA suppliers who were the DOMINANT source
    (>35% of the year's shipped quantity) for some 'bolt' part. Fixture
    adaptation (no partsupp/availqty): Q20's "supplier has excess stock
    of a forest part" becomes "supplier shipped more than a fixed share
    of the part's annual volume" — same nested-aggregate chain (per
    (part,supplier) sum, compared against a per-part total of that same
    relation) feeding a semi-join on supplier.

    Plan: the part-name predicate broadcasts into the fact scan before
    the one real shuffle (groupBy (partkey, suppkey), decimal map-side
    partials); the per-part total re-aggregates the |pairs| relation —
    never a second fact pass — and joins back on partkey (one row per
    key build side, skew-free). The DISTINCT suppkey projection is
    Q20's semi-join: supplier⋈nation⋈region all broadcast dims.
    Determinism: qty is an exact decimal(18,2) sum; the per-part total
    re-sums those exact values through shortest-string decimal, so both
    engines compare identical doubles. Cited: TPC-H spec Q20."""
    p = F.broadcast(
        t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%bolt%"))
        .select("p_partkey")
    )
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    sq = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity", scale=2, alias="qty"))
    )
    tot = sq.groupBy("l_partkey").agg(
        psum(F.col("qty"), scale=2, alias="total_qty")
    )
    dominant = (
        sq.join(tot, "l_partkey")
        .where(F.col("qty") > F.lit(0.35) * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "AFRICA")
    s = F.broadcast(
        t(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        dominant.join(s, dominant.l_suppkey == s.s_suppkey)
        .select(
            F.col("s_name").alias("sname"), F.col("n_name").alias("nname")
        )
        .orderBy("sname")
    )
