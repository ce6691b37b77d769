"""Bucketed-table layout: shuffle elimination for repeated fact-fact joins.

The reference has no layout story at all (flat CSV on HDFS, every job
re-shuffles — Job1.java/Job2.java each pay a full sort); Spark's
equivalent of "pay once, join forever" is ``bucketBy`` on the join key.
A parquet scan of a bucketed table reports
``HashPartitioning(key, nbuckets)``, so Catalyst drops the shuffle in
front of any aggregate or join keyed on it — the Q18/Q3 exchange SCALE.md
measured at 22× growth (15M groups at the 100× run) disappears from the
per-query plan and becomes a one-time write cost amortized across every
downstream query on the key.

100 TB posture: bucket both fact tables on the shared key (orderkey) with
the SAME bucket count sized so one bucket ≈ one task's memory (e.g. 2048
buckets for 60 B lineitem rows); dims keep broadcasting. Bucket-pruning
also applies to point lookups on the key. The layout is plan-verified in
``tests/test_bucketed.py`` (no Exchange in the bucketed Q18 core) and the
wall-clock delta is recorded in SCALE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.compat import dsum


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as an external parquet table bucketed by ``key`` and
    sorted within buckets by ``sort_cols`` (default: the key). The input is
    pre-repartitioned on the key with the SAME murmur3 mapping bucketing
    uses, so each bucket lands in exactly ONE file — the condition under
    which Spark exposes the files' sort order to the planner
    (``spark.sql.legacy.bucketedTableScan.outputOrdering=true``), letting a
    downstream sort-merge join or window skip its Sort, not just its
    Exchange. That conf is session-level, off by default, and changes PLAN
    behavior for every bucketed scan — so this WRITE helper does not touch
    it: the read/plan helpers that rely on Sort elision set it themselves
    (``big_orders_bucketed`` does), and external readers opt in the same
    way. (Earlier versions set it here as a write side effect, silently
    reconfiguring the caller's whole session.)"""
    sort_cols = sort_cols or [key]
    (
        df.repartition(buckets, key)
        .write.format("parquet")
        .mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(*sort_cols)
        .option("path", path)
        .saveAsTable(table)
    )


def big_orders_bucketed(
    spark: SparkSession,
    li_table: str = "lineitem_bucketed",
    o_table: str = "orders_bucketed",
) -> DataFrame:
    """The Q18 fact-fact core (plans/tpch_suite.py:q_big_orders, minus the
    broadcast customer dim) over pre-bucketed tables: aggregate lineitem by
    orderkey, filter the HAVING threshold, join the surviving orderkeys to
    orders. Over bucketed inputs BOTH the pre-aggregation exchange and the
    join exchanges vanish — the scans' bucket partitioning satisfies every
    downstream distribution requirement."""
    # one-file-per-bucket layouts (write_bucketed) also expose their sort
    # order when this is on — required for Sort elision, harmless otherwise
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    )
    li_qty = (
        spark.table(li_table)
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity", alias="total_qty"))
        .where(F.col("total_qty") > 300)
    )
    o = spark.table(o_table)
    return li_qty.join(o, li_qty.l_orderkey == o.o_orderkey).select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_totalprice").cast("double").alias("totalprice"),
        "total_qty",
    )
