"""Scale-technique demonstrations: query-level rewrites a 100 TB deployment
needs when the default shuffle plan hits a wall — each registered with a
PLAIN-SQL oracle so the driver proves the rewrite is semantics-preserving
(same posture as q_salted_agg: the oracle is the naive plan, the Spark side
is the scale-hardened one; results must hash-match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_join
from .registry import register, t

_PREFILTER_BITS = 16  # fingerprint domain 2^16 → FPs guaranteed at sf>=0.01
_HIGH_VALUE = 400_000.0  # o_totalprice cutoff: selective build side


@register(
    "q_salted_join",
    oracle="""
    SELECT p_brand AS brand,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact⋈dim join (operators/skew.py salted_join): lineitem
    joins part on (partkey, salt) with part replicated ×8 — the manual
    rewrite for a hot part key that would otherwise pin one reducer.
    The oracle is the PLAIN join + group-by: the salted plan must be
    result-identical (every pair meets exactly once, decimal sums commute).

    At 100 TB: AQE skew-join splits oversized map partitions, but a single
    key's rows must still meet the dim row in one task; salting is the
    rewrite that actually divides a hot KEY. Cost is ×8 dim replication
    through the shuffle — chosen here over broadcast to exercise the
    shuffle path (part fits in memory at test SF, but a 100 TB part table
    with wide rows may not)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    joined = salted_join(
        li.select("l_partkey", "l_quantity", "l_orderkey", "l_linenumber"),
        p.select("p_partkey", "p_brand"),
        fact_key="l_partkey",
        dim_key="p_partkey",
        # stable row identity (lineitem PK) — recompute-safe deterministic salt
        salt_cols=["l_orderkey", "l_linenumber"],
    )
    return joined.groupBy(F.col("p_brand").alias("brand")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_prefilter_semi_join",
    oracle=f"""
    SELECT l_returnflag AS returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders WHERE o_totalprice > {_HIGH_VALUE}
    )
    GROUP BY l_returnflag
    """,
)
def q_prefilter_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase bloom-style semi-join: lineitem rows of high-value orders.

    Phase 1 broadcasts the build side's DISTINCT 16-bit key fingerprints
    (``xxhash64(key) mod 2^16`` — deliberately lossy, false positives by
    construction) and prefilters the probe side with a broadcast semi-join
    on the fingerprint. Phase 2 removes the false positives with the exact
    semi-join, but now over the ~0.3% surviving rows instead of the full
    fact table. The oracle is the PLAIN one-phase semi-join: the two-phase
    plan must be result-identical (phase 1 only over-approximates).

    At 100 TB this is the semi-join pushdown every warehouse engine does
    with a runtime bloom filter (Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` injects the same
    shape when stats allow): the fingerprint SET is kilobytes where the
    build rows are gigabytes, so the broadcast stays feasible and the big
    shuffle moves only prefiltered rows. Expressed with DataFrame ops
    (distinct + broadcast + double semi-join) so the plan is explicit and
    stats-independent."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    build = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > _HIGH_VALUE)
        .select("o_orderkey")
    )
    fp = F.pmod(F.xxhash64("l_orderkey"), F.lit(1 << _PREFILTER_BITS))
    # same hash input type (int64) on both sides → identical fingerprints
    build_fp = build.select(
        F.pmod(F.xxhash64("o_orderkey"), F.lit(1 << _PREFILTER_BITS)).alias("_fp")
    ).distinct()
    candidates = li.withColumn("_fp", fp).join(
        F.broadcast(build_fp), "_fp", "left_semi"
    )
    exact = candidates.join(
        F.broadcast(build),
        candidates["l_orderkey"] == build["o_orderkey"],
        "left_semi",
    )
    return exact.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )
