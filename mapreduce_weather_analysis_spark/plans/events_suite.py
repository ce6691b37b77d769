"""Event-stream analytics over ``events`` — the batch twins of the
streaming operators (streaming_suite runs the same logic through
Structured Streaming; these forms carry the DuckDB oracles).

Time semantics: ``ts`` arrives as TIMESTAMP(NANOS) parquet, loaded as a
µs-truncated timestamp (sources/tables.py) — identical to DuckDB's own
ns→µs truncation, so window boundaries agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.compat import bounded_rank_window
from .registry import register, t


@register(
    "q_events_tumbling",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation per event type — the canonical
    streaming shape (streaming_suite runs it with watermark + availableNow;
    this batch twin is provably equivalent and oracle-checkable).

    Window starts are emitted as UTC strings, not timestamps: collect()
    renders timestamps in the *Python process* timezone, which would break
    value comparison on non-UTC hosts."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.window("ts", "1 hour").start, "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "q_events_sliding",
    oracle="""
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM (
      SELECT unnest([
               time_bucket(INTERVAL '30 minutes', ts),
               time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
             ]) AS window_start,
             event_type, value
      FROM events
    )
    GROUP BY 1, 2
    """,
)
def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h length, 30 min slide): each event lands in two
    overlapping windows. Spark's window() expands rows exactly like the
    oracle's two-bucket unnest (both grids align to the epoch)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(
                F.window("ts", "1 hour", "30 minutes").start, "yyyy-MM-dd HH:mm:ss"
            ).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@register(
    "q_events_sessionize",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                       OR lag(epoch_us(ts)) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, event_id, value, ts_us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) AS session_end_us,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM sessions
    GROUP BY 1, 2
    """,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + cumulative-sum of
    session starts — the batch form of streaming session windows. Timestamps
    compared as epoch microseconds (exact integers, engine-agnostic).
    Boundary matches native session_window's end-EXCLUSIVE interval
    [start, last+gap): an event arriving exactly gap after the previous
    one starts a NEW session (predicate >=, both engines)."""
    e = t(spark, sf_dir, "events")
    ts_us = F.unix_micros("ts")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        "event_id",
        "value",
        ts_us.alias("ts_us"),
        F.when(
            (ts_us - F.lag(ts_us).over(w) >= 1_800_000_000)
            | F.lag(ts_us).over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    w2 = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sessions = gaps.select(
        "user_id",
        "event_id",
        "value",
        "ts_us",
        F.sum("is_new").over(w2).cast("bigint").alias("session_id"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
    )


@register(
    "q_approx_count_distinct",
    oracle="""
    -- Self-checking sketch contract: Spark emits the exact distinct count
    -- plus an in-plan boolean asserting the HLL++ estimate is within 3×rsd
    -- (+3 absolute slack). The oracle emits the same exact values and a
    -- literal TRUE — the hash matches iff the sketch really was in bounds,
    -- turning the old rows-only row into a full correctness assertion.
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS approx_within_3rsd
    FROM events GROUP BY 1
    """,
)
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct users per event type, emitted as
    a self-checking row: exact COUNT(DISTINCT) + a boolean that the HLL++
    estimate (rsd=0.02) lands within 3×rsd (observed error at both test
    SFs: 0 — the bound is 3σ of the advertised accuracy, deterministic
    given the data since Spark's HLL++ hashing is deterministic).
    The 100 TB rationale for the sketch: one pass, fixed sketch memory, no
    distinct-expansion shuffle — the exact twin here exists only to make
    the driver row a real assertion rather than a rows-only check."""
    e = t(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_raw"),
    )
    tol = F.greatest(
        F.round(F.col("exact_users") * 0.06).cast("bigint"), F.lit(3)
    )
    return agg.select(
        "event_type",
        "n_events",
        "exact_users",
        (F.abs(F.col("approx_raw") - F.col("exact_users")) <= tol).alias(
            "approx_within_3rsd"
        ),
    )


@register(
    "q_events_session_window",
    oracle="""
    WITH gaps AS (
      SELECT user_id, value, epoch_us(ts) AS ts_us,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                       OR lag(epoch_us(ts)) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, value, ts_us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps
    )
    SELECT user_id,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) + 1800000000 AS session_end_us,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    """,
)
def q_events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in session_window (30-min gap): Spark's native session
    bucketing, oracle-checked against the lag+cumsum formulation — the two
    independent constructions must produce identical session bounds
    (window end = last event + gap)."""
    e = t(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        e.groupBy("user_id", sw)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
        )
    )


@register(
    "q_scd2_history",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
           epoch_us(ts) AS effective_from,
           lead(epoch_us(ts)) OVER w AS effective_to,
           lead(epoch_us(ts)) OVER w IS NULL AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 effective dating (operators/merge.py): every event becomes a
    dimension version valid [effective_from, effective_to), open-ended for
    the current state — the change-history layout MERGE-based lakehouse
    pipelines maintain; here one window pass."""
    from ..operators.merge import scd2_history

    e = t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    # total per-key order: (ts_us, event_id)
    w_df = scd2_history(
        e.withColumn("_ord", F.struct("ts_us", "event_id")), "user_id", "_ord"
    )
    return w_df.select(
        "user_id",
        "event_id",
        "ts_us",
        "value",
        F.col("effective_from.ts_us").alias("effective_from"),
        F.col("effective_to.ts_us").alias("effective_to"),
        "is_current",
    )


@register(
    "q_cdc_apply",
    oracle="""
    WITH ch AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             CASE event_type WHEN 'signup' THEN 'I'
                             WHEN 'error' THEN 'D'
                             ELSE 'U' END AS op,
             value
      FROM events
    ),
    latest AS (
      SELECT user_id, CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT)
               AS n_changes,
             ts_us, event_id, op, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC
             ) AS rn
      FROM ch
    )
    SELECT user_id, n_changes, op AS last_op, ts_us AS last_ts_us,
           value AS last_value
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC CHANGELOG to produce current table state — the
    Debezium-to-lakehouse fold every ingestion pipeline runs: events
    become ops (signup=INSERT, error=DELETE, rest=UPDATE payloads),
    latest-wins per key in (ts, event_id) order, and keys whose FINAL
    op is a delete are tombstoned out of the result entirely (the
    delete fold q_latest_per_key doesn't model and q_scd2_history
    retains as history). Output: surviving keys with change count and
    final payload.

    Scale shape: ONE hash-partial-aggregated groupBy — the fold is a
    skew-safe max-of-struct argmax over the unique (ts, event_id)
    order key plus a counter, never a per-key window over the
    changelog (the oracle's ROW_NUMBER formulation is the spec, not
    the plan; at 10⁹ changes per hot key a window would single-thread
    exactly the keys CDC makes hot). Payload doubles pass through
    untouched — no arithmetic to diverge."""
    ch = t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        "value",
    )
    folded = ch.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_changes"),
        F.max(F.struct("ts_us", "event_id", "op", "value")).alias("last"),
    )
    return folded.where(F.col("last.op") != "D").select(
        "user_id",
        "n_changes",
        F.col("last.op").alias("last_op"),
        F.col("last.ts_us").alias("last_ts_us"),
        F.col("last.value").alias("last_value"),
    )


@register(
    "q_merge_upsert",
    oracle="""
    WITH mbase AS (
      SELECT o_orderkey, o_custkey, o_orderstatus AS status,
             o_totalprice AS price, CAST(o_orderdate AS DATE) AS ts
      FROM orders WHERE o_orderkey % 4 <> 1
    ),
    mupd AS (
      SELECT o_orderkey, o_custkey,
             'V' || CAST(v AS VARCHAR) AS status,
             CAST(CAST(CAST(o_totalprice + v AS VARCHAR)
               AS DECIMAL(28,2)) AS DOUBLE) AS price,
             CAST(o_orderdate AS DATE) + CAST(v AS INTEGER) AS ts
      FROM orders, (SELECT unnest([1, 2]) AS v)
      WHERE o_orderkey % 4 <= 1
    ),
    mlatest AS (
      SELECT o_orderkey, o_custkey, status, price, ts FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY o_orderkey ORDER BY ts DESC) AS rn
        FROM mupd
      ) WHERE rn = 1
    )
    SELECT b.o_orderkey, b.o_custkey, b.status, b.price,
           strftime(b.ts, '%Y-%m-%d') AS ts
    FROM mbase b
    WHERE NOT EXISTS (
      SELECT 1 FROM mlatest l WHERE l.o_orderkey = b.o_orderkey
    )
    UNION ALL
    SELECT o_orderkey, o_custkey, status, price,
           strftime(ts, '%Y-%m-%d') AS ts
    FROM mlatest
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation (operators/merge.py:17) registered as a
    query — the operator its scd2/latest-per-key/CDC siblings already
    certify was unit-tested only (VERDICT r9 ask #6). Base = orders
    outside the arriving batch; the update batch carries TWO versions
    per key (v ∈ {1,2}: bumped price, dated v days later) and overlaps
    base on half its keys — exercising all three MERGE behaviors at
    once: WHEN MATCHED (latest version replaces the base row), latest-
    wins WITHIN the batch (v=2 beats v=1), and WHEN NOT MATCHED
    (batch-only keys insert). Oracle is the ANSI anti-join + union
    spec of the same plan.

    Scale shape: the within-batch dedup windows over the UPDATE BATCH
    only (incremental batches ≪ base — the one window this family
    allows; the full-table fold stays the max-of-struct in
    q_cdc_apply), and the anti-join hashes on the key (AQE broadcasts
    the batch side when small). Determinism: version dates are unique
    per key within the batch, price bump is dround-pinned, the date
    emits as a formatted string (TZ-proof)."""
    from ..functions.compat import dround
    from ..operators.merge import merge_upsert

    o = t(spark, sf_dir, "orders")
    base = o.where(F.pmod(F.col("o_orderkey"), F.lit(4)) != 1).select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
        F.to_date("o_orderdate").alias("ts"),
    )
    upd = (
        o.where(F.pmod(F.col("o_orderkey"), F.lit(4)) <= 1)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.to_date("o_orderdate").alias("d0"),
            F.explode(F.array(F.lit(1), F.lit(2))).alias("v"),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.concat(F.lit("V"), F.col("v").cast("string")).alias("status"),
            dround(F.col("o_totalprice") + F.col("v"), 2).alias("price"),
            F.date_add("d0", F.col("v")).alias("ts"),
        )
    )
    merged = merge_upsert(base, upd, "o_orderkey", "ts")
    return merged.select(
        "o_orderkey",
        "o_custkey",
        "status",
        "price",
        F.date_format("ts", "yyyy-MM-dd").alias("ts"),
    )


@register(
    "q_events_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
      WHERE e.event_type = 'click' GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT 'view' AS stage, 1 AS stage_idx, COUNT(*) AS n_users FROM s1
    UNION ALL SELECT 'click', 2, COUNT(*) FROM s2
    UNION ALL SELECT 'purchase', 3, COUNT(*) FROM s3
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase, strictly increasing time
    per user): conditional-min cascade, each stage an equi-join back to the
    fact on user_id + a time bound. All three aggregations and joins share
    the user_id key, so a cluster run co-partitions once and every stage is
    shuffle-local from there; stage outputs are one row per converting
    user, shrinking monotonically down the funnel."""
    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def stage(evt: str, prev, prev_t: str, out_t: str):
        base = e.where(F.col("event_type") == evt)
        if prev is not None:
            base = base.join(prev, "user_id").where(F.col("ts") > F.col(prev_t))
        return base.groupBy("user_id").agg(F.min("ts").alias(out_t))

    s1 = stage("view", None, "", "t1")
    s2 = stage("click", s1, "t1", "t2")
    s3 = stage("purchase", s2, "t2", "t3")

    def cnt(df, name: str, idx: int):
        return df.agg(
            F.lit(name).alias("stage"),
            F.lit(idx).alias("stage_idx"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return cnt(s1, "view", 1).unionByName(cnt(s2, "click", 2)).unionByName(
        cnt(s3, "purchase", 3)
    )


@register(
    "q_retention_cohorts",
    oracle="""
    WITH cohort AS (
      SELECT user_id, MIN(strftime(ts, '%Y-%m')) AS cohort_month
      FROM events GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT user_id, strftime(ts, '%Y-%m') AS active_month
      FROM events
    )
    SELECT c.cohort_month,
           (CAST(substr(a.active_month, 1, 4) AS INT) * 12
              + CAST(substr(a.active_month, 6, 2) AS INT))
           - (CAST(substr(c.cohort_month, 1, 4) AS INT) * 12
              + CAST(substr(c.cohort_month, 6, 2) AS INT)) AS months_since,
           COUNT(*) AS n_active_users
    FROM cohort c JOIN activity a ON c.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users bucketed by first-seen month, counted
    in each subsequent active month (months_since 0 = the cohort's own
    month). Two aggregations + one user_id-keyed join — the cohort dim is
    derived from the fact itself, and all three steps share the user_id
    key, so a cluster run co-partitions once. The month delta is computed
    on the string bucket (y*12+m) to stay engine-portable."""
    e = t(spark, sf_dir, "events").select(
        "user_id", F.date_format("ts", "yyyy-MM").alias("month")
    )
    cohort = e.groupBy("user_id").agg(F.min("month").alias("cohort_month"))
    activity = e.distinct().withColumnRenamed("month", "active_month")

    def months(col: str):
        return F.substring(col, 1, 4).cast("int") * 12 + F.substring(
            col, 6, 2
        ).cast("int")

    return (
        cohort.join(activity, "user_id")
        .groupBy(
            "cohort_month",
            (months("active_month") - months("cohort_month")).alias("months_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


def _hll_ok(est, exact):
    """|est − exact| ≤ max(5%·exact, 2): 3σ of default-lgK HLL (rsd≈1.6%)."""
    return F.abs(est.cast("double") - exact) <= F.greatest(
        exact * F.lit(0.05), F.lit(2.0)
    )


@register(
    "q_sketch_mergeable",
    oracle="""
    -- Self-checking mergeable-sketch contract (see q_approx_count_distinct):
    -- exact per-month distincts + a TRUE bounds boolean; the ALL row's
    -- exact union distinct is what the merged sketch must estimate.
    SELECT strftime(ts, '%Y-%m') AS month,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS est_within_bounds
    FROM events GROUP BY 1
    UNION ALL
    SELECT 'ALL', COUNT(*), COUNT(DISTINCT user_id), TRUE FROM events
    """,
)
def q_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (Datasketches HLL): per-month user sketches,
    then a re-merge to the all-time estimate via hll_union_agg — THE
    pre-aggregation pattern at 100 TB: store tiny per-partition sketches,
    answer distinct-count queries over any month range by merging sketches
    instead of rescanning raw events. Self-checking output: each row
    carries the exact distinct count and a boolean that the sketch
    estimate (per-month, and the MERGED sketch for ALL) is within 3σ of
    default-lgK accuracy — so the driver hash-asserts sketch correctness
    including the union-merge path."""
    e = t(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM").alias("month"), "user_id"
    )
    per_month = e.groupBy("month").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    monthly = per_month.select(
        "month",
        "n_events",
        "exact_users",
        _hll_ok(F.hll_sketch_estimate("sk"), F.col("exact_users")).alias(
            "est_within_bounds"
        ),
    )
    merged = per_month.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.sum("n_events").alias("n_events"),
    )
    overall = (
        e.agg(F.countDistinct("user_id").alias("exact_users"))
        .crossJoin(F.broadcast(merged))
        .select(
            F.lit("ALL").alias("month"),
            "n_events",
            "exact_users",
            _hll_ok(F.col("est"), F.col("exact_users")).alias(
                "est_within_bounds"
            ),
        )
    )
    return monthly.unionByName(overall)


@register(
    "q_sketch_quantiles",
    oracle="""
    -- Self-checking KLL contract: exact interpolated percentiles (DuckDB
    -- quantile_cont ≡ Spark percentile, bitwise — the q_percentiles
    -- precedent) + literal TRUE bounds booleans; Spark computes the
    -- booleans in-plan as |kll − exact| ≤ 8% of the global value range
    -- (observed worst error 1.8%; default-k KLL rank error ≈1.7%).
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           quantile_cont(value, 0.5) AS p50_exact,
           quantile_cont(value, 0.95) AS p95_exact,
           TRUE AS p50_ok, TRUE AS p95_ok
    FROM events GROUP BY 1
    UNION ALL
    SELECT 'ALL', CAST(COUNT(*) AS BIGINT),
           quantile_cont(value, 0.5), quantile_cont(value, 0.95),
           TRUE, TRUE
    FROM events
    """,
)
def q_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketches (Datasketches KLL): per-event-type value
    sketch → p50/p95, plus the all-types quantiles by re-merging the
    per-group sketches (kll_merge_agg_double — a second, tiny aggregation
    over sketches, not data) — same store-small/re-merge pattern, for
    quantiles, where exact distributed percentiles need a full sort.
    Self-checking output: exact percentiles + in-plan booleans that the
    KLL values (incl. the MERGED sketch for ALL) sit within 8% of the
    value range — the driver hash-asserts sketch accuracy."""
    e = t(spark, sf_dir, "events").select("event_type", "value")
    rng = e.agg(
        ((F.max("value") - F.min("value")) * F.lit(0.08)).alias("tol")
    )
    sk = e.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value").alias("sk"),
        F.percentile("value", F.lit(0.5)).alias("p50_exact"),
        F.percentile("value", F.lit(0.95)).alias("p95_exact"),
        F.count(F.lit(1)).alias("n"),
    )

    def row(df, label, sk_col):
        q50 = F.kll_sketch_get_quantile_double(sk_col, F.lit(0.5))
        q95 = F.kll_sketch_get_quantile_double(sk_col, F.lit(0.95))
        return df.crossJoin(F.broadcast(rng)).select(
            label.alias("event_type"),
            "n",
            "p50_exact",
            "p95_exact",
            (F.abs(q50 - F.col("p50_exact")) <= F.col("tol")).alias("p50_ok"),
            (F.abs(q95 - F.col("p95_exact")) <= F.col("tol")).alias("p95_ok"),
        )

    per_type = row(sk, F.col("event_type"), F.col("sk"))
    merged = sk.agg(F.expr("kll_merge_agg_double(sk)").alias("m"))
    overall_exact = e.agg(
        F.percentile("value", F.lit(0.5)).alias("p50_exact"),
        F.percentile("value", F.lit(0.95)).alias("p95_exact"),
        F.count(F.lit(1)).alias("n"),
    )
    overall = row(
        overall_exact.crossJoin(F.broadcast(merged)), F.lit("ALL"), F.col("m")
    )
    return per_type.unionByName(overall)


@register(
    "q_events_funnel_windowed",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
       AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 1 HOUR
      WHERE e.event_type = 'click' GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
       AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 1 HOUR
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT 'view' AS stage, 1 AS stage_idx, COUNT(*) AS n_users FROM s1
    UNION ALL SELECT 'click', 2, COUNT(*) FROM s2
    UNION ALL SELECT 'purchase', 3, COUNT(*) FROM s3
    """,
)
def q_events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel with conversion windows: each stage must occur within 1 hour
    of the previous stage's first event — the bounded form real funnels
    use (and the one that produces actual drop-off). Same co-partitioned
    cascade as q_events_funnel; the upper time bound also caps join state
    if run as a streaming funnel."""
    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def stage(evt: str, prev, prev_t: str, out_t: str):
        base = e.where(F.col("event_type") == evt)
        if prev is not None:
            base = base.join(prev, "user_id").where(
                (F.col("ts") > F.col(prev_t))
                & (F.col("ts") <= F.col(prev_t) + F.expr("INTERVAL 1 HOUR"))
            )
        return base.groupBy("user_id").agg(F.min("ts").alias(out_t))

    s1 = stage("view", None, "", "t1")
    s2 = stage("click", s1, "t1", "t2")
    s3 = stage("purchase", s2, "t2", "t3")

    def cnt(df, name: str, idx: int):
        return df.agg(
            F.lit(name).alias("stage"),
            F.lit(idx).alias("stage_idx"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return cnt(s1, "view", 1).unionByName(cnt(s2, "click", 2)).unionByName(
        cnt(s3, "purchase", 3)
    )


@register(
    "q_sketch_set_ops",
    oracle="""
    -- Self-checking theta-sketch contract: the exact user-set algebra via
    -- one per-user flag aggregation + TRUE bounds booleans (Spark computes
    -- |est − exact| ≤ max(5%·exact, 2) in-plan for all three set ops).
    WITH u AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS hc,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS hp
      FROM events
      WHERE event_type IN ('click', 'purchase')
      GROUP BY 1
    )
    SELECT CAST(SUM(hc * hp) AS BIGINT) AS both_exact,
           CAST(COUNT(*) AS BIGINT) AS either_exact,
           CAST(SUM(hc * (1 - hp)) AS BIGINT) AS click_only_exact,
           TRUE AS both_ok, TRUE AS either_ok, TRUE AS click_only_ok
    FROM u
    """,
)
def q_sketch_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra over user sets: estimated |click ∩
    purchase|, |click ∪ purchase|, |click ∖ purchase| from two tiny
    per-type sketches — audience-overlap math without ever materializing
    the sets (at 100 TB the sketches are bytes; the exact DISTINCT
    intersection is a full shuffle). Self-checking output: the exact set
    sizes (one per-user flag agg) + in-plan booleans that each theta
    estimate is within max(5%, ±2) — driver hash-asserts the sketch."""
    e = t(spark, sf_dir, "events").select("event_type", "user_id")
    cp = e.where(F.col("event_type").isin("click", "purchase"))
    sk = cp.groupBy("event_type").agg(F.theta_sketch_agg("user_id").alias("sk"))
    two = sk.agg(
        F.max(F.when(F.col("event_type") == "click", F.col("sk"))).alias("c"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("sk"))).alias("p"),
    )
    est = two.select(
        F.theta_sketch_estimate(F.expr("theta_intersection(c, p)")).alias("e_both"),
        F.theta_sketch_estimate(F.expr("theta_union(c, p)")).alias("e_either"),
        F.theta_sketch_estimate(F.expr("theta_difference(c, p)")).alias("e_conly"),
    )
    exact = (
        cp.groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("hc"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "hp"
            ),
        )
        .agg(
            F.sum(F.col("hc") * F.col("hp")).alias("both_exact"),
            F.count(F.lit(1)).alias("either_exact"),
            F.sum(F.col("hc") * (F.lit(1) - F.col("hp"))).alias(
                "click_only_exact"
            ),
        )
    )

    def ok(est_col, exact_col):
        return F.abs(est_col.cast("double") - exact_col) <= F.greatest(
            exact_col * F.lit(0.05), F.lit(2.0)
        )

    return exact.crossJoin(F.broadcast(est)).select(
        "both_exact",
        "either_exact",
        "click_only_exact",
        ok(F.col("e_both"), F.col("both_exact")).alias("both_ok"),
        ok(F.col("e_either"), F.col("either_exact")).alias("either_ok"),
        ok(F.col("e_conly"), F.col("click_only_exact")).alias("click_only_ok"),
    )


@register(
    "q_events_funnel_sessionized",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                       OR lag(epoch_us(ts)) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, event_type, ts_us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    ),
    v AS (
      SELECT user_id, session_id, MIN(ts_us) AS t1 FROM s
      WHERE event_type = 'view' GROUP BY 1, 2
    ),
    c AS (
      SELECT s.user_id, s.session_id, MIN(s.ts_us) AS t2
      FROM s JOIN v ON s.user_id = v.user_id AND s.session_id = v.session_id
                   AND s.ts_us > v.t1
      WHERE s.event_type = 'click' GROUP BY 1, 2
    ),
    p AS (
      SELECT s.user_id, s.session_id, MIN(s.ts_us) AS t3
      FROM s JOIN c ON s.user_id = c.user_id AND s.session_id = c.session_id
                   AND s.ts_us > c.t2
      WHERE s.event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT 'view' AS stage, 1 AS stage_idx, COUNT(*) AS n_sessions FROM v
    UNION ALL SELECT 'click', 2, COUNT(*) FROM c
    UNION ALL SELECT 'purchase', 3, COUNT(*) FROM p
    """,
)
def q_events_funnel_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel scoped to sessions: view → click → purchase must all happen
    inside one 30-min-gap session (the per-visit conversion funnel product
    analytics actually reports). Composition of the sessionize pass with
    the conditional-min cascade — every stage keyed on (user_id,
    session_id), so the whole pipeline runs on one co-partitioning."""
    e = t(spark, sf_dir, "events")
    ts_us = F.unix_micros("ts")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        "event_id",
        "event_type",
        ts_us.alias("ts_us"),
        F.when(
            (ts_us - F.lag(ts_us).over(w) >= 1_800_000_000)
            | F.lag(ts_us).over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    w2 = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    s = gaps.select(
        "user_id",
        "event_type",
        "ts_us",
        F.sum("is_new").over(w2).cast("bigint").alias("session_id"),
    )

    def stage(evt: str, prev, prev_t: str, out_t: str):
        base = s.where(F.col("event_type") == evt)
        if prev is not None:
            base = base.join(prev, ["user_id", "session_id"]).where(
                F.col("ts_us") > F.col(prev_t)
            )
        return base.groupBy("user_id", "session_id").agg(
            F.min("ts_us").alias(out_t)
        )

    v = stage("view", None, "", "t1")
    c = stage("click", v, "t1", "t2")
    p = stage("purchase", c, "t2", "t3")

    def cnt(df, name: str, idx: int):
        return df.agg(
            F.lit(name).alias("stage"),
            F.lit(idx).alias("stage_idx"),
            F.count(F.lit(1)).alias("n_sessions"),
        )

    return cnt(v, "view", 1).unionByName(cnt(c, "click", 2)).unionByName(
        cnt(p, "purchase", 3)
    )


@register(
    "q_heavy_hitters",
    oracle="""
    SELECT event_type AS item, COUNT(*) AS n,
           CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type)
                AS INTEGER) AS rank
    FROM events
    GROUP BY 1
    ORDER BY 2 DESC, 1
    LIMIT 5
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the approx_top_k frequent-items sketch — the
    one-pass, fixed-memory answer to "which keys dominate this stream".
    Unlike the exact groupBy (whose state is |distinct keys|), the sketch
    is O(maxItemsTracked) per partition and merges associatively, so it
    survives arbitrary cardinality at 100 TB.

    Exactness for the oracle: with |distinct| ≤ maxItemsTracked the sketch
    degenerates to exact counts (no evictions ever happen), and k covers
    the whole domain, so the result equals the exact top-5 — ranked here
    with a total (count desc, item) tie-break applied identically in both
    engines. maxItemsTracked is passed EXPLICITLY (10000, the bound the
    no-evictions argument depends on — not an implicit library default);
    tests/test_extensions.py asserts the fixture's distinct-type count
    stays under it."""
    ev = t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("v_events_hh")
    topk = spark.sql(
        "SELECT approx_top_k(event_type, 5, 10000) AS tk FROM v_events_hh"
    ).select(F.explode("tk").alias("e"))
    return (
        topk.select(F.col("e.item").alias("item"), F.col("e.count").alias("n"))
        .orderBy(F.desc("n"), F.asc("item"))
        .select(
            "item",
            "n",
            F.row_number()
            .over(bounded_rank_window(F.desc("n"), F.asc("item"), anchor="item"))
            .alias("rank"),
        )
        .limit(5)
    )


@register(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    ),
    pairs AS (
      SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           n * 1.0 / CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
             AS p_transition
    FROM pairs
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next event type | current) — the generalization of the fixed funnel
    queries (any path, not just view→click→purchase), and the input to
    drop-off/anomaly analyses.

    Shape: one shuffle on user_id for the LEAD window (tie-broken on
    event_id for a total per-user order), then a tiny |types|² agg; the
    conditional probability normalizes by an exact bigint row-count sum,
    so the division is deterministic. At 100 TB the user_id partitioning
    is the same high-cardinality key the sessionization queries already
    scale on."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).where(F.col("next_type").isNotNull())
    pairs = (
        seq.groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    w_from = W.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n") * F.lit(1.0) / F.sum("n").over(w_from)).alias("p_transition"),
    )


_ANOM_WIN = 7  # trailing days in the baseline window
_ANOM_Z = 2.0  # alert threshold


def _anomaly_oracle() -> str:
    from ..functions.compat import dround_sql

    z = dround_sql(
        "CASE WHEN sq * nw > s * s THEN "
        "(n * nw - s) / sqrt((sq * nw - s * s) * 1.0) "
        "ELSE NULL END",
        6,
    )
    return f"""
    WITH daily AS (
      SELECT event_type,
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    trail AS (
      SELECT event_type, day, n,
             SUM(n) OVER w AS s,
             SUM(n * n) OVER w AS sq,
             COUNT(*) OVER w AS nw
      FROM daily
      WINDOW w AS (
        PARTITION BY event_type ORDER BY day
        ROWS BETWEEN {_ANOM_WIN} PRECEDING AND 1 PRECEDING
      )
    )
    SELECT event_type, day, CAST(n AS BIGINT) AS n_events,
           {z} AS zscore,
           COALESCE(abs({z}) > {_ANOM_Z}, FALSE) AS is_anomaly
    FROM trail
    WHERE nw = {_ANOM_WIN}
    """


@register("q_event_anomaly", oracle=_anomaly_oracle())
def q_event_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection on daily event volumes — the
    monitoring query every event pipeline runs against itself: per
    (event_type, day), the z-score of today's count against the previous
    {W} days' mean/stddev, alerting at |z| > {Z} (flat-variance windows
    emit NULL z — no division by a zero spread).

    Scale shape: the daily rollup is a map-side-combined hash-agg (the
    relation shrinks to |types|·|days| immediately); the trailing stats
    are ONE window pass with a bounded {W}-row frame partitioned by
    event_type over that tiny relation — the corpus never re-shuffles.
    Determinism: counts are exact integers, so the z-score reduces to
    (n·W − s)/√(sq·W − s²) — integral numerator and radicand (the W²
    factors cancel), one sqrt + one division then dround(6)."""
    from ..functions.compat import dround

    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
                "day"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-_ANOM_WIN, -1)
    )
    trail = daily.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(w).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("sq"),
        F.count(F.lit(1)).over(w).alias("nw"),
    ).where(F.col("nw") == _ANOM_WIN)
    z = dround(
        F.when(
            F.col("sq") * F.col("nw") > F.col("s") * F.col("s"),
            (F.col("n") * F.col("nw") - F.col("s"))
            / F.sqrt(
                (F.col("sq") * F.col("nw") - F.col("s") * F.col("s"))
                * F.lit(1.0)
            ),
        ),
        6,
    )
    return trail.select(
        "event_type",
        "day",
        F.col("n").cast("bigint").alias("n_events"),
        z.alias("zscore"),
        F.coalesce(F.abs(z) > _ANOM_Z, F.lit(False)).alias("is_anomaly"),
    )


q_event_anomaly.__doc__ = q_event_anomaly.__doc__.format(
    W=_ANOM_WIN, Z=_ANOM_Z
)


_LD_L = 5  # minimum distinct sensitive values per released QI cell


@register(
    "q_ldiversity",
    oracle=f"""
    SELECT event_type,
           CAST(hour(ts) AS INTEGER) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           COUNT(DISTINCT user_id) < {_LD_L} AS at_risk
    FROM events
    GROUP BY 1, 2
    """,
)
def q_ldiversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-DIVERSITY audit (Machanavajjhala et al., ICDE'06) — the
    attribute-disclosure check k-anonymity misses: a released event
    aggregate keyed by the quasi-identifiers (event_type, hour-of-day)
    is safe only if each cell spans at least l={L} DISTINCT users;
    a cell with few distinct users lets an attacker who knows someone
    acted in that window infer WHO. Pairs with q_kanon_audit (group
    SIZE) to complete the release-audit pair: big groups can still be
    homogeneous, which is exactly what this catches.

    Scale shape: one hash-agg with an exact two-phase distinct count
    (partial distinct within partitions, merge across — Spark's
    standard expand/agg plan); the QI grid is ≤ |types|×24 cells, so
    output is broadcast-sized at any event volume. Hours are extracted
    under the pinned UTC session on both engines."""
    e = t(spark, sf_dir, "events")
    return e.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hour")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count_distinct(F.col("user_id")).cast("bigint").alias("n_users"),
        (F.count_distinct(F.col("user_id")) < _LD_L).alias("at_risk"),
    )


q_ldiversity.__doc__ = q_ldiversity.__doc__.format(L=_LD_L)
