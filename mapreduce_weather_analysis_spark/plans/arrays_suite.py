"""Array / map / percentile scalar suite (SURVEY.md §2.2: absent from the
reference — engine extension surface over the nested-type fixtures)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import as_double, dot
from .registry import register, t


@register(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(embedding[len(embedding)] AS DOUBLE) AS last_val,
           CAST(list_max(embedding) AS DOUBLE) AS max_val,
           CAST(list_min(embedding) AS DOUBLE) AS min_val,
           sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))
               AS l2_norm,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function battery over the embedding column: size, element
    access, min/max, an exact L2 norm (order-identical fold), predicate
    counting — all JVM array expressions."""
    e = t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    v = as_double(emb)
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_val"),
        F.element_at(emb, F.size(emb)).cast("double").alias("last_val"),
        F.array_max(emb).cast("double").alias("max_val"),
        F.array_min(emb).cast("double").alias("min_val"),
        F.sqrt(dot(v, v)).alias("l2_norm"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
           CAST(props ->> '$.k' AS BIGINT) AS k_value,
           CASE WHEN list_contains(json_keys(props), 'k') THEN 1 ELSE 0 END AS has_k
    FROM events
    WHERE props IS NOT NULL
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload → typed map (from_json to map<string,bigint>) → map
    introspection: key count, typed lookup, membership."""
    e = t(spark, sf_dir, "events").where(F.col("props").isNotNull())
    m = F.from_json("props", "map<string,bigint>")
    return e.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "k").alias("k_value"),
        F.when(F.array_contains(F.map_keys(m), "k"), 1).otherwise(0).alias("has_k"),
    )


@register(
    "q_percentiles",
    oracle="""
    SELECT l_returnflag AS returnflag,
           quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.5) AS p50,
           quantile_cont(l_extendedprice, 0.75) AS p75,
           quantile_cont(l_extendedprice, 0.99) AS p99,
           MAX(l_extendedprice) AS p100
    FROM lineitem
    GROUP BY 1
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (both engines implement the
    same linear-interpolation definition, so values match bitwise). At
    100 TB the exact form needs a per-group sort — approx_percentile
    (t-digest, rows-only sibling below) is the sketch path."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.percentile("l_extendedprice", 0.25).alias("p25"),
        F.percentile("l_extendedprice", 0.5).alias("p50"),
        F.percentile("l_extendedprice", 0.75).alias("p75"),
        F.percentile("l_extendedprice", 0.99).alias("p99"),
        F.max("l_extendedprice").alias("p100"),
    )


@register(
    "q_approx_percentiles",
    oracle="""
    -- Self-checking sketch contract: exact interpolated percentiles
    -- (quantile_cont ≡ Spark percentile bitwise, the q_percentiles
    -- precedent) + literal TRUE booleans; Spark asserts in-plan that the
    -- GK-sketch values sit within 1% of the global price range (accuracy
    -- 10000 → rank error 1e-4; observed value error ≤0.1% of range).
    SELECT l_returnflag AS returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           quantile_cont(l_extendedprice, 0.5) AS p50_exact,
           quantile_cont(l_extendedprice, 0.99) AS p99_exact,
           TRUE AS p50_ok, TRUE AS p99_ok
    FROM lineitem
    GROUP BY 1
    """,
)
def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (Greenwald-Khanna via percentile_approx):
    the one-pass, bounded-memory path exact percentiles can't take at
    100 TB. Self-checking output: exact percentiles + in-plan booleans
    that each sketch value is within 1% of the global value range — the
    driver hash-asserts sketch accuracy instead of a rows-only check."""
    li = t(spark, sf_dir, "lineitem")
    rng = li.agg(
        ((F.max("l_extendedprice") - F.min("l_extendedprice")) * F.lit(0.01)).alias(
            "tol"
        )
    )
    agg = li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("p50_exact"),
        F.percentile("l_extendedprice", F.lit(0.99)).alias("p99_exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("p99_approx"),
    )
    return agg.crossJoin(F.broadcast(rng)).select(
        "returnflag",
        "n",
        "p50_exact",
        "p99_exact",
        (F.abs(F.col("p50_approx") - F.col("p50_exact")) <= F.col("tol")).alias(
            "p50_ok"
        ),
        (F.abs(F.col("p99_approx") - F.col("p99_exact")) <= F.col("tol")).alias(
            "p99_ok"
        ),
    )
