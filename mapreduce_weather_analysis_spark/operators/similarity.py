"""Similarity search over embedding columns (``array<float>``).

Two paths, both pure JVM column math (functions/vectors.py — no UDFs):

* **Brute force** — every query × every candidate, cosine, windowed top-k.
  The correctness baseline; O(|Q|·|N|·d).
* **Random-hyperplane LSH** — sign-bucket each vector against a fixed ±1
  hyperplane matrix, search only the query's bucket neighbourhood
  (multi-probe: hamming-1 buckets). The scale path: candidate set shrinks
  from |N| to the probed buckets' occupancy.

The hyperplane matrix is deterministic (md5-derived signs, inlined as
LITERALS into both the Spark plan and the DuckDB oracle — zero per-row hash
cost and zero cross-engine drift; dot-product folds are order-identical in
both engines, so even the cosine doubles match bitwise).

Scale posture (100 TB): vectors partition by bucket; the probe join is an
equi-join on bucket id (broadcast the query side — queries ≪ corpus). For a
real deployment you'd add IVF (k-means coarse quantizer) as a third path;
the bucket-join plumbing here is identical.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.vectors import as_double, cosine, dot

LSH_PLANES = 6  # 2^6 = 64 buckets
EMBED_DIM = 64


def _plane_sign(j: int, d: int) -> float:
    h = int(hashlib.md5(f"plane{j}:{d}".encode()).hexdigest()[:8], 16)
    return 1.0 if h % 2 == 1 else -1.0


PLANES: list[list[float]] = [
    [_plane_sign(j, d) for d in range(EMBED_DIM)] for j in range(LSH_PLANES)
]


def brute_force_topk(
    queries: DataFrame, candidates: DataFrame, k: int = 5
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, cosine).

    ``queries``/``candidates``: (vec_id, embedding). The query side is
    broadcast (queries ≪ corpus); ties break on neighbor id.
    """
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"), as_double("embedding").alias("qv")
        )
    )
    c = candidates.select(
        F.col("vec_id").alias("neighbor_id"), as_double("embedding").alias("cv")
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def lsh_bucket(v: Column) -> Column:
    """Sign-pattern bucket id of a double-array vector against PLANES."""
    bucket = F.lit(0)
    for j, plane in enumerate(PLANES):
        lits = F.array(*[F.lit(w) for w in plane])
        d = dot(v, lits)
        bucket = bucket + F.when(d > 0, F.lit(1 << j)).otherwise(0)
    return bucket.cast("int")


def lsh_bucket_sql(v_expr: str) -> str:
    terms = []
    for j, plane in enumerate(PLANES):
        arr = "[" + ", ".join(f"{w:.1f}" for w in plane) + "]"
        d = (
            f"list_sum(list_transform(range(1, {EMBED_DIM} + 1), "
            f"i -> {v_expr}[i] * ({arr}::DOUBLE[])[i]))"
        )
        terms.append(f"(CASE WHEN {d} > 0 THEN {1 << j} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS INTEGER)"


def probe_buckets(bucket: Column) -> Column:
    """Multi-probe set: the bucket itself + all hamming-1 neighbours."""
    return F.array(bucket, *[bucket.bitwiseXOR(F.lit(1 << j)) for j in range(LSH_PLANES)])


def probe_buckets_sql(bucket_expr: str) -> str:
    elems = ", ".join(
        [bucket_expr] + [f"xor({bucket_expr}, {1 << j})" for j in range(LSH_PLANES)]
    )
    return f"[{elems}]"


def lsh_topk(queries: DataFrame, candidates: DataFrame, k: int = 5) -> DataFrame:
    """Approximate cosine top-k via hyperplane buckets + hamming-1 probing.

    Same output shape as :func:`brute_force_topk`; recall < 1 by design
    (measured against brute force in tests)."""
    c = candidates.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double("embedding").alias("cv"),
    ).withColumn("bucket", lsh_bucket(F.col("cv")))
    q = (
        queries.select(
            F.col("vec_id").alias("query_id"), as_double("embedding").alias("qv")
        )
        .withColumn("probe", F.explode(probe_buckets(lsh_bucket(F.col("qv")))))
    )
    scored = (
        c.join(F.broadcast(q), F.col("bucket") == F.col("probe"))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cosine"),
        )
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
