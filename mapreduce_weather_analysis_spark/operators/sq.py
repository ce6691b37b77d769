"""SQ8 scalar quantization: per-dimension 8-bit linear codes — the third
compression arm of the ANN family next to PQ (operators/pq.py) and the
binary SimHash signs (operators/dedup.py).

FAISS ``ScalarQuantizer QT_8bit`` semantics: train per-dimension
``[vmin_d, vmax_d]`` ranges over the corpus, encode each dimension to
``floor((x−vmin)/(vmax−vmin)·255 + 0.5)`` ∈ [0, 255], search
ASYMMETRICALLY — the unquantized query scores against dequantized
reconstructions. One byte per dimension cuts the scanned bytes 8× vs
float64 lists (4× vs float32) with far better fidelity than PQ's
M-subspace codes at the same rate; the trade is no LUT trick, so scoring
is a full D-dim fold per candidate. At 100 TB the role is bandwidth:
inverted lists stored as SQ8 stream an eighth of the bytes through the
same IVF probe shape (the composition is exactly how FAISS's
``IVF..,SQ8`` indexes run); this operator demonstrates the train/encode/
decode/search math standalone, brute over the corpus like the cosine
baseline.

Determinism: min/max are order-independent; encode/decode use the same
left-to-right elementary-op sequence in Spark and DuckDB (one divide, one
multiply, one add each way; ``floor(·+0.5)`` instead of ``round`` — the
engines disagree on double rounding mode but agree on floor), so codes
and reconstructed cosines are bit-identical. Constant dimensions
(vmax = vmin) encode to 0 and decode to vmin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .similarity import EMBED_DIM as DIM

SQ_LEVELS = 255


def sq8_stats(vecs: DataFrame) -> DataFrame:
    """One-row (vmin, vmax) arrays of per-dimension corpus ranges. Two
    narrow hash-aggs over the exploded dims; the result is 2·D doubles —
    broadcast everywhere, the whole \"codebook\" of scalar quantization
    (vs PQ's M·K·subdim floats)."""
    dims = vecs.select(F.posexplode("v").alias("dim", "val"))
    stats = dims.groupBy("dim").agg(
        F.min("val").alias("vmin"), F.max("val").alias("vmax")
    )
    return stats.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "vmin"))),
            lambda s: s.vmin,
        ).alias("vmin"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "vmax"))),
            lambda s: s.vmax,
        ).alias("vmax"),
    )


_ENCODE = (
    "transform(v, (x, i) -> CASE WHEN vmax[i] > vmin[i] THEN "
    f"CAST(floor((x - vmin[i]) / (vmax[i] - vmin[i]) * {SQ_LEVELS}.0D + 0.5D)"
    " AS INT) ELSE 0 END)"
)
_DECODE = (
    "transform(code, (cd, i) -> vmin[i] + CAST(cd AS DOUBLE)"
    f" / {SQ_LEVELS}.0D * (vmax[i] - vmin[i]))"
)


def sq8_encode(vecs: DataFrame, stats: DataFrame) -> DataFrame:
    """(vec_id, code): the 1-byte-per-dim codes (INT array here — parquet
    would store them as bytes). Zero shuffle: a crossJoin with the
    broadcast one-row stats relation, then a JVM-side transform."""
    return vecs.crossJoin(F.broadcast(stats)).select(
        "vec_id", F.expr(_ENCODE).alias("code")
    )


def sq8_decode(codes: DataFrame, stats: DataFrame) -> DataFrame:
    """(vec_id, xhat): dequantized reconstructions for asymmetric scoring."""
    return codes.crossJoin(F.broadcast(stats)).select(
        "vec_id", F.expr(_DECODE).alias("xhat")
    )


def sq8_topk(
    emb: DataFrame, query_filter: str, k_neighbors: int = 5
) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine): asymmetric SQ8 search —
    exact query vectors against the dequantized corpus, cosine top-k with
    id tie-breaks. Same brute scan shape as the cosine baseline; the
    production composition wraps the byte codes in IVF lists."""
    from ..functions.vectors import cosine

    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).localCheckpoint(eager=False)  # stats + encode + queries all read it
    stats = sq8_stats(vecs)
    deq = sq8_decode(sq8_encode(vecs, stats), stats)
    queries = vecs.where(F.expr(query_filter)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(deq.withColumnRenamed("vec_id", "neighbor_id"))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            # interpreted fold, not cosine_unrolled: per-plan Janino cost
            # of the width-64 unroll outweighed the per-row win at this
            # pair count (r15 verdict — q_ann_sq8_topk ×0.47)
            cosine(F.col("qv"), F.col("xhat")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_neighbors)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_sq8_topk(
    emb: DataFrame,
    query_filter: str,
    k_neighbors: int = 5,
    nprobe: int | None = None,
) -> DataFrame:
    """``IVF..,SQ8`` — the composition the standalone operators exist
    for: the IVF coarse quantizer restricts candidates to the probed
    cells, whose members are stored as 1-byte-per-dim SQ8 codes;
    asymmetric scoring dequantizes only the probed cells' codes against
    the exact query vector. Query-time bytes = (nprobe/k)·N·D codes —
    the probe restriction cuts the candidates, SQ8 cuts the bytes per
    candidate 8×, and both cuts multiply. One broadcast probe relation,
    one stats crossJoin; the corpus never shuffles for search."""
    from pyspark.sql import functions as F

    from ..functions.vectors import cosine
    from .ivf import IVF_NPROBE, ivf_index, ivf_probes

    if nprobe is None:
        nprobe = IVF_NPROBE
    assigned, centroids = ivf_index(emb)
    vecs = assigned.select("vec_id", "v")
    stats = sq8_stats(vecs)
    # encoded lists keyed by cell: at rest this is the (cluster-partitioned)
    # code relation; decode inline for the asymmetric scan
    deq_cells = (
        sq8_encode(vecs, stats)
        .join(assigned.select("vec_id", "cluster"), "vec_id")
        .crossJoin(F.broadcast(stats))
        .select("vec_id", "cluster", F.expr(_DECODE).alias("xhat"))
    )
    probes = ivf_probes(assigned, centroids, query_filter, nprobe=nprobe)
    cand = (
        F.broadcast(probes)
        .join(deq_cells, "cluster")
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("xhat")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_neighbors)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _sq8_ctes(table_cte: str) -> list[str]:
    """The train/encode/decode CTE block over an existing (vec_id, v)
    relation — shared by the standalone and IVF-composed oracles."""
    return [
        f"""sqdims AS (
          SELECT i AS dim, v[i] AS val
          FROM {table_cte}, (SELECT unnest(range(1, {DIM} + 1)) AS i)
        )""",
        """sqstats AS (
          SELECT dim, MIN(val) AS vmin, MAX(val) AS vmax
          FROM sqdims GROUP BY dim
        )""",
        """sqrow AS (
          SELECT list(vmin ORDER BY dim) AS vmin,
                 list(vmax ORDER BY dim) AS vmax
          FROM sqstats
        )""",
        f"""sqenc AS (
          SELECT vec_id,
                 list_transform(range(1, {DIM} + 1),
                   i -> CASE WHEN vmax[i] > vmin[i] THEN
                          CAST(FLOOR((v[i] - vmin[i]) / (vmax[i] - vmin[i])
                                     * {SQ_LEVELS}.0 + 0.5) AS INT)
                        ELSE 0 END) AS code
          FROM {table_cte}, sqrow
        )""",
        f"""sqdeq AS (
          SELECT vec_id,
                 list_transform(range(1, {DIM} + 1),
                   i -> vmin[i] + CAST(code[i] AS DOUBLE)
                        / {SQ_LEVELS}.0 * (vmax[i] - vmin[i])) AS xhat
          FROM sqenc, sqrow
        )""",
    ]


def ivf_sq8_topk_sql(
    table: str,
    query_filter: str,
    k_neighbors: int = 5,
    nprobe: int | None = None,
) -> str:
    from ..functions.vectors import cosine_sql
    from .ivf import IVF_NPROBE, ivf_chain

    if nprobe is None:
        nprobe = IVF_NPROBE
    ctes = ivf_chain(
        table, query_filter, nprobe=nprobe, materialize=True
    ) + _sq8_ctes("vecs")
    cos = cosine_sql("probes.qv", "sqdeq.xhat")
    ctes.append(
        f"""sqscored AS (
          SELECT probes.query_id, fa.vec_id AS neighbor_id, {cos} AS cosine
          FROM probes
          JOIN fa ON fa.cluster = probes.cluster
          JOIN sqdeq ON sqdeq.vec_id = fa.vec_id
          WHERE probes.query_id <> fa.vec_id
        )"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
      ) AS rank
      FROM sqscored
    ) WHERE rank <= {k_neighbors}
    """
    )


def sq8_topk_sql(
    table: str, query_filter: str, k_neighbors: int = 5
) -> str:
    from ..functions.vectors import cosine_sql

    cos = cosine_sql("q.qv", "deq.xhat")
    return f"""
    WITH vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}
    ),
    dims AS (
      SELECT i AS dim, v[i] AS val
      FROM vecs, (SELECT unnest(range(1, {DIM} + 1)) AS i)
    ),
    stats AS (
      SELECT dim, MIN(val) AS vmin, MAX(val) AS vmax FROM dims GROUP BY dim
    ),
    rowstats AS (
      SELECT list(vmin ORDER BY dim) AS vmin,
             list(vmax ORDER BY dim) AS vmax
      FROM stats
    ),
    enc AS (
      SELECT vec_id,
             list_transform(range(1, {DIM} + 1),
               i -> CASE WHEN vmax[i] > vmin[i] THEN
                      CAST(FLOOR((v[i] - vmin[i]) / (vmax[i] - vmin[i])
                                 * {SQ_LEVELS}.0 + 0.5) AS INT)
                    ELSE 0 END) AS code
      FROM vecs, rowstats
    ),
    deq AS (
      SELECT vec_id,
             list_transform(range(1, {DIM} + 1),
               i -> vmin[i] + CAST(code[i] AS DOUBLE)
                    / {SQ_LEVELS}.0 * (vmax[i] - vmin[i])) AS xhat
      FROM enc, rowstats
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM vecs WHERE {query_filter})
    SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
      ) AS rank
      FROM (
        SELECT q.query_id, deq.vec_id AS neighbor_id, {cos} AS cosine
        FROM q, deq WHERE q.query_id <> deq.vec_id
      )
    ) WHERE rank <= {k_neighbors}
    """
