"""Graph-analytics queries: PageRank over the nation trade graph.

Connected components (operators/graph.py) already powers the dedup
clustering; this suite exercises the other canonical iterative fixed-point
— weighted PageRank — end-to-end through the driver contract, with an
EXACT oracle: the DuckDB twin unrolls the same five iterations as chained
CTEs with bit-identical arithmetic (fixed double op order + decimal-exact
contribution sums, the `functions/compat.psum` trick applied per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import pagerank
from .registry import register, t

_PR_ITERS = 5
_PR_DAMPING = 0.85

# Edge relation: supplier-nation -> customer-nation, weighted by lineitem
# count (exact bigint). Shared between the Spark plan and the oracle.
_EDGES_SQL = """
    SELECT ns.n_name AS src, nc.n_name AS dst, COUNT(*) AS w
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    GROUP BY 1, 2
"""


def _pagerank_cte_list(
    edges_sql: str, iters: int, damping: float
) -> list[str]:
    """The unrolled PageRank recurrence as a LIST of CTE definitions
    (e, nodes, nn, ow, r0, c1, r1, … r{iters}) — the single definition
    both _pagerank_oracle and _pagerank_ctes compose from (ADVICE r8:
    the WITH-block was previously recovered by string-splitting the
    generated oracle, which any rewording of the final select would
    silently break)."""
    term = (
        "CAST(CAST((r.rank * CAST(e.w AS DOUBLE)) / CAST(ow.out_w AS DOUBLE)"
        " AS VARCHAR) AS DECIMAL(18,12))"
    )
    ctes = [
        f"e AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM e GROUP BY 1)",
        "r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"c{i} AS (SELECT e.dst AS node, CAST(SUM({term}) AS DOUBLE) AS contrib"
            f" FROM e JOIN r{i - 1} r ON r.node = e.src"
            f" JOIN ow ON ow.src = e.src GROUP BY 1)"
        )
        # NB: bare decimal literals are DECIMAL in DuckDB (1.0 - 0.85 folds
        # EXACTLY to 0.15), while Spark/Python do the IEEE double subtract
        # (0.15000000000000002) — cast to DOUBLE first so both engines run
        # the identical float ops.
        ctes.append(
            f"r{i} AS (SELECT n.node,"
            f" (CAST(1.0 AS DOUBLE) - CAST({damping} AS DOUBLE))"
            f" / (SELECT n FROM nn)"
            f" + CAST({damping} AS DOUBLE) * COALESCE(c.contrib, 0.0) AS rank"
            f" FROM nodes n LEFT JOIN c{i} c ON c.node = n.node)"
        )
    return ctes


def _pagerank_oracle(
    iters: int = _PR_ITERS,
    damping: float = _PR_DAMPING,
    edges_sql: str | None = None,
) -> str:
    """Unrolled-CTE twin of operators/graph.pagerank: r0 -> r{iters}.
    ``edges_sql`` (src, dst, w) defaults to the nation trade graph;
    q_textrank_keywords reuses the same unroll over the word graph."""
    return (
        _pagerank_ctes(edges_sql or _EDGES_SQL, iters, damping)
        + f"SELECT node AS nation, rank FROM r{iters}"
    )


def _pagerank_ctes(
    edges_sql: str, iters: int, damping: float
) -> str:
    """The WITH-block of the PageRank unroll (trailing newline+indent
    included) — callers append their own projection over ``r{iters}``.
    Composed from :func:`_pagerank_cte_list`, not recovered from
    generated SQL."""
    return (
        "WITH "
        + ",\n    ".join(_pagerank_cte_list(edges_sql, iters, damping))
        + "\n    "
    )


@register("q_pagerank_nations", scale_tier="scale", oracle=_pagerank_oracle())
def q_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the supplier-nation → customer-nation trade
    graph (edge weight = lineitem count): which nations sit at the center
    of the trade network. Five damped iterations of the driver-loop
    operator (operators/graph.pagerank); the oracle unrolls the identical
    recurrence as five chained CTEs — two entirely different executions,
    bit-identical fixpoint trajectory.

    Scale: edge derivation is the q_nation_volume join (broadcast dims,
    one fact-fact shuffle); the iteration itself only ever shuffles the
    |nations|² edge relation — for a billion-node web graph the SAME code
    shuffles edges per round, which is the canonical Pregel/GraphX cost."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = F.broadcast(t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    s = F.broadcast(t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    n = t(spark, sf_dir, "nation")
    ns = F.broadcast(
        n.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("src"))
    )
    nc = F.broadcast(
        n.select(F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("dst"))
    )
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(ns, F.col("s_nationkey") == F.col("ns_key"))
        .join(nc, F.col("c_nationkey") == F.col("nc_key"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    ranks = pagerank(
        edges, src="src", dst="dst", weight="w",
        damping=_PR_DAMPING, iters=_PR_ITERS,
    )
    return ranks.select(F.col("node").alias("nation"), "rank")


# --- TextRank keywords: PageRank over the word co-occurrence graph -------------

_TR_ITERS = 3
_TR_TOPK = 15


def _textrank_edges_sql() -> str:
    from ..functions.text import tokens_sql

    return f"""
    SELECT a AS src, b AS dst, CAST(SUM(c) AS BIGINT) AS w FROM (
      SELECT w1 AS a, w2 AS b, COUNT(*) AS c FROM (
        SELECT unnest(toks[1:len(toks)-1]) AS w1,
               unnest(toks[2:len(toks)]) AS w2
        FROM (SELECT {tokens_sql('text')} AS toks FROM documents)
        WHERE len(toks) >= 2
      ) GROUP BY 1, 2
      UNION ALL
      SELECT w2 AS a, w1 AS b, COUNT(*) AS c FROM (
        SELECT unnest(toks[1:len(toks)-1]) AS w1,
               unnest(toks[2:len(toks)]) AS w2
        FROM (SELECT {tokens_sql('text')} AS toks FROM documents)
        WHERE len(toks) >= 2
      ) GROUP BY 1, 2
    ) GROUP BY 1, 2
    """


def _textrank_oracle() -> str:
    return (
        _pagerank_ctes(_textrank_edges_sql(), _TR_ITERS, _PR_DAMPING)
        + f"""SELECT word, rank, CAST(krank AS INTEGER) AS krank FROM (
      SELECT node AS word, rank, ROW_NUMBER() OVER (
        ORDER BY rank DESC, node ASC) AS krank
      FROM r{_TR_ITERS}
    ) WHERE krank <= {_TR_TOPK}
    """
    )


@register("q_textrank_keywords", scale_tier="scale", oracle=_textrank_oracle())
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP'04): weighted
    PageRank over the word CO-OCCURRENCE graph — nodes are corpus tokens,
    undirected edges join adjacent tokens with co-occurrence counts as
    weights, and the stationary score ranks keywords. The same iterative
    operator that ranks nations (operators/graph.pagerank) composed onto
    a text-derived graph: the graph-analytics and text-analysis families
    meeting in one query.

    Scale shape: the bigram edge build is one explode + two hash-aggs
    (the q_ngram_lm shape); the graph itself is VOCABULARY-sized — nodes
    = distinct tokens, edges = distinct co-occurring pairs — so the {I}
    PageRank rounds shuffle relations that grow with the vocabulary
    (Heaps-law sublinear), not the corpus. Top-{K} is TakeOrdered + a
    bounded rank window. Determinism: the shared pagerank kernel's
    decimal-routed contribution sums, unrolled verbatim in the oracle."""
    from ..functions.compat import bounded_rank_window
    from ..functions.text import has_min_tokens, tokens

    d = t(spark, sf_dir, "documents")
    toks = d.where(has_min_tokens("text", 2)).select(
        tokens("text").alias("toks")
    )
    bg = toks.select(
        F.explode(
            F.zip_with(
                F.slice("toks", 1, F.size("toks") - 1),
                F.slice("toks", 2, F.size("toks") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("g")
    ).select("g.w1", "g.w2")
    directed = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    und = (
        directed.select(
            F.col("w1").alias("src"), F.col("w2").alias("dst"), "c"
        )
        .unionAll(
            directed.select(
                F.col("w2").alias("src"), F.col("w1").alias("dst"), "c"
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("c").cast("bigint").alias("w"))
    )
    ranks = pagerank(und, iters=_TR_ITERS, damping=_PR_DAMPING)
    top = ranks.orderBy(F.desc("rank"), F.asc("node")).limit(_TR_TOPK)
    wk = bounded_rank_window(F.desc("rank"), F.asc("node"), anchor="node")
    return top.select(
        F.col("node").alias("word"),
        "rank",
        F.row_number().over(wk).cast("int").alias("krank"),
    )


q_textrank_keywords.__doc__ = q_textrank_keywords.__doc__.format(
    I=_TR_ITERS, K=_TR_TOPK
)
