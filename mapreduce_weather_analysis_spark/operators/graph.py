"""Iterative graph operators: connected components — the transitive-closure
step that upgrades pairwise near-dup detection into duplicate CLUSTERS.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — each round is
two relational steps (per-node min + join), and the edge relation
contracts toward a forest of depth-1 stars rooted at each component's
minimum id in **O(log n) rounds** (vs O(diameter) for naive min-label
propagation: a 64-node chain converges in ~6 rounds instead of ~63 —
asserted in tests/test_extensions.py).

This is the engine's one genuinely iterative algorithm (driver-side loop,
each step a distributed job). Lineage is cut with ``localCheckpoint`` per
round — the standard posture for iterative Spark (GraphX/Pregel
materialize the same way); without it the plan doubles every round.
Convergence detection is two-tier and exact: a (count, checksum)
aggregate over the already-checkpointed round output filters the common
not-converged case for one tiny job per round, and a fingerprint match is
confirmed with an ``exceptAll`` set-equality check before breaking — so a
checksum collision cannot end the loop early; it only costs one extra
small job in the (typically single) round where the check fires.

Scale: every step shuffles only the EDGE relation (≪ corpus: only
near-dup members appear), and the star contraction specifically bounds
the high-degree-node blowup that breaks label propagation on skewed
graphs — large-star re-points every neighbor of a hub at the hub's
minimum, so hub adjacency lists shrink geometrically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct (u > v)-oriented edge relation, self-loops dropped."""
    e = edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
    return (
        e.select(
            F.greatest("x", "y").alias("u"), F.least("x", "y").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of each node to the node's
    minimum neighborhood id. Input/output: (u > v)-oriented distinct."""
    s = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = s.groupBy("u").agg(F.min("v").alias("mn"))
    m = m.select("u", F.least("u", "mn").alias("m"))
    return (
        s.where(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect every smaller neighbor (and the node itself) to the node's
    minimum neighborhood id. Input/output: (u > v)-oriented distinct."""
    m = e.groupBy("u").agg(F.min("v").alias("m"))
    joined = e.join(m, "u")
    re_pointed = (
        joined.where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edge = m.select(F.col("u"), F.col("m").alias("v"))
    return re_pointed.union(self_edge).where(F.col("u") != F.col("v")).distinct()


def _fingerprint(e: DataFrame) -> tuple[int, int]:
    """(row count, order-independent checksum) of the edge relation."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38) accumulator: a raw long sum overflows under ANSI mode
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row.n), int(row.h)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges`` (undirected);
    component = min node id reachable. Deterministic.

    ``stats``, if given, receives {"rounds": int} — the number of
    large-star/small-star rounds until fixpoint (O(log n)).
    """
    # materialize the edge input ONCE: both the node universe and the
    # canonical relation derive from it, and without this the (possibly
    # expensive — e.g. full MinHash-LSH) upstream plan executes twice
    ed = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).localCheckpoint(eager=False)
    nodes = (
        ed.select(F.col("s").alias("node"))
        .union(ed.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    e = _canonical(ed, "s", "d").localCheckpoint(eager=False)
    fp = _fingerprint(e)
    rounds = 0
    for _ in range(max_iter):
        prev = e
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        rounds += 1
        new_fp = _fingerprint(e)
        # two-tier convergence check, EXACT by construction: the cheap
        # (count, checksum) fingerprint filters the common not-converged
        # case; on fingerprint equality an exceptAll confirms true set
        # equality (both relations are distinct, so equal counts + empty
        # one-sided difference ⇒ identical) — a checksum collision can
        # never break the loop early, it only costs one extra tiny job
        if new_fp == fp and e.exceptAll(prev).isEmpty():
            break
        fp = new_fp
    if stats is not None:
        stats["rounds"] = rounds
    # fixpoint is a forest of depth-1 stars: u (leaf) -> v (root). The
    # groupBy-min is a safety net for a max_iter cutoff mid-convergence.
    leaf_labels = e.groupBy(F.col("u").alias("node")).agg(
        F.min("v").alias("component")
    )
    return (
        nodes.join(leaf_labels, "node", "left")
        .select(
            "node", F.coalesce("component", F.col("node")).alias("component")
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    damping: float = 0.85,
    iters: int = 5,
) -> DataFrame:
    """Weighted PageRank (simplified/original formulation: rank' =
    (1-d)/N + d·Σ_in rank·w/out_w, no dangling-mass redistribution) over an
    edge relation — the second iterative fixed-point operator next to
    :func:`connected_components`, same driver-loop posture: each round is
    one join + one grouped aggregate over the EDGE relation, lineage cut
    per round with ``localCheckpoint``.

    Determinism (oracle-exactness): per-edge contributions are doubles with
    a fixed op order ``(rank * w) / out_w``; the per-node reduction routes
    through DECIMAL(18,12) string-cast accumulation (order-independent,
    identical rounding in DuckDB — see ``functions/compat.psum``), and the
    teleport+damping update is two scalar double ops. Every iteration is
    therefore bit-identical to the unrolled SQL twin.

    Scale: shuffles only edges (grouped on dst) and the O(|V|) rank
    relation per round; out-degree normalization is one precomputed
    grouped sum. Hub skew is bounded by the weighted normalization (no
    adjacency-list explosion as in label propagation).
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).alias("w")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    teleport = (1.0 - damping) / n
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    ew = e.join(out_w, "src").localCheckpoint(eager=False)  # (src, dst, w, out_w), static
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        term = (F.col("rank") * F.col("w").cast("double")) / F.col(
            "out_w"
        ).cast("double")
        contrib = (
            ew.join(ranks, ew.src == ranks.node)
            .select(F.col("dst").alias("node"), term.alias("term"))
            .groupBy("node")
            .agg(
                F.sum(F.col("term").cast("string").cast("decimal(18,12)"))
                .cast("double")
                .alias("contrib")
            )
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, degree) of the subgraph surviving ``rounds`` k-core peel
    iterations — the third iterative operator, bounded-round semantics
    like :func:`pagerank` (an exact oracle needs a fixed unroll depth;
    a convergence test asserts rounds+1 changes nothing at test scale).

    Each round recomputes degrees over the SURVIVING edge relation and
    drops every vertex with degree < k together with its incident edges
    (Matula & Beck's peeling, one bulk round per iteration — the
    standard bulk-synchronous k-core; at fixpoint the remainder is
    exactly the k-core). Per round: one partial-agg'd degree count plus
    two semi-joins of the edge relation against the (smaller) surviving
    vertex set — everything edge-bounded, nothing corpus-sized, and the
    relation only shrinks. Lineage is cut per round (localCheckpoint),
    the same posture as the other driver-loop operators; without it the
    replayed plan doubles every round.
    """
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint(eager=False)
    for _ in range(rounds):
        und = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        alive = (
            und.groupBy("u")
            .agg(F.count(F.lit(1)).alias("degree"))
            .where(F.col("degree") >= k)
        )
        # the survivor keys MUST be re-aliased to fresh names: ``alive``
        # derives from ``e`` (a self-join), so a USING-style join on the
        # shared "u" attribute misresolves once ``e`` is itself a
        # checkpointed join output (observed: round 2 diverged from the
        # oracle both directions). Distinct names force unambiguous
        # resolution; semi-join output drops the right side anyway.
        ka = alive.select(F.col("u").alias("ka"))
        kb = alive.select(F.col("u").alias("kb"))
        e = (
            e.join(ka, F.col("u") == F.col("ka"), "left_semi")
            .join(kb, F.col("v") == F.col("kb"), "left_semi")
            .localCheckpoint(eager=False)
        )
    und = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )


def label_propagation(
    edges: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, label) after ``rounds`` synchronous label-propagation
    iterations (Raghavan, Albert & Kumara 2007, the synchronous
    variant): every node starts labeled with its own id, and each round
    adopts the MOST FREQUENT label among its neighbors, ties broken by
    the smallest label — fully deterministic, so a SQL oracle can
    unroll the identical rounds (the async/randomized variants of the
    paper trade determinism for convergence speed; bounded-round
    deterministic semantics is this engine's posture for every
    iterative operator, like pagerank and kcore_peel).

    Communities differ from connected components: LP splits a weakly
    chained component at its thin waist (a hub label can't out-vote a
    dense clique across a single bridge edge), so it is the label to
    group by when components are too coarse.

    Scale shape: per round one edge-bounded join (labels onto the
    undirected edge relation), one (node, label) partial-agg'd count,
    and one max-of-struct argmax per node — map-side combinable,
    skew-safe (no windows; a viral label adds rows to a count, not
    bytes to one task). Labels are localCheckpoint'd per round — the
    loop's three consumers of the previous round's labels would
    otherwise replay every prior round (the kcore_peel posture).
    """
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint(eager=False)
    und = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    labels = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        # fresh alias for the neighbor key: labels shares lineage with
        # und in round 1 (both derive from e), so a USING-style join on
        # a shared name would hit the same ambiguous-self-join
        # misresolution the k-core peel documents above
        nb = und.join(
            labels.select(F.col("node").alias("nbr"), "label"),
            F.col("v") == F.col("nbr"),
        ).select("u", "label")
        cnt = nb.groupBy("u", "label").agg(F.count(F.lit(1)).alias("c"))
        best = cnt.groupBy("u").agg(
            F.max(
                F.struct(F.col("c"), (-F.col("label")).alias("nl"))
            ).alias("b")
        )
        labels = best.select(
            F.col("u").alias("node"), (-F.col("b.nl")).alias("label")
        ).localCheckpoint(eager=False)
    return labels
