"""Iterative graph operators: connected components via min-label
propagation — the transitive-closure step that upgrades pairwise near-dup
detection into proper duplicate CLUSTERS.

This is the engine's one genuinely iterative algorithm (driver-side loop,
each step a distributed join). Lineage is cut with ``localCheckpoint`` per
iteration — the standard posture for iterative Spark (GraphX/Pregel
materialize the same way); without it the plan doubles every round.
Convergence: min-label propagation moves a label one hop per iteration, so
it finishes in O(component diameter) rounds — near-dup clusters are tiny
(diameter ≤ a handful), and ``max_iter`` bounds the pathological case.

Scale: each iteration is one shuffle join on node id over the EDGE
relation (≪ corpus: only near-dup members appear). The big-graph
refinement (large-star/small-star, alternating to cut diameter) drops into
the same loop shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """(node, component) for every node in ``edges`` (undirected);
    component = min node id reachable. Deterministic."""
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = und.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    for _ in range(max_iter):
        nbr_min = (
            und.join(labels, und.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
