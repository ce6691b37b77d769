#!/usr/bin/env python
"""NN-descent convergence curve: recall@3 and wall per round, iterating
the SAME nn_descent_round plan the registered q_knn_refine runs once.

Round 0 is the raw IVF kNN join; each further round feeds the previous
round's edges back through the descent step (edges ∪ two-hop, exact
rescore, re-rank). Ground truth is exact brute-force top-3 over every
vector. Edges are localCheckpointed between rounds so round r+1's plan
does not re-execute rounds 0..r.

A third argument widens the GRAPH degree k while still evaluating
recall@3 of each round's top-3 — the experiment behind SCALE.md's
"the recall lever is k, not rounds" reading.

Usage: python scripts/nn_descent_curve.py [SF_DIR] [ROUNDS] [K]
(defaults: sf0.1, 3, 3)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    from mapreduce_weather_analysis_spark.functions.vectors import as_double
    from mapreduce_weather_analysis_spark.operators.similarity import (
        brute_force_topk,
    )
    from mapreduce_weather_analysis_spark.plans.registry import (
        REGISTRY,
        _import_plans,
    )
    from mapreduce_weather_analysis_spark.plans.similarity_suite import (
        nn_descent_round,
    )
    from mapreduce_weather_analysis_spark.session import get_spark

    _import_plans()
    spark = get_spark(app_name="nn-descent-curve")

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_vec = e.count()
    truth = (
        brute_force_topk(e, e, k=3)
        .select(F.col("query_id").alias("vec_id"), "neighbor_id")
        .localCheckpoint()
    )
    vv = e.select("vec_id", as_double("embedding").alias("v")).localCheckpoint()

    def recall(edges) -> float:
        # recall@3 of each round's TOP-3, whatever the graph degree k
        top3 = edges.where(F.col("rank") <= 3).select("vec_id", "neighbor_id")
        return top3.intersect(truth).count() / (3 * n_vec)

    t0 = time.perf_counter()
    if k == 3:
        edges = REGISTRY["q_knn_join"].fn(spark, sf_dir).localCheckpoint()
    else:
        from mapreduce_weather_analysis_spark.operators.ivf import ivf_index
        from mapreduce_weather_analysis_spark.plans.similarity_suite import (
            _knn_from_lists,
        )

        assigned, centroids = ivf_index(e)
        edges = _knn_from_lists(assigned, centroids, k=k).localCheckpoint()
    print(
        f"k={k} round 0 (kNN join): recall@3={recall(edges):.3f} "
        f"wall={time.perf_counter() - t0:.1f}s",
        flush=True,
    )
    for r in range(1, rounds + 1):
        t0 = time.perf_counter()
        edges = nn_descent_round(
            edges.select("vec_id", "neighbor_id"), vv, k=k
        ).localCheckpoint()
        print(
            f"k={k} round {r}: recall@3={recall(edges):.3f} "
            f"wall={time.perf_counter() - t0:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
