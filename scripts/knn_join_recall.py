#!/usr/bin/env python
"""Recall@3 of the corpus×corpus kNN JOIN against exact brute force —
the quality number for q_knn_join, measured over EVERY vector (the join
has no query sample: recall here averages the full corpus, unlike the
20-query samples in ann_recall_sweep.py).

Ground truth is the exact cosine top-3 per vector via the same
brute_force_topk operator the q_ann_cosine_topk oracle certifies, with
the query filter opened to the whole corpus.

Usage: python scripts/knn_join_recall.py [SF_DIR] [QUERY ...]
(defaults: sf0.1, q_knn_join)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from mapreduce_weather_analysis_spark.operators.similarity import (
        brute_force_topk,
    )
    from mapreduce_weather_analysis_spark.plans.registry import (
        REGISTRY,
        _import_plans,
    )
    from mapreduce_weather_analysis_spark.session import get_spark

    _import_plans()
    spark = get_spark(app_name="knn-join-recall")

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    truth = (
        brute_force_topk(e, e, k=3)
        .select(F.col("query_id").alias("vec_id"), "neighbor_id")
        .localCheckpoint()
    )
    n_vec = e.count()
    names = sys.argv[2:] or ["q_knn_join"]
    for name in names:
        approx = REGISTRY[name].fn(spark, sf_dir).select(
            "vec_id", "neighbor_id"
        )
        hits = approx.intersect(truth).count()
        print(
            f"{name} sf_dir={sf_dir} vectors={n_vec} "
            f"recall@3={hits / (3 * n_vec):.3f} ({hits}/{3 * n_vec})"
        )


if __name__ == "__main__":
    main()
