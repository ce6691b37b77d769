#!/usr/bin/env python
"""Recall@5 of every ANN arm against brute-force ground truth — the
quality column next to bench.py's cost column, over the SAME registered
queries the driver certifies.

For each arm, the (query_id, neighbor_id, rank<=5) output joins the
brute-force top-5 (q_ann_cosine_topk) and recall@5 = mean over queries of
|arm ∩ truth| / 5. Wall is one warm best-of-2 run at the target SF.

Usage: python scripts/ann_recall_sweep.py [SF_DIR]   (default sf0.1)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ARMS = [
    "q_ann_lsh_topk",
    "q_ann_gemm_topk",
    "q_ann_ivf_topk",
    "q_ann_ivf_sampled",
    "q_ann_ivf_search",
    "q_ann_imi_search",
    "q_ann_pq_topk",
    "q_ann_ivfpq_topk",
    "q_ann_ivfpq_residual",
    "q_ann_ivfpq_search",
    "q_ann_ivfpq_rerank",
    "q_ann_sq8_topk",
    "q_ann_matryoshka_rerank",
    "q_ann_ivf_sq8_topk",
    "q_ann_imi_sq8_search",
    "q_ann_imi_rerank",
    "q_ann_binary_hamming",
    "q_ann_binary_search",
    "q_ann_binary_rotated",
    "q_ann_binary_rotated_search",
    "q_ann_ivf_binary_search",
    "q_ann_ivf_binary_rotated",
    "q_abtt_search_indexed",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from mapreduce_weather_analysis_spark.plans.registry import (
        REGISTRY,
        _import_plans,
    )
    from mapreduce_weather_analysis_spark.session import get_spark

    _import_plans()
    spark = get_spark(app_name="ann-recall-sweep")

    def top5(name: str) -> dict[int, set[int]]:
        rows = REGISTRY[name].fn(spark, sf_dir).collect()
        out: dict[int, set[int]] = {}
        for r in rows:
            if int(r["rank"]) <= 5:
                out.setdefault(int(r["query_id"]), set()).add(
                    int(r["neighbor_id"])
                )
        return out

    truth = top5("q_ann_cosine_topk")
    nq = len(truth)
    print(f"# ground truth: brute cosine top-5, {nq} queries @ {sf_dir}")
    print("| arm | recall@5 | wall (warm best-of-2) |")
    print("|---|---|---|")
    for name in ARMS:
        fn = REGISTRY[name].fn
        fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
            "noop"
        ).save()  # plan/codegen warmup (and index build at smoke SF)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        got = top5(name)
        rec = sum(
            len(got.get(q, set()) & t) / 5.0 for q, t in truth.items()
        ) / nq
        print(f"| {name} | {rec:.2f} | {best:.2f} s |")


if __name__ == "__main__":
    main()
