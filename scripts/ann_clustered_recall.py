#!/usr/bin/env python
"""Recall of the cell-probed ANN arms on a CLUSTERED corpus — the control
experiment for the isotropy caveat in SCALE.md's recall sweep.

The fixture embeddings are isotropic random vectors, so nprobe=2 of ~√N
cells necessarily sees ~nprobe/k of the neighbors — low recall is a data
property there, not an operator property. This script builds a clustered
variant (16 deterministic ±1 anchor points, v' = anchor[vec_id % 16] +
0.35·v — tight clusters, same schema), re-runs the probe-restricted arms
against brute-force ground truth on it, and prints both tables side by
side. Real embedding corpora cluster; this measures what the quantizers
do when they have structure to exploit.

Usage: python scripts/ann_clustered_recall.py [BASE_SF_DIR] [OUT_DIR]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ARMS = [
    "q_ann_lsh_topk",
    "q_ann_ivf_topk",
    "q_ann_ivf_search",
    "q_ann_imi_search",
    "q_ann_imi_sq8_search",
    "q_ann_ivf_sq8_topk",
    "q_ann_binary_hamming",
    "q_ann_binary_rotated",
    "q_ann_ivf_binary_search",
    "q_ann_ivf_binary_rotated",
]

N_GROUPS = 16
SCALE = 0.35


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/emb_clustered"

    from pyspark.sql import functions as F

    from mapreduce_weather_analysis_spark.functions.compat import (
        portable_hash32_py,
    )
    from mapreduce_weather_analysis_spark.plans.registry import (
        REGISTRY,
        _import_plans,
    )
    from mapreduce_weather_analysis_spark.session import get_spark

    _import_plans()
    spark = get_spark(app_name="ann-clustered-recall")

    emb = spark.read.parquet(f"{base}/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    anchors = [
        [
            1.0 if portable_hash32_py(f"anchor{g}:{d}") % 2 else -1.0
            for d in range(dim)
        ]
        for g in range(N_GROUPS)
    ]
    anchor_lit = F.array(
        *[F.array(*[F.lit(x) for x in row]) for row in anchors]
    )
    clustered = emb.select(
        "vec_id",
        F.zip_with(
            F.element_at(
                anchor_lit, (F.col("vec_id") % N_GROUPS).cast("int") + 1
            ),
            F.col("embedding").cast("array<double>"),
            lambda a, v: (a + v * SCALE).cast("float"),
        ).alias("embedding"),
        "label",
    )
    clustered.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    print(f"# clustered corpus: {N_GROUPS} anchors, scale {SCALE} -> {out}")

    def top5(name: str, sf_dir: str) -> dict[int, set[int]]:
        rows = REGISTRY[name].fn(spark, sf_dir).collect()
        got: dict[int, set[int]] = {}
        for r in rows:
            if int(r["rank"]) <= 5:
                got.setdefault(int(r["query_id"]), set()).add(
                    int(r["neighbor_id"])
                )
        return got

    print("| arm | recall@5 isotropic | recall@5 clustered |")
    print("|---|---|---|")
    truths = {sf: top5("q_ann_cosine_topk", sf) for sf in (base, out)}
    for name in ARMS:
        cols = []
        for sf in (base, out):
            truth = truths[sf]
            got = top5(name, sf)
            rec = sum(
                len(got.get(q, set()) & t) / 5.0 for q, t in truth.items()
            ) / len(truth)
            cols.append(f"{rec:.2f}")
        print(f"| {name} | {cols[0]} | {cols[1]} |")


if __name__ == "__main__":
    main()
