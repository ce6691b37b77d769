#!/usr/bin/env python
"""Recall-vs-IO frontier for the celled binary arms at nprobe 2/4/8
(VERDICT r10 ask #4): the deployment rule "spread corpus -> raw codes,
clustered -> rotated codes" rested on the single registered nprobe=2
point; this maps how much recall each doubling of scanned cells buys
for BOTH code variants on BOTH corpus classes.

Protocol: same corpora as scripts/ann_clustered_recall.py (isotropic
fixture + 16-anchor clustered control), recall@5 against brute cosine
top-5 (q_ann_cosine_topk), wall = warm second run (index artifacts
pre-built by the first). IO column = nprobe/k, the fraction of cells
(and, cells being balanced in expectation, of code bytes) each query
scans — the quantity that actually costs at 10^10 vectors.

Usage: python scripts/ann_nprobe_frontier.py [BASE_SF_DIR] [OUT_DIR]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_GROUPS, SCALE = 16, 0.35
NPROBES = (2, 4, 8)


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/emb_clustered"

    from pyspark.sql import functions as F

    from mapreduce_weather_analysis_spark.functions.compat import (
        portable_hash32_py,
    )
    from mapreduce_weather_analysis_spark.operators.ivf import ivf_cells
    from mapreduce_weather_analysis_spark.plans.registry import (
        REGISTRY,
        _import_plans,
    )
    from mapreduce_weather_analysis_spark.plans.similarity_suite import (
        _binary_codes,
        _celled_binary_serve,
        _rot_codes,
    )
    from mapreduce_weather_analysis_spark.session import get_spark

    _import_plans()
    spark = get_spark(app_name="ann-nprobe-frontier")

    emb = spark.read.parquet(f"{base}/embeddings.parquet")
    n = emb.count()
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
    emb.select(
        "vec_id",
        F.zip_with(
            F.element_at(
                anchor_lit, (F.col("vec_id") % N_GROUPS).cast("int") + 1
            ),
            F.col("embedding").cast("array<double>"),
            lambda a, v: (a + v * SCALE).cast("float"),
        ).alias("embedding"),
        "label",
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    k = ivf_cells(n)
    print(f"# n={n} k={k} cells; corpora: {base} (isotropic), {out} (clustered)")

    def top5(df) -> dict[int, set[int]]:
        got: dict[int, set[int]] = {}
        for r in df.collect():
            if int(r["rank"]) <= 5:
                got.setdefault(int(r["query_id"]), set()).add(
                    int(r["neighbor_id"])
                )
        return got

    truths = {
        sf: top5(REGISTRY["q_ann_cosine_topk"].fn(spark, sf))
        for sf in (base, out)
    }
    variants = {
        "raw (bin_v1)": (_binary_codes, "bin_v1"),
        "rotated (binrot_v2)": (lambda v: _rot_codes(spark, v), "binrot_v2"),
    }
    print("| corpus | codes | nprobe | cells scanned | recall@5 | wall (warm) |")
    print("|---|---|---|---|---|---|")
    for sf, label in ((base, "isotropic"), (out, "clustered")):
        for vname, (codes_fn, variant) in variants.items():
            for nprobe in NPROBES:
                walls = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    df = _celled_binary_serve(
                        spark, sf, codes_fn, variant, nprobe=nprobe
                    )
                    got = top5(df)
                    walls.append(time.perf_counter() - t0)
                truth = truths[sf]
                rec = sum(
                    len(got.get(q, set()) & t) / 5.0
                    for q, t in truth.items()
                ) / len(truth)
                print(
                    f"| {label} | {vname} | {nprobe} | {nprobe}/{k} "
                    f"({100 * nprobe / k:.0f}%) | {rec:.2f} "
                    f"| {min(walls):.2f} s |"
                )


if __name__ == "__main__":
    main()
