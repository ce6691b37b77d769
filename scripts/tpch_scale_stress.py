#!/usr/bin/env python
"""Scale the relational fact tables (lineitem + orders) by N and time the
decision-support shapes against sf0.1 — SCALE.md evidence that the
subquery/exists/anti-join pack extrapolates like the join-agg pack does.

Replication preserves workload character: each replica r shifts orderkey
by r*10^9 (orders and lineitem consistently, so the fact-fact join keys
still match 1:1 and per-order lineitem multiplicity is unchanged), keeps
all dimension keys as-is (per-customer order counts and per-supplier
lateness profiles scale linearly), and leaves dimensions untouched.

Usage: python scripts/tpch_scale_stress.py [MULT] [OUT_DIR] [ONLY]
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = [
    "q_cust_order_distribution",
    "q_late_shipment_priority",
    "q_solo_late_supplier",
    "q_idle_customers",
    "q_top_supplier",
    "q_small_qty_revenue",
    "q_forecast_revenue",
    "q_market_share",
    "q_product_profit",
    "q_table_profile",
    "q_mincost_supplier",
    "q_important_parts",
    "q_lateness_priority_split",
    "q_dominant_supplier",
]

_SHIFT = 1_000_000_000


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/tpch10x"
    base = "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from mapreduce_weather_analysis_spark.plans.registry import (
        REGISTRY,
        _import_plans,
    )
    from mapreduce_weather_analysis_spark.session import get_spark

    _import_plans()
    spark = get_spark(app_name="tpch-scale-stress")

    outp = Path(out)
    outp.mkdir(parents=True, exist_ok=True)
    for dim in ("region", "nation", "customer", "supplier", "part",
                "documents", "embeddings", "events"):
        src = Path(base) / f"{dim}.parquet"
        dst = outp / f"{dim}.parquet"
        if src.exists() and not dst.exists():
            if src.is_dir():
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)

    marker = outp / f".pack_x{mult}_done"
    for fact, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        if marker.exists():
            # pack already generated (idempotence: rewriting identical
            # parquet would re-spend the scale-up on every timing run)
            print(f"reusing {out}/{fact}.parquet")
            continue
        f0 = spark.read.parquet(f"{base}/{fact}.parquet")
        reps = [
            f0.withColumn(key, F.col(key) + F.lit(r * _SHIFT))
            for r in range(mult)
        ]
        big = reps[0]
        for p in reps[1:]:
            big = big.unionByName(p)
        big.write.mode("overwrite").parquet(f"{out}/{fact}.parquet")
        print(f"scaled {fact} x{mult}")
    marker.touch()

    queries = list(QUERIES)
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        queries = [q for q in queries if q in only]
    for name in queries:
        fn = REGISTRY[name].fn
        fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
            "noop"
        ).save()
        row = []
        for sf_dir in (base, out):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            row.append(time.perf_counter() - t0)
        print(
            f"{name}: sf0.1={row[0]:.2f}s {mult}x={row[1]:.2f}s "
            f"ratio={row[1] / row[0]:.1f}"
        )


if __name__ == "__main__":
    main()
