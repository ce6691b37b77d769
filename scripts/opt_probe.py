"""Optimization probe: time one or more registered queries in
isolation (noop sink, best-of-N) and dump .explain("formatted") to
plans/$SPARK_GRAFT_PLAN_DIR (default r16)/<query>_<tag>.txt.

Usage: opt_probe.py [--tag before|after] [--reps N] [--sf DIR] q_a q_b ...

Methodology matches bench.py (one warmup at sf0.001, then timed draws at
the target SF through the noop sink, best-of-N reported) so numbers are
comparable to the bench's per-query map, minus suite interference.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default=None, help="plans/r15/<q>_<tag>.txt")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from mapreduce_weather_analysis_spark.plans.registry import (
        REGISTRY,
        _import_plans,
    )
    from mapreduce_weather_analysis_spark.session import get_spark
    from mapreduce_weather_analysis_spark.streaming import events_stream as es

    _import_plans()
    spark = get_spark(app_name="opt-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def clear(spark) -> None:
        for jrdd in list(
            spark.sparkContext._jsc.getPersistentRDDs().values()
        ):
            jrdd.unpersist(True)

    plan_dir = Path(REPO) / "plans" / os.environ.get(
        "SPARK_GRAFT_PLAN_DIR", "r16"
    )
    plan_dir.mkdir(parents=True, exist_ok=True)

    for name in args.queries:
        fn = REGISTRY[name].fn
        if not args.no_warm:
            fn(spark, "/root/testdata/sf0.001").write.mode(
                "overwrite"
            ).format("noop").save()
            clear(spark)
        best, best_drain = float("inf"), 0.0
        walls = []
        for _ in range(args.reps):
            n0 = len(es.DRAIN_TIMINGS)
            t0 = time.perf_counter()
            fn(spark, args.sf).write.mode("overwrite").format("noop").save()
            w = time.perf_counter() - t0
            drain = sum(d["drain_s"] for d in es.DRAIN_TIMINGS[n0:])
            walls.append(round(w, 3))
            if w < best:
                best, best_drain = w, drain
            clear(spark)
        print(
            f"{name}: best {best:.3f}s drain {best_drain:.3f}s "
            f"draws {walls}",
            flush=True,
        )
        if args.tag:
            df = fn(spark, args.sf)
            out = plan_dir / f"{name}_{args.tag}.txt"
            jvm = spark.sparkContext._jvm
            out.write_text(
                jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            )
            clear(spark)
            print(f"  plan -> {out}", flush=True)


if __name__ == "__main__":
    main()
