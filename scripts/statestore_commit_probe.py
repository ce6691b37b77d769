"""Decompose q_stream_stream_join's drain into state-store commit vs
compute (VERDICT r15 ask #7): monkeypatch run_available_now to keep each
StreamingQuery's progress events and sum the per-batch durationMs buckets
(addBatch, commitOffsets/walCommit, getBatch, latestOffset) plus the
stateOperators' allUpdatesTimeMs / commitTimeMs / allRemovalsTimeMs and
rows-committed counts — the per-side row-commit cost a "left alone"
entry must name.

Usage: statestore_commit_probe.py [--sf DIR] [--reps N] [q_name ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import uuid
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("queries", nargs="*", default=["q_stream_stream_join"])
    args = ap.parse_args()

    from mapreduce_weather_analysis_spark.plans.registry import (
        REGISTRY,
        _import_plans,
    )
    from mapreduce_weather_analysis_spark.session import get_spark
    from mapreduce_weather_analysis_spark.streaming import events_stream as es

    _import_plans()
    spark = get_spark(app_name="statestore-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    progresses: list[dict] = []

    def run_available_now(agg, spark, mode="complete"):
        name = f"stream_out_{uuid.uuid4().hex[:8]}"
        t0 = time.perf_counter()
        q = (
            agg.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        drain = time.perf_counter() - t0
        for p in q.recentProgress:
            progresses.append(p if isinstance(p, dict) else json.loads(p.json))
        es.DRAIN_TIMINGS.append({"setup_s": 0.0, "drain_s": drain})
        return spark.table(name)

    es.run_available_now = run_available_now
    for mod in list(sys.modules.values()):
        if mod is None or mod is es:
            continue
        f = getattr(mod, "run_available_now", None)
        if f is not None and callable(f) and f.__module__ == es.__name__:
            mod.run_available_now = run_available_now

    for name in args.queries:
        fn = REGISTRY[name].fn
        fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
            "noop"
        ).save()  # warmup
        best = None
        for _ in range(args.reps):
            progresses.clear()
            n0 = len(es.DRAIN_TIMINGS)
            t0 = time.perf_counter()
            fn(spark, args.sf).write.mode("overwrite").format("noop").save()
            wall = time.perf_counter() - t0
            drain = sum(d["drain_s"] for d in es.DRAIN_TIMINGS[n0:])
            dur: dict[str, int] = {}
            st = {
                "allUpdatesTimeMs": 0,
                "commitTimeMs": 0,
                "allRemovalsTimeMs": 0,
                "numRowsUpdated": 0,
                "numRowsTotal": 0,
            }
            n_batches = 0
            for p in progresses:
                n_batches += 1
                for k, v in (p.get("durationMs") or {}).items():
                    dur[k] = dur.get(k, 0) + int(v)
                for op in p.get("stateOperators") or []:
                    for k in st:
                        st[k] += int(op.get(k, 0) or 0)
            rec = {
                "wall_s": round(wall, 3),
                "drain_s": round(drain, 3),
                "n_batches": n_batches,
                "durationMs": dur,
                "state": st,
            }
            if best is None or rec["wall_s"] < best["wall_s"]:
                best = rec
            print(f"{name}: {json.dumps(rec)}", flush=True)
        print(f"BEST {name}: {json.dumps(best)}", flush=True)


if __name__ == "__main__":
    main()
