"""Round-16 overhead probe: decompose each bench query's wall into
DataFrame-construction time (Python plan building, incl. any plan-time
collects), first-action execution time, and job/task counts — the
measurement behind VERDICT r15 ask #3 ("8-core suite wall ~= 32-core
wall => the sf0.1 suite is per-query constant-overhead-bound; find the
constant").

Usage: overhead_probe.py [--sf DIR] [--out FILE] [q_a q_b ...]

Methodology matches bench.py (warmup of every probed query at sf0.001,
then ONE timed pass at the target SF through the noop sink). Job/task
counts come from the app status store, so "n_jobs"/"n_tasks" include
plan-time collect jobs triggered during construction.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/overhead_probe.json")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import bench as B
    from mapreduce_weather_analysis_spark.plans.registry import (
        REGISTRY,
        _import_plans,
    )
    from mapreduce_weather_analysis_spark.session import get_spark

    _import_plans()
    spark = get_spark(app_name="overhead-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    names = args.queries or [n for n in B.HEADLINE if n in REGISTRY]

    def clear() -> None:
        for jrdd in list(
            spark.sparkContext._jsc.getPersistentRDDs().values()
        ):
            jrdd.unpersist(True)

    tracker = spark.sparkContext.statusTracker()

    def counters() -> tuple[int, int, int]:
        job_ids = tracker.getJobIdsForGroup(None)
        n_jobs = len(job_ids)
        n_tasks = 0
        n_stages = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            n_stages += len(info.stageIds)
            for sid in info.stageIds:
                sinfo = tracker.getStageInfo(sid)
                if sinfo is not None:
                    n_tasks += sinfo.numTasks
        return n_jobs, n_stages, n_tasks

    for name in names:  # JIT warmup, same posture as bench.py
        try:
            REGISTRY[name].fn(spark, "/root/testdata/sf0.001").write.mode(
                "overwrite"
            ).format("noop").save()
        except Exception as exc:
            print(f"WARMUP FAILED {name}: {exc!r}", file=sys.stderr)
    clear()

    rows = {}
    for name in names:
        j0, s0, t0 = counters()
        w0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, args.sf)
        w1 = time.perf_counter()
        j1, s1, t1 = counters()
        df.write.mode("overwrite").format("noop").save()
        w2 = time.perf_counter()
        j2, s2, t2 = counters()
        clear()
        rows[name] = {
            "build_s": round(w1 - w0, 3),
            "exec_s": round(w2 - w1, 3),
            "build_jobs": j1 - j0,
            "exec_jobs": j2 - j1,
            "build_tasks": t1 - t0,
            "exec_tasks": t2 - t1,
            "build_stages": s1 - s0,
            "exec_stages": s2 - s1,
        }
        r = rows[name]
        print(
            f"{name}: build {r['build_s']:.3f}s ({r['build_jobs']} jobs/"
            f"{r['build_tasks']} tasks) exec {r['exec_s']:.3f}s "
            f"({r['exec_jobs']} jobs/{r['exec_stages']} stages/"
            f"{r['exec_tasks']} tasks)",
            flush=True,
        )

    tot_build = sum(r["build_s"] for r in rows.values())
    tot_exec = sum(r["exec_s"] for r in rows.values())
    print(
        f"TOTAL build {tot_build:.1f}s exec {tot_exec:.1f}s over "
        f"{len(rows)} queries"
    )
    with open(args.out, "w") as fh:
        json.dump(rows, fh, indent=1, sort_keys=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
