#!/usr/bin/env python
"""Time every registered query OUTSIDE the benched headline wall at
sf0.1 (VERDICT r10 ask #8): the per-query regression gate covers
HEADLINE; this records what the un-gated remainder actually costs so
BASELINE.md can triage each name with a measured number instead of a
class guess. Best-of-2 after an sf0.001 warmup pass, same methodology
as bench.py.

Usage: python scripts/nonheadline_triage.py [SF_DIR]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import bench
    from mapreduce_weather_analysis_spark.plans.registry import (
        REGISTRY,
        _import_plans,
    )
    from mapreduce_weather_analysis_spark.session import get_spark

    _import_plans()
    spark = get_spark(app_name="nonheadline-triage")
    gated = set(bench.HEADLINE) | set(bench.GROUND_TRUTH)
    names = [n for n in sorted(REGISTRY) if n not in gated]
    for n in names:  # warmup at smoke SF
        try:
            REGISTRY[n].fn(spark, "/root/testdata/sf0.001").write.mode(
                "overwrite"
            ).format("noop").save()
        except Exception as exc:
            print(f"WARMUP FAILED {n}: {exc!r}", file=sys.stderr)
    for n in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            REGISTRY[n].fn(spark, sf).write.mode("overwrite").format(
                "noop"
            ).save()
            best = min(best, time.perf_counter() - t0)
        print(f"{n}\t{best:.2f}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
