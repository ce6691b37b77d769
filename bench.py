"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology: one session-warmup action, then each query timed end-to-end
(plan construction + execution) with results materialized through the
``noop`` sink — full execution, no driver collect cost, no disk write skew.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the two reference flagships + one representative per major
# operator family (kept in sync with plans/* as coverage grows).
HEADLINE = [
    # reference surface (Job1/Job2 analogs)
    "q_max_month",
    "q_city_month",
    "q_city_month_formatted",
    # relational core
    "q_agg_pricing_summary",
    "q_join_inner",
    "q_window_topk_per_group",
    "q_topk_global",
    # events / time
    "q_events_tumbling",
    "q_events_sessionize",
    # training-data pipeline extensions
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_ann_cosine_topk",
    "q_text_quality",
    "q_token_count",
]


def _sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1).rstrip(".")) if m else -1.0


def main() -> None:
    from mapreduce_weather_analysis_spark.plans.registry import REGISTRY, _import_plans
    from mapreduce_weather_analysis_spark.session import get_spark

    _import_plans()
    spark = get_spark(app_name="mwa-spark-bench")

    # JVM/codegen warmup: run every headline query once at the smoke SF so
    # the timed runs measure steady-state execution, not one-time JIT of
    # each plan's generated code (worth seconds on the widest plans).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    names = [n for n in HEADLINE if n in REGISTRY]
    warm_sf = "/root/testdata/sf0.001"
    for name in names:
        try:
            REGISTRY[name].fn(spark, warm_sf).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception:
            pass  # warmup is best-effort; the timed run surfaces real errors
    timings: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name].fn
        start = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_of(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
