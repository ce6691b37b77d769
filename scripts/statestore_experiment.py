#!/usr/bin/env python
"""State-store-provider experiment for the heaviest stateful stream drains
(VERDICT r12 ask #2): time each query's availableNow drain under

  a) the default HDFSBackedStateStoreProvider (in-memory maps + DFS
     snapshot files),
  b) RocksDBStateStoreProvider (full-snapshot checkpointing, the default),
  c) RocksDB + changelog checkpointing (uploads per-batch deltas instead
     of full snapshots — the knob Spark docs recommend for snapshot-bound
     workloads).

Method mirrors bench.py exactly: best-of-2 walls via a noop save, drain
seconds from the DRAIN_TIMINGS ledger that run_available_now appends to,
provider set on the session conf before the run (the provider class is a
per-query conf: Structured Streaming reads it when the query starts).
Results are pasted into SCALE.md; a measured drain win would also move the
provider into the plans themselves.

Usage: python scripts/statestore_experiment.py [SF_DIR] [ONLY]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
QUERIES = (
    sys.argv[2].split(",")
    if len(sys.argv) > 2
    else [
        # the three heaviest gated drain quantities (BENCH_r12): stateful
        # complete-mode agg ledger, watermarked interval-join state, and
        # the broadcast bloom gate for contrast (near-stateless control)
        "q_stream_minhash_ledger",
        "q_stream_stream_join",
        "q_stream_decontaminate",
    ]
)

PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
CHANGELOG_CONF = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
HDFS = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)

VARIANTS = [
    ("hdfs(default)", {PROVIDER_CONF: HDFS, CHANGELOG_CONF: "false"}),
    ("rocksdb", {PROVIDER_CONF: ROCKSDB, CHANGELOG_CONF: "false"}),
    ("rocksdb+changelog", {PROVIDER_CONF: ROCKSDB, CHANGELOG_CONF: "true"}),
]


def main() -> None:
    from mapreduce_weather_analysis_spark.plans.registry import (
        REGISTRY,
        _import_plans,
    )
    from mapreduce_weather_analysis_spark.session import get_spark
    from mapreduce_weather_analysis_spark.streaming import (
        events_stream as _es,
    )

    _import_plans()
    spark = get_spark(app_name="statestore-experiment")

    def time_once(fn) -> tuple[float, float]:
        n0 = len(_es.DRAIN_TIMINGS)
        start = time.perf_counter()
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - start
        drain = sum(d["drain_s"] for d in _es.DRAIN_TIMINGS[n0:])
        return wall, drain

    print(f"# state-store experiment @ {SF_DIR}")
    print(f"| query | variant | wall s | drain s |")
    print(f"|---|---|---|---|")
    for name in QUERIES:
        fn = REGISTRY[name].fn
        # one untimed warmup per query so the first variant doesn't absorb
        # plan compilation / page-cache warmup that the others skip
        time_once(fn)
        for label, confs in VARIANTS:
            for k, v in confs.items():
                spark.conf.set(k, v)
            try:
                best = min(time_once(fn) for _ in range(2))
                print(
                    f"| {name} | {label} | {best[0]:.2f} | {best[1]:.2f} |",
                    flush=True,
                )
            except Exception as e:  # record, don't abort the matrix
                print(f"| {name} | {label} | ERROR | {e} |", flush=True)
        for k in (PROVIDER_CONF, CHANGELOG_CONF):
            spark.conf.unset(k)


if __name__ == "__main__":
    main()
