"""Capture the MICRO-BATCH physical plan of streaming queries (VERDICT
r15 ask #6: the committed plans/r15 stream dumps only showed the
post-drain batch plan — the actual rewrite lives in the micro-batch).

Monkeypatches events_stream.run_available_now{,_files} with a body that,
after the availableNow drain terminates, snapshots
``StreamingQuery.explainInternal`` (the last IncrementalExecution's
executed plan — where BroadcastNestedLoopJoin vs ArrowEvalPython is
visible) and writes it to <out_dir>/<query>_<tag>.txt.

Usage: stream_plan_probe.py --repo /root/repo --tag after \
           --out plans/r16 q_stream_decontaminate ...
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=str(Path(__file__).resolve().parent.parent))
    ap.add_argument("--tag", default="after")
    ap.add_argument("--out", default=None, help="output dir (default <cwd-repo>/plans/r16)")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from mapreduce_weather_analysis_spark.plans.registry import (
        REGISTRY,
        _import_plans,
    )
    from mapreduce_weather_analysis_spark.session import get_spark
    from mapreduce_weather_analysis_spark.streaming import events_stream as es

    _import_plans()
    spark = get_spark(app_name="stream-plan-probe")

    out_dir = Path(args.out or (Path.cwd() / "plans" / "r16"))
    out_dir.mkdir(parents=True, exist_ok=True)

    captured: list[str] = []

    def _snap(q) -> None:
        try:
            captured.append(q._jsq.explainInternal(True))
        except Exception as exc:  # plan capture must never break the drain
            captured.append(f"(explainInternal failed: {exc!r})")

    import uuid as _uuid

    def run_available_now(agg, spark, mode="complete"):
        name = f"stream_out_{_uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _snap(q)
        es.DRAIN_TIMINGS.append({"setup_s": 0.0, "drain_s": 0.0})
        return spark.table(name)

    import os
    import tempfile

    def run_available_now_files(agg, spark):
        out = tempfile.mkdtemp(prefix="drain_", dir=es._drain_scratch_root())
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", os.path.join(out, "data"))
            .option("checkpointLocation", os.path.join(out, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _snap(q)
        es.DRAIN_TIMINGS.append({"setup_s": 0.0, "drain_s": 0.0})
        return spark.read.schema(agg.schema).parquet(os.path.join(out, "data"))

    es.run_available_now = run_available_now
    es.run_available_now_files = run_available_now_files
    # plan suites import the helpers by name at module level in places —
    # patch any module attribute that points at the originals
    for mod in list(sys.modules.values()):
        if mod is None or mod is es:
            continue
        for attr, repl in (
            ("run_available_now", run_available_now),
            ("run_available_now_files", run_available_now_files),
        ):
            if getattr(mod, attr, None) is not None and callable(
                getattr(mod, attr)
            ) and getattr(mod, attr).__module__ == es.__name__:
                setattr(mod, attr, repl)

    for name in args.queries:
        captured.clear()
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, args.sf)
        df.write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        txt = (
            f"== micro-batch plan(s) for {name} (tag={args.tag}, "
            f"wall {wall:.2f}s) ==\n\n"
            + "\n\n---- next stream in this query ----\n\n".join(captured)
            if captured
            else f"(no stream drained for {name})"
        )
        dst = out_dir / f"{name}_microbatch_{args.tag}.txt"
        dst.write_text(txt)
        print(f"{name}: {len(captured)} stream plan(s) -> {dst}", flush=True)


if __name__ == "__main__":
    main()
