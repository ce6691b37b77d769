#!/usr/bin/env python
"""Semantic-gate drain experiment (ROADMAP round-15 candidate #2, run
early): q_stream_decontaminate_semantic is the heaviest gated drain
(~10 s at sf0.1). The r12 decomposition cleared the featurizer (0.35 s)
and named per-pair scoring under the BroadcastNestedLoopJoin fanout; r13
cleared the state store. One structural lever was never measured: the
drain currently ships the WHOLE |train|x|eval| pair relation (~545k rows
at sf0.1) through the memory sink and computes the per-doc argmax
POST-drain with a batch window. Arm B moves the argmax INTO the stream
as a stateful max(struct(rounded_cosine, -eval_doc)) aggregation —
bit-identical semantics (the struct comparison reproduces the window's
(desc cosine, asc eval_doc) order on the SAME dround(9) values; state is
one row per train doc) — so the sink carries one row per doc instead of
one per pair.

Measured on identical output (sorted rows compared exactly):
see SCALE.md round-14 section for the recorded numbers.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from mapreduce_weather_analysis_spark.plans.registry import (
        REGISTRY,
        _import_plans,
    )
    from mapreduce_weather_analysis_spark.session import get_spark
    from mapreduce_weather_analysis_spark.streaming import events_stream as es

    _import_plans()
    spark = get_spark(app_name="semgate-argmax-experiment")

    # --- arm A: the registered query (pair-fanout drain + batch window)
    fn = REGISTRY["q_stream_decontaminate_semantic"].fn

    def drain_of(build):
        best_wall, best_drain, out = float("inf"), 0.0, None
        for _ in range(3):
            n0 = len(es.DRAIN_TIMINGS)
            t0 = time.perf_counter()
            df = build(spark, SF)
            rows = df.collect()
            wall = time.perf_counter() - t0
            drain = sum(d["drain_s"] for d in es.DRAIN_TIMINGS[n0:])
            if wall < best_wall:
                best_wall, best_drain, out = wall, drain, rows
        return best_wall, best_drain, out

    wall_a, drain_a, rows_a = drain_of(fn)
    print(f"arm A (registered): wall {wall_a:.2f}s drain {drain_a:.2f}s "
          f"rows {len(rows_a)}")

    # --- arm B: in-stream stateful argmax, sink rows = |train docs|
    def arm_b(spark, sf_dir):
        from pyspark.sql import functions as F

        from mapreduce_weather_analysis_spark.functions.compat import (
            dround,
            portable_hash32,
        )
        from mapreduce_weather_analysis_spark.functions.text import (
            has_min_tokens,
            tokens,
        )
        from mapreduce_weather_analysis_spark.functions.vectors import (
            dot_unrolled,
        )
        from mapreduce_weather_analysis_spark.plans.curation_suite import (
            _FEAT_DIM,
            _SEMDECON_EVAL_CAP,
            _SEMDECON_TAU,
            hashed_count_vectors,
        )
        from mapreduce_weather_analysis_spark.plans.dedup_suite import (
            _DECON_EVAL,
        )
        from mapreduce_weather_analysis_spark.plans.registry import t
        from mapreduce_weather_analysis_spark.streaming.events_stream import (
            read_documents_stream,
            run_available_now,
        )

        ev_terms = (
            t(spark, sf_dir, "documents")
            .where(
                (F.col("doc_id") % _DECON_EVAL == 0)
                & (F.col("doc_id") < _SEMDECON_EVAL_CAP)
            )
            .select("doc_id", F.explode(tokens("text")).alias("term"))
        )
        evals = hashed_count_vectors(ev_terms).select(
            F.col("doc_id").alias("eval_doc"),
            F.transform(F.col("v"), lambda x: x * F.lit(1.0)).alias("ev_v"),
        )
        evals = evals.select(
            "eval_doc",
            "ev_v",
            F.sqrt(
                dot_unrolled(F.col("ev_v"), F.col("ev_v"), _FEAT_DIM)
            ).alias("ev_n"),
        )
        toks = tokens("text")
        buckets = F.transform(
            toks, lambda s: portable_hash32(s) % _FEAT_DIM
        )
        v_of_b = F.transform(
            F.sequence(F.lit(0), F.lit(_FEAT_DIM - 1)),
            lambda i: F.size(
                F.filter(F.col("b"), lambda b: b == i.cast("bigint"))
            )
            * F.lit(1.0),
        )
        stream = (
            read_documents_stream(spark, sf_dir)
            .where(F.col("doc_id") % _DECON_EVAL != 0)
            .where(has_min_tokens("text", 1))
            .select(F.col("doc_id").alias("train_doc"), buckets.alias("b"))
            .repartition(F.col("train_doc"))
            .select("train_doc", v_of_b.alias("tr_v"))
            .select(
                "train_doc",
                "tr_v",
                F.sqrt(
                    dot_unrolled(F.col("tr_v"), F.col("tr_v"), _FEAT_DIM)
                ).alias("tr_n"),
            )
            .repartition(F.col("train_doc"))
        )
        cand = stream.join(F.broadcast(evals), F.lit(True), "inner").select(
            "train_doc",
            "eval_doc",
            dround(
                dot_unrolled(F.col("tr_v"), F.col("ev_v"), _FEAT_DIM)
                / (F.col("tr_n") * F.col("ev_n")),
                9,
            ).alias("cosine"),
        )
        # in-stream argmax: max over struct(cosine, -eval_doc) is the
        # window's (desc cosine, asc eval_doc) order; update mode emits
        # one row per changed key per batch, final state = global argmax
        best = cand.groupBy("train_doc").agg(
            F.max(
                F.struct(F.col("cosine"), (-F.col("eval_doc")).alias("ne"))
            ).alias("m")
        )
        drained = run_available_now(best, spark, mode="update")
        final = drained.groupBy("train_doc").agg(
            F.max("m").alias("m")
        )
        return final.select(
            "train_doc",
            (-F.col("m.ne")).cast("bigint").alias("eval_doc"),
            F.col("m.cosine").alias("cosine"),
            (F.col("m.cosine") >= _SEMDECON_TAU).alias("contaminated"),
        )

    wall_b, drain_b, rows_b = drain_of(arm_b)
    print(f"arm B (in-stream argmax): wall {wall_b:.2f}s "
          f"drain {drain_b:.2f}s rows {len(rows_b)}")

    key = lambda r: (r.train_doc, r.eval_doc, repr(r.cosine), r.contaminated)
    same = sorted(map(key, rows_a)) == sorted(map(key, rows_b))
    print("outputs identical:", same)
    if not same:
        a = {r.train_doc: r for r in rows_a}
        b = {r.train_doc: r for r in rows_b}
        diffs = [
            (k, a.get(k), b.get(k))
            for k in set(a) | set(b)
            if key(a[k]) != key(b[k])
        ][:5] if set(a) == set(b) else [("keysets differ", len(a), len(b))]
        print("first diffs:", diffs)


if __name__ == "__main__":
    main()
