#!/usr/bin/env python
"""Measured skew-JOIN stress (VERDICT r13 ask #7): SCALE.md documented AQE
skew handling as posture and q_salted_agg covers the AGG side, but no row
measured a skewed JOIN. This script builds a deliberately hot join key —
one key holding ~30% of a x10-replicated sf0.1 lineitem — and times:

1. the TPC-H-shaped fact x orders sort-merge join with AQE skew-join ON
   vs OFF (broadcast disabled: at 100 TB neither side of a fact join
   broadcasts, so the shuffle path is the one that must survive skew);
   plus the manual salted_join fallback for the case AQE can't cover.
2. the LSH band-bucket self-join from minhash_lsh_pairs over a documents
   pack where a near-duplicate flood shares band keys — the skew shape a
   dedup pipeline actually meets (NB: a flooded band bucket is foremost a
   PAIR-EXPLOSION problem — output grows quadratically in the bucket — so
   shuffle-level mitigation can only smooth stragglers, never the output).

AQE's skew trigger is rescaled to the replica (the defaults —
skewedPartitionThresholdInBytes=256m, factor 5 — are sized for production
partitions; the hot partition here is ~10^2 MB): threshold 8m, advisory
4m. At 100 TB the default thresholds trigger on the same shape.

Usage: python scripts/skew_join_stress.py            # both arms
Writes nothing to the repo; prints the SCALE.md evidence lines.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE = "/root/testdata/sf0.1"
HOT_FRAC_MOD = 10  # hash % 10 < 3 -> ~30% of fact rows on the hot key
HOT_FRAC_LT = 3


def _timed(build, n=2):
    """Best-of-n collect wall + whether the final adaptive plan split a
    skewed partition (the 'skew=true' marker on the SMJ operands).
    collect(), not a noop save: the save executes a CLONED plan, leaving
    the inspected df's own queryExecution at isFinalPlan=false with no
    AQE markers (found the hard way this round). Every build() returns a
    small aggregate, so collect cost is the query, not the transfer."""
    best, split = float("inf"), False
    for _ in range(n):
        df = build()
        t0 = time.perf_counter()
        df.collect()
        w = time.perf_counter() - t0
        if w < best:
            best = w
            plan = df._jdf.queryExecution().executedPlan().toString()
            split = "skew=true" in plan
    return best, split


def main() -> None:
    from pyspark.sql import functions as F

    from mapreduce_weather_analysis_spark.operators.skew import salted_join
    from mapreduce_weather_analysis_spark.session import get_spark

    spark = get_spark(app_name="skew-join-stress")
    # force the sort-merge path (see module docstring) and rescale AQE's
    # skew trigger to replica-sized partitions
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")

    # --- arm 1: TPC-H fact x orders with a 30%-hot orderkey ---------------
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    orders = spark.read.parquet(f"{BASE}/orders.parquet")
    hot = orders.agg(F.min("o_orderkey")).first()[0]
    fact = (
        li.withColumn("_r", F.explode(F.sequence(F.lit(1), F.lit(10))))
        .withColumn(
            "l_orderkey",
            F.when(
                F.pmod(
                    F.hash("l_orderkey", "l_linenumber", "_r"),
                    F.lit(HOT_FRAC_MOD),
                )
                < HOT_FRAC_LT,
                F.lit(hot),
            ).otherwise(F.col("l_orderkey")),
        )
        # MAP-GRANULARITY FINDING (round 14, verified with map-stats
        # forensics): AQE's OptimizeSkewedJoin subdivides a skewed reduce
        # partition at MAP-OUTPUT-BLOCK boundaries. The sf0.1 lineitem
        # parquet reads as ONE real input split, so the x10 replica's 6M
        # rows sat in a single map partition — the 21 MB hot reduce
        # partition (13x the 1.6 MB median, far over every threshold) had
        # exactly one map block and createSkewPartitionSpecs returned
        # None: "number of skewed partitions: left 0". A production fact
        # scan has thousands of map tasks, so the repartition below is
        # what makes the replica faithful, not a cheat.
        .repartition(32)
        .localCheckpoint()  # freeze the pack so every config times the JOIN
    )
    n_fact = fact.count()
    n_hot = fact.where(F.col("l_orderkey") == hot).count()
    print(
        f"fact rows {n_fact}, hot-key rows {n_hot} "
        f"({100 * n_hot / n_fact:.1f}%)"
    )

    def tpch_join():
        j = fact.join(orders, fact.l_orderkey == orders.o_orderkey)
        return j.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("qty"),
        )

    for tag, on in (("aqe-skew-ON ", "true"), ("aqe-skew-OFF", "false")):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", on)
        w, split = _timed(tpch_join)
        print(f"tpch-join {tag}: {w:6.2f}s  skew-partition-split={split}")

    # manual fallback, measured with AQE skew handling disabled
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")

    def tpch_salted():
        j = salted_join(
            fact,
            orders,
            "l_orderkey",
            "o_orderkey",
            ["l_orderkey", "l_linenumber", "_r"],
            n_salts=16,
        )
        return j.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("qty"),
        )

    w, _ = _timed(tpch_salted)
    print(f"tpch-join salted(16), aqe-skew-OFF: {w:6.2f}s")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    # --- arm 2: LSH band-bucket self-join under a near-dup flood ----------
    from mapreduce_weather_analysis_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    base_text = (
        docs.orderBy("doc_id").select("text").first()[0] or "the base doc"
    )
    for pct, lt in (("10%", 1), ("30%", 3)):
        flood = docs.withColumn(
            "text",
            F.when(
                F.pmod(F.hash("doc_id"), F.lit(HOT_FRAC_MOD)) < lt,
                F.concat(
                    F.lit(base_text + " uniq"),
                    F.col("doc_id").cast("string"),
                ),
            ).otherwise(F.col("text")),
        ).localCheckpoint()
        n_flood = flood.where(
            F.pmod(F.hash("doc_id"), F.lit(HOT_FRAC_MOD)) < lt
        ).count()
        n_pairs = minhash_lsh_pairs(flood, "text", "doc_id").count()
        for tag, on in (("aqe-skew-ON ", "true"), ("aqe-skew-OFF", "false")):
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", on)
            w, split = _timed(
                # reduce to one row so collect() cost IS the pair join
                lambda: minhash_lsh_pairs(flood, "text", "doc_id").agg(
                    F.count(F.lit(1)).alias("n_pairs")
                )
            )
            print(
                f"lsh-band-join flood={pct} ({n_flood} docs) {tag}: "
                f"{w:6.2f}s  pairs={n_pairs}  skew-partition-split={split}"
            )


if __name__ == "__main__":
    main()
