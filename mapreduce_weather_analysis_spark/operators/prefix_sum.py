"""Distributed exclusive prefix sum — the scalable global running total.

A running sum over a GLOBAL order is the textbook Spark anti-pattern when
written naively: ``Window.orderBy(key)`` with no partition spec funnels
the whole relation through ONE task (WindowExec's "No Partition Defined"
warning — the hazard bench.py gates on). The scalable form is the classic
two-phase scan (Blelloch, "Prefix Sums and Their Applications", CMU-CS-90;
the same shape MPI_Scan / Flink's keyless running aggregates use):

1. **range-partition** the relation on the order key (each partition owns
   a contiguous key range, partitions themselves ordered);
2. one **per-partition total** aggregation — #partitions rows, a bounded
   driver collect (thousands of rows at any scale, never data-sized);
3. driver-side exclusive cumsum over those totals → per-partition OFFSETS,
   broadcast back;
4. one **within-partition** running sum (WindowExec partitioned on the
   partition id — every task streams only its own slice) plus the offset.

Wall-clock is two scans of the relation and one tiny collect; no stage
ever sees more than one partition's rows in one task.

Determinism note: ``repartitionByRange`` SAMPLES to pick boundaries, so
the partition assignment of a row is not stable across re-executions of
the same plan. Steps 2 and 4 must therefore read the SAME materialized
partitioning — the partitioned relation is pinned with ``localCheckpoint``
(the iterative-operator posture used by graph.py) before fanning out to
its two consumers. The RESULT is independent of where the boundaries
landed; only the two phases' agreement matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exclusive_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "prefix",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = sum of ``value_col`` over all rows STRICTLY before
    this row in ``order_col`` order (exclusive scan; first row gets 0).

    ``value_col`` must be integral (the per-partition totals and offsets
    stay exact bigints end-to-end). ``order_col`` must be unique — it is
    the total order being scanned. With duplicate keys the row-based
    frame below still produces a valid scan of SOME tie order, but that
    order (hence each peer's prefix) is not deterministic across runs;
    a count-vs-distinct guard is deliberately not paid here (it would
    add a third full scan to a two-scan operator) — callers own the
    uniqueness contract.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        # Lineage cut shared by both phases. NOTE the determinism
        # precondition of the lazy form (ADVICE r15): a lazy
        # localCheckpoint only pins partitions on their first
        # materialization, so "both phases see identical rows" holds
        # because every upstream here is deterministic (parquet scan +
        # deterministic exprs; repartitionByRange samples with a
        # per-partition-index seed) AND the first action below is a full
        # scan. A nondeterministic upstream (unseeded sample/rand) would
        # need eager=True to truly pin.
        .localCheckpoint(eager=False)
    )
    totals = {
        r["_pid"]: r["t"]
        for r in part.groupBy("_pid")
        .agg(F.sum(value_col).cast("bigint").alias("t"))
        .collect()  # bounded: one row per partition, never data-sized
    }
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += totals[pid]
    if not offsets:  # empty input: preserve schema, nothing to scan
        return df.withColumn(out_col, F.lit(0).cast("bigint"))
    odf = spark.createDataFrame(offsets, schema="_pid int, _off bigint")
    # ROWS frame, not the default RANGE (ADVICE r8): with RANGE, peer
    # rows (duplicate order keys) would share one inclusive sum and the
    # subtraction below would yield wrong exclusive prefixes SILENTLY
    # instead of surfacing the key-uniqueness precondition violation.
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col(value_col).cast("bigint")).over(w)
    return (
        part.join(F.broadcast(odf), "_pid")
        .withColumn(
            out_col, running - F.col(value_col).cast("bigint") + F.col("_off")
        )
        .drop("_pid", "_off")
    )


def shard_by_budget(
    df: DataFrame,
    order_col: str,
    value_col: str,
    budget: int,
    shard_col: str = "shard",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each row to a contiguous shard of ~``budget`` total
    ``value_col`` in ``order_col`` order: shard = exclusive-prefix DIV
    budget. Greedy first-fit on the running total — a row whose prefix
    crosses a shard boundary starts the next shard, so every shard except
    possibly the last holds ≥ budget − max(value) and < budget + max(value)
    units. Integer ``DIV`` keeps the bucketing exact past 2^53. Shard ids
    are monotone in key order but NOT necessarily dense: a single row
    larger than the budget jumps the running total past whole ids
    (hypothesis-pinned in tests/test_properties.py) — consumers must not
    assume id = ordinal."""
    pre = exclusive_prefix_sum(
        df, order_col, value_col, out_col="_prefix", num_partitions=num_partitions
    )
    return pre.withColumn(
        shard_col, F.expr(f"_prefix DIV {int(budget)}").cast("bigint")
    ).drop("_prefix")
