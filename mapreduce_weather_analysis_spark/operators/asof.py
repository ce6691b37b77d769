"""As-of and range joins — operators Spark lacks natively (the reference
has no joins beyond its single equi-join, Job1.java:66-80; these are the
standard temporal extensions a training-data/event pipeline needs).

**As-of join** (latest right row with r.ts ≤ l.ts per key), implemented the
scalable way: union both sides with a side tag, one window pass per key in
(ts, tag) order carrying the last-seen right row forward, then keep left
rows. One shuffle on the key, O(n log n) per partition, no per-group Python
(`pd.merge_asof` via applyInPandas would be the slow fallback).

**Range join** (point-in-interval): broadcast the interval side when small
(dimension bands), else bucketize the range key and equi-join on bucket +
residual predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """For each left row: columns of the latest right row (same ``key``)
    with ``right.ts <= left.ts`` — nulls when none exists (LEFT as-of).

    Equal timestamps match (right sorts before left at ties).
    """
    l_tagged = left.select(
        F.col(key).alias("_key"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.col(c).alias(f"l_{c}") for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("_key"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"l_{c}") for c in left_cols],
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy("_key")
        .orderBy("_ts", "_tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "_key",
        "_ts",
        "_tag",
        *[F.col(f"l_{c}") for c in left_cols],
        *[
            F.last(f"r_{c}", ignorenulls=True).over(w).alias(f"r_{c}")
            for c in right_cols
        ],
    )
    return carried.where(F.col("_tag") == 1).select(
        F.col("_key").alias(key),
        F.col("_ts").alias(ts),
        *[F.col(f"l_{c}").alias(c) for c in left_cols],
        *[F.col(f"r_{c}").alias(f"r_{c}") for c in right_cols],
    )


def range_join_bands(
    facts: DataFrame, bands: DataFrame, value_col: str, lo: str = "lo", hi: str = "hi"
) -> DataFrame:
    """Point-in-interval join: fact row × band with lo ≤ value < hi.

    The band side broadcasts (BroadcastNestedLoopJoin with the range
    predicate) — right for dimension-sized interval tables. For large
    interval sides, bucketize ``value_col`` to equi-join first.
    """
    return facts.join(
        F.broadcast(bands),
        (F.col(value_col) >= F.col(lo)) & (F.col(value_col) < F.col(hi)),
    )
