"""MERGE-style upsert and SCD2 effective dating, emulated with plain
DataFrame ops (no Delta/Iceberg in this environment — the pattern is
anti-join + union + window, per the standard lakehouse-less recipe).

Scale: both operators shuffle once on the key. Upsert's anti-join
broadcast-s the update batch when small (the common case: incremental
batches ≪ base table); SCD2's window partitions on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def merge_upsert(base: DataFrame, updates: DataFrame, key: str, ts: str) -> DataFrame:
    """MERGE emulation: rows from ``updates`` replace same-key rows in
    ``base`` (latest ``ts`` wins within updates too); unmatched keys insert.
    Equivalent to ``MERGE INTO base USING updates ... WHEN MATCHED UPDATE
    WHEN NOT MATCHED INSERT`` for whole-row updates."""
    w = W.partitionBy(key).orderBy(F.desc(ts))
    latest_updates = (
        updates.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    untouched = base.join(latest_updates, key, "left_anti")
    return untouched.unionByName(latest_updates)


def scd2_history(events: DataFrame, key: str, ts: str) -> DataFrame:
    """Slowly-changing-dimension type 2: each state change becomes a
    version row with [effective_from, effective_to) — open-ended (null)
    for the current version."""
    w = W.partitionBy(key).orderBy(ts)
    return events.select(
        "*",
        F.col(ts).alias("effective_from"),
        F.lead(ts).over(w).alias("effective_to"),
        F.lead(ts).over(w).isNull().alias("is_current"),
    )
