"""Skew-mitigation operators (SCALE.md: the manual fallback when AQE's
skew handling isn't enough — e.g. one hot grouping key dominating a 100 TB
aggregation).

Salted aggregation: two-phase — (key, salt) partial aggregate spreads the
hot key over ``n_salts`` reducers, then a tiny re-aggregate by key merges
the partials. Results are EXACTLY the plain groupBy's (decimal-routed sums
are order-independent).

The salt MUST be deterministic per row (a hash of stable row columns):
a random or ``monotonically_increasing_id``-based salt changes on task
recompute, and a stage retry after partial shuffle-fetch would re-bucket
rows — double-counting some and dropping others. Spark's indeterminate-
stage rollback does not protect user-defined nondeterministic grouping
keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt_cols: list[str] | None = None,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs`` are the phase-1 aggregate columns; ``final_aggs``
    re-aggregate the phase-1 output by the bare key. ``salt_cols`` (default:
    every input column) feed the deterministic per-row salt hash.
    """
    salt_src = [F.col(c) for c in (salt_cols or df.columns)]
    salt = F.pmod(F.hash(*salt_src), F.lit(n_salts))
    phase1 = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return phase1.groupBy(*key_cols).agg(*final_aggs)
