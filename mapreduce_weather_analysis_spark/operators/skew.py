"""Skew-mitigation operators (SCALE.md: the manual fallback when AQE's
skew handling isn't enough — e.g. one hot grouping key dominating a 100 TB
aggregation).

Salted aggregation: two-phase — (key, salt) partial aggregate spreads the
hot key over ``n_salts`` reducers, then a tiny re-aggregate by key merges
the partials. Results are EXACTLY the plain groupBy's (decimal-routed sums
are order-independent), which is what the oracle checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: Callable[[], list[Column]],
    final_aggs: list[Column],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs`` builds the phase-1 aggregate columns (fresh per call);
    ``final_aggs`` re-aggregates the partial columns by the bare key.
    """
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(*partial_aggs())
    )
    return phase1.groupBy(*key_cols).agg(*final_aggs)
