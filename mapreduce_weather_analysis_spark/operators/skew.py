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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_cols: list[str],
    n_salts: int = 8,
) -> DataFrame:
    """Skew-salted inner equi-join: the hot-key mitigation for joins where
    one fact key dominates (AQE skew-join splits map outputs, but a single
    reducer key can still exceed memory when the dim row must meet EVERY
    hot fact row in one task).

    Rewrite: the fact side gets a deterministic salt in [0, n_salts) hashed
    from stable row-identity columns (``salt_cols`` — same recompute-safety
    argument as :func:`salted_agg`); the dim side is replicated once per
    salt via ``explode``; the join key becomes (key, salt), spreading each
    hot key over ``n_salts`` reducers. Result is EXACTLY the plain join's —
    every (fact row, dim row) pair still meets exactly once, on the fact
    row's salt.

    Cost: dim side scales ×``n_salts`` through the shuffle — apply to the
    smaller-but-not-broadcastable side only.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in salt_cols]), F.lit(n_salts))
    f = fact.withColumn("_fsalt", salt)
    d = dim.withColumn(
        "_dsalt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return (
        f.join(
            d,
            (f[fact_key] == d[dim_key]) & (f["_fsalt"] == d["_dsalt"]),
            "inner",
        )
        .drop("_fsalt", "_dsalt")
    )


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
