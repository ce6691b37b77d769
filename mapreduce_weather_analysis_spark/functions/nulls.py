"""Null/malformed-value coercion (SURVEY.md §2 O10, quirk Q1).

The reference's two jobs disagree about bad numerics:
* Job1 coerces null/empty/malformed to 0.0 and *includes them in AVG counts*
  (Job1.java:116-123 via Job1.java:89-105);
* Job2 silently drops rows whose value fails to parse (Job2.java:38-45).

Both behaviors are first-class here so each query can pick the reference
semantics it needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zero_if_null(c: Column | str, target: str = "double") -> Column:
    """Job1's ``parseDouble``-with-fallback: anything unparseable → 0.0.

    ``try_cast`` mirrors the try/catch (malformed → null), ``coalesce``
    the catch-arm's ``return 0.0`` (Job1.java:116-123).
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.coalesce(col.try_cast(target), F.lit(0.0))


def drop_if_unparseable(df: DataFrame, column: str, target: str = "double") -> DataFrame:
    """Job2's skip-on-parse-failure (Job2.java:38-45): filter, don't coerce."""
    return df.where(F.col(column).try_cast(target).isNotNull())
