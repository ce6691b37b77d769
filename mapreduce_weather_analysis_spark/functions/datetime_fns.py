"""Date/time derivations (SURVEY.md §2 O8).

The reference derives a ``yyyy-MM`` month bucket two different ways:
* Job1: lenient ``SimpleDateFormat("M/d/yyyy")`` + Calendar + ``%04d-%02d``
  (Job1.java:61, 92-95);
* Job2: manual ``split("/")`` with zero-padded month (Job2.java:30-36).

For valid dates the two coincide; this module provides both the typed path
(parse → format, strict — Spark's ``to_date`` nulls out what SimpleDateFormat
would leniently roll over, quirk Q2) and the string path (split/pad, which
mirrors Job2 byte-for-byte and never touches a date type).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def month_bucket(date_str: Column | str, fmt: str = "M/d/yyyy") -> Column:
    """``M/d/yyyy`` string → ``yyyy-MM`` month key (typed path, Job1 analog)."""
    c = F.col(date_str) if isinstance(date_str, str) else date_str
    return F.date_format(F.to_date(c, fmt), "yyyy-MM")


def month_bucket_string_path(date_str: Column | str) -> Column:
    """Job2's string-only month derivation (Job2.java:30-36): split on '/',
    zero-pad the month, join with year. Never parses — accepts any a/b/c."""
    c = F.col(date_str) if isinstance(date_str, str) else date_str
    parts = F.split(c, "/")
    return F.concat_ws(
        "-", parts.getItem(2), F.lpad(parts.getItem(0), 2, "0")
    )


def month_of(ts: Column | str) -> Column:
    """``yyyy-MM`` bucket of a native timestamp/date column."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, "yyyy-MM")
