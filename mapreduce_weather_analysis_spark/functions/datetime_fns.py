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


def month_bucket(
    date_str: Column | str, fmt: str = "M/d/yyyy", lenient: bool = False
) -> Column:
    """``M/d/yyyy`` string → ``yyyy-MM`` month key (typed path, Job1 analog).

    ``lenient=False`` (default): Spark's strict ``to_date`` — malformed
    or out-of-range dates become null (the engine's documented Q2
    divergence; SURVEY.md §2.1 pins fixtures to valid dates where the
    behaviors coincide).

    ``lenient=True``: reproduces Java's lenient ``SimpleDateFormat`` /
    ``Calendar`` ROLLOVER (Job1.java:61 accepts ``13/45/2023``) via
    pure date arithmetic: Calendar.set(y, m-1, d) normalizes to
    ``make_date(y,1,1) + (m-1) months + (d-1) days`` — exact for every
    integer m and d including zero and negatives (month 0 rolls back
    to December of y-1, day 0 to the prior month's last day), because
    Calendar's lenient normalization IS this affine arithmetic.
    Non-numeric fields still null out (SimpleDateFormat would throw
    ParseException there — no rollover to emulate), and numeric fields
    outside a wide affine domain (year 1-9999, |month| ≤ 12M, |day| ≤
    300M — ±1M years of rollover) null out too: past those bounds the
    date arithmetic itself overflows DateType's day counter, and under
    Spark 4's default ANSI mode plain ``make_date``/``add_months``/
    ``date_add`` RAISE on overflow — a "lenient" mode that crashes on
    extreme input would be neither lenient nor the strict-null
    divergence (review finding, round 11). The CASE guard short-circuits
    so the raising ops never see out-of-domain rows.

    Both paths otherwise use the try_* variants: under ANSI plain
    ``to_date``/``cast`` RAISE on malformed input, which is neither the
    reference's behavior (lenient rollover) nor the documented
    divergence (strict → null)."""
    c = F.col(date_str) if isinstance(date_str, str) else date_str
    if not lenient:
        return F.date_format(F.try_to_date(c, fmt), "yyyy-MM")
    if fmt != "M/d/yyyy":
        raise ValueError("lenient mode implements the reference's M/d/yyyy")
    parts = F.split(c, "/")
    m = parts.getItem(0).try_cast("int")
    d = parts.getItem(1).try_cast("int")
    y = parts.getItem(2).try_cast("int")
    # bounds keep every intermediate inside DateType's int32 day range:
    # base ≤ 2.93M days (year 9999), |m| months ≤ 1M years ≈ 3.7e8 days,
    # |d| ≤ 3e8 — worst-case sum ~6.8e8 < 2^31
    in_domain = (
        y.between(1, 9999)
        & m.between(-12_000_000, 12_000_000)
        & d.between(-300_000_000, 300_000_000)
    )
    rolled = F.when(
        in_domain,
        F.date_add(
            F.add_months(F.make_date(y, F.lit(1), F.lit(1)), m - F.lit(1)),
            d - F.lit(1),
        ),
    )
    return F.date_format(rolled, "yyyy-MM")


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
