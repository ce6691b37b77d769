"""Local replica of the driver's oracle comparison (SURVEY.md §5.2 item 1):
run a registered Spark query and its DuckDB oracle SQL over the same parquet
fixtures, then compare row count + column names + order-insensitive values.

Stricter than tolerance-based checks on purpose: values must match exactly
(doubles bitwise) — the engine's cross-engine determinism contract
(functions/compat.py) is designed to make that hold.
"""

from __future__ import annotations

import datetime as _dt
import math


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # decimals → float-compatible; dates/timestamps → ISO strings
    if hasattr(v, "as_tuple"):  # Decimal
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        out.append(tuple(_norm_cell(row[i]) for i in order))
    return sorted(out, key=repr), [colnames[i] for i in order]


def compare_query(spark, duck, spec, sf_dir):
    """Assert a QuerySpec's Spark result matches its DuckDB oracle."""
    sdf = spec.fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns

    rel = duck.execute(spec.oracle)
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()

    assert sorted(scols) == sorted(ocols), (
        f"{spec.name}: column mismatch spark={sorted(scols)} oracle={sorted(ocols)}"
    )
    assert len(srows) == len(orows), (
        f"{spec.name}: row count spark={len(srows)} oracle={len(orows)}"
    )

    snorm, cols = _normalize([tuple(r) for r in srows], scols)
    onorm, _ = _normalize(orows, ocols)
    # repr-strict: int 900 must not silently equal float 900.0 — the driver
    # hashes typed values, so type drift is a real mismatch.
    mismatches = [
        (i, a, b)
        for i, (a, b) in enumerate(zip(snorm, onorm))
        if repr(a) != repr(b)
    ]
    assert not mismatches, (
        f"{spec.name}: {len(mismatches)} value mismatches (cols={cols}); "
        f"first: spark={mismatches[0][1]} oracle={mismatches[0][2]}"
    )
