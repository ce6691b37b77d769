#!/usr/bin/env python
"""Independently verify CLI job1/job2 outputs against DuckDB.

Recomputes the reference semantics (SURVEY.md §2 quirks: inner join,
null->0 counted in AVG for Job1, unparseable-dropped for Job2, Java %.3f
HALF_UP emulated as varchar->DECIMAL(28,3)->varchar, earliest-month
argmax tie-break) straight from the input CSVs and byte-compares the
job outputs. Used for the 1x/10x/100x stress runs recorded in SCALE.md.

Usage:
  python scripts/verify_weather_cli.py WEATHER_CSV LOCATION_CSV JOB1_DIR JOB2_DIR
"""

from __future__ import annotations

import glob
import sys

import duckdb


def read_part_lines(out_dir: str) -> list[str]:
    lines: list[str] = []
    for p in sorted(glob.glob(f"{out_dir}/part-*.txt")):
        with open(p) as f:
            lines.extend(line.rstrip("\n") for line in f)
    return lines


def main() -> None:
    weather_csv, location_csv, job1_dir, job2_dir = sys.argv[1:5]
    con = duckdb.connect()
    con.execute(f"SET threads TO 16")
    con.execute(
        f"""
        CREATE VIEW w AS SELECT * FROM read_csv('{weather_csv}', header=true,
          all_varchar=true);
        CREATE VIEW l AS SELECT * FROM read_csv('{location_csv}', header=true,
          all_varchar=true);
        """
    )

    # --- Job1: city,yyyy-MM\t%.3f,%.3f (null->0 counted in AVG) ---
    job1_expected = [
        r[0]
        for r in con.execute(
            """
        WITH wx AS (
          SELECT location_id,
                 strftime(strptime(date, '%m/%d/%Y'), '%Y-%m') AS ym,
                 COALESCE(TRY_CAST(temperature_2m_mean AS DOUBLE), 0.0) AS temp,
                 COALESCE(TRY_CAST(precipitation_hours AS DOUBLE), 0.0) AS precip
          FROM w WHERE location_id IS NOT NULL AND date IS NOT NULL AND date <> ''
        ), agg AS (
          SELECT l.city_name, wx.ym,
                 SUM(precip) AS total, AVG(temp) AS avg_t
          FROM wx JOIN l ON wx.location_id = l.location_id
          GROUP BY 1, 2
        )
        SELECT city_name || ',' || ym || chr(9)
               || CAST(CAST(CAST(total AS VARCHAR) AS DECIMAL(28,3)) AS VARCHAR)
               || ','
               || CAST(CAST(CAST(avg_t AS VARCHAR) AS DECIMAL(28,3)) AS VARCHAR)
        FROM agg
        """
        ).fetchall()
    ]
    job1_got = read_part_lines(job1_dir)
    ok1 = sorted(job1_expected) == sorted(job1_got)
    print(f"job1: {len(job1_got)} lines, match={ok1}")
    if not ok1:
        exp, got = set(job1_expected), set(job1_got)
        for line in list(exp - got)[:5]:
            print(f"  only-expected: {line!r}")
        for line in list(got - exp)[:5]:
            print(f"  only-got:      {line!r}")

    # --- Job2: single line "yyyy-MM,<Double.toString(total)>" with
    # unparseable precip DROPPED and earliest-month tie-break ---
    ym, total = con.execute(
        """
        WITH wx AS (
          SELECT strftime(strptime(date, '%m/%d/%Y'), '%Y-%m') AS ym,
                 TRY_CAST(precipitation_hours AS DOUBLE) AS precip
          FROM w WHERE date IS NOT NULL AND date <> ''
        )
        SELECT ym, SUM(precip) AS total FROM wx WHERE precip IS NOT NULL
        GROUP BY 1 ORDER BY total DESC, ym ASC LIMIT 1
        """
    ).fetchone()
    job2_got = read_part_lines(job2_dir)
    # Job2 prints the raw Double.toString total (Job2.java semantics), so
    # the check is: argmax MONTH exact, total within 1e-9 relative. The
    # total's last digits are summation-order-dependent: byte-identical at
    # 7.3M rows, diverging in the ~13th significant digit at 72.9M rows
    # (Spark's 32-partition partial sums vs DuckDB's ordered scan — both
    # are valid IEEE sums of the same multiset).
    got_ym, got_total = job2_got[0].split(",")
    ok2 = (
        len(job2_got) == 1
        and got_ym == ym
        and abs(float(got_total) - total) <= 1e-9 * abs(total)
    )
    print(
        f"job2: got={job2_got[0]!r} expected_month={ym} "
        f"expected_total~={total!r} match={ok2}"
    )
    sys.exit(0 if ok1 and ok2 else 1)


if __name__ == "__main__":
    main()
