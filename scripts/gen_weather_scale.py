#!/usr/bin/env python
"""Generate a scaled synthetic weatherData.csv + locationData.csv for the
reference-workload stress runs recorded in SCALE.md.

Shape mirrors the reference's committed inputs
(/root/reference/input/locationData.csv + the missing weatherData.csv whose
schema Job1.java reads positionally): one row per (location, day) over 74
years starting 1950-01-01, m/d/yyyy non-padded dates, ~3% empty
temperature cells (the null-counted-in-AVG quirk Q1 path), occasional
empty precipitation_hours. Deterministic (hash-based), generated through
DuckDB COPY for speed (~73M rows in ~1 min).

Usage: python scripts/gen_weather_scale.py MULT OUT_WEATHER OUT_LOCATION
  MULT=100 -> 2700 locations x 74y x 365.25d ~ 72.9M rows (~2.9 GB).
"""

from __future__ import annotations

import sys

import duckdb

BASE_CITIES = 27
YEARS_DAYS = 27010  # 1950-01-01 .. 2023-12-way, same span the 1x file had


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out_weather = sys.argv[2] if len(sys.argv) > 2 else "/tmp/weather100x.csv"
    out_location = sys.argv[3] if len(sys.argv) > 3 else "/tmp/location100x.csv"
    n_loc = BASE_CITIES * mult

    con = duckdb.connect()
    con.execute(f"SET threads TO 16")

    # locations: cycle the reference's 27 city names with a replica suffix
    con.execute(
        f"""
        COPY (
          SELECT i AS location_id,
                 round(6.9 + (hash(i) % 1000) / 100.0, 6) AS latitude,
                 round(79.9 + (hash(i + 7) % 1000) / 100.0, 6) AS longitude,
                 hash(i + 13) % 500 AS elevation,
                 19800 AS utc_offset_seconds,
                 'Asia/Colombo' AS timezone,
                 530 AS timezone_abbreviation,
                 'City_' || CAST(i % {BASE_CITIES} AS VARCHAR)
                   || '_' || CAST(i // {BASE_CITIES} AS VARCHAR) AS city_name
          FROM range({n_loc}) t(i)
        ) TO '{out_location}' (HEADER, DELIMITER ',')
        """
    )

    # weather: one row per (location, day); ~3% null temperature
    con.execute(
        f"""
        COPY (
          SELECT l.i AS location_id,
                 CAST(EXTRACT(month FROM dd) AS VARCHAR) || '/'
                   || CAST(EXTRACT(day FROM dd) AS VARCHAR) || '/'
                   || CAST(EXTRACT(year FROM dd) AS VARCHAR) AS date,
                 0 AS c2, 0 AS c3, 0 AS c4,
                 CASE WHEN hash(l.i * 100000 + d.j) % 100 < 3 THEN NULL
                      ELSE round((hash(l.i * 31 + d.j * 7) % 450) / 10.0, 1)
                 END AS temperature_2m_mean,
                 0 AS c6, 0 AS c7, 0 AS c8, 0 AS c9, 0 AS c10, 0 AS c11,
                 0 AS c12,
                 CASE WHEN hash(l.i + d.j * 3) % 10 < 2 THEN NULL
                      ELSE round((hash(l.i * 5 + d.j) % 240) / 10.0, 1)
                 END AS precipitation_hours
          FROM range({n_loc}) l(i)
          CROSS JOIN (
            SELECT j, DATE '1950-01-01' + INTERVAL (j) DAY AS dd
            FROM range({YEARS_DAYS}) t(j)
          ) d
        ) TO '{out_weather}' (HEADER, DELIMITER ',')
        """
    )
    n = con.execute(
        f"SELECT count(*) FROM read_csv_auto('{out_weather}')"
    ).fetchone()[0]
    print(f"rows={n} locations={n_loc} -> {out_weather}, {out_location}")


if __name__ == "__main__":
    main()
