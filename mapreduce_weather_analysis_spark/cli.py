"""CLI entry points mirroring the reference's two job mains (SURVEY.md §3).

    python -m mapreduce_weather_analysis_spark job1 <weather_csv> <location_csv> <out>
    python -m mapreduce_weather_analysis_spark job2 <weather_csv> <location_csv> <job1_out> <job2_out>
    python -m mapreduce_weather_analysis_spark ingest <weather_csv> <location_csv> <out_dir>

* ``job1`` = Q-CITY-MONTH (Job1.java:126-148): formatted ``%.3f`` text out.
* ``job2`` = Q-MAX-MONTH (Job2.java:80-106): one ``month,total`` line where
  total is the raw double string (Job2.java:76 — Spark's double→string IS
  Java Double.toString, so the byte format matches). Quirk Q6 preserved:
  four args accepted, only <weather_csv> and <job2_out> used.
* ``ingest`` = the engine-canonical upgrade: typed, month-partitioned parquet.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(__doc__)
        return 2
    cmd, args = argv[0], argv[1:]

    from .plans.weather import q_city_month, q_max_month
    from .session import get_spark
    from .sources.sinks import ingest_weather_to_parquet, write_formatted_text
    from .sources.weather_csv import read_location_csv, read_weather_csv

    spark = get_spark(app_name=f"mwa-spark-{cmd}")

    if cmd == "job1":
        weather_csv, location_csv, out = args
        agg = q_city_month(
            read_weather_csv(spark, weather_csv), read_location_csv(spark, location_csv)
        )
        write_formatted_text(agg, out)
        return 0
    if cmd == "job2":
        weather_csv, _location_csv, _job1_out, out = args  # Q6: middle two unused
        top = q_max_month(read_weather_csv(spark, weather_csv))
        line = top.select(
            F.concat_ws(
                ",",
                "year_month",
                F.col("total_precipitation_hours").cast("string"),
            ).alias("value")
        )
        line.coalesce(1).write.mode("overwrite").text(out)
        return 0
    if cmd == "ingest":
        weather_csv, location_csv, out_dir = args
        ingest_weather_to_parquet(spark, weather_csv, location_csv, out_dir)
        return 0
    print(f"unknown command: {cmd}", file=sys.stderr)
    return 2
