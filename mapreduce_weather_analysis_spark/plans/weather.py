"""The reference's two end-to-end queries, Spark-first (SURVEY.md §2).

These run over any DataFrames with the reference's weather/location shapes
(tests feed tiny CSVs; the fixture-table analogs live in plans/analog.py).

Physical posture vs. the reference:
* Job1's reduce-side repartition join shuffles every weather row
  (Job1.java:36,48-49); here the 27-row dimension broadcast-joins — zero
  shuffle of the fact side for the join, and the groupBy aggregation gets
  map-side partial aggregation (the reference sets no combiner).
* Job2 funnels ALL rows through one reducer (setNumReduceTasks(1),
  Job2.java:100); here the month-sum is a distributed hash agg and the
  argmax a one-row ``orderBy().limit(1)`` over ~tens of month rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.datetime_fns import month_bucket
from ..functions.nulls import drop_if_unparseable, zero_if_null
from ..sources.weather_csv import filter_nonnull_keys


def q_city_month(weather: DataFrame, location: DataFrame) -> DataFrame:
    """Q-CITY-MONTH (Job1.java end-to-end): per (city, yyyy-MM) total
    precipitation hours and mean temperature.

    Reference semantics preserved:
    * inner join on location_id (quirk Q4 — Job1.java:80 drops unmatched
      weather AND weatherless cities);
    * null/malformed numerics → 0.0 *including in the AVG count*
      (quirk Q1 — Job1.java:89-105,116-123): hence avg(coalesce(x, 0)),
      not Spark's default null-skipping avg.
    """
    wx = filter_nonnull_keys(weather).select(
        "location_id",
        month_bucket("date").alias("year_month"),
        zero_if_null("temperature_2m_mean").alias("temp"),
        zero_if_null("precipitation_hours").alias("precip"),
    )
    dim = F.broadcast(location.select("location_id", "city_name"))
    return (
        wx.join(dim, "location_id", "inner")
        .groupBy("city_name", "year_month")
        .agg(
            F.sum("precip").alias("total_precipitation_hours"),
            F.avg("temp").alias("avg_temperature"),
        )
    )


def q_city_month_formatted(weather: DataFrame, location: DataFrame) -> DataFrame:
    """O11 formatted sink rows: ``city,yyyy-MM<TAB>%.3f,%.3f``
    (TextOutputFormat layout + rounding, Job1.java:106-107,145)."""
    agg = q_city_month(weather, location)
    return agg.select(
        F.format_string(
            "%s,%s\t%.3f,%.3f",
            "city_name",
            "year_month",
            "total_precipitation_hours",
            "avg_temperature",
        ).alias("line")
    )


def q_max_month(weather: DataFrame) -> DataFrame:
    """Q-MAX-MONTH (Job2.java end-to-end): the month with the highest global
    precipitation-hour total.

    Reference semantics preserved:
    * unparseable precipitation rows are DROPPED, not zeroed (quirk Q1,
      Job2.java:38-45) — opposite of Job1;
    * month key derived on the string path (Job2.java:30-36);
    * tie-break: strict ``>`` over ascending sorted keys (Job2.java:65)
      ⇒ earliest month wins — hence the secondary ascending sort.
    """
    wx = drop_if_unparseable(
        weather.where(F.col("date").isNotNull() & (F.col("date") != "")),
        "precipitation_hours",
    )
    monthly = (
        wx.select(
            month_bucket("date").alias("year_month"),
            F.col("precipitation_hours").cast("double").alias("precip"),
        )
        .groupBy("year_month")
        .agg(F.sum("precip").alias("total_precipitation_hours"))
    )
    return monthly.orderBy(
        F.desc("total_precipitation_hours"), F.asc("year_month")
    ).limit(1)
