"""Explicit StructTypes for every table the engine touches.

The reference has no schemas — column positions live in code
(``Job1.java:40-44`` reads weather cols {0,1,5,13} of a ≥14-column CSV;
``input/locationData.csv:1`` fixes the 8 location columns). Here each table
gets a real typed schema so the parquet/CSV scans prune columns and push
predicates (SURVEY.md §1.2/§1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Reference-shaped tables (SURVEY.md §1.2, FIXTURES.md §A) ---------------

# weatherData.csv: ≥14 comma-separated columns, semantically-used ones below
# (Job1.java:40-44, Job2.java:30-40). `date` stays a string at scan time —
# the reference's `M/d/yyyy` parsing (Job1.java:61) is an engine operator
# (functions.datetime_fns.month_bucket), not a scan concern.
WEATHER_USED_COLUMNS = {
    0: "location_id",
    1: "date",
    5: "temperature_2m_mean",
    13: "precipitation_hours",
}
WEATHER_ARITY = 14  # Job1.java:40 dispatches on >= 14 columns


def weather_csv_schema(n_cols: int = WEATHER_ARITY) -> T.StructType:
    """Positional schema for the raw weather CSV (inert cols kept as string)."""
    fields = []
    for i in range(n_cols):
        name = WEATHER_USED_COLUMNS.get(i, f"weather_metric_{i}")
        fields.append(T.StructField(name, T.StringType(), True))
    return T.StructType(fields)


# Typed form after ingestion (engine-canonical).
WEATHER = T.StructType(
    [
        T.StructField("location_id", T.IntegerType(), True),
        T.StructField("date", T.StringType(), True),  # M/d/yyyy
        T.StructField("temperature_2m_mean", T.DoubleType(), True),
        T.StructField("precipitation_hours", T.DoubleType(), True),
    ]
)

# locationData.csv: 8 columns (input/locationData.csv:1-28, Job1.java:33-35).
LOCATION = T.StructType(
    [
        T.StructField("location_id", T.IntegerType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("elevation", T.IntegerType(), True),
        T.StructField("utc_offset_seconds", T.IntegerType(), True),
        T.StructField("timezone", T.StringType(), True),
        T.StructField("timezone_abbreviation", T.StringType(), True),
        T.StructField("city_name", T.StringType(), True),
    ]
)

# --- Driver fixture tables (FIXTURES.md §B) ---------------------------------
# Parquet files carry their own schemas; these StructTypes document the
# contract and back the streaming reader (readStream needs an explicit schema).

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),  # JSON payload
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)
