"""PySpark-native analytics engine with the query/data-processing
capabilities of ``nishitha97/mapreduce_weather_analysis`` (a 2-job Hadoop
MapReduce weather analysis), re-expressed Spark-first.

The reference (read-only at /root/reference) computes two analyses over a
weather fact CSV joined to a 27-row location dimension:

* Q-CITY-MONTH (``Job1.java``): per (city, yyyy-MM) sum of precipitation
  hours and mean temperature, via a reduce-side inner equi-join.
* Q-MAX-MONTH (``Job2.java``): the single month with the highest global
  precipitation-hour total (earliest month wins ties).

This package generalizes those 13 dataflow operators (SURVEY.md §2) into a
reusable DataFrame-first operator library, plus the large-scale
training-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing, structured streaming) the reference never had.

Design posture (SURVEY.md §4.2): no custom Catalyst rules — every operator
is declared with the DataFrame/SQL API so predicate pushdown, column
pruning, broadcast-join selection, partial aggregation and AQE come free.
Python touches rows only where no built-in exists (Arrow-batched, never
per-row).
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
