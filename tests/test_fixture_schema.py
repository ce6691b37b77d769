"""Fixture-schema contract: the NORMALIZED schema every query depends on,
as produced by load_table (ensure_session_conf pins NTZ inference off and
nanos-as-long on, so physical re-encodings of the driver-generated parquet
— TIMESTAMP(NANOS) in rounds 1-2, plain µs NTZ from round 3 — all land on
the same logical types). If the driver regenerates /root/testdata with yet
another encoding, this fails first with a readable message instead of 40
queries erroring on unix_micros/watermarks."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from mapreduce_weather_analysis_spark.sources.tables import load_table

from .conftest import SMOKE_SF

EXPECTED = {
    "events": {
        "event_id": T.LongType(),
        "ts": T.TimestampType(),  # NOT TimestampNTZType — unix_micros needs this
        "user_id": T.LongType(),
        "event_type": T.StringType(),
        "value": T.DoubleType(),
        "props": T.StringType(),
    },
    "lineitem": {"l_shipdate": T.TimestampType(), "l_quantity": T.DoubleType()},
    "orders": {"o_orderdate": T.TimestampType(), "o_totalprice": T.DoubleType()},
    "documents": {"doc_id": T.LongType(), "text": T.StringType()},
    "embeddings": {
        "vec_id": T.LongType(),
        "embedding": T.ArrayType(T.FloatType()),
        "label": T.IntegerType(),
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_normalized_fixture_schema(spark, table):
    schema = {f.name: f.dataType for f in load_table(spark, SMOKE_SF, table).schema}
    for col, want in EXPECTED[table].items():
        assert col in schema, f"{table}.{col} missing from fixture"
        assert schema[col] == want, (
            f"{table}.{col} normalized to {schema[col]}, queries expect {want} "
            "— the driver likely regenerated /root/testdata with a new "
            "encoding; adjust session.py/ensure_session_conf normalization"
        )
