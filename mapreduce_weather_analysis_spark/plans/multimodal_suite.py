"""Multimodal queries: binary-payload metadata (oracle-checked, pure JVM)
and the Arrow-batched fake-decode pipeline (rows-only: Python feature
extraction has no SQL twin)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_blob, fake_decode_features
from .registry import register, t


@register(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256,
           lower(hex(encode(substr(text, 1, 4)))) AS magic_hex
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-blob metadata extraction (documents.text standing in for
    image bytes): byte length, content digest, magic-prefix hex — the
    shuffle-free metadata pass every multimodal pipeline starts with."""
    d = t(spark, sf_dir, "documents")
    blob = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.octet_length(blob).cast("bigint").alias("n_bytes"),
        F.sha2(blob, 256).alias("sha256"),
        F.lower(F.hex(F.substring(blob, 1, 4))).alias("magic_hex"),
    )


@register("q_multimodal_decode", oracle=None)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode + feature extraction (mapInPandas; deterministic
    fake codec — see operators/multimodal.py). Rows-only check: the Python
    stage has no SQL twin; determinism is asserted in tests."""
    d = t(spark, sf_dir, "documents")
    blobs = attach_blob(d, "text", "doc_id")
    return fake_decode_features(blobs)
