"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
with decode/feature-extract as Arrow-batched ``mapInPandas`` operators.

The image/audio codecs aren't in this container (committed probe:
``scripts/env_probe.py`` output recorded in ``ENVIRONMENT.md`` — no PIL,
cv2, av, soundfile, nor ffmpeg/ffprobe binaries; installs are out of
scope), so the *decode* step is
either (a) a deterministic fake used to exercise the real Spark plumbing
(schemas, batch iteration, partitioning) end-to-end, or (b) a
clearly-marked ``NotImplementedError`` stub showing exactly where a real
codec (PIL / torchaudio / pyav) drops in. Everything around the decode —
binary columns, metadata structs, batch shapes, partition sizing — is real
and tested.

Scale posture (100 TB of blobs): blobs never shuffle — metadata extraction
and decoding are narrow per-partition maps; only the (tiny) feature/metadata
output flows into joins. Partition budget: size input splits so a batch of
decoded frames fits executor memory (``spark.sql.files.maxPartitionBytes``
tuned to blob size × decode expansion factor).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_blob(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Wrap a content column as an opaque binary payload + typed metadata —
    the ingestion shape for any multimodal table."""
    blob = F.col(content_col).cast("binary")
    return df.select(
        F.col(id_col).alias("doc_id"),
        blob.alias("blob"),
        F.struct(
            F.octet_length(blob).cast("bigint").alias("n_bytes"),
            F.sha2(blob, 256).alias("sha256"),
            F.lit("application/octet-stream").alias("content_type"),
        ).alias("meta"),
    )


def fake_decode_features(blobs: DataFrame) -> DataFrame:
    """Deterministic FAKE decoder (stands in for image decode): derives a
    pseudo width/height from the byte length and an 8-bin byte-value
    histogram as the "feature vector". Real Arrow-batched ``mapInPandas``
    plumbing — swap `_decode_batch`'s body for a PIL/pyav call and nothing
    else changes."""

    def _decode_batch(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                # null payloads decode as empty (a real decoder must not
                # crash on a missing blob; geometry degenerates to 1x1)
                data = np.frombuffer(
                    bytes(blob) if blob is not None else b"", dtype=np.uint8
                )
                n = int(data.size)
                width = max(int(n**0.5), 1)
                height = max(n // width, 1)
                hist = np.bincount(data % FEATURE_DIM, minlength=FEATURE_DIM)
                feats = (hist / max(n, 1)).astype(float).tolist()
                rows.append((int(doc_id), n, width, height, feats))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "width", "height", "features"]
            )

    return blobs.select("doc_id", "blob").mapInPandas(_decode_batch, DECODED_SCHEMA)


def decode_image(blobs: DataFrame) -> DataFrame:
    """REAL image decode — requires PIL, absent from this container."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image decode needs Pillow; this container has no codecs — "
            "use fake_decode_features for plumbing tests"
        ) from e
    raise NotImplementedError("wire PIL decode into _decode_batch")  # pragma: no cover


def resize_stub(blobs: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub: real implementation is a mapInPandas identical in shape
    to fake_decode_features (batch in → batch out, no shuffle)."""
    raise NotImplementedError("resize needs an image codec (PIL/opencv)")


def frame_sample_stub(blobs: DataFrame, every_n: int) -> DataFrame:
    """CODEC video frame-sampling stub (pyav): real container formats need
    ffmpeg to find frame boundaries. For fixed-stride payloads (raw video,
    tensors, audio PCM) use :func:`frame_sample_relational` — same 1→N
    output contract, pure JVM."""
    raise NotImplementedError("codec frame sampling needs pyav/ffmpeg")


FRAME_BYTES = 256


def frame_sample_relational(
    blobs: DataFrame, frame_bytes: int = FRAME_BYTES, every_n: int = 4
) -> DataFrame:
    """Frame sampling over fixed-stride binary payloads, fully relational:
    one row per sampled frame (index stride ``every_n``), sliced with
    binary ``substring`` and fingerprinted JVM-side. The 1→N expansion is
    an array ``explode`` — no Python, no shuffle; output volume is
    input/every_n, which is the number that matters when sizing partitions
    for 100 TB of video."""
    n = F.octet_length("blob").cast("bigint")
    n_frames = (n + F.lit(frame_bytes - 1)) / F.lit(frame_bytes)
    n_frames = F.floor(n_frames).cast("bigint")
    idxs = F.when(
        n_frames > 0,
        F.sequence(
            F.lit(0).cast("bigint"),
            n_frames - 1,
            F.lit(every_n).cast("bigint"),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    frame = F.substring(
        F.col("blob"), (F.col("frame_idx") * frame_bytes + 1).cast("int"), frame_bytes
    )
    # The digest is sha256 of the frame's lowercase-hex encoding, not of the
    # raw bytes: DuckDB 1.0's sha256() only accepts VARCHAR, so hashing the
    # hex string is the strongest frame fingerprint both engines can compute
    # byte-exactly even when a frame boundary splits a multi-byte UTF-8
    # character (the oracle slices a hex string, 2 chars per byte).
    return (
        blobs.select("doc_id", "blob", F.explode(idxs).alias("frame_idx"))
        .select(
            "doc_id",
            "frame_idx",
            F.octet_length(frame).cast("bigint").alias("frame_bytes"),
            F.sha2(F.lower(F.hex(frame)), 256).alias("frame_sha"),
        )
    )


def fake_decode_features_arrow(blobs: DataFrame) -> DataFrame:
    """mapInArrow twin of :func:`fake_decode_features`: same fake decode,
    but the batch API is pyarrow RecordBatch — no pandas materialization,
    which matters when blobs are large (Arrow buffers stay zero-copy until
    the numpy view). Tests assert it is row-identical to the pandas path."""

    def _decode_batch(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            ids = batch.column("doc_id").to_pylist()
            rows = []
            for doc_id, blob in zip(ids, batch.column("blob").to_pylist()):
                data = np.frombuffer(
                    bytes(blob) if blob is not None else b"", dtype=np.uint8
                )
                n = int(data.size)
                width = max(int(n**0.5), 1)
                height = max(n // width, 1)
                hist = np.bincount(data % FEATURE_DIM, minlength=FEATURE_DIM)
                feats = (hist / max(n, 1)).astype(float).tolist()
                rows.append((int(doc_id), n, width, height, feats))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([r[i] for r in rows], type=t)
                    for i, t in enumerate(
                        (
                            pa.int64(),
                            pa.int64(),
                            pa.int32(),
                            pa.int32(),
                            pa.list_(pa.float64()),
                        )
                    )
                ],
                names=["doc_id", "n_bytes", "width", "height", "features"],
            )

    return blobs.select("doc_id", "blob").mapInArrow(_decode_batch, DECODED_SCHEMA)
