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


# --- REAL image codec: 24-bit uncompressed BMP, pure stdlib + numpy ---------
#
# BMP (BITMAPINFOHEADER, bpp=24, BI_RGB) is fully specified by public
# documentation and needs no codec library: a 54-byte little-endian header,
# then pixel rows stored BOTTOM-UP, each row's pixels in BGR channel order,
# each row zero-padded to a 4-byte boundary. That makes it the one mainstream
# image format this container can decode END-TO-END (VERDICT r12 ask #3) —
# the decoder below reads geometry from the file header and undoes all three
# format quirks; any image viewer opens what the encoder writes.
#
# The codec functions are produced by a factory so they are NON-IMPORTABLE
# nested functions: cloudpickle then serializes them BY VALUE into executor
# closures (a plain module-level def pickles by reference and crashes
# workers that can't import this repo — the driver-sim's /tmp cwd).

BMP_HEADER_BYTES = 54


def _make_bmp24_codec():
    def encode_bmp24(payload, width=None, height=None) -> bytes:
        """Encode an arbitrary byte payload as a spec-conformant 24-bit
        uncompressed BMP: the payload becomes the top-down, row-major RGB
        pixel stream (zero-padded to width*height*3), stored per the
        format — bottom-up rows, BGR order, 4-byte row padding. Geometry
        is explicit when (width, height) are passed (the resize path,
        where the near-square rule would mislabel any non-square target —
        ADVICE r13), else the near-square the fake codec uses:
        npix = max(ceil(n/3), 1), width = max(floor(sqrt(npix)), 1),
        height = ceil(npix/width). An explicit geometry too small for the
        payload is a caller bug and raises ValueError."""
        import struct

        import numpy as np

        data = bytes(payload) if payload is not None else b""
        n = len(data)
        if (width is None) != (height is None):
            raise ValueError("pass both of (width, height) or neither")
        if width is not None:
            if width <= 0 or height <= 0:
                raise ValueError(f"bad explicit geometry {width}x{height}")
            if n > width * height * 3:
                raise ValueError(
                    f"payload of {n} bytes overflows the explicit "
                    f"{width}x{height} pixel stream"
                )
        else:
            npix = max((n + 2) // 3, 1)
            # float sqrt, not isqrt: the oracle computes floor(sqrt(npix))
            # in DuckDB and IEEE-754 sqrt is correctly rounded on both
            # engines, so floor agrees bit-exactly (incl. perfect squares)
            # — the same device q_multimodal_decode's geometry relies on.
            width = max(int(npix**0.5), 1)
            height = (npix + width - 1) // width
        rgb = np.zeros(width * height * 3, dtype=np.uint8)
        rgb[:n] = np.frombuffer(data, dtype=np.uint8)
        # top-down RGB -> bottom-up BGR rows
        px = rgb.reshape(height, width, 3)[::-1, :, ::-1]
        stride = (width * 3 + 3) // 4 * 4
        rows = np.zeros((height, stride), dtype=np.uint8)
        rows[:, : width * 3] = px.reshape(height, width * 3)
        body = rows.tobytes()
        header = struct.pack(
            "<2sIHHI" "IiiHHIIiiII",
            b"BM",
            BMP_HEADER_BYTES + len(body),
            0,
            0,
            BMP_HEADER_BYTES,  # pixel data offset
            40,  # BITMAPINFOHEADER size
            width,
            height,  # positive = bottom-up
            1,  # planes
            24,  # bpp
            0,  # BI_RGB (uncompressed)
            len(body),
            2835,  # 72 DPI in px/metre
            2835,
            0,
            0,
        )
        return header + body

    def decode_bmp24(blob):
        """Parse a 24-bit uncompressed BMP GENERICALLY: geometry comes
        from the file header (never a side channel), row padding is
        stripped, bottom-up row order (or top-down when height < 0) and
        BGR channel order are undone. Returns (width, height, top-down
        row-major RGB uint8 array). Raises ValueError on non-BMP input
        and NotImplementedError on BMP variants that genuinely need a
        codec library (palette / RLE / non-24bpp)."""
        import struct

        import numpy as np

        b = bytes(blob) if blob is not None else b""
        if len(b) < BMP_HEADER_BYTES or b[:2] != b"BM":
            raise ValueError("not a BMP payload (missing 'BM' magic)")
        (off,) = struct.unpack_from("<I", b, 10)
        hdr_size, width, height, planes, bpp, compression = struct.unpack_from(
            "<IiiHHI", b, 14
        )
        if hdr_size < 40 or planes != 1 or width <= 0 or height == 0:
            raise ValueError(
                f"malformed BMP header (dib={hdr_size}, planes={planes}, "
                f"{width}x{height})"
            )
        if bpp != 24 or compression != 0:
            raise NotImplementedError(
                f"only 24-bit uncompressed BMP is implemented "
                f"(bpp={bpp}, compression={compression} needs a codec "
                f"library such as Pillow)"
            )
        topdown = height < 0
        height = abs(height)
        stride = (width * 3 + 3) // 4 * 4
        if len(b) < off + stride * height:
            raise ValueError("truncated BMP pixel array")
        rows = np.frombuffer(
            b, dtype=np.uint8, count=stride * height, offset=off
        ).reshape(height, stride)
        px = rows[:, : width * 3].reshape(height, width, 3)
        if not topdown:
            px = px[::-1]
        return width, height, px[..., ::-1].reshape(-1).copy()

    return encode_bmp24, decode_bmp24


encode_bmp24, decode_bmp24 = _make_bmp24_codec()


DECODED_REAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("file_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("pixel_weighted", T.LongType()),
    ]
)


def encode_bmp_blobs(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Arrow-batched BMP encode: (id, content) -> (doc_id, blob) where blob
    is a real BMP file. Fixture synthesis for the end-to-end decode path —
    in production the blobs arrive encoded; this stage exists so the
    decoder has spec-conformant input at every SF without shipping binary
    fixtures."""
    enc = encode_bmp24  # closure-capture: ships by value, see factory note

    def _encode_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    # pd.isna, not `is None`: pandas may surface a null
                    # string cell as NaN, and str(nan) would encode the
                    # literal "nan" instead of the empty payload the
                    # oracle's COALESCE(text, '') predicts
                    "blob": [
                        enc(None if pd.isna(v) else str(v).encode("utf-8"))
                        for v in pdf["content"]
                    ],
                }
            )

    src = df.select(
        F.col(id_col).alias("doc_id"), F.col(content_col).alias("content")
    )
    return src.mapInPandas(
        _encode_batch, "doc_id bigint, blob binary"
    )


def decode_image(blobs: DataFrame) -> DataFrame:
    """REAL image decode over (doc_id, blob): per-blob magic dispatch —
    BMP parses end-to-end via the pure-stdlib decoder (header geometry,
    padding strip, bottom-up + BGR undo); JPEG/PNG/GIF magic raises
    NotImplementedError naming the codec library that would slot in
    (Pillow, absent from this container — ENVIRONMENT.md). Output per
    blob: header-derived geometry, file size, per-channel sums over the
    decoded top-down RGB stream, and a position-weighted fingerprint
    sum((i+1) * byte_i) that only matches if the decoder recovered the
    EXACT byte order (channel sums alone are permutation-blind).

    Scale posture: identical to fake_decode_features — a narrow
    Arrow-batched mapInPandas, blobs never shuffle, only the 8-column
    numeric row flows downstream."""
    dec = decode_bmp24  # closure-capture: ships by value, see factory note

    def _decode_batch(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        magics = {
            b"\xff\xd8": "JPEG",
            b"\x89P": "PNG",
            b"GI": "GIF",
        }
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob) if blob is not None else b""
                if b[:2] in magics:
                    raise NotImplementedError(
                        f"{magics[b[:2]]} decode needs Pillow; only BMP "
                        "decodes without a codec library"
                    )
                width, height, rgb = dec(b)
                v = rgb.astype(np.int64)
                ch = v.reshape(-1, 3).sum(axis=0)
                weighted = int(
                    (v * (np.arange(v.size, dtype=np.int64) + 1)).sum()
                )
                rows.append(
                    (
                        int(doc_id),
                        len(b),
                        width,
                        height,
                        int(ch[0]),
                        int(ch[1]),
                        int(ch[2]),
                        weighted,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "file_bytes",
                    "width",
                    "height",
                    "sum_r",
                    "sum_g",
                    "sum_b",
                    "pixel_weighted",
                ],
            )

    return blobs.select("doc_id", "blob").mapInPandas(
        _decode_batch, DECODED_REAL_SCHEMA
    )


def resize_stub(blobs: DataFrame, width: int, height: int) -> DataFrame:
    """CODEC resize stub: compressed formats (JPEG/PNG) need PIL/opencv to
    reach pixels. For BMP payloads use :func:`resize_bmp` — a REAL resize,
    no codec library required."""
    raise NotImplementedError("resize needs an image codec (PIL/opencv)")


def resize_bmp(blobs: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize for BMP blobs, end-to-end: parse the container
    (generic decoder), nearest-neighbor resample to (width, height) via
    integer floor index maps (target (x, y) reads source
    (x*sw // width, y*sh // height) — the standard NN rule, integer-exact
    so an oracle can replay it), and RE-ENCODE the resampled pixel stream
    as a new spec-conformant BMP. (doc_id, blob) -> (doc_id, blob): the
    output of one stage is valid input to decode_image, so
    decode -> resize -> encode -> decode exercises the full codec cycle.

    Scale posture: one narrow Arrow-batched mapInPandas — blobs never
    shuffle, output volume is width*height*3 per image regardless of
    input size (thumbnailing SHRINKS the corpus in flight, which is the
    point of doing it before any wide stage)."""
    enc, dec = encode_bmp24, decode_bmp24  # ship by value, see factory note

    def _resize_batch(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                sw, sh, rgb = dec(bytes(blob) if blob is not None else b"")
                px = rgb.reshape(sh, sw, 3)
                ys = np.arange(height, dtype=np.int64) * sh // height
                xs = np.arange(width, dtype=np.int64) * sw // width
                resized = px[ys][:, xs]  # NN gather, top-down raster order
                # explicit target geometry: the near-square default would
                # re-derive (w', h') from the payload length and mislabel
                # any non-square target's header (ADVICE r13)
                out.append(
                    (
                        int(doc_id),
                        enc(resized.reshape(-1).tobytes(), width, height),
                    )
                )
            yield pd.DataFrame(out, columns=["doc_id", "blob"])

    return blobs.select("doc_id", "blob").mapInPandas(
        _resize_batch, "doc_id bigint, blob binary"
    )


# --- REAL audio codec: WAV (RIFF) PCM16 mono, pure stdlib + numpy ----------
#
# Canonical WAV is the other mainstream media container simple enough to
# decode honestly without a codec library: a RIFF envelope whose chunks are
# (4-byte tag, uint32le size, payload) — the decoder below WALKS the chunk
# list generically (tolerating extra chunks like LIST/fact) to find "fmt "
# and "data", then validates PCM16 mono before touching samples. Compressed
# formats (MP3/AAC/IEEE-float WAV) raise NotImplementedError naming the
# library that would slot in. Same factory device as the BMP codec so
# executor closures ship the functions by value.

WAV_SAMPLE_RATE = 16_000


def _make_wav_pcm16_codec():
    def encode_wav_pcm16(payload) -> bytes:
        """Encode an arbitrary byte payload as a spec-conformant WAV file:
        the bytes become the little-endian PCM16 mono sample stream
        (zero-padded to an even length), 16 kHz. Any audio player opens
        the result."""
        import struct

        data = bytes(payload) if payload is not None else b""
        if len(data) % 2:
            data += b"\x00"
        fmt = struct.pack(
            "<HHIIHH",
            1,  # PCM
            1,  # mono
            WAV_SAMPLE_RATE,
            WAV_SAMPLE_RATE * 2,  # byte rate
            2,  # block align
            16,  # bits/sample
        )
        body = (
            b"WAVE"
            + b"fmt "
            + struct.pack("<I", len(fmt))
            + fmt
            + b"data"
            + struct.pack("<I", len(data))
            + data
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def decode_wav_pcm16(blob):
        """Parse a WAV GENERICALLY: validate the RIFF/WAVE envelope, walk
        the chunk list (any chunk order, unknown chunks skipped with
        word-aligned sizes — the format's actual contract) to locate
        "fmt " and "data", validate PCM 16-bit mono, and return
        (sample_rate, int16 numpy sample array). ValueError on a
        malformed container; NotImplementedError on formats that truly
        need a codec library (compressed / float / multichannel)."""
        import struct

        import numpy as np

        b = bytes(blob) if blob is not None else b""
        if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            raise ValueError("not a WAV payload (missing RIFF/WAVE)")
        pos, fmt_chunk, data_chunk = 12, None, None
        while pos + 8 <= len(b):
            tag = b[pos : pos + 4]
            (size,) = struct.unpack_from("<I", b, pos + 4)
            payload_end = pos + 8 + size
            if payload_end > len(b):
                raise ValueError(f"truncated {tag!r} chunk")
            if tag == b"fmt ":
                fmt_chunk = b[pos + 8 : payload_end]
            elif tag == b"data":
                data_chunk = b[pos + 8 : payload_end]
            pos = payload_end + (size & 1)  # chunks are word-aligned
        if fmt_chunk is None or data_chunk is None:
            raise ValueError("missing fmt /data chunk")
        audio_format, channels, rate, _, _, bits = struct.unpack_from(
            "<HHIIHH", fmt_chunk
        )
        if audio_format != 1 or bits != 16 or channels != 1:
            raise NotImplementedError(
                f"only PCM16 mono WAV is implemented (format="
                f"{audio_format}, bits={bits}, channels={channels} needs "
                f"an audio library such as soundfile/pyav)"
            )
        return rate, np.frombuffer(
            data_chunk[: len(data_chunk) // 2 * 2], dtype="<i2"
        )

    return encode_wav_pcm16, decode_wav_pcm16


encode_wav_pcm16, decode_wav_pcm16 = _make_wav_pcm16_codec()


DECODED_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("file_bytes", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sum_samples", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("sample_weighted", T.LongType()),
    ]
)


def encode_wav_blobs(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Arrow-batched WAV encode: (id, content) -> (doc_id, blob) where blob
    is a real RIFF/WAV file — fixture synthesis for the audio decode path
    (the encode_bmp_blobs convention for the audio modality)."""
    enc = encode_wav_pcm16  # ship by value, see factory note

    def _encode_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    # pd.isna for the NaN-null case — see encode_bmp_blobs
                    "blob": [
                        enc(None if pd.isna(v) else str(v).encode("utf-8"))
                        for v in pdf["content"]
                    ],
                }
            )

    src = df.select(
        F.col(id_col).alias("doc_id"), F.col(content_col).alias("content")
    )
    return src.mapInPandas(_encode_batch, "doc_id bigint, blob binary")


def decode_audio(blobs: DataFrame) -> DataFrame:
    """REAL audio decode over (doc_id, blob): WAV parses end-to-end via
    the chunk-walking PCM16 decoder; MP3/OGG magic raises
    NotImplementedError naming the codec library. Per blob: container
    size, header-derived sample rate, sample count/duration, integer
    sample sum, peak |amplitude|, and a position-weighted fingerprint
    (order-sensitive — a sample shuffle cannot hash-match). Narrow
    Arrow-batched mapInPandas; blobs never shuffle."""
    dec = decode_wav_pcm16  # ship by value, see factory note

    def _decode_batch(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        # prefix match, not fixed-width dict probe: the MPEG frame-sync
        # magic is 2 bytes while ID3/OggS are 3, so a b[:3] lookup could
        # never hit the 2-byte key and headerless MP3 fell through to the
        # WAV parser's ValueError instead of naming the codec (ADVICE r13)
        magics = ((b"ID3", "MP3"), (b"\xff\xfb", "MP3"), (b"Ogg", "OGG"))
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob) if blob is not None else b""
                codec = next(
                    (c for m, c in magics if b.startswith(m)), None
                )
                if codec is not None:
                    raise NotImplementedError(
                        f"{codec} decode needs an audio codec "
                        "library; only PCM WAV decodes without one"
                    )
                rate, samples = dec(b)
                v = samples.astype(np.int64)
                rows.append(
                    (
                        int(doc_id),
                        len(b),
                        int(rate),
                        int(v.size),
                        int(v.size) * 1000 // int(rate),
                        int(v.sum()),
                        int(np.abs(v).max()) if v.size else 0,
                        int(
                            (v * (np.arange(v.size, dtype=np.int64) + 1)).sum()
                        ),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "file_bytes",
                    "sample_rate",
                    "n_samples",
                    "duration_ms",
                    "sum_samples",
                    "peak",
                    "sample_weighted",
                ],
            )

    return blobs.select("doc_id", "blob").mapInPandas(
        _decode_batch, DECODED_AUDIO_SCHEMA
    )


# --- REAL video codec: YUV4MPEG2 (Y4M), pure stdlib + numpy -----------------
#
# Y4M is the one mainstream VIDEO container simple enough to decode honestly
# without a codec library (VERDICT r13 ask #3 — it completes the modality
# trio beside BMP and WAV): an ASCII stream header
# ``YUV4MPEG2 W<w> H<h> F<num>:<den> ...\n`` followed by frames, each a
# ``FRAME[ params]\n`` marker plus raw planar pixel data whose size is a pure
# function of (width, height, colorspace). mpv/ffplay open what the encoder
# writes. Compressed containers (MP4/AVI/MKV) raise NotImplementedError
# naming the library that would slot in. Same factory device as the BMP/WAV
# codecs so executor closures ship the functions by value.

Y4M_WIDTH = 8
Y4M_HEIGHT = 8
Y4M_FPS = (25, 1)
# raw-format frame sizes in HALF-BYTES per pixel (integer-exact): the
# colorspaces the spec defines for uncompressed planar data
Y4M_PLANES = {
    "mono": 2,
    "420": 3,
    "420jpeg": 3,
    "420mpeg2": 3,
    "420paldv": 3,
    "422": 4,
    "444": 6,
}


def _make_y4m_codec():
    def encode_y4m(payload, width=Y4M_WIDTH, height=Y4M_HEIGHT) -> bytes:
        """Encode an arbitrary byte payload as a spec-conformant Y4M
        stream: the bytes become the luma planes of consecutive Cmono
        frames (zero-padded to a whole number of width*height frames,
        minimum one), 25 fps progressive. Any Y4M-aware player opens
        the result."""
        data = bytes(payload) if payload is not None else b""
        fsz = width * height
        n_frames = max((len(data) + fsz - 1) // fsz, 1)
        data += b"\x00" * (n_frames * fsz - len(data))
        header = (
            f"YUV4MPEG2 W{width} H{height} "
            f"F{Y4M_FPS[0]}:{Y4M_FPS[1]} Ip A1:1 Cmono\n"
        ).encode("ascii")
        return header + b"".join(
            b"FRAME\n" + data[f * fsz : (f + 1) * fsz]
            for f in range(n_frames)
        )

    def decode_y4m(blob):
        """Parse a Y4M stream GENERICALLY: validate the YUV4MPEG2 magic,
        read the tagged stream header (any tag order; unknown tags like
        I/A/X skipped — frame geometry never depends on them; a missing
        C tag defaults to C420 per the spec), size frames from the
        (width, height, colorspace) triple, and walk the FRAME chunks
        tolerating per-frame parameters after the marker. Returns
        (width, height, fps_num, fps_den, colorspace, frames) with
        frames a [n_frames, frame_bytes] uint8 array. ValueError on a
        malformed container; NotImplementedError on colorspaces that
        genuinely need a pixel-format library (10-bit etc.)."""
        import numpy as np

        b = bytes(blob) if blob is not None else b""
        nl = b.find(b"\n")
        if not b.startswith(b"YUV4MPEG2") or nl < 0:
            raise ValueError("not a Y4M payload (missing YUV4MPEG2 magic)")
        width = height = None
        fps_num, fps_den = 0, 1
        cs = "420"  # spec default when the C tag is absent
        for tag in b[9:nl].split(b" "):
            if not tag:
                continue
            k, v = tag[:1], tag[1:]
            try:
                if k == b"W":
                    width = int(v)
                elif k == b"H":
                    height = int(v)
                elif k == b"F":
                    num, den = v.split(b":")
                    fps_num, fps_den = int(num), int(den)
                elif k == b"C":
                    cs = v.decode("ascii", "replace")
                # I(nterlace), A(spect), X(app metadata) are legal tags;
                # frame sizing never depends on them
            except (ValueError, UnicodeDecodeError) as exc:
                raise ValueError(f"malformed Y4M header tag {tag!r}") from exc
        if not width or not height or width < 0 or height < 0:
            raise ValueError("Y4M header missing W/H geometry")
        if cs not in Y4M_PLANES:
            raise NotImplementedError(
                f"Y4M colorspace C{cs} needs a pixel-format library "
                "(pyav/ffmpeg); raw mono/420/422/444 parse here"
            )
        # chroma geometry must divide evenly: an odd dimension under a
        # subsampled colorspace has no well-defined plane sizes, and the
        # floor-division frame size would silently misalign every
        # subsequent FRAME boundary — reject instead (ADVICE r14)
        if cs.startswith("420") and (width % 2 or height % 2):
            raise ValueError(
                f"Y4M C{cs} requires even W and H, got {width}x{height}"
            )
        if cs == "422" and width % 2:
            raise ValueError(f"Y4M C422 requires even W, got {width}")
        fsz = width * height * Y4M_PLANES[cs] // 2
        frames = []
        pos = nl + 1
        while pos < len(b):
            fnl = b.find(b"\n", pos)
            if not b.startswith(b"FRAME", pos) or fnl < 0:
                raise ValueError("malformed Y4M FRAME marker")
            start = fnl + 1  # per-frame params between FRAME and \n skipped
            if start + fsz > len(b):
                raise ValueError("truncated Y4M frame data")
            frames.append(b[start : start + fsz])
            pos = start + fsz
        arr = (
            np.frombuffer(b"".join(frames), dtype=np.uint8).reshape(
                len(frames), fsz
            )
            if frames
            else np.zeros((0, fsz), dtype=np.uint8)
        )
        return width, height, fps_num, fps_den, cs, arr

    return encode_y4m, decode_y4m


encode_y4m, decode_y4m = _make_y4m_codec()


DECODED_VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("file_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("fps_num", T.IntegerType()),
        T.StructField("fps_den", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("y_sum", T.LongType()),
        T.StructField("frame_weighted", T.LongType()),
    ]
)


def _make_y4m_c420_encoder():
    def encode_y4m_c420(payload, width=Y4M_WIDTH, height=Y4M_HEIGHT) -> bytes:
        """C420 twin of encode_y4m: the payload becomes the CONCATENATED
        planar frame stream — each frame is Y (w*h bytes) then the
        2x2-subsampled U and V planes (w*h/4 each), zero-padded to whole
        frames. Exercises the decoder's colorspace-derived frame sizing
        (w*h*3/2) on a real chroma-bearing stream; any Y4M player opens
        the result."""
        data = bytes(payload) if payload is not None else b""
        fsz = width * height * 3 // 2
        n_frames = max((len(data) + fsz - 1) // fsz, 1)
        data += b"\x00" * (n_frames * fsz - len(data))
        header = (
            f"YUV4MPEG2 W{width} H{height} "
            f"F{Y4M_FPS[0]}:{Y4M_FPS[1]} Ip A1:1 C420\n"
        ).encode("ascii")
        return header + b"".join(
            b"FRAME\n" + data[f * fsz : (f + 1) * fsz]
            for f in range(n_frames)
        )

    return encode_y4m_c420


encode_y4m_c420 = _make_y4m_c420_encoder()


def encode_y4m_blobs(
    df: DataFrame, content_col: str, id_col: str, colorspace: str = "mono"
) -> DataFrame:
    """Arrow-batched Y4M encode: (id, content) -> (doc_id, blob) where blob
    is a real YUV4MPEG2 stream — fixture synthesis for the video decode
    path (the encode_bmp_blobs convention for the video modality).
    ``colorspace="420"`` writes chroma-bearing C420 frames instead of
    luma-only Cmono."""
    enc = (
        encode_y4m if colorspace == "mono" else encode_y4m_c420
    )  # ship by value, see factory note

    def _encode_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    # pd.isna for the NaN-null case — see encode_bmp_blobs
                    "blob": [
                        enc(None if pd.isna(v) else str(v).encode("utf-8"))
                        for v in pdf["content"]
                    ],
                }
            )

    src = df.select(
        F.col(id_col).alias("doc_id"), F.col(content_col).alias("content")
    )
    return src.mapInPandas(_encode_batch, "doc_id bigint, blob binary")


def decode_video(blobs: DataFrame) -> DataFrame:
    """REAL video decode over (doc_id, blob): Y4M parses end-to-end via
    the header/FRAME-walking parser; MP4/AVI/MKV magic raises
    NotImplementedError naming the codec library. Per stream: container
    size, header geometry and frame rate, frame count, the luma-plane
    byte sum, and a position-weighted fingerprint over the concatenated
    frame stream (order-sensitive — a frame or pixel shuffle cannot
    hash-match). Narrow Arrow-batched mapInPandas; blobs never shuffle."""
    dec = decode_y4m  # ship by value, see factory note

    def _decode_batch(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        magics = (
            (b"\x1a\x45\xdf\xa3", "MKV/WebM"),
            (b"RIFF", "AVI"),
        )
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob) if blob is not None else b""
                codec = next(
                    (c for m, c in magics if b.startswith(m)), None
                )
                if codec is None and b[4:8] == b"ftyp":
                    codec = "MP4"
                if codec is not None:
                    raise NotImplementedError(
                        f"{codec} decode needs a video codec library "
                        "(pyav/ffmpeg); only raw Y4M decodes without one"
                    )
                w, h, fn, fd, _cs, frames = dec(b)
                v = frames.astype(np.int64)
                # luma plane = the first w*h bytes of each frame (the
                # whole frame for Cmono)
                y = v[:, : w * h]
                rows.append(
                    (
                        int(doc_id),
                        len(b),
                        w,
                        h,
                        fn,
                        fd,
                        int(frames.shape[0]),
                        int(y.sum()),
                        int(
                            (
                                v.reshape(-1)
                                * (np.arange(v.size, dtype=np.int64) + 1)
                            ).sum()
                        ),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "file_bytes",
                    "width",
                    "height",
                    "fps_num",
                    "fps_den",
                    "n_frames",
                    "y_sum",
                    "frame_weighted",
                ],
            )

    return blobs.select("doc_id", "blob").mapInPandas(
        _decode_batch, DECODED_VIDEO_SCHEMA
    )


DECODED_PLANES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("file_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("y_sum", T.LongType()),
        T.StructField("u_sum", T.LongType()),
        T.StructField("v_sum", T.LongType()),
        T.StructField("frame_weighted", T.LongType()),
    ]
)

# chroma-plane size as a fraction of the luma plane, numerator over 4
# (per-plane: mono has none; 420 subsamples 2x2; 422 2x1; 444 full)
_Y4M_CHROMA_Q = {"mono": 0, "420": 1, "420jpeg": 1, "420mpeg2": 1,
                 "420paldv": 1, "422": 2, "444": 4}


def decode_video_planes(blobs: DataFrame) -> DataFrame:
    """PLANE-AWARE video decode over (doc_id, blob): like decode_video
    but splits each frame into its Y/U/V planes using the
    colorspace-derived plane geometry (luma w*h, chroma w*h*q/4 with q
    from the subsampling mode) and reports per-plane byte sums plus the
    order-sensitive whole-stream fingerprint. This is the query path
    that certifies the decoder's CHROMA handling end-to-end — Cmono
    streams report zero chroma; C420 streams split 4:1:1."""
    dec = decode_y4m  # ship by value, see factory note

    def _decode_batch(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob) if blob is not None else b""
                w, h, _fn, _fd, cs, frames = dec(b)
                v = frames.astype(np.int64)
                luma = w * h
                chroma = luma * _Y4M_CHROMA_Q[cs] // 4
                rows.append(
                    (
                        int(doc_id),
                        len(b),
                        w,
                        h,
                        int(v.shape[0]),
                        int(v[:, :luma].sum()),
                        int(v[:, luma : luma + chroma].sum()),
                        int(v[:, luma + chroma : luma + 2 * chroma].sum()),
                        int(
                            (
                                v.reshape(-1)
                                * (np.arange(v.size, dtype=np.int64) + 1)
                            ).sum()
                        ),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "file_bytes",
                    "width",
                    "height",
                    "n_frames",
                    "y_sum",
                    "u_sum",
                    "v_sum",
                    "frame_weighted",
                ],
            )

    return blobs.select("doc_id", "blob").mapInPandas(
        _decode_batch, DECODED_PLANES_SCHEMA
    )


SAMPLED_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("y_sum", T.LongType()),
        T.StructField("frame_weighted", T.LongType()),
    ]
)


def frame_sample_y4m(blobs: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL video frame sampling over Y4M blobs (retires
    frame_sample_stub for one true container format): parse the stream,
    emit one row per every_n-th frame — index, size, luma sum, and a
    within-frame position-weighted fingerprint. The 1→N expansion
    happens INSIDE the Arrow batch (one output row per sampled frame),
    so output volume is frames/every_n — the number that matters when
    sizing partitions for 100 TB of video. Codec containers still raise
    in decode_video's dispatch; fixed-stride tensor payloads keep the
    pure-JVM :func:`frame_sample_relational` path."""
    dec = decode_y4m  # ship by value, see factory note

    def _sample_batch(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                w, h, _fn, _fd, _cs, frames = dec(bytes(blob) if blob is not None else b"")
                v = frames.astype(np.int64)
                wts = np.arange(v.shape[1], dtype=np.int64) + 1
                for f in range(0, v.shape[0], every_n):
                    rows.append(
                        (
                            int(doc_id),
                            f,
                            int(v.shape[1]),
                            int(v[f, : w * h].sum()),
                            int((v[f] * wts).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "frame_idx",
                    "frame_bytes",
                    "y_sum",
                    "frame_weighted",
                ],
            )

    return blobs.select("doc_id", "blob").mapInPandas(
        _sample_batch, SAMPLED_FRAME_SCHEMA
    )


def frame_sample_stub(blobs: DataFrame, every_n: int) -> DataFrame:
    """CODEC video frame-sampling stub (pyav): compressed container
    formats (MP4/AVI/MKV) need ffmpeg to find frame boundaries. For raw
    Y4M streams use :func:`frame_sample_y4m` — a REAL parse, no codec
    library required; for fixed-stride payloads (tensors, audio PCM)
    use :func:`frame_sample_relational` — same 1→N output contract,
    pure JVM."""
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
