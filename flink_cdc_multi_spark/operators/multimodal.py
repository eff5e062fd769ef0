"""Multimodal columns (SURVEY.md §2.11): image/audio/video as opaque
``binary`` columns with typed metadata, plus decode / feature-extract /
resize / frame-sample operators over ``mapInPandas``.

Dimension/format decode is REAL: ``parse_image_header`` reads PNG IHDR,
JPEG SOF, GIF logical-screen, and BMP InfoHeader dimensions straight from
the container bytes (public format knowledge, no media library needed).
Only the pixel-level kernels (mean luma; resize) still require PIL/opencv,
which are NOT in this container — those remain stubbed behind
``fake_luma=True`` (a deterministic fake clearly marked as such). Swapping
that kernel body for a real pixel decoder changes nothing upstream.

Scale notes: media blobs ride in parquet binary columns; mapInPandas streams
Arrow batches so one task never materializes more than
``spark.sql.execution.arrow.maxRecordsPerBatch`` blobs; feature outputs are
narrow (the blob is dropped as early as possible).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)

# JPEG start-of-frame markers that carry dimensions: SOF0-SOF15 minus
# DHT (C4), JPG (C8), DAC (CC) — the baseline/progressive/lossless family
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_image_header(blob: bytes) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) parsed from the container header bytes —
    PNG IHDR, JPEG SOFn scan, GIF87a/89a logical screen, BMP InfoHeader.
    Unknown/truncated input → (None, None, None); never raises on garbage.
    Pure public format knowledge; no media library involved."""
    try:
        if blob[:8] == b"\x89PNG\r\n\x1a\n" and blob[12:16] == b"IHDR":
            w, h = struct.unpack(">II", blob[16:24])
            return "png", w, h
        if blob[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", blob[6:10])
            return "gif", w, h
        if blob[:2] == b"BM" and len(blob) >= 26:
            # DIB header size at offset 14 picks the layout: 12-byte
            # BITMAPCOREHEADER carries uint16 dims at 18/20; the
            # BITMAPINFOHEADER family (40/52/56/108/124) carries int32
            # dims at 18/22. Anything else → unknown, not garbage dims.
            dib = struct.unpack("<I", blob[14:18])[0]
            if dib == 12:
                w, h = struct.unpack("<HH", blob[18:22])
                return "bmp", w, h
            if dib in (40, 52, 56, 64, 108, 124) and len(blob) >= 26:
                w, h = struct.unpack("<ii", blob[18:26])
                return "bmp", w, abs(h)  # negative height = top-down DIB
            return "bmp", None, None
        if blob[:2] == b"\xff\xd8":
            # walk the segment chain to the first SOF marker
            pos = 2
            while pos + 4 <= len(blob):
                if blob[pos] != 0xFF:
                    break
                marker = blob[pos + 1]
                if marker == 0xFF:  # fill byte
                    pos += 1
                    continue
                if marker == 0xD9:  # EOI: stop — trailing bytes are not
                    break  # segments (concatenated/MJPEG streams)
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    pos += 2  # standalone marker, no length field
                    continue
                seg_len = struct.unpack(">H", blob[pos + 2 : pos + 4])[0]
                if marker in _JPEG_SOF:
                    h, w = struct.unpack(">HH", blob[pos + 5 : pos + 9])
                    return "jpeg", w, h
                pos += 2 + seg_len
            return "jpeg", None, None  # valid SOI but no SOF found
    except (struct.error, IndexError):
        pass
    return None, None, None


def make_tiny_png(width: int, height: int) -> bytes:
    """Minimal 45-byte PNG container (signature + IHDR + IEND) with the
    given dimensions — a deterministic test/demo blob generator so media
    pipelines can be exercised end to end without shipping image files.
    CRCs are zeroed (header parsers don't verify them)."""
    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
        + struct.pack(">I", 0) + b"IEND" + b"\x00\x00\x00\x00"
    )


def attach_media_meta(df: DataFrame, binary_col: str, media_type: str, fmt: str) -> DataFrame:
    """Wrap an opaque binary column with the typed metadata struct (decode
    fills width/height/duration later)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def _fake_luma(blob: bytes) -> float:
    """Deterministic fake mean-luma derived from an md5 of the bytes
    (Python's builtin hash() is per-process salted — not reproducible).
    Stands in for the pixel-decode kernel until PIL/opencv is available."""
    import hashlib

    h = int.from_bytes(hashlib.md5(blob).digest()[:4], "big") & 0x7FFFFFFF
    return round((h % 256) / 255.0, 6)


def decode_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "media",
    fake_luma: bool = False,
) -> DataFrame:
    """binary image column → (doc_id, byte_len, format, width, height,
    mean_luma) via mapInPandas (Arrow-batched).

    format/width/height are REAL — parsed from the container header bytes
    (parse_image_header), null for unrecognized formats. mean_luma needs a
    pixel decode, which this container cannot do (no PIL/opencv): it is
    null unless ``fake_luma=True`` substitutes the deterministic fake."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = [bytes(b) for b in pdf[binary_col]]
            headers = [parse_image_header(b) for b in blobs]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": pd.Series([len(b) for b in blobs], dtype="int64"),
                    "format": [f for f, _, _ in headers],
                    "width": pd.array([w for _, w, _ in headers], dtype="Int32"),
                    "height": pd.array([h for _, _, h in headers], dtype="Int32"),
                    "mean_luma": [
                        _fake_luma(b) if fake_luma else None for b in blobs
                    ],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(batches, IMAGE_FEATURES)


def frame_sample_plan(
    df: DataFrame,
    every_ms: int,
    id_col: str = "doc_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (doc, frame_ts) — pure
    Column math (sequence+explode), ready to feed a decode kernel. The
    decode itself is the stubbed mapInPandas step."""
    return df.select(
        id_col,
        F.explode(
            F.sequence(F.lit(0), F.col(duration_col), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def resize_plan(
    df: DataFrame,
    max_dim: int,
    id_col: str = "doc_id",
    binary_col: str = "media",
) -> DataFrame:
    """Image resize *plan*: target dimensions for a bounded-box downscale
    (longest side → ``max_dim``, aspect preserved, never upscale). The
    width/height inputs are REAL (container header parse via
    decode_image_features); the pixel resample itself is the stubbed
    kernel this container cannot run (no PIL/opencv) — the plumbing a real
    deployment drops its decoder into. Unrecognized formats pass through
    with null targets. All integer/ratio math is pure Column expressions:

      scale = min(1, max_dim / max(w, h));  target = round(dim * scale)
    """
    feats = decode_image_features(df, id_col, binary_col)
    longest = F.greatest(F.col("width"), F.col("height")).cast("double")
    # try_divide: a crafted/corrupt header can declare 0x0 dims (the
    # parser has no zero guard by design — it reports what the container
    # says); ANSI `/` would crash the job on one bad blob, try_divide
    # degrades it to null targets like any unrecognized format
    scale = F.least(F.lit(1.0), F.try_divide(F.lit(float(max_dim)), longest))
    return feats.select(
        id_col,
        "format",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
    )
