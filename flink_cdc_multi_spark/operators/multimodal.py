"""Multimodal columns (SURVEY.md §2.11): image/audio/video as opaque
``binary`` columns with typed metadata, plus decode / feature-extract /
resize / frame-sample operators over ``mapInPandas``.

The media libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernels are STUBBED — ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
fake decoder (sized from a hash of the bytes) exercises the real Spark-side
plumbing: schema, Arrow batch iteration, partition-preserving mapInPandas,
and metadata struct handling. Swapping the kernel body for a real decoder
changes nothing upstream.

Scale notes: media blobs ride in parquet binary columns; mapInPandas streams
Arrow batches so one task never materializes more than
``spark.sql.execution.arrow.maxRecordsPerBatch`` blobs; feature outputs are
narrow (the blob is dropped as early as possible).
"""

from __future__ import annotations

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
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
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


def _fake_decode(blob: bytes) -> tuple[int, int, float]:
    """Deterministic fake image decode: dims/luma derived from an md5 of the
    bytes (Python's builtin hash() is per-process salted — not reproducible).
    Stands in for PIL.Image.open until the real library is available."""
    import hashlib

    h = int.from_bytes(hashlib.md5(blob).digest()[:4], "big") & 0x7FFFFFFF
    width = 64 + (h % 1920)
    height = 64 + ((h >> 11) % 1080)
    mean_luma = round((h % 256) / 255.0, 6)
    return width, height, mean_luma


def decode_image_features(
    df: DataFrame, id_col: str = "doc_id", binary_col: str = "media", fake: bool = False
) -> DataFrame:
    """binary image column → (doc_id, byte_len, width, height, mean_luma)
    via mapInPandas (Arrow-batched). Real decoder STUBBED — see module doc."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv (not in this container); "
            "pass fake=True for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf[binary_col]
            decoded = [_fake_decode(bytes(b)) for b in blobs]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": blobs.map(len).astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_luma": [d[2] for d in decoded],
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
