"""Multimodal columns (SURVEY.md §2.11): image/audio/video as opaque
``binary`` columns with typed metadata, plus decode / feature-extract /
resize / frame-sample operators over ``mapInPandas``.

Dimension/format decode is REAL: ``parse_image_header`` reads PNG IHDR,
JPEG SOF, GIF logical-screen, and BMP InfoHeader dimensions straight from
the container bytes (public format knowledge, no media library needed).
PNG PIXEL decode is REAL too (round 6): ``png_luma_sum`` inflates IDAT
with stdlib zlib and unfilters all five PNG filter types, so ``mean_luma``
is a genuine pixel statistic for PNG. Pixel kernels for the
entropy-coded formats (JPEG) and the resize resample still require
PIL/opencv, which are NOT in this container — those remain stubbed
behind ``fake_luma=True`` (a deterministic fake clearly marked as such).
Swapping that kernel body for a real decoder changes nothing upstream.

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


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload))
    )


def _paeth(a: int, b: int, c: int) -> int:
    # PNG Paeth predictor (spec §9.4): pick the neighbor closest to
    # a + b - c, ties broken left, up, up-left
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def make_png_rgb(width: int, height: int, seed: int) -> bytes:
    """REAL spec-valid PNG (8-bit RGB, zlib IDAT, correct CRCs) with a
    deterministic pixel pattern:

        R(x,y) = (seed + x) % 256
        G(x,y) = (seed + y) % 256
        B(x,y) = (seed + x + y) % 256

    Scanline filters CYCLE through all five PNG filter types (y % 5:
    None/Sub/Up/Average/Paeth) so a decoder has to implement genuine
    unfiltering — constant filter-0 data would let a broken Sub/Up/
    Average/Paeth path pass. The closed-form pattern is what makes the
    decoded mean luma oracle-checkable: DuckDB can recompute it from
    (width, height, seed) with generate_series — see the
    ext_multimodal_luma oracle."""
    import zlib

    bpp = 3  # RGB8: filter predictors look back one whole pixel
    raw = bytearray()
    prev = bytes(width * bpp)  # row above the first row is all zero
    for y in range(height):
        line = bytearray()
        for x in range(width):
            line += bytes(
                (
                    (seed + x) % 256,
                    (seed + y) % 256,
                    (seed + x + y) % 256,
                )
            )
        ftype = y % 5
        raw.append(ftype)
        if ftype == 0:
            raw += line
        elif ftype == 1:  # Sub
            raw += bytes(
                (line[i] - (line[i - bpp] if i >= bpp else 0)) % 256
                for i in range(len(line))
            )
        elif ftype == 2:  # Up
            raw += bytes((line[i] - prev[i]) % 256 for i in range(len(line)))
        elif ftype == 3:  # Average
            raw += bytes(
                (line[i] - ((line[i - bpp] if i >= bpp else 0) + prev[i]) // 2) % 256
                for i in range(len(line))
            )
        else:  # Paeth
            raw += bytes(
                (
                    line[i]
                    - _paeth(
                        line[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                )
                % 256
                for i in range(len(line))
            )
        prev = bytes(line)
    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


# Rec.601 luma weights scaled to integers — mean_luma is defined over
# THESE exact integer per-pixel values so every engine (this decoder, the
# DuckDB closed-form oracle) sums identical integers; only the final
# division is floating-point
_LUMA_W = (299, 587, 114)


def png_luma_sum(blob: bytes) -> tuple[int, int] | None:
    """Decode a PNG's pixels with the stdlib only (zlib inflate + spec
    unfiltering, all five filter types) and return
    (Σ 299·R + 587·G + 114·B over pixels, n_pixels) as exact integers —
    mean luma = sum / (1000 · n). Supports the non-interlaced 8-bit
    grayscale / RGB / RGBA color types (0/2/6), which covers the
    generated fixtures and the common corpus cases; anything else
    (palette, 16-bit, interlaced, truncated, bad zlib) → None, never an
    exception. Pixel decode became REAL in round 6 — only formats other
    than PNG still need an external media library."""
    import zlib

    try:
        if blob[:8] != b"\x89PNG\r\n\x1a\n":
            return None
        # walk chunks: IHDR first, concatenate IDAT payloads
        pos = 8
        ihdr = None
        idat = bytearray()
        while pos + 8 <= len(blob):
            (clen,) = struct.unpack(">I", blob[pos : pos + 4])
            tag = blob[pos + 4 : pos + 8]
            payload = blob[pos + 8 : pos + 8 + clen]
            if len(payload) != clen:
                return None  # truncated
            if tag == b"IHDR":
                ihdr = payload
            elif tag == b"IDAT":
                idat += payload
            elif tag == b"IEND":
                break
            pos += 12 + clen  # len + tag + payload + crc
        if ihdr is None or not idat:
            return None
        w, h, depth, ctype, comp, filt, interlace = struct.unpack(">II5B", ihdr)
        if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
            return None
        channels = {0: 1, 2: 3, 6: 4}.get(ctype)
        if channels is None or w == 0 or h == 0:
            return None
        raw = zlib.decompress(bytes(idat))
        stride = w * channels
        if len(raw) != h * (stride + 1):
            return None
        # unfilter in place, row by row
        out = bytearray(h * stride)
        prev_off = None
        for y in range(h):
            ftype = raw[y * (stride + 1)]
            src = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
            off = y * stride
            if ftype == 0:
                out[off : off + stride] = src
            elif ftype == 1:  # Sub
                for i in range(stride):
                    left = out[off + i - channels] if i >= channels else 0
                    out[off + i] = (src[i] + left) % 256
            elif ftype == 2:  # Up
                for i in range(stride):
                    up = out[prev_off + i] if prev_off is not None else 0
                    out[off + i] = (src[i] + up) % 256
            elif ftype == 3:  # Average
                for i in range(stride):
                    left = out[off + i - channels] if i >= channels else 0
                    up = out[prev_off + i] if prev_off is not None else 0
                    out[off + i] = (src[i] + (left + up) // 2) % 256
            elif ftype == 4:  # Paeth
                for i in range(stride):
                    left = out[off + i - channels] if i >= channels else 0
                    up = out[prev_off + i] if prev_off is not None else 0
                    ul = out[prev_off + i - channels] if (
                        prev_off is not None and i >= channels
                    ) else 0
                    out[off + i] = (src[i] + _paeth(left, up, ul)) % 256
            else:
                return None
            prev_off = off
        # vectorized integer luma over the unfiltered pixel matrix
        import numpy as np

        px = np.frombuffer(bytes(out), dtype=np.uint8).reshape(-1, channels)
        wr, wg, wb = _LUMA_W
        if channels == 1:
            s = int(px[:, 0].astype(np.int64).sum()) * (wr + wg + wb)
        else:  # RGB / RGBA (alpha ignored)
            s = int(
                (
                    px[:, 0].astype(np.int64) * wr
                    + px[:, 1].astype(np.int64) * wg
                    + px[:, 2].astype(np.int64) * wb
                ).sum()
            )
        return s, w * h
    except (struct.error, IndexError, zlib.error, ValueError):
        return None


# -- audio: real RIFF/WAVE container + PCM16 decode (stdlib + numpy) --------


def make_wav_pcm16(sample_rate: int, samples, extra_chunk: bool = False) -> bytes:
    """Spec-valid mono PCM16 WAV: RIFF header, fmt chunk, optional LIST
    (INFO) chunk to exercise the chunk walker, data chunk. ``samples`` is
    any int sequence in int16 range."""
    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:
        payload = b"INFOISFT" + struct.pack("<I", 5) + b"tests"  # 17 bytes: ODD
        # RIFF odd-chunk encoding: the DECLARED length stays odd and the
        # pad byte sits outside it — this is what forces the reader's
        # (ln & 1) word-alignment skip to actually run
        chunks += (
            b"LIST" + struct.pack("<I", len(payload)) + payload
            + b"\x00" * (len(payload) & 1)
        )
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def parse_wav_pcm16(blob: bytes):
    """Real RIFF walk: returns (sample_rate, samples ndarray[int16]) for
    mono 16-bit PCM, None for anything else (stereo, 8/24-bit, float,
    truncated, non-RIFF). Chunks are word-aligned per spec — an
    odd-length chunk is followed by a pad byte the walker must skip."""
    import numpy as np

    try:
        if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
            return None
        pos, sr, ch, bits, data = 12, None, None, None, None
        while pos + 8 <= len(blob):
            tag = blob[pos : pos + 4]
            (ln,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
            body = blob[pos + 8 : pos + 8 + ln]
            if len(body) < ln:
                return None  # truncated chunk
            if tag == b"fmt " and len(body) >= 16:
                afmt, ch, sr, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
                if afmt != 1:  # PCM only
                    return None
            elif tag == b"data":
                data = body
            pos += 8 + ln + (ln & 1)
        if sr is None or data is None or bits != 16 or ch != 1:
            return None
        return sr, np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
    except (struct.error, ValueError):
        return None


def wav_pcm16_stats(blob: bytes):
    """(sample_rate, n_samples, sum_abs, peak) from a real decode of the
    WAV bytes — exact integers (the audio analogue of png_luma_sum's
    integer luma sums; ratio-rule outputs, no rounded doubles)."""
    import numpy as np

    parsed = parse_wav_pcm16(blob)
    if parsed is None:
        return None
    sr, a = parsed
    ab = np.abs(a.astype(np.int64))
    return int(sr), int(a.size), int(ab.sum()), int(ab.max()) if a.size else 0


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
    Stands in for the pixel-decode kernel for formats whose pixel decode
    needs PIL/opencv (JPEG/GIF/BMP); PNG decode is REAL (png_luma_sum)."""
    import hashlib

    h = int.from_bytes(hashlib.md5(blob).digest()[:4], "big") & 0x7FFFFFFF
    return round((h % 256) / 255.0, 6)


def _real_or_none_luma(blob: bytes) -> float | None:
    """Mean luma in [0, 255]: real stdlib pixel decode for PNG, None for
    formats that need an external media library (JPEG entropy decode) or
    undecodable input."""
    r = png_luma_sum(blob)
    if r is None:
        return None
    s, n = r
    return s / (1000.0 * n)


def decode_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "media",
    fake_luma: bool = False,
) -> DataFrame:
    """binary image column → (doc_id, byte_len, format, width, height,
    mean_luma) via mapInPandas (Arrow-batched).

    format/width/height are REAL — parsed from the container header bytes
    (parse_image_header), null for unrecognized formats. mean_luma is
    REAL for PNG (stdlib zlib inflate + spec unfiltering, png_luma_sum;
    scale 0-255), null for formats whose pixel decode needs PIL/opencv
    (JPEG/GIF/BMP). ``fake_luma=True`` substitutes the deterministic
    md5 fake for EVERY blob — the pre-round-6 behavior, kept for
    pipelines that need a non-null placeholder for all formats."""

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
                        _fake_luma(b) if fake_luma else _real_or_none_luma(b)
                        for b in blobs
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
