"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing (schemas, partition-friendly batch shapes,
mapInPandas signatures) is real and tested.  Decode policy (the codec
boundary): PNG and baseline JPEG blobs are decoded FOR REAL —
dependency-free spec-conformant codecs live in functions/png.py (zlib
inflate + all five scanline filters) and functions/jpeg.py (DQT/DHT/
SOF0/SOS parse, Huffman entropy decode, IDCT, 4:4:4 / 4:2:0, restart
markers) — MPNG video containers (length-prefixed PNG frames, below)
parse + frame-decode for real, and WAV audio decodes for real through
the RIFF/PCM16 codec in functions/wav.py; remaining formats
(MP3/MP4/progressive JPEG: no PIL/ffmpeg in this container) raise
NotImplementedError under ``strict=True`` or fall back to a
clearly-marked deterministic fake otherwise.

Reference analog: the crawler streams images to disk separately from text
(share_func.py:224-242 saveImage) and binarizes captcha pixels
(share_func.py:194-221) — media bytes never travel inline with text rows,
which is exactly the media_ref indirection here.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import jpeg, png


def _decode_rgba(content, strict: bool = False) -> tuple[np.ndarray, bool]:
    """Blob -> (h, w, 4) uint8 RGBA + whether the decode was real.

    PNG and baseline JPEG bytes go through the real codecs; anything else
    is the stubbed step: NotImplementedError when strict, deterministic
    bytes->grid fake otherwise (swapping in PIL/ffmpeg changes only this
    branch)."""
    b = bytes(content or b"")
    if png.is_png(b):
        return png.decode_png(b), True
    if jpeg.is_jpeg(b):
        rgb = jpeg.decode_jpeg(b)
        rgba = np.concatenate(
            [rgb, np.full(rgb.shape[:2] + (1,), 255, dtype=np.uint8)], axis=2
        )
        return rgba, True
    if strict:
        raise NotImplementedError(
            "non-PNG/JPEG decode requires PIL/ffmpeg, not available in this container"
        )
    a = np.frombuffer(b, dtype=np.uint8)
    n_px = max(len(a) // 4, 1)
    w = max(int(np.sqrt(n_px)), 1)
    h = max(n_px // w, 1)
    return np.resize(a, (h, w, 4)), False

MEDIA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("media_kind", T.StringType()),  # image | audio | video
        T.StructField("n_bytes", T.IntegerType()),
    ]
)

MEDIA_FEATURES = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("byte_entropy", T.DoubleType()),
    ]
)


def synth_media_table(refs: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """Deterministic fake media store: bytes derived from xxhash64(ref).

    Plumbing is real: binary column, sizes vary per ref, kind from the
    ref path.  (Stand-in for reading an object store by media_ref.)"""
    h = F.xxhash64(F.col(ref_col))
    n = (F.abs(h) % 3000 + 64).cast("int")  # < blob length, so n_bytes == len(content)
    kind = (
        F.when(F.col(ref_col).contains("img"), "image")
        .when(F.col(ref_col).contains("aud"), "audio")
        .otherwise("video")
    )
    # repeated sha2-hex truncated per ref — deterministic variable-length blob
    blob = F.substring(F.repeat(F.sha2(F.col(ref_col), 256), 64), 1, 4096)
    return refs.select(
        F.col(ref_col).alias("media_ref"),
        F.substring(blob, F.lit(1), n).cast("binary").alias("content"),
        kind.alias("media_kind"),
        n.alias("n_bytes"),
    )


def synth_png_media(refs: DataFrame) -> DataFrame:
    """REAL-PNG media store: per ref, deterministic RGBA pixels from the
    integer ``seed`` column, encoded through the real codec
    (png.encode_png) — so downstream operators decode genuine PNG bytes.

    The pixel formulas are integer arithmetic a SQL oracle can replicate
    (the m2 entry recomputes the binarize result analytically):
      w = 16 + seed % 17,  h = 16 + seed % 13,  i = row-major pixel index
      R = (7*seed + 13*i) % 256
      G = (11*seed + 29*i) % 256
      B = 1 + (3*i + seed) % 7      (>= 1: every surviving pixel whitens)
      A = 255
    The scanline filter rotates with seed % 5, so a batch of refs drives
    every decoder filter branch (None/Sub/Up/Average/Paeth).

    Input: (media_ref string, seed long).  Output matches
    synth_media_table: (media_ref, content, media_kind, n_bytes)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_refs, blobs, nbytes = [], [], []
            for ref, seed in zip(pdf["media_ref"], pdf["seed"]):
                s = int(seed)
                w, h = 16 + s % 17, 16 + s % 13
                i = np.arange(w * h, dtype=np.int64)
                px = np.empty((h, w, 4), dtype=np.uint8)
                px[..., 0] = ((7 * s + 13 * i) % 256).reshape(h, w)
                px[..., 1] = ((11 * s + 29 * i) % 256).reshape(h, w)
                px[..., 2] = (1 + (3 * i + s) % 7).reshape(h, w)
                px[..., 3] = 255
                data = png.encode_png(px, filter_type=s % 5)
                out_refs.append(ref)
                blobs.append(data)
                nbytes.append(len(data))
            yield pd.DataFrame(
                {
                    "media_ref": out_refs,
                    "content": blobs,
                    "media_kind": ["image"] * len(out_refs),
                    "n_bytes": np.array(nbytes, dtype=np.int32),
                }
            )

    return refs.select("media_ref", F.col("seed").cast("long").alias("seed")).mapInPandas(
        fn, MEDIA
    )


def decode_and_featurize(media: DataFrame, strict: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Batch shape: one Arrow batch of (media_ref, content, media_kind);
    output one row per media item.  PNG blobs decode for real (true
    width/height from the codec, functions/png.py); other formats are
    the stubbed step:
    - strict=True  -> NotImplementedError (no PIL/ffmpeg in container)
    - strict=False -> deterministic fake decode: width/height/frames from
      a stable byte hash, entropy computed for real from the bytes.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            widths = np.zeros(n, dtype=np.int32)
            heights = np.zeros(n, dtype=np.int32)
            frames = np.zeros(n, dtype=np.int32)
            entropy = np.zeros(n, dtype=np.float64)
            nbytes = np.zeros(n, dtype=np.int32)
            for i, (content, kind) in enumerate(zip(pdf["content"], pdf["media_kind"])):
                b = np.frombuffer(content or b"", dtype=np.uint8)
                nbytes[i] = len(b)
                if len(b):
                    counts = np.bincount(b, minlength=256)
                    p = counts[counts > 0] / len(b)
                    entropy[i] = float(-(p * np.log2(p)).sum())
                if png.is_png(bytes(content or b"")):
                    px = png.decode_png(bytes(content))
                    heights[i], widths[i] = px.shape[0], px.shape[1]
                    frames[i] = 1
                    continue
                if jpeg.is_jpeg(bytes(content or b"")):
                    px = jpeg.decode_jpeg(bytes(content))
                    heights[i], widths[i] = px.shape[0], px.shape[1]
                    frames[i] = 1
                    continue
                if strict:
                    raise NotImplementedError(
                        "non-PNG/JPEG decode requires PIL/ffmpeg, not available in this container"
                    )
                seed = int(b[:8].astype(np.int64).sum()) if len(b) >= 8 else 0
                widths[i] = 16 + seed % 1024
                heights[i] = 16 + (seed // 7) % 1024
                frames[i] = 1 if kind == "image" else 1 + seed % 120
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_kind": pdf["media_kind"],
                    "n_bytes": nbytes,
                    "width": widths,
                    "height": heights,
                    "n_frames": frames,
                    "byte_entropy": np.round(entropy, 4),
                }
            )

    return media.mapInPandas(fn, MEDIA_FEATURES)


def media_refs_from_documents(docs: DataFrame) -> DataFrame:
    """Explode media spans out of interleaved documents (JVM explode)."""
    return (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )


def binarize_rgba(pixels: np.ndarray) -> np.ndarray:
    """F14 captcha binarization (binaryzationImage share_func.py:194-221),
    vectorized.  The reference runs three SEQUENTIAL passes whose effects
    feed each other, so order is semantics, not style:

    1. R < 90   -> (0,0,0,255)
    2. G < 136  -> (0,0,0,255)   (sees pass 1's zeroed G channels)
    3. B > 0    -> (255,255,255,255)

    Input (..., 4) uint8 RGBA; returns a new array, pure black/white."""
    px = pixels.copy()
    px[px[..., 0] < 90] = (0, 0, 0, 255)
    px[px[..., 1] < 136] = (0, 0, 0, 255)
    px[px[..., 2] > 0] = (255, 255, 255, 255)
    return px


def binarize_media(media: DataFrame, strict: bool = False) -> DataFrame:
    """mapInPandas binarization over binary image columns: decode the blob
    into an RGBA array (REAL decode for PNG via functions/png.py; the
    stubbed deterministic fake otherwise — see _decode_rgba), run the
    reference's three-pass threshold, emit the binarized bytes +
    white-pixel fraction."""

    out_schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("binarized", T.BinaryType()),
            T.StructField("frac_white", T.DoubleType()),
            T.StructField("n_white", T.IntegerType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, widths, heights, blobs, fracs, whites = [], [], [], [], [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                px, _real = _decode_rgba(content, strict)
                h, w = px.shape[0], px.shape[1]
                out = binarize_rgba(px)
                refs.append(ref)
                widths.append(w)
                heights.append(h)
                blobs.append(out.tobytes())
                # integer white count alongside the fraction: exact across
                # engines (no float-rounding hazard in the m2 oracle)
                n_w = int((out[..., 0] == 255).sum())
                whites.append(n_w)
                fracs.append(round(n_w / (h * w), 4))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "width": np.array(widths, dtype=np.int32),
                    "height": np.array(heights, dtype=np.int32),
                    "binarized": blobs,
                    "frac_white": np.array(fracs, dtype=np.float64),
                    "n_white": np.array(whites, dtype=np.int32),
                }
            )

    return media.select("media_ref", "content").mapInPandas(fn, out_schema)


def _nn_resize(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample of an (h, w, c) array — the single
    implementation both resize_media and resize_stats grade."""
    h, w = px.shape[0], px.shape[1]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return px[ys[:, None], xs[None, :]]


def resize_media(media: DataFrame, out_w: int = 32, out_h: int = 32) -> DataFrame:
    """Nearest-neighbor resize over binary image columns (mapInPandas).

    Decode via _decode_rgba (real for PNG, stubbed fake otherwise); the
    resize itself is real numpy index math.  Output keeps the
    binary-column contract: (media_ref, width, height, content)."""
    out_schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, blobs = [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                px, _real = _decode_rgba(content)
                blobs.append(_nn_resize(px, out_w, out_h).tobytes())
                refs.append(ref)
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "width": np.full(len(refs), out_w, dtype=np.int32),
                    "height": np.full(len(refs), out_h, dtype=np.int32),
                    "content": blobs,
                }
            )

    return media.select("media_ref", "content").mapInPandas(fn, out_schema)


def resize_stats(
    media: DataFrame, out_w: int = 32, out_h: int = 32, strict: bool = False
) -> DataFrame:
    """Fused REAL decode + nearest-neighbor resize + R-channel checksum,
    one python stage.  Same _nn_resize math as resize_media; the sum_r
    of the resized grid is the analytic value the m6 oracle recomputes
    from the generator pixel formulas."""
    out_schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("sum_r", T.LongType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, sums = [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                px, _real = _decode_rgba(content, strict)
                out = _nn_resize(px, out_w, out_h)
                refs.append(ref)
                sums.append(int(out[..., 0].astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "width": np.full(len(refs), out_w, dtype=np.int32),
                    "height": np.full(len(refs), out_h, dtype=np.int32),
                    "sum_r": np.array(sums, dtype=np.int64),
                }
            )

    return media.select("media_ref", "content").mapInPandas(fn, out_schema)


def synth_jpeg_media(refs: DataFrame) -> DataFrame:
    """REAL-JPEG media store: per ref, deterministic grayscale pixels
    built from constant 16x16 tiles, encoded through the real baseline
    codec (jpeg.encode_jpeg).  Constant tiles quantize EXACTLY under the
    flat step-8 table (DC = 8*(v-128) is a step multiple; AC = 0), so the
    decode side reproduces every pixel bit-exactly and a SQL oracle can
    recompute downstream checksums analytically:

      tiles across tw = 2 + seed % 3, tiles down th = 1 + seed % 2
      w = 16*tw, h = 16*th; tile t (row-major, 0..tw*th-1) has constant
      value v_t = (23*seed + 41*t) % 256
    The restart interval rotates with seed % 3 in {0, 1, 2} so the graded
    path also exercises DRI/RSTn framing and DC-predictor resets.

    Input: (media_ref string, seed long).  Output matches
    synth_media_table: (media_ref, content, media_kind, n_bytes)."""
    from . import jpeg as _jpeg

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_refs, blobs, nbytes = [], [], []
            for ref, seed in zip(pdf["media_ref"], pdf["seed"]):
                s = int(seed)
                tw, th = 2 + s % 3, 1 + s % 2
                t = (np.arange(th * 16)[:, None] // 16) * tw + (
                    np.arange(tw * 16)[None, :] // 16
                )
                px = ((23 * s + 41 * t) % 256).astype(np.uint8)
                data = _jpeg.encode_jpeg(px, restart_interval=s % 3)
                out_refs.append(ref)
                blobs.append(data)
                nbytes.append(len(data))
            yield pd.DataFrame(
                {
                    "media_ref": out_refs,
                    "content": blobs,
                    "media_kind": ["image"] * len(out_refs),
                    "n_bytes": np.array(nbytes, dtype=np.int32),
                }
            )

    return refs.select(
        "media_ref", F.col("seed").cast("long").alias("seed")
    ).mapInPandas(fn, MEDIA)


def jpeg_stats(media: DataFrame, strict: bool = False) -> DataFrame:
    """REAL JPEG decode + stats fused in one python stage: marker parse,
    Huffman entropy decode, dequant + IDCT, then (width, height, R-channel
    sum) per blob — the m8 oracle recomputes sum_r analytically from the
    generator tile formulas.  Non-JPEG blobs raise under strict (the
    PIL/ffmpeg drop-in boundary) or report n/a dims with sum_r = -1."""
    from . import jpeg as _jpeg

    out_schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("sum_r", T.LongType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, ws, hs, sums = [], [], [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                b = bytes(content or b"")
                if _jpeg.is_jpeg(b):
                    rgb = _jpeg.decode_jpeg(b)
                    refs.append(ref)
                    hs.append(rgb.shape[0])
                    ws.append(rgb.shape[1])
                    sums.append(int(rgb[..., 0].astype(np.int64).sum()))
                    continue
                if strict:
                    raise NotImplementedError(
                        "non-JPEG decode requires PIL/ffmpeg, not available"
                    )
                refs.append(ref)
                hs.append(0)
                ws.append(0)
                sums.append(-1)
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "width": np.array(ws, dtype=np.int32),
                    "height": np.array(hs, dtype=np.int32),
                    "sum_r": np.array(sums, dtype=np.int64),
                }
            )

    return media.select("media_ref", "content").mapInPandas(fn, out_schema)


# ------------------------------------------------------- audio (WAV/PCM)
def synth_wav_media(refs: DataFrame) -> DataFrame:
    """REAL-audio media store: per ref, a genuine RIFF/WAVE blob
    (functions/wav.py) with SQL-replicable integer samples:

      sample_rate = 8000 + 100 * (seed % 5)
      n_samples   = 500 + seed % 300
      sample[i]   = ((37*seed + 11*i) % 2003) - 1001   (int16-safe)

    Input (media_ref string, seed long); output matches
    synth_media_table: (media_ref, content, media_kind, n_bytes)."""
    from . import wav

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_refs, blobs, nbytes = [], [], []
            for ref, seed in zip(pdf["media_ref"], pdf["seed"]):
                s = int(seed)
                rate = 8000 + 100 * (s % 5)
                n = 500 + s % 300
                i = np.arange(n, dtype=np.int64)
                samples = (((37 * s + 11 * i) % 2003) - 1001).astype(np.int16)
                data = wav.encode_wav(samples, rate)
                out_refs.append(ref)
                blobs.append(data)
                nbytes.append(len(data))
            yield pd.DataFrame(
                {
                    "media_ref": out_refs,
                    "content": blobs,
                    "media_kind": ["audio"] * len(out_refs),
                    "n_bytes": np.array(nbytes, dtype=np.int32),
                }
            )

    return refs.select(
        "media_ref", F.col("seed").cast("long").alias("seed")
    ).mapInPandas(fn, MEDIA)


def wav_stats(media: DataFrame, strict: bool = False) -> DataFrame:
    """REAL audio decode + stats in one python stage: RIFF chunk-walk,
    PCM16 samples out, (rate, count, amplitude sum) per blob — the
    feature row an audio-quality filter keys on.  Non-WAV blobs raise
    under strict (the codec drop-in boundary) or fall back to zeroed
    stats with n_samples = -1 (clearly marked undecodable)."""
    from . import wav

    out_schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("sum_amp", T.LongType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, rates, counts, sums = [], [], [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                b = bytes(content or b"")
                if wav.is_wav(b):
                    rate, samples = wav.decode_wav(b)
                    refs.append(ref)
                    rates.append(rate)
                    counts.append(len(samples))
                    sums.append(int(samples.astype(np.int64).sum()))
                    continue
                if strict:
                    raise NotImplementedError(
                        "non-WAV audio decode requires ffmpeg, not available"
                    )
                refs.append(ref)
                rates.append(0)
                counts.append(-1)
                sums.append(0)
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "sample_rate": np.array(rates, dtype=np.int32),
                    "n_samples": np.array(counts, dtype=np.int32),
                    "sum_amp": np.array(sums, dtype=np.int64),
                }
            )

    return media.select("media_ref", "content").mapInPandas(fn, out_schema)


# ------------------------------------------------- multi-frame container
# Minimal motion-PNG container so VIDEO decode is real too, not only
# still images: magic + frame count + length-prefixed PNG frames.  The
# length prefixes give decoders O(1) seek past unsampled frames — the
# shape an MP4 atom index / MJPEG stream has.
MPNG_MAGIC = b"MPNG"


def encode_mpng(frames: list[bytes]) -> bytes:
    import struct

    out = [MPNG_MAGIC, struct.pack(">I", len(frames))]
    for fb in frames:
        out.append(struct.pack(">I", len(fb)))
        out.append(fb)
    return b"".join(out)


def is_mpng(data: bytes | None) -> bool:
    return bool(data) and bytes(data[:4]) == MPNG_MAGIC


def parse_mpng(data: bytes) -> list[bytes]:
    """Container bytes -> per-frame PNG blobs (no pixel decode)."""
    import struct

    n = struct.unpack(">I", data[4:8])[0]
    frames, off = [], 8
    for _ in range(n):
        ln = struct.unpack(">I", data[off : off + 4])[0]
        frames.append(data[off + 4 : off + 4 + ln])
        off += 4 + ln
    return frames


def synth_png_video(refs: DataFrame) -> DataFrame:
    """REAL-video media store: per ref, an MPNG container of genuine PNG
    frames with SQL-replicable pixel formulas (the m3 oracle recomputes
    per-frame channel sums analytically):

      n_frames = 3 + seed % 8,  w = 8 + seed % 5,  h = 8 + seed % 3
      frame f, pixel i (row-major):
        R = (5*seed + 7*f + 11*i) % 256
        G = (3*seed + 13*f + 17*i) % 256
        B = (seed + f + i) % 5,  A = 255
    The scanline filter rotates with (seed + f) % 5 so one container
    exercises every decoder filter branch.

    Input: (media_ref string, seed long); output matches
    synth_media_table: (media_ref, content, media_kind, n_bytes)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_refs, blobs, nbytes = [], [], []
            for ref, seed in zip(pdf["media_ref"], pdf["seed"]):
                s = int(seed)
                nf, w, h = 3 + s % 8, 8 + s % 5, 8 + s % 3
                i = np.arange(w * h, dtype=np.int64)
                frames = []
                for f in range(nf):
                    px = np.empty((h, w, 4), dtype=np.uint8)
                    px[..., 0] = ((5 * s + 7 * f + 11 * i) % 256).reshape(h, w)
                    px[..., 1] = ((3 * s + 13 * f + 17 * i) % 256).reshape(h, w)
                    px[..., 2] = ((s + f + i) % 5).reshape(h, w)
                    px[..., 3] = 255
                    frames.append(png.encode_png(px, filter_type=(s + f) % 5))
                data = encode_mpng(frames)
                out_refs.append(ref)
                blobs.append(data)
                nbytes.append(len(data))
            yield pd.DataFrame(
                {
                    "media_ref": out_refs,
                    "content": blobs,
                    "media_kind": ["video"] * len(out_refs),
                    "n_bytes": np.array(nbytes, dtype=np.int32),
                }
            )

    return refs.select(
        "media_ref", F.col("seed").cast("long").alias("seed")
    ).mapInPandas(fn, MEDIA)


def sample_frame_stats(
    media: DataFrame, every_k: int = 4, strict: bool = False
) -> DataFrame:
    """Fused sample-every-k-th-frame + REAL per-frame decode + stats, one
    python stage (CLAUDE.md perf rule 1: never chain two pandas ops in a
    stage).  MPNG containers parse for real — unsampled frames are
    SKIPPED via the length prefix, never inflated — and each sampled
    frame goes through the full PNG decode; non-container blobs raise
    under strict (the ffmpeg drop-in boundary), else fall back to the
    fake single-frame decode.

    Output: (media_ref, frame_idx, n_frames, width, height, sum_r) —
    sum_r = sum of the decoded R channel, the analytic per-frame checksum
    the m3 oracle recomputes in SQL."""
    out_schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("sum_r", T.LongType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, idxs, totals, ws, hs, sums = [], [], [], [], [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                b = bytes(content or b"")
                if is_mpng(b):
                    frames = parse_mpng(b)
                    for fi in range(0, len(frames), every_k):
                        px = png.decode_png(frames[fi])
                        refs.append(ref)
                        idxs.append(fi)
                        totals.append(len(frames))
                        hs.append(px.shape[0])
                        ws.append(px.shape[1])
                        sums.append(int(px[..., 0].astype(np.int64).sum()))
                    continue
                if strict:
                    raise NotImplementedError(
                        "non-MPNG video decode requires ffmpeg, not available"
                    )
                px, _real = _decode_rgba(b)
                refs.append(ref)
                idxs.append(0)
                totals.append(1)
                hs.append(px.shape[0])
                ws.append(px.shape[1])
                sums.append(int(px[..., 0].astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "frame_idx": np.array(idxs, dtype=np.int32),
                    "n_frames": np.array(totals, dtype=np.int32),
                    "width": np.array(ws, dtype=np.int32),
                    "height": np.array(hs, dtype=np.int32),
                    "sum_r": np.array(sums, dtype=np.int64),
                }
            )

    return media.select("media_ref", "content").mapInPandas(fn, out_schema)


def frame_sample(media: DataFrame, every_k: int = 10) -> DataFrame:
    """Sample every k-th frame from video blobs: one OUTPUT ROW PER KEPT
    FRAME — the batch-shape contract a real decoder (ffmpeg) would have.
    Frame count/bytes are derived deterministically from the blob (the
    stubbed decode); frames are fixed-size slices of the blob, cycled."""
    out_schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, idxs, totals, frames = [], [], [], []
            for ref, content, kind in zip(
                pdf["media_ref"], pdf["content"], pdf["media_kind"]
            ):
                b = np.frombuffer(content or b"", dtype=np.uint8)
                seed = int(b[:8].astype(np.int64).sum()) if len(b) >= 8 else 0
                n_frames = 1 if kind == "image" else 1 + seed % 120
                fsize = max(len(b) // max(n_frames, 1), 1)
                for fi in range(0, n_frames, every_k):
                    start = (fi * fsize) % max(len(b), 1)
                    refs.append(ref)
                    idxs.append(fi)
                    totals.append(n_frames)
                    frames.append(b[start : start + fsize].tobytes())
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "frame_idx": np.array(idxs, dtype=np.int32),
                    "n_frames": np.array(totals, dtype=np.int32),
                    "frame": frames,
                }
            )

    return media.select("media_ref", "content", "media_kind").mapInPandas(fn, out_schema)


def synth_shifted_png_media(refs: DataFrame) -> DataFrame:
    """REAL-PNG media store for the perceptual-hash family: deterministic
    RGBA pixels from (seed, shift), encoded through the real codec.  The
    channel formulas are bounded to 254 so a uniform +shift (shift in
    {0, 1}) NEVER wraps — a shifted image is a true brightness variant
    whose bytes differ but whose average-hash is bit-identical (see
    average_hash_rgba: every integer floor shifts by exactly +shift, so
    the > comparisons are invariant, ties included):

      w = 16 + seed % 17,  h = 16 + seed % 13,  i = row-major pixel index
      R = (7*seed + 13*i)  % 255 + shift
      G = (11*seed + 29*i) % 255 + shift
      B = (3*i + seed)     % 200 + shift
      A = 255

    Input: (media_ref string, seed long, shift int).  Output matches
    synth_media_table: (media_ref, content, media_kind, n_bytes)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_refs, blobs, nbytes = [], [], []
            for ref, seed, shift in zip(pdf["media_ref"], pdf["seed"], pdf["shift"]):
                s, sh = int(seed), int(shift)
                w, h = 16 + s % 17, 16 + s % 13
                i = np.arange(w * h, dtype=np.int64)
                px = np.empty((h, w, 4), dtype=np.uint8)
                px[..., 0] = ((7 * s + 13 * i) % 255 + sh).reshape(h, w)
                px[..., 1] = ((11 * s + 29 * i) % 255 + sh).reshape(h, w)
                px[..., 2] = ((3 * i + s) % 200 + sh).reshape(h, w)
                px[..., 3] = 255
                data = png.encode_png(px, filter_type=s % 5)
                out_refs.append(ref)
                blobs.append(data)
                nbytes.append(len(data))
            yield pd.DataFrame(
                {
                    "media_ref": out_refs,
                    "content": blobs,
                    "media_kind": ["image"] * len(out_refs),
                    "n_bytes": np.array(nbytes, dtype=np.int32),
                }
            )

    return refs.select(
        "media_ref",
        F.col("seed").cast("long").alias("seed"),
        F.col("shift").cast("int").alias("shift"),
    ).mapInPandas(fn, MEDIA)


def average_hash_rgba(px: np.ndarray) -> int:
    """64-bit average hash (aHash) of an (h, w, 4) uint8 RGBA array, all
    integer arithmetic so the hash is engine- and platform-exact:

      gray      = (R + 2G + B) // 4                    (int luma)
      block[y,x]= floor(mean(gray over the 8x8 grid cell))  (floor division)
      ref       = floor(mean of the 64 block values)
      bit[y,x]  = block[y,x] > ref                     (row-major, MSB first)

    Invariance contract (what makes brightness twins dedup-able): adding
    a uniform +c to every channel adds exactly +c to gray, each block
    floor, and ref — floor((s + c*n)/n) == floor(s/n) + c — so every
    comparison, ties included, is unchanged and the hash is identical."""
    h, w = px.shape[0], px.shape[1]
    if h < 8 or w < 8:
        raise ValueError(f"average_hash_rgba needs >= 8x8 pixels, got {h}x{w}")
    gray = (
        px[..., 0].astype(np.int64) + 2 * px[..., 1].astype(np.int64) + px[..., 2]
    ) // 4
    ys = [y * h // 8 for y in range(9)]
    xs = [x * w // 8 for x in range(9)]
    blocks = np.empty((8, 8), dtype=np.int64)
    for by in range(8):
        for bx in range(8):
            blk = gray[ys[by] : ys[by + 1], xs[bx] : xs[bx + 1]]
            blocks[by, bx] = int(blk.sum()) // blk.size
    ref = int(blocks.sum()) // 64
    val = 0
    for bit in (blocks > ref).flatten():
        val = (val << 1) | int(bit)
    return val


def average_hash_media(media: DataFrame, strict: bool = True) -> DataFrame:
    """mapInPandas perceptual hashing over binary image columns: decode
    the blob (REAL decode for PNG/JPEG), compute the integer-exact 64-bit
    average hash, emit it as a 16-hex-char string (no int64 sign games).
    Group-by this column to find brightness/re-encode near-duplicates
    that an exact byte hash misses — the image-side analog of the text
    MinHash tier (reference stores media by content hash only,
    share_func.py download path)."""
    out_schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("ahash", T.StringType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, widths, heights, hashes = [], [], [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                px, _real = _decode_rgba(content, strict)
                refs.append(ref)
                heights.append(px.shape[0])
                widths.append(px.shape[1])
                hashes.append(f"{average_hash_rgba(px):016x}")
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "width": np.array(widths, dtype=np.int32),
                    "height": np.array(heights, dtype=np.int32),
                    "ahash": hashes,
                }
            )

    return media.select("media_ref", "content").mapInPandas(fn, out_schema)


def synth_tagged_wav_media(refs: DataFrame) -> DataFrame:
    """REAL-audio media store for the sample-dedup family: same integer
    sample formulas as synth_wav_media, plus a ``retag`` column — retag=1
    re-encodes with a LIST/INFO metadata chunk (comment length varies
    with the seed so both word-alignment paths are exercised): the BYTES
    differ, the PCM samples do not.  Input (media_ref, seed long,
    retag int); output matches synth_media_table."""
    from . import wav

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_refs, blobs, nbytes = [], [], []
            for ref, seed, retag in zip(pdf["media_ref"], pdf["seed"], pdf["retag"]):
                s = int(seed)
                rate = 8000 + 100 * (s % 5)
                n = 500 + s % 300
                i = np.arange(n, dtype=np.int64)
                samples = (((37 * s + 11 * i) % 2003) - 1001).astype(np.int16)
                info = (b"c" * (1 + s % 3)) if int(retag) else None
                data = wav.encode_wav(samples, rate, info=info)
                out_refs.append(ref)
                blobs.append(data)
                nbytes.append(len(data))
            yield pd.DataFrame(
                {
                    "media_ref": out_refs,
                    "content": blobs,
                    "media_kind": ["audio"] * len(out_refs),
                    "n_bytes": np.array(nbytes, dtype=np.int32),
                }
            )

    return refs.select(
        "media_ref",
        F.col("seed").cast("long").alias("seed"),
        F.col("retag").cast("int").alias("retag"),
    ).mapInPandas(fn, MEDIA)


def audio_fingerprint_media(media: DataFrame, strict: bool = True) -> DataFrame:
    """Sample-level audio fingerprint in one python stage: REAL RIFF
    chunk-walk decode (functions/wav.py), then md5 over (rate || raw PCM
    bytes) — identical audio re-encoded with different container
    metadata fingerprints identically, while the byte-level content hash
    (the reference's media-store key) differs.  Group by the fingerprint
    to dedup.  Output (media_ref, rate, n_samples, pcm_md5)."""
    import hashlib

    from . import wav

    out_schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("rate", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("pcm_md5", T.StringType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, rates, counts, fps = [], [], [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                b = bytes(content or b"")
                if not wav.is_wav(b):
                    if strict:
                        raise NotImplementedError("non-WAV audio decode not available")
                    continue
                rate, samples = wav.decode_wav(b)
                refs.append(ref)
                rates.append(rate)
                counts.append(len(samples))
                fps.append(
                    hashlib.md5(str(rate).encode() + b"|" + samples.tobytes()).hexdigest()
                )
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "rate": np.array(rates, dtype=np.int32),
                    "n_samples": np.array(counts, dtype=np.int32),
                    "pcm_md5": fps,
                }
            )

    return media.select("media_ref", "content").mapInPandas(fn, out_schema)


def synth_tagged_png_video(refs: DataFrame) -> DataFrame:
    """REAL-video media store for the frame-dedup family: same pixel
    formulas as synth_png_video, plus a ``refilter`` column — refilter=1
    re-encodes every frame with the NEXT scanline filter ((s+f+1) % 5
    instead of (s+f) % 5): the PNG byte streams differ, the decoded
    frames do not (all five filters are lossless).  Input (media_ref,
    seed long, refilter int); output matches synth_media_table."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_refs, blobs, nbytes = [], [], []
            for ref, seed, refl in zip(pdf["media_ref"], pdf["seed"], pdf["refilter"]):
                s, shift = int(seed), int(refl)
                nf, w, h = 3 + s % 8, 8 + s % 5, 8 + s % 3
                i = np.arange(w * h, dtype=np.int64)
                frames = []
                for f in range(nf):
                    px = np.empty((h, w, 4), dtype=np.uint8)
                    px[..., 0] = ((5 * s + 7 * f + 11 * i) % 256).reshape(h, w)
                    px[..., 1] = ((3 * s + 13 * f + 17 * i) % 256).reshape(h, w)
                    px[..., 2] = ((s + f + i) % 5).reshape(h, w)
                    px[..., 3] = 255
                    frames.append(png.encode_png(px, filter_type=(s + f + shift) % 5))
                data = encode_mpng(frames)
                out_refs.append(ref)
                blobs.append(data)
                nbytes.append(len(data))
            yield pd.DataFrame(
                {
                    "media_ref": out_refs,
                    "content": blobs,
                    "media_kind": ["video"] * len(out_refs),
                    "n_bytes": np.array(nbytes, dtype=np.int32),
                }
            )

    return refs.select(
        "media_ref",
        F.col("seed").cast("long").alias("seed"),
        F.col("refilter").cast("int").alias("refilter"),
    ).mapInPandas(fn, MEDIA)


def video_fingerprint_media(media: DataFrame, strict: bool = True) -> DataFrame:
    """Frame-level video fingerprint in one python stage: MPNG container
    walk + REAL per-frame PNG decode, then md5 over the concatenated
    decoded frame pixels (dims included) — a re-encoded container (same
    frames, different scanline filters / compression) fingerprints
    identically while its bytes, and the byte-level media-store key,
    differ.  Output (media_ref, n_frames, frames_md5)."""
    import hashlib

    out_schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("frames_md5", T.StringType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, counts, fps = [], [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                b = bytes(content or b"")
                if not is_mpng(b):
                    if strict:
                        raise NotImplementedError("non-MPNG video decode not available")
                    continue
                h = hashlib.md5()
                frames = parse_mpng(b)
                for fb in frames:
                    px = png.decode_png(fb)
                    h.update(np.array(px.shape, dtype=np.int64).tobytes())
                    h.update(px.tobytes())
                refs.append(ref)
                counts.append(len(frames))
                fps.append(h.hexdigest())
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "n_frames": np.array(counts, dtype=np.int32),
                    "frames_md5": fps,
                }
            )

    return media.select("media_ref", "content").mapInPandas(fn, out_schema)


def synth_png_media_tagged(refs: DataFrame) -> DataFrame:
    """synth_png_media's pixel formulas, plus spec tEXt metadata chunks
    (png.encode_png(text=)): Title = 'doc<seed>' always; Software =
    'sw<seed % 7>' except when seed % 11 == 0 (absent — extractors must
    handle missing keys, not just present ones).  Bytes therefore carry
    REAL in-band metadata the way crawled images do (Title/Software are
    the PNG spec's registered keywords)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_refs, blobs, nbytes = [], [], []
            for ref, seed in zip(pdf["media_ref"], pdf["seed"]):
                s = int(seed)
                w, h = 16 + s % 17, 16 + s % 13
                i = np.arange(w * h, dtype=np.int64)
                px = np.empty((h, w, 4), dtype=np.uint8)
                px[..., 0] = ((7 * s + 13 * i) % 256).reshape(h, w)
                px[..., 1] = ((11 * s + 29 * i) % 256).reshape(h, w)
                px[..., 2] = (1 + (3 * i + s) % 7).reshape(h, w)
                px[..., 3] = 255
                text = {"Title": f"doc{s}"}
                if s % 11 != 0:
                    text["Software"] = f"sw{s % 7}"
                data = png.encode_png(px, filter_type=s % 5, text=text)
                out_refs.append(ref)
                blobs.append(data)
                nbytes.append(len(data))
            yield pd.DataFrame(
                {
                    "media_ref": out_refs,
                    "content": blobs,
                    "media_kind": ["image"] * len(out_refs),
                    "n_bytes": np.array(nbytes, dtype=np.int32),
                }
            )

    return refs.select("media_ref", F.col("seed").cast("long").alias("seed")).mapInPandas(
        fn, MEDIA
    )


MEDIA_TEXT = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("software", T.StringType()),
        T.StructField("n_keys", T.IntegerType()),
    ]
)


def extract_media_text(media: DataFrame, strict: bool = False) -> DataFrame:
    """In-band metadata extraction over binary media columns
    (png.png_text_chunks): per image its tEXt keyword map projected to
    the registered Title/Software keys plus the key count — WITHOUT
    inflating pixels (the chunk walk stops at IDAT boundaries' headers),
    which is the point: a 100 TB media sweep reads metadata at chunk-
    header cost, deciding what to decode later.  Non-PNG blobs: strict
    raises (codec boundary), lax yields a null row."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, titles, softwares, nkeys = [], [], [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                try:
                    chunks = png.png_text_chunks(content or b"")
                except ValueError:
                    if strict:
                        raise
                    chunks = None
                refs.append(ref)
                titles.append(None if chunks is None else chunks.get("Title"))
                softwares.append(None if chunks is None else chunks.get("Software"))
                nkeys.append(-1 if chunks is None else len(chunks))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "title": titles,
                    "software": softwares,
                    "n_keys": np.array(nkeys, dtype=np.int32),
                }
            )

    return media.select("media_ref", "content").mapInPandas(fn, MEDIA_TEXT)
