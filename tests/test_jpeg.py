"""Dependency-free baseline JPEG codec (spider_spark/functions/jpeg.py):
exact roundtrip for quantization-exact inputs (constant 8x8 blocks under
the flat step-8 table), bounded error on natural images for 4:4:4 and
4:2:0, restart-marker framing, canonical Huffman construction, malformed
/ unsupported-mode rejection, and the real-decode path through the
multimodal operators — JPEG is the format the reference crawler persists
(share_func.py:224-242 saveImage), so the dominant web image format now
flows through the decode boundary for real, alongside PNG/MPNG/WAV."""

import numpy as np
import pytest

from spider_spark.functions.jpeg import (
    _build_huff,
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
)


def _tile_gray(seed: int) -> np.ndarray:
    """The m8 generator: constant 16x16 tiles, v_t = (23s + 41t) % 256."""
    s = int(seed)
    tw, th = 2 + s % 3, 1 + s % 2
    t = (np.arange(th * 16)[:, None] // 16) * tw + (np.arange(tw * 16)[None, :] // 16)
    return ((23 * s + 41 * t) % 256).astype(np.uint8)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 17, 123])
def test_constant_tiles_roundtrip_exact(seed):
    px = _tile_gray(seed)
    out = decode_jpeg(encode_jpeg(px, restart_interval=seed % 3))
    assert out.shape == (*px.shape, 3)
    for ch in range(3):  # grayscale replicates across channels
        assert np.array_equal(out[..., ch], px)


def test_orientation_not_transposed():
    # non-square image whose tiles vary along x only: pixel-location
    # assertions catch a transposed decode that checksums would miss
    px = np.zeros((16, 48), dtype=np.uint8)
    px[:, 16:32] = 130
    px[:, 32:] = 250
    out = decode_jpeg(encode_jpeg(px))
    assert out.shape == (16, 48, 3)
    assert out[0, 0, 0] == 0 and out[0, 16, 0] == 130 and out[0, 47, 0] == 250
    assert out[15, 0, 0] == 0 and out[8, 40, 0] == 250


def test_restart_markers_present_and_equal():
    px = _tile_gray(9)
    plain = encode_jpeg(px)
    rst = encode_jpeg(px, restart_interval=1)
    assert b"\xff\xd0" in rst or b"\xff\xd1" in rst
    assert np.array_equal(decode_jpeg(plain), decode_jpeg(rst))


def test_color_444_and_420_bounded_error():
    yy, xx = np.mgrid[0:40, 0:56]
    rgb = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, (yy + xx) % 256], axis=-1
    ).astype(np.uint8)
    for subsample, max_tol, mean_tol in [(False, 8, 1.5), (True, 16, 2.5)]:
        out = decode_jpeg(encode_jpeg(rgb, subsample=subsample))
        err = np.abs(out.astype(int) - rgb.astype(int))
        assert err.max() <= max_tol
        assert err.mean() <= mean_tol


def test_constant_color_within_color_transform_rounding():
    c = np.full((24, 24, 3), (200, 30, 99), dtype=np.uint8)
    for subsample in (False, True):
        out = decode_jpeg(encode_jpeg(c, subsample=subsample))
        # DCT path is exact for constants; only the two YCbCr roundings remain
        assert np.abs(out.astype(int) - c.astype(int)).max() <= 2


@pytest.mark.parametrize("shape", [(1, 1), (7, 9), (37, 51), (8, 64)])
def test_odd_sizes_crop_back(shape):
    rng = np.random.RandomState(shape[0] * 100 + shape[1])
    rgb = (rng.randint(0, 32, (*shape, 3)) * 8).astype(np.uint8)
    for subsample in (False, True):
        out = decode_jpeg(encode_jpeg(rgb, subsample=subsample))
        assert out.shape == (*shape, 3)


def test_build_huff_canonical_multi_length():
    # canonical assignment: lengths [2,2,3] -> codes 00, 01, 100
    bits = [0, 2, 1] + [0] * 13
    table = _build_huff(bits, [10, 20, 30])
    assert table == {(2, 0b00): 10, (2, 0b01): 20, (3, 0b100): 30}


def test_rejects_garbage_and_truncation():
    assert not is_jpeg(b"") and not is_jpeg(None) and not is_jpeg(b"\x89PNG")
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00" * 32)
    blob = encode_jpeg(_tile_gray(3))
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg(blob[:40])


def test_progressive_raises_not_implemented():
    blob = bytearray(encode_jpeg(_tile_gray(1)))
    i = blob.index(b"\xff\xc0")
    blob[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob))


def test_decode_rgba_real_for_jpeg():
    from spider_spark.functions.multimodal import _decode_rgba

    px = _tile_gray(5)
    rgba, real = _decode_rgba(encode_jpeg(px), strict=True)
    assert real and rgba.shape == (*px.shape, 4)
    assert np.array_equal(rgba[..., 0], px) and (rgba[..., 3] == 255).all()
    # non-PNG/JPEG bytes still hit the strict codec guard
    with pytest.raises(NotImplementedError):
        _decode_rgba(b"GIF89a" + b"\x00" * 64, strict=True)


def test_jpeg_stats_matches_formula_on_spark(spark):
    from pyspark.sql import functions as F

    from spider_spark.functions.multimodal import jpeg_stats, synth_jpeg_media

    n = 24
    refs = spark.range(n).select(
        F.concat(F.lit("media://doc/"), F.col("id"), F.lit("/jpg0")).alias("media_ref"),
        F.col("id").alias("seed"),
    )
    rows = {r["media_ref"]: r for r in jpeg_stats(synth_jpeg_media(refs), strict=True).collect()}
    assert len(rows) == n
    for s in range(n):
        r = rows[f"media://doc/{s}/jpg0"]
        tw, th = 2 + s % 3, 1 + s % 2
        assert (r["width"], r["height"]) == (16 * tw, 16 * th)
        want = sum(256 * ((23 * s + 41 * t) % 256) for t in range(tw * th))
        assert r["sum_r"] == want


def test_resize_stats_over_real_jpeg_media(spark):
    """The shared decode boundary: resize_stats (built for PNG media)
    decodes JPEG blobs for real through the same _decode_rgba."""
    from pyspark.sql import functions as F

    from spider_spark.functions.multimodal import resize_stats, synth_jpeg_media

    refs = spark.range(6).select(
        F.concat(F.lit("media://doc/"), F.col("id"), F.lit("/jpg0")).alias("media_ref"),
        F.col("id").alias("seed"),
    )
    out = resize_stats(synth_jpeg_media(refs), 16, 16, strict=True).collect()
    assert len(out) == 6
    for r in out:
        assert (r["width"], r["height"]) == (16, 16)
        assert r["sum_r"] >= 0
