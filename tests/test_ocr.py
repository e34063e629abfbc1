"""S4 captcha OCR (recogImage analog): render -> binarize -> template
match.  Contract mirrored from share_func.py:56-66: a clean all-digit
read or None."""

import numpy as np
import pytest

from spider_spark.functions.ocr import (
    _INK,
    acquire_session_token,
    challenge_code,
    recog_captcha,
    recog_rgba,
    render_code_rgba,
)


def test_every_digit_roundtrips_at_every_scale():
    for scale in (1, 2, 3, 4):
        for d in "0123456789":
            assert recog_rgba(render_code_rgba(d, scale=scale)) == d


def test_multidigit_roundtrip_under_noise():
    # noise binarizes WHITE (like the captcha backgrounds the reference's
    # three-pass threshold is built to erase), so reads stay exact
    for i in range(40):
        code = f"{(i * 7919) % 100000:05d}"
        px = render_code_rgba(code, scale=2, noise=80, seed=i)
        assert recog_rgba(px) == code


def test_unreadable_returns_none():
    # a glyph-shaped blob that matches no template -> whole read fails
    # (the reference returns False when tesseract's read isn't digits)
    px = render_code_rgba("77", scale=2)
    h, w = px.shape[:2]
    px[3 : h - 3, w // 2 - 1 : w // 2 + 1] = _INK  # unknown full-height bar glyph
    assert recog_rgba(px) is None
    blank = np.zeros((10, 30, 4), dtype=np.uint8)
    blank[:] = (200, 200, 200, 255)
    assert recog_rgba(blank) is None


def test_render_rejects_non_digits():
    with pytest.raises(ValueError):
        render_code_rgba("12a4")


def test_session_token_is_deterministic_and_digit():
    toks = [acquire_session_token(p) for p in range(8)]
    assert toks == [acquire_session_token(p) for p in range(8)]
    assert all(t is not None and t.isdigit() and len(t) == 4 for t in toks)
    assert toks[0] == challenge_code(0)


def test_recog_captcha_dataframe(spark):
    """DataFrame face over REAL RGBA bytes + dims; malformed blob -> NULL."""
    rows = []
    for i in range(12):
        code = f"{i * 937 % 10000:04d}"
        px = render_code_rgba(code, scale=2, noise=30, seed=i)
        rows.append((f"cap:{i}", px.tobytes(), px.shape[1], px.shape[0], code))
    rows.append(("cap:bad", b"\x01\x02\x03", 10, 10, None))  # wrong byte count
    df = spark.createDataFrame(
        rows, "media_ref string, content binary, width int, height int, expect string"
    )
    got = {r["media_ref"]: r["code"] for r in recog_captcha(df).collect()}
    want = {r["media_ref"]: r["expect"] for r in df.collect()}
    assert got == want
