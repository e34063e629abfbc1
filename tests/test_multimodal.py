

def test_binarize_rgba_matches_reference_pixel_loop():
    """Golden vs a literal per-pixel transcription of the reference's
    three-pass loop (binaryzationImage share_func.py:194-221)."""
    import numpy as np

    from spider_spark.functions.multimodal import binarize_rgba

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(13, 17, 4), dtype=np.uint8)

    ref = img.copy()
    h, w = ref.shape[:2]
    for y in range(h):
        for x in range(w):
            if ref[y, x][0] < 90:
                ref[y, x] = (0, 0, 0, 255)
    for y in range(h):
        for x in range(w):
            if ref[y, x][1] < 136:
                ref[y, x] = (0, 0, 0, 255)
    for y in range(h):
        for x in range(w):
            if ref[y, x][2] > 0:
                ref[y, x] = (255, 255, 255, 255)

    got = binarize_rgba(img)
    assert (got == ref).all()
    # result is pure black/white
    flat = got.reshape(-1, 4)
    assert set(map(tuple, flat)) <= {(0, 0, 0, 255), (255, 255, 255, 255)}


def test_binarize_media_plumbing(spark):
    from pyspark.sql import functions as F

    from spider_spark.functions.multimodal import binarize_media, synth_media_table

    refs = spark.range(8).select(
        F.concat(F.lit("media://h0/p"), F.col("id"), F.lit("/img0")).alias("media_ref")
    )
    media = synth_media_table(refs)
    out = binarize_media(media).collect()
    assert len(out) == 8
    for r in out:
        assert r["width"] * r["height"] * 4 == len(r["binarized"])
        assert 0.0 <= r["frac_white"] <= 1.0
    # deterministic across runs
    again = {r["media_ref"]: r["frac_white"] for r in binarize_media(media).collect()}
    assert again == {r["media_ref"]: r["frac_white"] for r in out}
