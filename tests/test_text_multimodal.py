from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_text_profile_columns(spark):
    from spider_spark.functions.text import text_profile

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    prof = text_profile(d).cache()
    row = prof.first()
    for c in ["n_tokens", "punct_ratio", "stopword_ratio", "quality_score", "lang_guess", "fingerprint"]:
        assert c in prof.columns
    assert prof.filter("quality_score < 0 or quality_score > 1").count() == 0
    assert prof.filter("n_tokens <= 0").count() == 0
    # deterministic: same input -> same fingerprint
    prof2 = text_profile(d)
    j = prof.select("doc_id", "fingerprint").join(
        prof2.select("doc_id", F.col("fingerprint").alias("f2")), "doc_id"
    )
    assert j.filter("fingerprint != f2").count() == 0
    prof.unpersist()


def test_media_plumbing(spark):
    from spider_spark.functions.multimodal import (
        decode_and_featurize,
        media_refs_from_documents,
        synth_media_table,
    )
    from spider_spark.synth import interleaved_documents

    docs = interleaved_documents(spark, 60, n_hosts=10, page_space=100)
    refs = media_refs_from_documents(docs)
    n_refs = refs.count()
    assert n_refs > 0

    media = synth_media_table(refs)
    assert media.schema["content"].dataType.typeName() == "binary"
    feats = decode_and_featurize(media).cache()
    assert feats.count() == n_refs
    assert feats.filter("n_bytes <= 0").count() == 0
    assert feats.filter("byte_entropy < 0 or byte_entropy > 8").count() == 0
    assert feats.filter("width < 16 or height < 16").count() == 0
    feats.unpersist()


def test_media_strict_mode_raises(spark):
    import pytest

    from spider_spark.functions.multimodal import decode_and_featurize, synth_media_table

    refs = spark.createDataFrame([("media://x/img0",)], ["media_ref"])
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        decode_and_featurize(synth_media_table(refs), strict=True).collect()


def test_html_to_spans_roundtrip(spark):
    """HTML -> interleaved spans: mirrors the reference's mixed text+image
    pages (html/person_credit fixtures with <img> + text + links)."""
    from spider_spark.parse import html_to_spans, html_to_spans_udf

    html = (
        "<html><title>报告页</title><body>some text"
        '<img src="media://cap/img1"><a href="/p13">next</a> tail</body></html>'
    )
    spans = html_to_spans(html)
    kinds = [s["kind"] for s in spans]
    # anchor text 'next' and the trailing ' tail' are separate text spans
    assert kinds == ["title", "text", "media", "link", "text", "text"]
    assert [s["offset"] for s in spans] == list(range(6))
    assert spans[2]["media_ref"] == "media://cap/img1"
    assert spans[3]["text"] == "/p13"

    df = spark.createDataFrame([(html,)], ["body"])
    got = df.select(html_to_spans_udf(F.col("body")).alias("spans")).first()["spans"]
    assert [(s["kind"], s["offset"]) for s in got] == [(s["kind"], s["offset"]) for s in spans]


def _fingerprint_rows_reference(texts, window=16):
    """Round-2 per-row formulation, kept as the golden for the
    batch-vectorized _rolling_fingerprint."""
    import numpy as np
    import pandas as pd

    out = np.zeros(len(texts), dtype=np.uint64)
    base = np.uint64(257)
    for i, t in enumerate(pd.Series(texts).fillna("")):
        if len(t) < window:
            h = np.uint64(0)
            for ch in t:
                h = h * base + np.uint64(ord(ch) & 0xFF)
            out[i] = h
            continue
        a = np.frombuffer(t.encode("utf-8", "ignore")[: 1 << 16], dtype=np.uint8).astype(np.uint64)
        if len(a) < window:
            out[i] = a.sum()
            continue
        pows = np.power(base, np.arange(window, dtype=np.uint64))
        windows = np.lib.stride_tricks.sliding_window_view(a, window)
        out[i] = (windows * pows[::-1]).sum(axis=1).min()
    return pd.Series(out.view(np.int64))


def test_vectorized_fingerprint_matches_row_golden(monkeypatch):
    import random

    import pandas as pd

    from spider_spark.functions import text as T

    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "δοκιμή", "漢字", "x", ""]
    cases = [None, "", "a", "short doc", "exactly sixteen!", "exactly sixteen!!"]
    for _ in range(200):
        n = rng.randrange(0, 60)
        cases.append(" ".join(rng.choice(words) for _ in range(n)))
    cases.append("z" * 100_000)          # > byte cap
    cases.append("漢" * 40)               # multi-byte
    cases.append("\ud800" * 20)          # lone surrogates -> utf-8 ignore shrinks
    cases.append("\ud800ab")             # lone surrogate in a SHORT doc: the
    cases.append("a\udfff")              # utf-32 short path must not raise (ADVICE r3)
    s = pd.Series(cases, dtype="object")

    got = T._rolling_fingerprint(s)
    want = _fingerprint_rows_reference(s)
    assert got.tolist() == want.tolist()

    # force the multi-group path (memory-bounded flattening)
    monkeypatch.setattr(T, "_FP_GROUP_BYTES", 64)
    got2 = T._rolling_fingerprint(s)
    assert got2.tolist() == want.tolist()


def test_pack_sequences_invariants(spark):
    """Every doc lands in exactly one sequence; a sequence STARTS under
    budget so it can overflow by at most one document; seq ids are dense
    from 0 within each (lang, shard)."""
    from spider_spark.functions.text import pack_sequences, token_count_col

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    budget = 256
    packed = pack_sequences(d, budget=budget, n_shards=4).withColumn(
        "tk", token_count_col(F.col("text")).cast("long")
    )
    assert packed.count() == d.count()
    rows = packed.select("lang", "shard", "seq", "doc_id", "tk").collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault((r["lang"], r["shard"]), []).append(r)
    assert len(groups) > 3
    max_tk = max(r["tk"] for r in rows)
    for (lang, shard), g in groups.items():
        g.sort(key=lambda r: r["doc_id"])
        seqs = {}
        run = 0
        for r in g:
            assert r["seq"] == run // budget, (lang, shard, r["doc_id"])
            seqs[r["seq"]] = seqs.get(r["seq"], 0) + r["tk"]
            run += r["tk"]
        assert sorted(seqs) == list(range(len(seqs)))  # dense from 0
        for s, tot in seqs.items():
            assert tot < budget + max_tk, (lang, shard, s, tot)
