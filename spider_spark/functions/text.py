"""Text analysis over document tables: language-ID, quality scoring,
token counting, fingerprinting.

Everything except the rolling-hash fingerprint is pure JVM expressions
(whole-stage codegen, no Python); the fingerprint is an Arrow-batched
pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# tiny per-language stopword marker lists (public knowledge)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "a"],
    "de": ["der", "und", "die", "ist", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
    "zh": ["的", "是", "了", "在", "我"],
}


def token_count_col(text: Column) -> Column:
    """Whitespace tokenization count (JVM split, codegen'd)."""
    return F.when(F.length(F.trim(text)) == 0, 0).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )


def bpe_ish_token_count_col(text: Column) -> Column:
    """BPE-ish regex token count: words, numbers, punctuation runs each
    count as tokens (a cheap stand-in for subword tokenizers)."""
    return F.size(
        F.filter(
            F.split(text, r"(?<=\W)|(?=\W)"),
            lambda t: F.length(F.trim(t)) > 0,
        )
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features.

    quality_score in [0,1]: penalizes very short docs, high punctuation
    density, and low stopword ratio (boilerplate / non-linguistic text).
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count_col(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    stop_arr = F.array([F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(F.split(F.lower(t), r"\s+"), lambda w: F.array_contains(stop_arr, w)))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(0.0)
    len_score = F.least(n_chars / F.lit(200.0), F.lit(1.0))
    score = F.round(
        F.greatest(
            F.lit(0.0),
            len_score * (1 - punct_ratio) * F.least(F.lit(1.0), stop_ratio * 5 + 0.5),
        ),
        4,
    )
    return df.select(
        "*",
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def langid_col(text: Column) -> Column:
    """Marker-word language ID: score = count of per-language marker words
    in the text; argmax wins, ties broken by language code order.

    Pure JVM: split + array_contains counts + greatest/when chain."""
    words = F.split(F.lower(text), r"\s+")

    def _contains(markers: list[str]):
        # single-arg lambda: F.filter treats a two-arg callable as
        # (element, index), so a default-arg closure would break
        arr = F.array([F.lit(w) for w in markers])
        return lambda w: F.array_contains(arr, w)

    scores = {
        lang: F.size(F.filter(words, _contains(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    # deterministic: iterate langs sorted; strictly-greater to keep first
    expr = F.lit("unknown")
    best_score = F.lit(0)
    for lang in sorted(LANG_MARKERS):
        cond = scores[lang] > best_score
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return expr


def _rolling_fingerprint(texts: pd.Series, window: int = 16, mod: int = 1 << 61) -> pd.Series:
    """Winnowing-style document fingerprint: min rolling polynomial hash
    over character windows (numpy per row; Arrow-batched)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    base = np.uint64(257)
    for i, t in enumerate(texts.fillna("")):
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
        # rolling hash via cumulative powers (vectorized over the doc)
        pows = np.power(base, np.arange(window, dtype=np.uint64))
        windows = np.lib.stride_tricks.sliding_window_view(a, window)
        hashes = (windows * pows[::-1]).sum(axis=1)
        out[i] = hashes.min()
    return pd.Series(out.view(np.int64))


def fingerprint_udf(text: Column) -> Column:
    def _fp(texts: pd.Series) -> pd.Series:
        return _rolling_fingerprint(texts)

    return pandas_udf(_fp, "long")(text)


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-stop text analysis: lang guess + quality + tokens + fingerprint."""
    return quality_features(df, text_col).select(
        "*",
        langid_col(F.col(text_col)).alias("lang_guess"),
        fingerprint_udf(F.col(text_col)).alias("fingerprint"),
    )
