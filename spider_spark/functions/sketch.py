"""Bounded-memory frequent-items (heavy hitters): per-partition
Misra-Gries candidate generation + exact distributed recount.

The scale problem: "top-k keys by frequency" over 100 TB naively
shuffles EVERY distinct key (groupBy key).  With 10^9+ distinct keys
(URLs, tokens, hosts) that shuffle is the job.  The classic two-pass
fix, built from mergeable MG summaries (Misra & Gries 1982; Agarwal et
al., "Mergeable Summaries", PODS 2012 — public algorithm):

1. one pass of per-partition Misra-Gries with ``capacity`` counters
   (a single mapInPandas stage, O(capacity) memory per task) emits a
   CANDIDATE key set of at most n_partitions * capacity keys.
   Guarantee: any key with partition-local count > n_p/(capacity+1)
   survives its partition's summary, and a key with GLOBAL count
   > N/(capacity+1) must exceed that bound in at least one partition
   (pigeonhole), so the candidate union is a superset of every global
   heavy hitter;
2. an exact recount of ONLY the candidates (broadcast semi-join, then
   groupBy) — the shuffle carries O(candidate) rows, not O(distinct).

The result is EXACT (not approximate) whenever the k-th frequency
exceeds N/(capacity+1); ``heavy_hitters_topk`` RAISES when the
guarantee cannot certify that, instead of silently returning a maybe-
wrong list.

Reference capability: the crawl's per-host frequency ranking
(shixin_spider.py:174-180 source-volume accounting) at a key
cardinality where the exact groupBy stops being free.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _mg_merge(counters: dict, batch: pd.Series, capacity: int) -> dict:
    """Merge a batch's value counts into an MG summary (Agarwal et al.
    merge rule: add, then subtract the (capacity+1)-th largest count
    from all and drop non-positives — keeps <= capacity counters while
    preserving the N/(capacity+1) retention bound)."""
    for key, cnt in batch.value_counts().items():
        counters[key] = counters.get(key, 0) + int(cnt)
    if len(counters) > capacity:
        cut = sorted(counters.values(), reverse=True)[capacity]
        counters = {k: v - cut for k, v in counters.items() if v > cut}
    return counters


def misra_gries_candidates(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """Per-partition MG summaries in ONE python stage; returns the
    distinct candidate keys (<= n_partitions * capacity rows)."""
    field = df.schema[col]
    out_schema = StructType([field])

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            counters = _mg_merge(counters, pdf[col].dropna(), capacity)
        yield pd.DataFrame({col: list(counters.keys())})

    return df.select(col).mapInPandas(mg, out_schema).distinct()


def heavy_hitters_topk(
    df: DataFrame, col: str, k: int, capacity: int = 4096
) -> DataFrame:
    """Exact top-k keys by frequency with bounded-memory candidate
    generation (module docstring).  Returns (key, cnt) ordered by
    (cnt DESC, key ASC); raises AssertionError unless the MG guarantee
    certifies exactness (k-th count > N/(capacity+1))."""
    cand = misra_gries_candidates(df, col, capacity)
    top = (
        df.join(F.broadcast(cand), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(col))
        .limit(k)
    )
    rows = top.collect()
    n = df.count()
    threshold = n / (capacity + 1)
    if len(rows) < k or rows[-1]["cnt"] <= threshold:
        kth = rows[-1]["cnt"] if rows else 0
        raise AssertionError(
            f"MG guarantee cannot certify top-{k}: k-th count {kth} <= "
            f"N/(capacity+1) = {threshold:.1f} — raise capacity"
        )
    return top
