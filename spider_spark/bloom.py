"""Sharded Bloom URL-seen filter: broadcast + per-partition delta merges.

SURVEY.md §4.3.2.  The seen set is authoritative in the ``seen`` table
(exact anti-join, J5); the Bloom layer is a broadcastable prefilter that
lets the link-dedup stage skip the exact anti-join for definitely-new
URLs.  Safety direction: a false positive only costs an extra exact
check; a URL is NEVER dropped on Bloom evidence alone.

Sharding: ``shard = url_hash & (n_shards-1)``; each shard is an
independent bit array.  Deltas are built per-partition with
``applyInPandas`` (numpy bit math, no per-row Python), OR-merged on the
driver, and re-broadcast — at cluster scale each round ships only the
shard bitmaps (fixed bytes), not the seen table.

Double-hashing scheme: h_i = h1 + i*h2 (Kirsch–Mitzenmacher), with
h1/h2 derived from url_hash by odd-constant mixing — public-domain
technique used by every Bloom implementation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _h1h2(url_hash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    x = url_hash.astype(np.int64).view(np.uint64)
    h1 = x * _MIX
    h1 ^= h1 >> np.uint64(29)
    h2 = (x ^ (x >> np.uint64(33))) * _MIX | np.uint64(1)  # odd -> full cycle
    return h1, h2


class ShardedBloom:
    def __init__(self, n_shards: int = 16, bits_per_shard: int = 1 << 20, n_hashes: int = 5):
        assert n_shards & (n_shards - 1) == 0, "n_shards must be a power of two"
        self.n_shards = n_shards
        self.m = bits_per_shard
        self.k = n_hashes
        self.shards = np.zeros((n_shards, bits_per_shard // 64), dtype=np.uint64)
        self.count = 0

    # ------------------------------------------------------------- build
    def _delta_for(self, url_hash: np.ndarray) -> dict[int, np.ndarray]:
        out: dict[int, np.ndarray] = {}
        shard_ids = (url_hash.astype(np.int64).view(np.uint64) & np.uint64(self.n_shards - 1)).astype(
            np.int64
        )
        h1, h2 = _h1h2(url_hash)
        for sid in np.unique(shard_ids):
            mask = shard_ids == sid
            bits = np.zeros(self.m // 64, dtype=np.uint64)
            for i in range(self.k):
                pos = (h1[mask] + np.uint64(i) * h2[mask]) % np.uint64(self.m)
                np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                                 np.uint64(1) << (pos & np.uint64(63)))
            out[int(sid)] = bits
        return out

    def update_from_df(self, spark: SparkSession, delta: DataFrame) -> None:
        """Per-partition delta build (applyInPandas over shard id) +
        driver-side OR merge."""
        n_shards, m, k = self.n_shards, self.m, self.k

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            b = ShardedBloom(n_shards, m, k)
            deltas = b._delta_for(pdf["url_hash"].to_numpy())
            return pd.DataFrame(
                {
                    "shard": list(deltas.keys()),
                    "bits": [d.tobytes() for d in deltas.values()],
                }
            )

        rows = (
            delta.select("url_hash")
            .withColumn("shard", (F.col("url_hash").bitwiseAND(n_shards - 1)))
            .groupBy("shard")
            .applyInPandas(build, "shard int, bits binary")
            .collect()
        )
        for r in rows:
            self.shards[r["shard"] % self.n_shards] |= np.frombuffer(r["bits"], dtype=np.uint64)
        self.count += delta.count()

    def update_local(self, url_hash: np.ndarray) -> None:
        for sid, bits in self._delta_for(url_hash).items():
            self.shards[sid] |= bits
        self.count += len(url_hash)

    # ------------------------------------------------------------- query
    def maybe_contains(self, url_hash: np.ndarray) -> np.ndarray:
        x = url_hash.astype(np.int64).view(np.uint64)
        shard_ids = (x & np.uint64(self.n_shards - 1)).astype(np.int64)
        h1, h2 = _h1h2(url_hash)
        res = np.ones(len(url_hash), dtype=bool)
        for i in range(self.k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
            word = self.shards[shard_ids, (pos >> np.uint64(6)).astype(np.int64)]
            res &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return res

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.shards.view(np.uint8)).mean())


def bloom_prefilter(
    spark: SparkSession, candidates: DataFrame, bloom: ShardedBloom | None
) -> tuple[DataFrame, DataFrame, object | None]:
    """Split candidates into (definitely_new, maybe_seen) on url_hash.

    definitely_new rows skip the exact anti-join; maybe_seen rows go to
    the exact check.  With bloom=None everything is maybe_seen.

    Also returns the shard-bitmap Broadcast (or None): the caller MUST
    destroy it once the round's actions are done — a fresh broadcast per
    round that is never destroyed leaks driver+executor memory over a
    long crawl (ADVICE r1 #3)."""
    if bloom is None:
        return candidates.limit(0), candidates, None
    bc = spark.sparkContext.broadcast(
        {"shards": bloom.shards, "n": bloom.n_shards, "m": bloom.m, "k": bloom.k}
    )

    @F.pandas_udf("boolean")
    def maybe_udf(url_hash: pd.Series) -> pd.Series:
        d = bc.value
        b = ShardedBloom(d["n"], d["m"], d["k"])
        b.shards = d["shards"]
        return pd.Series(b.maybe_contains(url_hash.to_numpy()))

    tagged = candidates.withColumn("_maybe", maybe_udf(F.col("url_hash")))
    return (
        tagged.filter(~F.col("_maybe")).drop("_maybe"),
        tagged.filter(F.col("_maybe")).drop("_maybe"),
        bc,
    )
