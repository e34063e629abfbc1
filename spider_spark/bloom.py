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

# Driver-memory sizing rule (VERDICT r2 #5).  The filter needs
# ~bits_per_key * n_keys total bits (≈10 bits/key for ~1% FP at k=5,
# ≈14.4 for 0.1%); driver-resident bitmaps AND their per-round broadcast
# both carry the FULL n_shards * bits_per_shard / 8 bytes.  A 10^10-URL
# frontier at 10 bits/key is ~12 GB — far past any sane driver heap or
# broadcast, so ShardedBloom fails FAST at construction instead of
# OOMing mid-crawl; that scale belongs to DistributedBloom (shards live
# in a store table, shipped per-shard via a cogrouped join, never
# resident on or broadcast from the driver).
DRIVER_BUDGET_BYTES = 512 << 20


def _h1h2(url_hash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    x = url_hash.astype(np.int64).view(np.uint64)
    h1 = x * _MIX
    h1 ^= h1 >> np.uint64(29)
    h2 = (x ^ (x >> np.uint64(33))) * _MIX | np.uint64(1)  # odd -> full cycle
    return h1, h2


def _shard_bitmap(url_hash: np.ndarray, m: int, k: int) -> np.ndarray:
    """OR the k bit positions of each url_hash into ONE shard's m-bit array."""
    bits = np.zeros(m // 64, dtype=np.uint64)
    h1, h2 = _h1h2(url_hash)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
        np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    return bits


def _maybe_in_bitmap(url_hash: np.ndarray, bits: np.ndarray, m: int, k: int) -> np.ndarray:
    """Membership of url_hash values against ONE shard's bit array."""
    h1, h2 = _h1h2(url_hash)
    res = np.ones(len(url_hash), dtype=bool)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
        word = bits[(pos >> np.uint64(6)).astype(np.int64)]
        res &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
    return res


class ShardedBloom:
    def __init__(
        self,
        n_shards: int = 16,
        bits_per_shard: int = 1 << 20,
        n_hashes: int = 5,
        driver_budget_bytes: int = DRIVER_BUDGET_BYTES,
    ):
        assert n_shards & (n_shards - 1) == 0, "n_shards must be a power of two"
        nbytes = n_shards * (bits_per_shard // 8)
        if nbytes > driver_budget_bytes:
            raise ValueError(
                f"ShardedBloom sized at {nbytes / 2**30:.1f} GiB "
                f"({n_shards} shards x {bits_per_shard} bits) exceeds the "
                f"driver budget of {driver_budget_bytes / 2**30:.1f} GiB: "
                f"driver-resident bitmaps are broadcast whole every round. "
                f"Rule of thumb: total bits ~= 10 * expected keys (1% FP); "
                f"past the budget use DistributedBloom (store-backed shards, "
                f"cogrouped per-shard membership, no driver copy) or raise "
                f"driver_budget_bytes explicitly."
            )
        self.n_shards = n_shards
        self.m = bits_per_shard
        self.k = n_hashes
        self.shards = np.zeros((n_shards, bits_per_shard // 64), dtype=np.uint64)
        self.count = 0

    @property
    def nbytes(self) -> int:
        return self.shards.nbytes

    # ------------------------------------------------------------- build
    def _delta_for(self, url_hash: np.ndarray) -> dict[int, np.ndarray]:
        out: dict[int, np.ndarray] = {}
        shard_ids = (url_hash.astype(np.int64).view(np.uint64) & np.uint64(self.n_shards - 1)).astype(
            np.int64
        )
        for sid in np.unique(shard_ids):
            out[int(sid)] = _shard_bitmap(url_hash[shard_ids == sid], self.m, self.k)
        return out

    def update_from_df(self, spark: SparkSession, delta: DataFrame) -> None:
        """Per-partition delta build (applyInPandas over shard id) +
        driver-side OR merge."""
        n_shards, m, k = self.n_shards, self.m, self.k

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            # one group == one shard: build just that shard's m-bit array
            bits = _shard_bitmap(pdf["url_hash"].to_numpy(), m, k)
            return pd.DataFrame(
                {"shard": [int(pdf["shard"].iloc[0])], "bits": [bits.tobytes()]}
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


class DistributedBloom:
    """The 10^10-key form of the seen-filter: shard bitmaps live in a
    TableStore table (``bloom_shards``), NEVER on the driver and never in
    a broadcast (VERDICT r2 #5: a 10^10-URL filter at 10 bits/key is
    ~12 GB — past any driver heap/broadcast limit; ShardedBloom now
    fails fast at that size and points here).

    - update: per-shard delta bitmaps built with ``applyInPandas``,
      OR-merged against the current rows of the TOUCHED shards only, then
      MERGE-upserted — O(touched shards) rows per round.  The table
      version flips with ``commit_round``, so resume-from-checkpoint
      restores the filter with no rebuild (``persistent = True``).
    - query: candidates shuffle by shard id and COGROUP with the shards
      table — each task reads only the bitmaps of the shards its
      candidates hash into, instead of every executor receiving every
      byte.  At n_shards >> cores the shuffle is balanced by the hash.

    Same hash family and bit layout as ShardedBloom — identical
    membership decisions for identical inserts — and the same safety
    direction: a false positive costs an extra exact check, never a
    dropped URL.
    """

    TABLE = "bloom_shards"
    persistent = True  # lives in the store; resume() must NOT rebuild it

    def __init__(
        self,
        spark: SparkSession,
        store,
        n_shards: int = 4096,
        bits_per_shard: int = 1 << 23,
        n_hashes: int = 5,
    ):
        assert n_shards & (n_shards - 1) == 0, "n_shards must be a power of two"
        self.spark = spark
        self.store = store
        self.n_shards = n_shards
        self.m = bits_per_shard
        self.k = n_hashes
        self.count = 0

    def _shard_col(self):
        return F.col("url_hash").bitwiseAND(self.n_shards - 1).cast("int")

    def _delta_df(self, delta: DataFrame) -> DataFrame:
        m, k = self.m, self.k

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            bits = _shard_bitmap(pdf["url_hash"].to_numpy(), m, k)
            return pd.DataFrame(
                {"shard": [int(pdf["shard"].iloc[0])], "bits": [bits.tobytes()]}
            )

        return (
            delta.select("url_hash")
            .withColumn("shard", self._shard_col())
            .groupBy("shard")
            .applyInPandas(build, "shard int, bits binary")
        )

    def update_from_df(self, spark: SparkSession, delta: DataFrame) -> None:
        new = self._delta_df(delta)
        if not self.store.exists(self.TABLE):
            self.store.write(self.TABLE, new)
        else:
            old = self.store.read(self.TABLE).withColumnRenamed("bits", "_old")

            @F.pandas_udf("binary")
            def or_bytes(a: pd.Series, b: pd.Series) -> pd.Series:
                # <= touched-shards rows per round: driver-free, tiny
                return pd.Series(
                    x if y is None
                    else (np.frombuffer(x, dtype=np.uint64)
                          | np.frombuffer(y, dtype=np.uint64)).tobytes()
                    for x, y in zip(a, b)
                )

            merged = new.join(old, "shard", "left").select(
                "shard", or_bytes("bits", "_old").alias("bits")
            ).localCheckpoint(eager=True)  # merge_upsert consumes its
            # input twice; pin the touched-shard rows so the delta-bitmap
            # python stage and the OR merge run once (see cuckoo._apply)
            self.store.merge_upsert(self.TABLE, merged, key="shard")
        self.count += delta.count()

    def prefilter(
        self, candidates: DataFrame, materialize=None
    ) -> tuple[DataFrame, DataFrame, None]:
        """Split candidates into (definitely_new, maybe_seen) — the
        cogrouped, broadcast-free twin of ``bloom_prefilter``.

        ``materialize(df) -> df`` pins the tagged frame before the split:
        downstream a round consumes BOTH halves plus a bucket-id collect,
        so without pinning the candidate shuffle + shard-bitmap cogroup —
        the expensive stage this class exists to bound — re-executes up
        to 3x per round (ADVICE r3)."""
        from pyspark.sql.types import BooleanType, StructField, StructType

        if not self.store.exists(self.TABLE):
            # no inserts yet -> no bloom evidence: send EVERYTHING to the
            # exact check (claiming definitely-new without a bitmap could
            # re-enqueue a seen URL)
            return candidates.limit(0), candidates, None
        m, k = self.m, self.k
        out_schema = StructType(
            list(candidates.schema.fields) + [StructField("_maybe", BooleanType())]
        )

        def check(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            left = left.drop(columns=["_shard"])
            if left.empty:
                return left.assign(_maybe=pd.Series([], dtype=bool))
            if right.empty:  # shard never inserted into -> definitely new
                return left.assign(_maybe=False)
            bits = np.frombuffer(right["bits"].iloc[0], dtype=np.uint64)
            return left.assign(
                _maybe=_maybe_in_bitmap(left["url_hash"].to_numpy(), bits, m, k)
            )

        tagged = (
            candidates.withColumn("_shard", self._shard_col())
            .groupby("_shard")
            .cogroup(self.store.read(self.TABLE).groupby("shard"))
            .applyInPandas(check, out_schema)
        )
        if materialize is not None:
            tagged = materialize(tagged)
        return (
            tagged.filter(~F.col("_maybe")).drop("_maybe"),
            tagged.filter(F.col("_maybe")).drop("_maybe"),
            None,
        )
