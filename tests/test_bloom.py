from __future__ import annotations

import numpy as np

from spider_spark.bloom import ShardedBloom, bloom_prefilter


def test_no_false_negatives_local():
    b = ShardedBloom(n_shards=4, bits_per_shard=1 << 14, n_hashes=5)
    rng = np.random.default_rng(42)
    inserted = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    b.update_local(inserted)
    assert b.maybe_contains(inserted).all(), "Bloom must never miss an inserted key"

    other = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    fresh = other[~np.isin(other, inserted)]
    fp_rate = b.maybe_contains(fresh).mean()
    assert fp_rate < 0.05, f"false-positive rate too high: {fp_rate}"


def test_distributed_build_matches_local(spark):
    vals = list(range(-500, 500))
    df = spark.createDataFrame([(v * 2654435761,) for v in vals], ["url_hash"])
    b1 = ShardedBloom(n_shards=4, bits_per_shard=1 << 12, n_hashes=3)
    b1.update_from_df(spark, df)
    b2 = ShardedBloom(n_shards=4, bits_per_shard=1 << 12, n_hashes=3)
    b2.update_local(np.array([v * 2654435761 for v in vals], dtype=np.int64))
    assert (b1.shards == b2.shards).all()


def test_prefilter_is_only_an_optimization(spark):
    """Crawl results with Bloom == results without (SURVEY.md §7 step 4):
    definite_new ∪ maybe_seen must partition candidates, with every
    truly-seen key in maybe_seen."""
    seen_keys = [(i * 7919,) for i in range(200)]
    cand_keys = [(i * 7919,) for i in range(150, 350)]
    seen = spark.createDataFrame(seen_keys, ["url_hash"])
    cand = spark.createDataFrame(cand_keys, ["url_hash"])

    b = ShardedBloom(n_shards=4, bits_per_shard=1 << 12, n_hashes=3)
    b.update_from_df(spark, seen)

    definite_new, maybe_seen, _bc = bloom_prefilter(spark, cand, b)
    new_with = {
        r["url_hash"]
        for r in definite_new.unionByName(
            maybe_seen.join(seen, "url_hash", "left_anti")
        ).collect()
    }
    new_without = {r["url_hash"] for r in cand.join(seen, "url_hash", "left_anti").collect()}
    assert new_with == new_without


def test_driver_budget_fails_fast():
    """A 10^10-key filter (~17 GiB of bitmaps) must fail at construction
    with the sizing rule, BEFORE any allocation (VERDICT r2 #5)."""
    import time

    import pytest

    t0 = time.monotonic()
    with pytest.raises(ValueError, match="DistributedBloom"):
        ShardedBloom(n_shards=4096, bits_per_shard=1 << 25)
    assert time.monotonic() - t0 < 1.0
    # an explicit budget raise is honored
    b = ShardedBloom(n_shards=4, bits_per_shard=1 << 14,
                     driver_budget_bytes=1 << 20)
    assert b.nbytes <= 1 << 20


def test_distributed_bloom_matches_broadcast(spark, tmp_path):
    """Store-backed cogrouped membership == driver-broadcast membership
    for identical inserts (same hash family, same bit layout)."""
    from spider_spark.bloom import DistributedBloom
    from spider_spark.storage import TableStore

    seen = spark.createDataFrame([(i * 7919,) for i in range(200)], "url_hash long")
    cand = spark.createDataFrame([(i * 7919,) for i in range(150, 350)], "url_hash long")
    sb = ShardedBloom(n_shards=8, bits_per_shard=1 << 12, n_hashes=3)
    sb.update_from_df(spark, seen)
    db = DistributedBloom(spark, TableStore(spark, str(tmp_path)),
                          n_shards=8, bits_per_shard=1 << 12, n_hashes=3)
    db.update_from_df(spark, seen)

    dn_b, ms_b, bc = bloom_prefilter(spark, cand, sb)
    dn_d, ms_d, _ = db.prefilter(cand)
    assert {r["url_hash"] for r in dn_b.collect()} == {r["url_hash"] for r in dn_d.collect()}
    assert {r["url_hash"] for r in ms_b.collect()} == {r["url_hash"] for r in ms_d.collect()}
    if bc is not None:
        bc.destroy()


def test_distributed_bloom_incremental_or_merge(spark, tmp_path):
    """Second update OR-merges into existing shard rows: earlier inserts
    stay present, the shards table keeps one row per touched shard."""
    from spider_spark.bloom import DistributedBloom
    from spider_spark.storage import TableStore

    store = TableStore(spark, str(tmp_path))
    db = DistributedBloom(spark, store, n_shards=8, bits_per_shard=1 << 12, n_hashes=3)
    first = spark.createDataFrame([(i * 104729,) for i in range(100)], "url_hash long")
    second = spark.createDataFrame([(i * 104729,) for i in range(100, 200)], "url_hash long")
    db.update_from_df(spark, first)
    db.update_from_df(spark, second)

    both = first.union(second)
    _dn, ms, _ = db.prefilter(both)
    # no false negatives across the merge: every inserted key reads maybe
    assert ms.count() == 200
    rows = store.read(db.TABLE).collect()
    assert len(rows) == len({r["shard"] for r in rows})  # unique shard rows
