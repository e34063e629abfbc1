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
