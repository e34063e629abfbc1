"""Cuckoo seen-filter gates: no false negatives, bounded false
positives, deletion works, deterministic, and the prefilter split is
safe (a URL is never dropped on filter evidence alone)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from spider_spark.cuckoo import ShardedCuckoo, cuckoo_prefilter


def _hashes(seed: int, n: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(-(2**62), 2**62, size=n, dtype=np.int64)


def test_no_false_negatives_and_bounded_fp():
    c = ShardedCuckoo(n_buckets=1 << 14)  # 65536 slots
    inserted = _hashes(1, 20_000)  # ~30% load
    c.update_local(inserted)
    assert c.dropped == 0
    assert c.maybe_contains(inserted).all(), "cuckoo must never forget an inserted key"
    others = _hashes(2, 20_000)
    fp_rate = c.maybe_contains(others).mean()
    # 16-bit fingerprints, 2 buckets x 4 slots: fp ~ 8/2^16 ~ 0.00012
    assert fp_rate < 0.01, f"false-positive rate too high: {fp_rate}"


def test_delete_restores_negatives():
    c = ShardedCuckoo(n_buckets=1 << 12)
    keys = _hashes(3, 2_000)
    c.update_local(keys)
    victims = keys[:500]
    removed = c.delete_local(victims)
    assert removed == 500
    # deleted keys may still collide with survivors' fingerprints, but the
    # overwhelming majority must now read "definitely new"
    assert c.maybe_contains(victims).mean() < 0.05
    # survivors are all still present
    assert c.maybe_contains(keys[500:]).all()


def test_deterministic_table():
    a, b = ShardedCuckoo(1 << 12), ShardedCuckoo(1 << 12)
    keys = _hashes(4, 5_000)
    a.update_local(keys)
    b.update_local(keys)
    assert (a.table == b.table).all()


def test_saturated_filter_fails_safe():
    c = ShardedCuckoo(n_buckets=1 << 4, max_kicks=8)  # 64 slots, tiny
    c.update_local(_hashes(5, 500))  # way past capacity
    assert c.dropped > 0
    # fail-safe: everything reads "maybe" -> exact check catches it
    assert c.maybe_contains(_hashes(6, 100)).all()


def test_cuckoo_prefilter_split(spark):
    c = ShardedCuckoo(1 << 14)
    seen_keys = _hashes(7, 1_000)
    c.update_local(seen_keys)
    new_keys = _hashes(8, 1_000)
    rows = [(int(k),) for k in np.concatenate([seen_keys, new_keys])]
    cand = spark.createDataFrame(rows, "url_hash long")
    definite_new, maybe_seen, bc = cuckoo_prefilter(spark, cand, c)
    n_new = definite_new.count()
    n_maybe = maybe_seen.count()
    assert n_new + n_maybe == 2_000
    # every truly-seen key is in maybe_seen (no URL dropped on filter evidence)
    maybe = {r["url_hash"] for r in maybe_seen.collect()}
    assert set(int(k) for k in seen_keys) <= maybe
    assert n_new > 900  # most new keys skip the exact check
    if bc is not None:
        bc.destroy()


def test_crawl_identical_under_any_seen_filter(spark, tmp_path):
    """The seen-prefilter (none / bloom / cuckoo / bloom-dist) is an
    optimization only: final seen set and frontier states must be
    IDENTICAL across all of them (the invariant that makes false
    positives harmless)."""
    from spider_spark import synth
    from spider_spark.crawl import Crawler
    from spider_spark.round import CrawlConfig

    n_hosts, page_space = 10, 200
    outs = {}
    for kind, use in (
        ("none", False), ("bloom", True), ("cuckoo", True), ("bloom-dist", True),
        ("cuckoo-dist", True),
    ):
        cfg = CrawlConfig(
            n_hosts=n_hosts, page_space=page_space, max_retries=2,
            fetch_partitions=4, use_bloom=use, bloom_shards=4,
            bloom_bits=1 << 14, filter_kind=kind if use else "bloom",
            cuckoo_buckets=1 << 12,
        )
        c = Crawler(spark, str(tmp_path / kind), cfg)
        c.bootstrap(
            synth.seed_list(spark, 40, n_hosts, page_space),
            synth.hosts_config(spark, n_hosts),
        )
        c.run_rounds(2, expire_keep=10)
        outs[kind] = (
            c.seen_urls(),
            {(r["url"], r["state"]) for r in c.frontier_df().collect()},
        )
    assert (
        outs["none"] == outs["bloom"] == outs["cuckoo"]
        == outs["bloom-dist"] == outs["cuckoo-dist"]
    )


def test_distributed_cuckoo_matches_local_and_deletes(spark, tmp_path):
    """DistributedCuckoo: (a) prefilter split keeps every truly-seen key
    in maybe_seen and passes most new keys; (b) delete_from_df removes
    fingerprints per-shard WITHOUT a rebuild (the property bloom lacks);
    (c) the shard table is the filter's only state (store-resident)."""
    import os

    from spider_spark.cuckoo import DistributedCuckoo
    from spider_spark.storage import TableStore

    store = TableStore(spark, str(tmp_path))
    dc = DistributedCuckoo(spark, store, n_shards=8, buckets_per_shard=1 << 11)
    seen_keys = _hashes(7, 1_000)
    dc.update_from_df(
        spark, spark.createDataFrame([(int(k),) for k in seen_keys], "url_hash long")
    )
    new_keys = _hashes(8, 1_000)
    cand = spark.createDataFrame(
        [(int(k),) for k in np.concatenate([seen_keys, new_keys])], "url_hash long"
    )
    definite_new, maybe_seen, _ = dc.prefilter(cand)
    maybe = {r["url_hash"] for r in maybe_seen.collect()}
    assert set(int(k) for k in seen_keys) <= maybe, "no URL dropped on filter evidence"
    assert definite_new.count() > 900, "most new keys must skip the exact check"

    # delete half the seen keys: they become (mostly) definitely-new again,
    # survivors keep reading maybe
    victims, survivors = seen_keys[:500], seen_keys[500:]
    dc.delete_from_df(
        spark.createDataFrame([(int(k),) for k in victims], "url_hash long")
    )
    d2, m2, _ = dc.prefilter(cand)
    maybe2 = {r["url_hash"] for r in m2.collect()}
    assert set(int(k) for k in survivors) <= maybe2, "delete must not evict survivors"
    victims_still_maybe = len(set(int(k) for k in victims) & maybe2)
    assert victims_still_maybe < 100, (
        f"deleted keys should mostly read new again ({victims_still_maybe} still maybe)"
    )
    # state lives in the store table, not the driver
    assert store.exists(DistributedCuckoo.TABLE)
    seg_files = []
    for root, _d, files in os.walk(str(tmp_path / DistributedCuckoo.TABLE)):
        seg_files += [f for f in files if f.endswith(".parquet")]
    assert seg_files, "shard bitmaps must be parquet members"
