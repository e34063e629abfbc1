"""T6 lost-ID audit sweep + S15 proxy refresh / F9 keyed identity choice."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark import synth
from spider_spark.crawl import Crawler
from spider_spark.round import CrawlConfig

N_HOSTS, PAGE_SPACE = 10, 200


def test_audit_lost_requeues_exactly_the_missing(spark, tmp_path):
    cfg = CrawlConfig(
        n_hosts=N_HOSTS, page_space=PAGE_SPACE, max_retries=2,
        fetch_partitions=4, use_bloom=True, bloom_shards=4, bloom_bits=1 << 14,
    )
    c = Crawler(spark, str(tmp_path), cfg)
    seeds = synth.seed_list(spark, 40, N_HOSTS, PAGE_SPACE)
    hosts = synth.hosts_config(spark, N_HOSTS)
    c.bootstrap(seeds, hosts)
    c.run_rounds(2, expire_keep=10)

    # expected universe: every page id 0..59 on host 0 — some were never
    # discovered by the crawl
    expected = spark.range(60).select(
        F.concat(F.lit("http://h0.example/p"), F.col("id").cast("string")).alias("url")
    )
    seen_before = c.seen_urls()
    manual_lost = {
        f"http://h0.example/p{i}" for i in range(60)
    } - seen_before
    n = c.audit_lost(expected)
    assert n == len(manual_lost)
    # re-enqueued as pending, recorded as seen, and idempotent
    fr = c.frontier_df().filter(F.col("state") == "pending")
    pend = {r["url"] for r in fr.select("url").collect()}
    assert manual_lost <= pend
    assert manual_lost <= c.seen_urls()
    assert c.audit_lost(expected) == 0


def test_probe_and_live_pool_deterministic(spark):
    from spider_spark.proxies import live_proxies, probe_proxies

    addrs = [(f"10.0.0.{i}:8080",) for i in range(30)]
    df = spark.createDataFrame(addrs, ["addr"])
    pool1 = live_proxies(df)
    pool2 = live_proxies(df)
    assert pool1 == pool2
    assert 0 < len(pool1) < 30  # fake prober kills ~1/3
    probed = probe_proxies(df)
    assert probed.count() == 30
    assert probed.filter(F.col("alive")).count() == len(pool1)


def test_keyed_choice_stable_and_covering(spark):
    from spider_spark.proxies import keyed_choice

    uas = ["ua-a", "ua-b", "ua-c"]
    df = spark.range(300).select(F.concat(F.lit("k"), F.col("id")).alias("key"))
    picked = df.select("key", keyed_choice(F.col("key"), uas).alias("ua"))
    again = df.select("key", keyed_choice(F.col("key"), uas).alias("ua"))
    a = {r["key"]: r["ua"] for r in picked.collect()}
    b = {r["key"]: r["ua"] for r in again.collect()}
    assert a == b  # same key -> same identity, across runs
    assert set(a.values()) == set(uas)  # all options actually used
