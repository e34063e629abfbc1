"""SURVEY.md §5 gates (b)+(c): crawl-order, seen-set, and per-document
span-sequence equality between the Spark engine and the pure-Python
reference-semantics simulator, under the same seed list + politeness
budget."""

from __future__ import annotations

import pytest

from spider_spark import synth
from spider_spark.crawl import Crawler
from spider_spark.refsim import SimConfig, simulate
from spider_spark.round import CrawlConfig

from .conftest import hosts_df_to_dict

N_HOSTS, PAGE_SPACE = 20, 400
ROUNDS = 4


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    cfg = CrawlConfig(
        n_hosts=N_HOSTS,
        page_space=PAGE_SPACE,
        global_cap=None,
        max_retries=2,
        fetch_partitions=4,
        use_bloom=True,
        bloom_shards=4,
        bloom_bits=1 << 16,
    )
    seeds = synth.seed_list(spark, 120, N_HOSTS, PAGE_SPACE)
    hosts = synth.hosts_config(spark, N_HOSTS)
    crawler = Crawler(spark, str(tmp_path_factory.mktemp("crawl")), cfg)
    crawler.bootstrap(seeds, hosts)
    results = crawler.run_rounds(ROUNDS, record_order=True)

    sim = simulate(
        [(r["url"], r["priority"]) for r in seeds.collect()],
        hosts_df_to_dict(hosts),
        SimConfig(n_hosts=N_HOSTS, page_space=PAGE_SPACE, global_cap=None, max_retries=2),
        ROUNDS,
    )
    return crawler, results, sim


def test_crawl_order_parity(crawled):
    _, results, sim = crawled
    assert len(results) == len(sim.crawl_order) == ROUNDS
    for res, sim_batch in zip(results, sim.crawl_order):
        assert res.batch_urls == sim_batch, f"round {res.round_id} order mismatch"


def test_seen_set_parity(crawled):
    crawler, _, sim = crawled
    assert crawler.seen_urls() == sim.seen


def test_span_sequence_parity(crawled):
    """Per-document span-sequence equality on (kind, text, media_ref, order)."""
    crawler, _, sim = crawled
    docs = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in crawler.store.read("documents").collect()
    }
    sim_docs = {
        d: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        for d, spans in sim.docs.items()
    }
    assert docs == sim_docs


def test_frontier_states_parity(crawled):
    crawler, _, sim = crawled
    eng = {
        r["url"]: (r["state"], r["retry_count"])
        for r in crawler.frontier_df().collect()
    }
    ref = {u: (row.state, row.retry_count) for u, row in sim.states.items()}
    assert eng == ref


def test_lineage_accounts_for_all_fetches(crawled):
    crawler, results, _ = crawled
    lineage = crawler.store.read("lineage")
    total = lineage.groupBy().sum("dequeued").collect()[0][0]
    assert total == sum(r.dequeued for r in results)


def test_span_invariant_holds(crawled):
    from spider_spark.parse import span_invariant_violations

    crawler, _, _ = crawled
    assert span_invariant_violations(crawler.store.read("documents")).count() == 0
