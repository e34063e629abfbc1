#!/usr/bin/env python
"""Bench harness (driver contract): prints ONE JSON line.

Headline metric: URLs scheduled+deduped per second — one full scheduling
wave over a synthetic frontier (dequeue window-rank with per-host caps →
salted repartition → mapInPandas fetch+parse → link extraction →
canonicalize+hash → exact seen-set anti-join), measured end-to-end,
no storage writes.  This is the BASELINE.md target operation.

Scaling evidence (north rule, sandbox form): the same job runs at
local[N_SMALL] and local[N_BIG] on identical input; efficiency =
(thr_big / thr_small) / (big / small).  Skippable with
SPARK_GRAFT_SCALING=0 for quick runs.

Also times the headline catalog queries at $SPARK_GRAFT_SF_DIR.

Env knobs:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     (default 32)
  SPARK_GRAFT_FRONTIER (default 1_000_000 rows)
  SPARK_GRAFT_SCALING  (default 1; 0 skips the two-level scaling run)
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_spark(cores: int):
    from spider_spark.session import get_spark

    return get_spark(
        app_name=f"spider_spark_bench_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )


def frontier_wave(spark, n_rows: int, cores: int, n_hosts: int = 1000) -> dict:
    """One scheduling wave; returns urls/sec and component counts."""
    from pyspark.sql import functions as F

    from spider_spark import canon, synth
    from spider_spark.fetch import fetch_batch
    from spider_spark.frontier import dequeue
    from spider_spark.politeness import eligible_hosts, robots_allowed

    page_space = max(10_000, n_rows)
    seeds = synth.seed_list(spark, n_rows, n_hosts, page_space, hot_frac=0.3)
    frontier = seeds.select(
        "url",
        F.xxhash64("url").alias("url_hash"),
        F.regexp_extract("url", r"^http://([^/]+)/", 1).alias("host"),
        "priority",
        F.lit(0).alias("depth"),
        F.lit("pending").alias("state"),
        F.lit(0).alias("retry_count"),
        F.lit(0).cast("long").alias("next_fetch_time"),
        F.lit(0).cast("long").alias("discovered_round"),
    )
    hosts = synth.hosts_config(spark, n_hosts, uniform_delay=0, uniform_cap=2000)
    frontier = frontier.persist()
    seen = frontier.select("url_hash").persist()
    # materialize inputs before the clock starts
    n_frontier = frontier.count()
    seen.count()

    t0 = time.monotonic()
    batch = dequeue(frontier, eligible_hosts(hosts, None, 1), 1, global_cap=None)
    results = fetch_batch(batch, n_hosts, page_space, num_partitions=cores * 2, salt=8).persist()
    ok = results.filter(F.col("err_type") == 0)
    links = (
        ok.select(F.explode("spans").alias("s"), "depth")
        .filter(F.col("s.kind") == "link")
        .select(F.col("s.text").alias("link"), (F.col("depth") + 1).alias("depth"))
    )
    cand = (
        links.select(canon.canonicalize_udf(F.col("link")).alias("url"), "depth")
        .groupBy("url")
        .agg(F.min("depth").alias("depth"))
        .select("url", canon.url_hash_col(F.col("url")).alias("url_hash"), "depth")
    ).persist()
    new = cand.join(seen, "url_hash", "left_anti")
    agg = results.groupBy().count().collect()[0][0]
    counts = cand.groupBy().count().collect()[0][0]
    n_new = new.groupBy().count().collect()[0][0]
    wall = time.monotonic() - t0

    results.unpersist()
    cand.unpersist()
    frontier.unpersist()
    seen.unpersist()
    processed = int(agg + counts)
    return {
        "frontier_rows": int(n_frontier),
        "dequeued": int(agg),
        "candidates": int(counts),
        "new_urls": int(n_new),
        "wall_sec": round(wall, 3),
        "urls_per_sec": round(processed / wall, 1),
        "urls_per_sec_per_core": round(processed / wall / cores, 1),
    }


HEADLINE_QUERIES = [
    "a5_group_stats",
    "j2_fk_join",
    "j1_broadcast_enrich",
    "w1_ranked_dequeue",
    "w6_sessionize",
    "d1_exact_dedup",
    "t1_token_count",
    "s1_cosine_topk",
    "c1_crawl_frontier_dequeue",
]


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    from spider_spark.catalog import QUERIES

    # warmup: spin python workers + parquet footer caches
    QUERIES["a5_group_stats"](spark, sf_dir).count()
    out = {}
    for name in HEADLINE_QUERIES:
        t0 = time.monotonic()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.monotonic() - t0, 3)
        log(f"  query {name}: {out[name]}s")
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_frontier = int(os.environ.get("SPARK_GRAFT_FRONTIER", "1000000"))
    do_scaling = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = make_spark(cpus)
    log(f"bench: frontier wave at local[{cpus}], {n_frontier} rows")
    wave = frontier_wave(spark, n_frontier, cpus)
    log(f"  {wave}")
    log(f"bench: catalog queries at {sf_dir}")
    queries = run_queries(spark, sf_dir)
    spark.stop()

    scaling = None
    if do_scaling:
        small, big = max(2, cpus // 4), cpus
        thr = {}
        for c in (small, big):
            s = make_spark(c)
            log(f"bench: scaling run local[{c}]")
            w = frontier_wave(s, n_frontier, c)
            thr[c] = w["urls_per_sec"]
            log(f"  local[{c}]: {w['urls_per_sec']} urls/s ({w['wall_sec']}s)")
            s.stop()
        eff = (thr[big] / thr[small]) / (big / small)
        scaling = {
            "cores_small": small,
            "cores_big": big,
            "urls_per_sec_small": thr[small],
            "urls_per_sec_big": thr[big],
            "efficiency": round(eff, 3),
        }

    result = {
        "metric": "urls_scheduled_deduped_per_sec",
        "value": wave["urls_per_sec"],
        "unit": "urls/sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "frontier": wave,
        "scaling": scaling,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
