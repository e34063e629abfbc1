"""One crawl round == one DataFrame job (SURVEY.md §3.4).

dequeue (W1) → politeness gates (T2/T3) → salted repartition → fetch+parse
(mapInPandas) → documents append → link extraction → canonicalize →
Bloom prefilter + exact seen anti-join (J5) → MERGE-back (frontier /
seen / host_state / documents) → per-partition lineage rows (T1).

The driver only sequences rounds; every data-touching step is a
DataFrame op.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import bloom as bloom_mod
from . import canon, fetch, frontier, parse, politeness
from .schemas import FRONTIER, LINEAGE


@dataclass
class CrawlConfig:
    n_hosts: int = 50
    page_space: int = 1000
    global_cap: int | None = None       # None -> per-host caps bound the batch
    max_retries: int = 3
    fetch_partitions: int = 8
    salt: int = 8
    use_bloom: bool = True
    bloom_shards: int = 16
    bloom_bits: int = 1 << 20
    # seen-prefilter structure: "bloom" (OR-mergeable deltas — the scale
    # default) or "cuckoo" (deletable, syncs with S9 delete-resolved)
    filter_kind: str = "bloom"
    cuckoo_buckets: int = 1 << 18
    # capacity for the STORE-BACKED cuckoo ("cuckoo-dist"): total buckets
    # across shards.  Sized like bloom_bits — for the key budget, not the
    # driver heap (the dist form exists to be big).  A cuckoo past ~85%
    # fill thrashes its kicking loop and saturated shards fail safe to
    # "maybe"-everything, gutting the prefilter (measured r5: 1<<18 hit
    # 95.6% fill + 4.1k drops on a 1M-key round wave).  1<<21 buckets =
    # 8.4M slots / 16.8 MB — the bloom-dist footprint, 12% load at 1M.
    cuckoo_dist_buckets: int = 1 << 21
    # link canonicalization happens inside the fetch stage (fetch.py) —
    # kept as a flag only to document the contract
    canonicalize_links: bool = True
    # S14 raw-body retention: keep the response HTML on each document row
    # so parsers can re-run over old crawls (credit_person_web.py:234-249)
    keep_raw_body: bool = False
    # S2 proxy rotation: refreshed pool (proxies.live_proxies output);
    # each fetch partition's session pins one proxy — deterministic
    # affinity (T5), replayable unlike the reference's random.choice
    proxies: list[str] | None = None
    # S13 media sink: persist one row per discovered media_ref (the
    # saveImage/file-sink analog, share_func.py:224-249) with dup-key
    # skip — first sighting wins, like the reference's unique-key insert
    write_media_table: bool = False
    # seen/media tables are bucketed by pmod(hash, N) so the per-round
    # exact dedup anti-joins read only candidate buckets (manifest-level
    # pruning) instead of the whole ever-grown key set; 0 disables.
    # At 10^10 URLs size so one bucket's parquet fits an executor scan
    # (e.g. 4096 buckets ≈ 2.4M keys/bucket).
    seen_buckets: int = 16
    media_buckets: int = 16
    # two-phase hot-host dequeue rank (frontier.dequeue rank_salt): the
    # per-host rank window alone sorts a viral host's whole pending set
    # in ONE task at 10^10 rows; S > 1 pre-ranks per (host, salt-slice)
    # keeping ≤ cap rows/slice, then exact-ranks the ≤ S·cap survivors.
    # Results-identical (parity-gated); None/1 keeps the single window.
    rank_salt: int | None = None
    # pluggable transport (S1-real / S3): a mapInPandas fetcher built by
    # transport.make_http_fetch_fn / make_browser_fetch_fn replaces the
    # simnet default for the WHOLE crawl — same flat schema, so every
    # downstream stage (span assembly, dedup, MERGE-back, resume) is
    # unchanged.  Parity gates (refsim) only apply to the simnet default.
    fetch_fn: object = None
    extra: dict = field(default_factory=dict)


@dataclass
class RoundResult:
    round_id: int
    dequeued: int
    fetched_ok: int
    errors: int
    new_urls: int
    dup_urls: int
    wall_ms: int
    batch_urls: list[str] | None = None  # crawl-order parity (tests only)


def run_round(
    spark: SparkSession,
    cfg: CrawlConfig,
    round_id: int,
    frontier_df: DataFrame,
    seen_df: DataFrame,
    hosts_df: DataFrame,
    host_state_df: DataFrame | None,
    bloom: bloom_mod.ShardedBloom | None,
    record_order: bool = False,
    materialize=None,
    seen_reader=None,
) -> tuple[RoundResult, dict[str, DataFrame]]:
    """Pure-transform round: takes current table DataFrames, returns the
    round result + the updated DataFrames (caller persists via storage).

    ``seen_reader(bucket_values) -> DataFrame``, when provided, returns
    the seen slice restricted to those pmod(url_hash, cfg.seen_buckets)
    buckets (storage.read_partitions) — the exact anti-join then opens
    only the buckets its candidates hash into.  Without it, ``seen_df``
    is scanned whole (correct, just O(all-ever-seen) per round).

    ``materialize(name, df) -> DataFrame`` pins an intermediate for reuse
    across the round's several consumers.  The Crawler passes a
    store-backed version (write parquet snapshot, read back — what Iceberg
    MERGE pays anyway); the default is ``.cache()``, which is fine for
    small tests but thrashes the JVM allocator on wide nested rows at
    high core counts (measured: in-memory columnar caching of the fetch
    results was 5-10x slower than a parquet round-trip at local[32])."""
    t0 = time.monotonic()
    if materialize is None:
        materialize = lambda name, df: df.cache()  # noqa: E731
    round_pins: list[DataFrame] = []  # extra intermediates to unpersist

    elig = politeness.eligible_hosts(hosts_df, host_state_df, round_id)
    batch = frontier.dequeue(
        frontier_df, elig, round_id, cfg.global_cap, hosts_df=hosts_df,
        rank_salt=cfg.rank_salt,
    )

    results = materialize(
        "_round_results",
        fetch.fetch_batch(
            batch, cfg.n_hosts, cfg.page_space, cfg.fetch_partitions, cfg.salt,
            keep_body=cfg.keep_raw_body, proxies=cfg.proxies,
            fetch_fn=cfg.fetch_fn,
        ),
    )

    # ---- documents (interleaved spans) for ok fetches
    ok = results.filter(F.col("err_type") == 0)
    doc_cols = ["doc_id", "spans", "url", "host"] + (
        ["body"] if cfg.keep_raw_body else []
    )
    docs = ok.select(
        *doc_cols, F.lit(round_id).cast("long").alias("fetch_round")
    )

    # ---- media refs (S13): one row per media span, first-seen metadata
    media_delta = None
    if cfg.write_media_table:
        media_delta = (
            ok.select(F.explode("spans").alias("s"), "url")
            .filter(F.col("s.kind") == "media")
            .groupBy(F.col("s.media_ref").alias("media_ref"))
            .agg(
                F.min("url").alias("source_url"),
                F.lit(round_id).cast("long").alias("first_seen_round"),
            )
        )
        if cfg.media_buckets:
            media_delta = media_delta.withColumn(
                "media_bucket",
                canon.bucket_col(F.xxhash64("media_ref"), cfg.media_buckets),
            )

    # ---- link extraction -> robots -> dedup vs seen.  Links come out of
    # the fetch stage ALREADY canonical (canon.canonicalize_series runs
    # inside the fetch worker): one python stage per pipeline — chaining a
    # second pandas UDF here would double the python workers per task and
    # oversubscribe the executor (measured 10x slowdown at 32 cores).
    links = parse.extract_links(ok.select("url", "depth", "spans"))
    cand = (
        links.select(F.col("link").alias("url"), (F.col("depth") + 1).alias("depth"))
        .groupBy("url")
        .agg(F.min("depth").cast("int").alias("depth"))
        .select(
            "url",
            canon.url_hash_col(F.col("url")).alias("url_hash"),
            canon.host_col(F.col("url")).alias("host"),
            "depth",
        )
    )
    cand = politeness.robots_allowed(cand, hosts_df).cache()
    n_cand = cand.count()

    from .cuckoo import DistributedCuckoo, ShardedCuckoo, cuckoo_prefilter

    if isinstance(bloom, ShardedCuckoo):
        definite_new, maybe_seen, bloom_bc = cuckoo_prefilter(spark, cand, bloom)
    elif isinstance(bloom, (bloom_mod.DistributedBloom, DistributedCuckoo)):
        # pin the tagged frame: both halves + the bucket-id collect below
        # consume it, and the shard cogroup must run ONCE per round
        def _pin_tagged(df):
            df = materialize("_bloom_tagged", df)
            round_pins.append(df)
            return df

        definite_new, maybe_seen, bloom_bc = bloom.prefilter(cand, materialize=_pin_tagged)
    else:
        definite_new, maybe_seen, bloom_bc = bloom_mod.bloom_prefilter(spark, cand, bloom)
    if seen_reader is not None and cfg.seen_buckets:
        # bucket-pruned exact check: collect the candidate buckets (a
        # bounded-size distinct over the post-Bloom survivors, reading
        # only the cached cand) and open just those seen members.
        # Correctness is unchanged — a bucket with no candidate hash
        # cannot produce an anti-join match.
        cand_buckets = [
            r["b"]
            for r in maybe_seen.select(
                canon.bucket_col(F.col("url_hash"), cfg.seen_buckets).alias("b")
            )
            .distinct()
            .collect()
        ]
        seen_scan = seen_reader(cand_buckets)
    else:
        seen_scan = seen_df
    checked_new = maybe_seen.join(seen_scan.select("url_hash"), "url_hash", "left_anti")
    new_links = definite_new.unionByName(checked_new).cache()

    # ---- MERGE-able outputs
    updates = frontier.state_updates(results, round_id, cfg.max_retries)
    new_rows = frontier.new_frontier_rows(new_links, round_id)
    frontier_updates = updates.unionByName(new_rows).select([f.name for f in FRONTIER.fields])
    seen_delta = new_links.select("url_hash", "url")
    if cfg.seen_buckets:
        seen_delta = seen_delta.withColumn(
            "seen_bucket", canon.bucket_col(F.col("url_hash"), cfg.seen_buckets)
        )
    host_updates = politeness.quarantine_updates(results, round_id)

    # ---- metrics (A1/A5 analog: per-batch valid/invalid counts ->
    # per-partition lineage rows)
    lineage = (
        results.groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("dequeued"),
            F.sum((F.col("err_type") == 0).cast("long")).alias("fetched_ok"),
            F.sum((F.col("err_type") > 0).cast("long")).alias("errors"),
        )
        .select(
            F.lit(round_id).cast("long").alias("round_id"),
            "partition_id",
            "dequeued",
            "fetched_ok",
            "errors",
            F.lit(None).cast("long").alias("new_urls"),
            F.lit(None).cast("long").alias("dup_urls"),
            F.lit(None).cast("long").alias("wall_ms"),
        )
    )

    # ONE driver action covers both the lineage sink and the round
    # metrics: the per-partition rows are tiny (<= fetch partitions), so
    # collect them, sum in python, and hand the store a local-relation
    # DataFrame — no second results.agg job (VERDICT r1 #8).
    lineage_rows = lineage.collect()
    n_deq = sum(r["dequeued"] for r in lineage_rows)
    n_ok = sum(r["fetched_ok"] for r in lineage_rows)
    lineage = spark.createDataFrame(lineage_rows, LINEAGE)
    n_new = new_links.count()
    batch_urls = None
    if record_order:
        batch_urls = [
            r["url"]
            for r in batch.orderBy(*[F.col(c) for c in frontier.ORDER_COLS]).select("url").collect()
        ]

    res = RoundResult(
        round_id=round_id,
        dequeued=int(n_deq),
        fetched_ok=int(n_ok),
        errors=int(n_deq - n_ok),
        new_urls=int(n_new),
        dup_urls=int(n_cand - n_new),
        wall_ms=int((time.monotonic() - t0) * 1000),
        batch_urls=batch_urls,
    )
    out = {
        "frontier_updates": frontier_updates,
        "new_links": new_links,
        "seen_delta": seen_delta,
        "documents": docs,
        "media_delta": media_delta,
        "host_updates": host_updates,
        "lineage": lineage,
        "_cached": [cand, new_links] + round_pins,
        # round-scoped broadcasts: destroyed by the caller once the
        # round's actions complete (never-destroyed per-round broadcasts
        # leak driver+executor memory over a long crawl)
        "_broadcasts": [b for b in [bloom_bc] if b is not None],
    }
    return res, out
