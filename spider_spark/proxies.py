"""Proxy-pool refresh job (S15) + keyed-deterministic identity rotation (F9).

Reference: proxy_spider.py:15-66 scrapes a proxy list page, probes each
candidate concurrently (gevent), and keeps the live ones for the fetch
layer; share_func.py:89-100 picks a UA/IP per request key.

Spark shape: the proxy list is a SMALL config DataFrame — the job is a
config-refresh pattern, not a data pipeline.  Probe fan-out runs as one
``mapInPandas`` pass (the probe is I/O-bound; one python stage, no
chaining), the surviving rows are collected once and broadcast, and the
per-request choice is a pure JVM expression keyed on ``xxhash64`` so the
same request key always rides the same proxy/UA (session-affinity
friendly, reproducible in tests — the reference's random.choice is
neither).

The real network probe cannot run in this sandbox; the default prober is
a deterministic hash-based fake with the same signature (vector of
addresses in, boolean liveness out).  Swapping in a requests/socket
probe changes ONE function.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def default_prober(addrs: pd.Series) -> np.ndarray:
    """Deterministic fake probe: ~2/3 of addresses are 'live'.  Stands in
    for the reference's telnetlib/requests check (proxy_spider.py:37-52).
    crc32, not Python hash(): hash() is salted per process and executors
    would disagree."""
    import zlib

    h = np.array(
        [zlib.crc32(str(a).encode("utf-8")) for a in addrs.astype(str)], dtype=np.uint64
    )
    mixed = (h * np.uint64(0x9E3779B9)) >> np.uint64(16)
    return (mixed % np.uint64(3)) != 0


def probe_proxies(
    proxies: DataFrame,
    addr_col: str = "addr",
    prober: Callable[[pd.Series], np.ndarray] | None = None,
    parallelism: int = 8,
) -> DataFrame:
    """(addr, alive) — one mapInPandas probe pass over the candidate list."""
    probe = prober or default_prober

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[[addr_col]].copy()
            out["alive"] = probe(pdf[addr_col])
            yield out

    return proxies.select(addr_col).repartition(parallelism).mapInPandas(
        run, f"{addr_col} string, alive boolean"
    )


def live_proxies(
    proxies: DataFrame,
    addr_col: str = "addr",
    prober: Callable[[pd.Series], np.ndarray] | None = None,
) -> list[str]:
    """The refreshed pool: probe, keep live, collect sorted (the list is
    config-sized — collecting it is the point; it gets broadcast into
    the fetch stage)."""
    alive = probe_proxies(proxies, addr_col, prober).filter(F.col("alive"))
    return sorted(r[addr_col] for r in alive.select(addr_col).collect())


def keyed_choice(key: Column, options: list[str]) -> Column:
    """F9 (share_func.py:89-100): deterministic element choice keyed on a
    column — same key, same UA/proxy, every time; pure JVM
    (xxhash64 + pmod + element_at, codegen'd)."""
    if not options:
        raise ValueError("options must be non-empty")
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(F.xxhash64(key), F.lit(len(options))) + 1).cast("int"))
