"""Fetch stage: salted host-hash repartition + mapInPandas fetch+parse.

Reference analog: the gevent fan-out fetch loop
(shixin_spider.py:212-215 spawn ×50; basicRequest share_func.py:103-171).
Differences by design:
- retries are NOT in-task recursion: a failed fetch is DATA (an err_type
  row) that the frontier state machine re-schedules (SURVEY.md §4.1) —
  Spark task retries stay reserved for real task failures.
- per-partition session bootstrap replaces the per-group cookie jar
  (shixin_spider.py:190-216): one session object per partition per round,
  created inside the iterator (T5).

Skew: the reference hand-tunes thread counts per source; we kill
hot-host skew generically with a salted repartition on
``(host, pmod(xxhash64(url), salt))`` — every host spreads over at most
``salt`` partitions, and since the per-host politeness cap was already
applied at dequeue, correctness is unaffected (SURVEY.md §4.3.1).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import simnet
from .schemas import FETCH_RESULT

_PASSTHROUGH = [
    "url",
    "url_hash",
    "host",
    "priority",
    "depth",
    "retry_count",
    "discovered_round",
]


def salted_repartition(batch: DataFrame, num_partitions: int, salt: int) -> DataFrame:
    return batch.repartition(
        num_partitions, F.col("host"), F.pmod(F.xxhash64(F.col("url")), F.lit(salt))
    )


def make_fetch_fn(n_hosts: int, page_space: int):
    """mapInPandas fetch+parse against the deterministic simnet.

    Hot fields (status/err_type) are numpy-vectorized; span bodies are
    materialized per ok-row (nested output — the genuinely non-columnar
    part, same shape real HTML parsing would have)."""

    def fetch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        session = None  # per-partition session (cookie-jar analog, T5)
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        for pdf in batches:
            if session is None:
                session = {"partition": pid, "fetches": 0}
            h, p = simnet.parse_url_np(pdf["url"])
            k = simnet.page_key(h, p)
            status = simnet.status_of_key_np(k)
            err = np.zeros(len(pdf), dtype=np.int32)
            err[status == 529] = simnet.ERR_REQUEST
            err[status == 408] = simnet.ERR_TIMEOUT
            err[status == 404] = simnet.ERR_UNKNOWN
            session["fetches"] += len(pdf)
            out = pdf[_PASSTHROUGH].copy()
            out["partition_id"] = np.int32(pid)
            out["status"] = status
            out["err_type"] = err
            ok = err == 0
            out["doc_id"] = np.where(ok, "doc:" + pdf["url"].astype(str), None)
            spans = [
                simnet.spans_of(int(hi), int(pi), n_hosts, page_space) if okk else None
                for hi, pi, okk in zip(h, p, ok)
            ]
            out["spans"] = spans
            yield out[[f.name for f in FETCH_RESULT.fields]]

    return fetch_fn


def fetch_batch(
    batch: DataFrame,
    n_hosts: int,
    page_space: int,
    num_partitions: int = 32,
    salt: int = 8,
) -> DataFrame:
    salted = salted_repartition(batch.select(*_PASSTHROUGH), num_partitions, salt)
    return salted.mapInPandas(make_fetch_fn(n_hosts, page_space), FETCH_RESULT)
