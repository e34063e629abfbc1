"""Misra-Gries heavy hitters: eviction really happens AND the recount
stays exact under it; the guarantee check refuses uncertifiable
(near-uniform) inputs instead of returning a maybe-wrong top-k."""

import pandas as pd
import pytest

from spider_spark.functions.sketch import (
    _mg_merge,
    heavy_hitters_topk,
    misra_gries_candidates,
)


N_TAIL = 512  # distinct tail keys (10..521), 20 copies each
HEAVY = {j: 3000 * (10 - j) for j in range(10)}  # genuinely heavy head


def _skewed(spark, parts=4):
    rows = [(j,) for j, c in HEAVY.items() for _ in range(c)]
    rows += [(j,) for j in range(10, 10 + N_TAIL) for _ in range(20)]
    return spark.createDataFrame(rows, "k long").repartition(parts)


def test_topk_exact_under_forced_eviction(spark):
    df = _skewed(spark)
    capacity = 64  # far below 522 distinct keys -> per-partition eviction
    cand = misra_gries_candidates(df, "k", capacity)
    n_cand = cand.count()
    assert n_cand < 10 + N_TAIL, "no eviction occurred — the test is vacuous"
    got = [(r["k"], r["cnt"]) for r in heavy_hitters_topk(df, "k", 10, capacity).collect()]
    assert got == [(j, HEAVY[j]) for j in range(10)]


def test_candidate_set_is_superset_of_heavy_keys(spark):
    df = _skewed(spark)
    capacity = 64
    n = sum(HEAVY.values()) + N_TAIL * 20
    cand = {r["k"] for r in misra_gries_candidates(df, "k", capacity).collect()}
    heavy = {j for j, c in HEAVY.items() if c > n / (capacity + 1)}
    assert heavy and heavy <= cand


def test_guarantee_refuses_uniform_input(spark):
    # 256 keys x 4 occurrences each: no key clears N/(capacity+1)
    rows = [(j,) for j in range(256) for _ in range(4)]
    df = spark.createDataFrame(rows, "k long")
    with pytest.raises(AssertionError, match="MG guarantee"):
        heavy_hitters_topk(df, "k", 10, capacity=16)


def test_mg_merge_bounds_counters():
    c: dict = {}
    c = _mg_merge(c, pd.Series(list(range(100)) * 3 + [7] * 50), capacity=10)
    assert len(c) <= 10
    assert 7 in c  # the one genuinely heavy key survives
