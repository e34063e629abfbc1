"""functions/graph.k_core — synchronized peeling to the certified
fixpoint: hand-checkable cores, multi-round cascades, empty cores, and
the convergence bound that raises instead of truncating."""

from __future__ import annotations

import pytest

from spider_spark.functions.graph import k_core


def _run(spark, edges, k, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["deg"] for r in k_core(df, k, **kw).collect()}


def test_k4_survives_pendant_cascade_peels(spark):
    # K4 on {0,1,2,3}; pendant cascade 4-(0,1,5), 5-(4,6), 6-(5):
    # round 1 removes 6 (deg 1) and 5 (deg 2), round 2 removes 4
    # (deg 3 -> 2 after 5 left), round 3 is the certifying no-op
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    pendant = [(4, 0), (4, 1), (4, 5), (5, 6)]
    assert _run(spark, k4 + pendant, 3) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_direction_and_duplicate_edges_are_normalized(spark):
    # same K4 written with reversed and repeated edges — degree must
    # mean distinct undirected neighbors
    e = [(1, 0), (0, 1), (2, 0), (0, 3), (2, 1), (3, 1), (3, 2), (2, 3)]
    assert _run(spark, e, 3) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_empty_core(spark):
    # k=3 on a path: everything peels, the fixpoint is the empty graph
    assert _run(spark, [(0, 1), (1, 2), (2, 3)], 3) == {}


def test_convergence_bound_raises(spark):
    # path of 7 with k=2 peels one layer per round from both ends
    # (3 removal rounds + the no-op) — a 2-round bound must refuse
    path = [(i, i + 1) for i in range(6)]
    with pytest.raises(RuntimeError, match="fixpoint"):
        _run(spark, path, 2, max_rounds=2)
    # with an adequate bound the 2-core of a path is empty
    assert _run(spark, path, 2, max_rounds=6) == {}
