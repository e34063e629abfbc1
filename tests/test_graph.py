"""functions/graph.py: deterministic synchronous label propagation —
majority vote, min-label tie-break, sink-node label retention."""

from __future__ import annotations

from spider_spark.functions.graph import label_propagation


def _lp(spark, edges, iters, directed=False):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.node: r.label for r in label_propagation(df, iters, directed).collect()
    }


def test_tied_counts_pick_smallest_label(spark):
    # star 0-(1,2,3): node 0 sees initial labels {1,2,3} once each
    labels = _lp(spark, [(0, 1), (0, 2), (0, 3), (4, 5)], iters=1)
    assert labels[0] == 1
    assert labels[1] == labels[2] == labels[3] == 0
    # isolated pair swaps ids after one round
    assert labels[4] == 5 and labels[5] == 4


def test_majority_beats_smaller_label(spark):
    # parallel edges vote independently: two votes for 5 beat one for 1
    labels = _lp(spark, [(9, 5), (9, 5), (9, 1)], iters=1)
    assert labels[9] == 5


def test_planted_stars_converge_in_two_rounds(spark):
    # the g6 construction at toy size: leaf d >= 10 attaches to hub d%10
    n = 60
    edges = [(d, d % 10) for d in range(10, n)]
    labels = _lp(spark, edges, iters=2)
    for h in range(10):
        assert labels[h] == h
    for d in range(10, n):
        assert labels[d] == 10 + d % 10


def test_directed_sink_keeps_label(spark):
    # directed 0 -> 1: node 1 never receives a vote and must keep its
    # current label instead of vanishing from the result
    labels = _lp(spark, [(0, 1)], iters=3, directed=True)
    assert labels == {0: 1, 1: 1}
