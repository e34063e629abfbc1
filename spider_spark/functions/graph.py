"""Distributed graph primitives beyond connected components.

The dedup module owns the CC fixpoints (functions/dedup.py:
connected_components / connected_components_star); this module holds
the label-quality tier above them — community detection by synchronous
label propagation (Raghavan et al. 2007), the standard cheap community
pass a link-graph pipeline runs between CC and PageRank.

Determinism: classic LPA breaks ties randomly; this form breaks ties by
(count DESC, label ASC), making every iteration a pure function of the
edge set — the property that lets a DuckDB twin state the result
exactly and lets two cluster sizes produce identical labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame, iters: int, directed: bool = False
) -> DataFrame:
    """Synchronous label propagation for ``iters`` rounds over
    ``edges(src, dst)``; returns (node, label).

    Every node starts labeled with its own id; each round, every node
    adopts the most frequent label among its NEIGHBORS (itself excluded
    — a self-vote would freeze singleton labels), ties broken by the
    smallest label.  Undirected by default (each edge votes both ways).

    Scale shape: per round, one (node, label) partial-count aggregation
    (map-side combine bounds hub skew exactly like i1's (term, doc)
    trick) and one per-node window argmax — two key-clustered exchanges
    per round, no driver state.  Labels are localCheckpointed each round
    so the lineage stays O(1) deep instead of O(iters) (the d6/g5
    self-join recompute trap).  A node with no votes this round (directed
    sink) keeps its current label.
    """
    if directed:
        und = edges.select("src", "dst")
    else:
        und = edges.select("src", "dst").unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    und = und.localCheckpoint(eager=True)
    nodes = (
        und.select(F.col("src").alias("node"))
        .unionAll(und.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    pick = Window.partitionBy("node").orderBy(F.desc("n"), F.asc("label"))
    for _ in range(int(iters)):
        votes = (
            und.join(labels, und.dst == labels.node, "inner")
            .select(F.col("src").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count("*").alias("n"))
        )
        picked = (
            votes.withColumn("rk", F.row_number().over(pick))
            .filter(F.col("rk") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(picked, "node", "left")
            .select("node", F.coalesce("new_label", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels
