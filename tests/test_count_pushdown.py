"""Metadata-only COUNT answering (Iceberg count-pushdown analog):
write-time footer counts in the manifest must always agree with a real
scan, and count_rows must REFUSE whenever metadata could lie (pending
merge-on-read deletes, pre-feature members) rather than overstate."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from spider_spark.storage import TableStore


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "store"))


def test_counts_match_scan_partitioned_multi_append(spark, store):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("p")
    )
    for r in (0, 1):
        store.append("t", df.filter(F.col("id") % 2 == r), partition_by=["p"])
    assert store.count_rows("t") == 100
    for v in ("0", "1", "2"):
        real = store.read_partitions("t", [v]).count()
        assert store.count_rows("t", values=[v]) == real
    # restricting to a subset sums only those members
    assert store.count_rows("t", values=["0", "2"]) == store.read_partitions(
        "t", ["0", "2"]
    ).count()


def test_counts_match_scan_unpartitioned(spark, store):
    store.write("u", spark.range(57))
    store.append("u", spark.range(13))
    assert store.count_rows("u") == 70 == store.read("u").count()


def test_refuses_under_pending_mor_deletes_then_compact_restores(spark, store):
    df = spark.range(50).select(F.col("id"), F.lit("x").alias("v"))
    store.write("d", df.filter(F.col("id") < 30))
    store.append("d", df.filter(F.col("id") >= 30))
    store.delete_rows("d", spark.range(10), key="id")
    with pytest.raises(ValueError, match="merge-on-read deletes"):
        store.count_rows("d")
    store.compact("d", max_members=1)
    assert store.count_rows("d") == 40 == store.read("d").count()


def test_refuses_on_pre_feature_members(spark, store):
    store.write("old", spark.range(5))
    # simulate a manifest written before counts existed
    v = store.current_version("old")
    path = os.path.join(store.root, "old", "_manifests", f"{v}.json")
    man = json.load(open(path))
    for m in man["members"]:
        m.pop("rows", None)
    json.dump(man, open(path, "w"))
    with pytest.raises(ValueError, match="without recorded counts"):
        store.count_rows("old")


def test_counts_survive_frontier_style_merge(spark, store):
    """merge carries old members by reference and rewrites a slice —
    both sides must still answer counts exactly."""
    df = spark.range(40).select(
        F.col("id"), F.when(F.col("id") < 20, "pending").otherwise("fetched").alias("state")
    )
    store.write("f", df, partition_by=["state"])
    upd = spark.range(5).select(F.col("id"), F.lit("fetched").alias("state"))
    store.merge_upsert("f", upd, key="id")
    assert store.count_rows("f") == store.read("f").count()
