"""Merge-on-read equality deletes (storage.delete_rows — the Iceberg v2
delete-file analog): O(keys) deletes that never rewrite data members,
applied at read via the sequence rule (a delete suppresses only members
OLDER than itself), materialized and pruned by compaction, invisible to
time-travel reads taken before the delete."""

from __future__ import annotations

import json
import os

import pytest

from spider_spark.storage import TableStore


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path))


def _rows(df):
    return sorted((r["k"], r["val"]) for r in df.collect())


def _mk(spark, lo, hi, tag):
    return spark.createDataFrame(
        [(i, f"{tag}{i}") for i in range(lo, hi)], "k long, val string"
    )


def test_delete_is_mor_and_sequence_scoped(spark, store):
    store.write("t", _mk(spark, 0, 10, "a"))
    store.append("t", _mk(spark, 10, 20, "a"))
    before = store._manifest("t")["members"]
    keys = spark.createDataFrame([(3,), (7,), (15,)], "k long")
    store.delete_rows("t", keys, "k")
    # no data member rewritten: identical member list, bytes untouched
    after = store._manifest("t")
    assert after["members"] == before
    assert len(after["deletes"]) == 1
    got = _rows(store.read("t"))
    assert [k for k, _ in got] == [i for i in range(20) if i not in (3, 7, 15)]

    # sequence rule: re-inserting a deleted key in a NEWER segment is
    # visible again — the old delete does not suppress the new row
    store.append("t", spark.createDataFrame([(7, "b7")], "k long, val string"))
    got = _rows(store.read("t"))
    assert (7, "b7") in got and (7, "a7") not in got
    # and a second delete generation takes it out again
    store.delete_rows("t", spark.createDataFrame([(7,)], "k long"), "k")
    assert all(k != 7 for k, _ in _rows(store.read("t")))


def test_time_travel_and_incremental_guard(spark, store):
    store.write("t", _mk(spark, 0, 10, "a"))
    store.commit_round(1)
    store.delete_rows("t", spark.createDataFrame([(2,)], "k long"), "k")
    store.append("t", _mk(spark, 10, 12, "a"))
    store.commit_round(2)
    # the snapshot taken before the delete still serves row 2
    assert (2, "a2") in _rows(store.read_at("t", round_id=1))
    assert (2, "a2") not in _rows(store.read_at("t", round_id=2))
    # incremental scan across a delete boundary refuses (unsound)
    with pytest.raises(ValueError, match="row-level deletes"):
        store.read_changes("t", since_round=1, until_round=2)


def test_compaction_materializes_and_prunes_deletes(spark, store):
    store.write("t", _mk(spark, 0, 5, "a"))
    for j in range(5, 15):
        store.append("t", _mk(spark, j, j + 1, "a"))
    store.delete_rows("t", spark.createDataFrame([(1,), (12,)], "k long"), "k")
    assert store.compact("t", max_members=4) is not None
    m = store._manifest("t")
    # every member is now newer than the delete -> entry pruned
    assert m["deletes"] == []
    assert [k for k, _ in _rows(store.read("t"))] == [
        i for i in range(15) if i not in (1, 12)
    ]
    # the dead delete segment is reclaimable once old manifests expire
    store.expire_snapshots(keep=1)
    assert [k for k, _ in _rows(store.read("t"))] == [
        i for i in range(15) if i not in (1, 12)
    ]


def test_delete_on_partitioned_table_and_merge_interaction(spark, store):
    df = spark.createDataFrame(
        [(i, "live" if i % 2 else "done", f"a{i}") for i in range(12)],
        "k long, state string, val string",
    )
    store.write("t", df, partition_by=["state"])
    store.delete_rows("t", spark.createDataFrame([(2,), (3,)], "k long"), "k")
    assert {r["k"] for r in store.read("t").collect()} == set(range(12)) - {2, 3}
    # partition-pruned reads apply deletes too
    assert {r["k"] for r in store.read_partitions("t", ["done"]).collect()} == {
        i for i in range(12) if i % 2 == 0 and i != 2
    }
    # a CoW merge of the live slice: deletes stay applied for the kept
    # member, and the rewritten slice has them materialized
    upd = spark.createDataFrame([(5, "live", "b5")], "k long, state string, val string")
    store.merge_upsert("t", upd, key="k", partition_by=["state"],
                       immutable_partitions=["done"])
    got = {r["k"]: r["val"] for r in store.read("t").collect()}
    assert got[5] == "b5" and 2 not in got and 3 not in got
    # the carried delete still guards ONLY the old kept member: a fresh
    # insert of k=2 into the live partition is visible
    store.append("t", spark.createDataFrame(
        [(2, "live", "b2")], "k long, state string, val string"))
    got = {r["k"]: r["val"] for r in store.read("t").collect()}
    assert got[2] == "b2"


def test_delete_guards(spark, store):
    store.write("t", _mk(spark, 0, 5, "a"))
    with pytest.raises(ValueError, match="not a column"):
        store.delete_rows("t", spark.createDataFrame([(1,)], "z long"), "z")
    with pytest.raises(ValueError, match="type"):
        store.delete_rows("t", spark.createDataFrame([(1,)], "k int"), "k")
    store.delete_rows("t", spark.createDataFrame([(1,)], "k long"), "k")
    with pytest.raises(ValueError, match="one equality-delete key"):
        store.delete_rows("t", spark.createDataFrame([("a1",)], "val string"), "val")


def test_dedup_purge_composition(spark, store):
    """The training-corpus purge flow: exact dedup finds loser doc_ids,
    delete_rows removes them with O(keys) I/O (no table rewrite), and
    the surviving corpus is exactly one doc per distinct text."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
    )
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    store.write("corpus", docs.unionByName(copies))
    n_all = store.read("corpus").count()
    losers = (
        store.read("corpus")
        .withColumn("h", F.md5(F.col("text").cast("binary")))
        .withColumn("keep", F.min("doc_id").over(Window.partitionBy("h")))
        .filter(F.col("doc_id") != F.col("keep"))
        .select("doc_id")
    )
    n_losers = losers.count()
    assert n_losers == copies.count()
    members_before = store._manifest("corpus")["members"]
    store.delete_rows("corpus", losers, "doc_id")
    assert store._manifest("corpus")["members"] == members_before  # no rewrite
    kept = store.read("corpus")
    assert kept.count() == n_all - n_losers
    assert kept.select("text").distinct().count() == kept.count()
    assert kept.filter(F.col("doc_id") > 100000).count() == 0  # min-id wins
