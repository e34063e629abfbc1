"""Orphan-file cleanup (storage.remove_orphans — the Iceberg
remove_orphan_files maintenance analog): never-committed segment bytes
(a crashed writer's debris) are swept; every committed snapshot, staged
append, and time-travel read is untouched; the ``older_than_s`` window
protects in-flight commits."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from spider_spark.storage import TableStore


def _mk(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in range(lo, hi)], "k long, val string"
    )


def _plant_orphan(store, table: str, src_seg: str, orphan_seg: str) -> str:
    """Simulate a crashed append: segment bytes on disk, no manifest."""
    tdir = store._tdir(table)
    shutil.copytree(os.path.join(tdir, src_seg), os.path.join(tdir, orphan_seg))
    return orphan_seg


def test_orphans_swept_and_committed_data_untouched(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    store.write("t", _mk(spark, 0, 50))
    store.append("t", _mk(spark, 50, 100))
    v_mid = store.current_version("t")
    store.append("t", _mk(spark, 100, 150))
    _plant_orphan(store, "t", "seg00000", "seg09999")
    before = sorted(r["k"] for r in store.read("t").collect())
    removed = store.remove_orphans("t")
    assert removed == ["seg09999"]
    assert not os.path.exists(os.path.join(store._tdir("t"), "seg09999"))
    # every committed surface unchanged: current read + time travel
    assert sorted(r["k"] for r in store.read("t").collect()) == before
    assert store.read_at("t", version=v_mid).count() == 100
    # idempotent
    assert store.remove_orphans("t") == []


def test_staged_and_delete_segments_are_not_orphans(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    store.write("t", _mk(spark, 0, 100))
    store.delete_rows("t", spark.createDataFrame([(5,)], "k long"), "k")
    store.stage_append("t", _mk(spark, 100, 110))  # WAP: manifest exists, pointer doesn't move
    assert store.remove_orphans("t") == []
    assert store.read("t").count() == 99  # MoR delete still applies


def test_age_window_protects_inflight_writes(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    store.write("t", _mk(spark, 0, 10))
    _plant_orphan(store, "t", "seg00000", "seg08888")
    # a freshly-written segment could be a commit in flight: kept
    assert store.remove_orphans("t", older_than_s=3600) == []
    assert os.path.exists(os.path.join(store._tdir("t"), "seg08888"))
    assert store.remove_orphans("t") == ["seg08888"]


def test_partitioned_orphan_subdir_swept_referenced_kept(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    df = spark.createDataFrame(
        [(i, "odd" if i % 2 else "even") for i in range(40)], "k long, par string"
    )
    store.write("t", df, partition_by=["par"])
    # plant an orphan partition subdir inside the LIVE segment
    tdir = store._tdir("t")
    shutil.copytree(
        os.path.join(tdir, "seg00000", "par=even"),
        os.path.join(tdir, "seg00000", "par=ghost"),
    )
    removed = store.remove_orphans("t")
    assert removed == ["seg00000/par=ghost"]
    assert sorted(
        r["par"] for r in store.read("t").select("par").distinct().collect()
    ) == ["even", "odd"]
    assert store.read("t").count() == 40
