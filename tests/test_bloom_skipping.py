"""Per-member Bloom file skipping (storage.read_point — the
Iceberg/Parquet column-bloom scan-pruning analog): appends with
``bloom_col`` record a per-member bloom; a point lookup opens only the
members whose bloom can match, the exact equality filter still applies,
bloom-less members are kept conservatively, min/max stats compose, and
merge-on-read deletes compose.  The JVM build hash and the driver probe
hash must agree bit-for-bit — that identity is what every test here
rides on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark.storage import TableStore


def _mk(spark, keys):
    return spark.createDataFrame([(k, f"v{k}") for k in keys], "k string, val string")


def test_point_scan_prunes_members_and_stays_exact(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    store.write("t", _mk(spark, [f"a{i}" for i in range(200)]), bloom_col="k")
    store.append("t", _mk(spark, [f"b{i}" for i in range(200)]), bloom_col="k")
    store.append("t", _mk(spark, [f"c{i}" for i in range(200)]), bloom_col="k")
    ms = store._manifest("t")["members"]
    assert len(ms) == 3 and all("bloom" in m for m in ms)
    # manifest-level pruning: the probe touches ONE member
    assert len(store.point_members("t", "k", "b42")) == 1
    df = store.read_point("t", "k", "b42")
    assert [(r["k"], r["val"]) for r in df.collect()] == [("b42", "vb42")]
    files = df.inputFiles()
    assert files and all("seg00001" in f for f in files)
    # an absent key prunes everything (modulo deterministic FPs: none here)
    assert store.read_point("t", "k", "zz-not-there").count() == 0
    # every present key is found — blooms can never drop a true match
    for probe in ["a0", "a199", "b0", "c123"]:
        assert store.read_point("t", "k", probe).count() == 1


def test_integral_column_and_python_probe_hash_agree(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    df = spark.createDataFrame([(i, f"v{i}") for i in range(500)], "k long, val string")
    store.write("t", df, bloom_col="k")
    bloom = store._manifest("t")["members"][0]["bloom"]["k"]
    # the driver-side probe must accept every key the JVM side inserted
    assert all(store._bloom_hit(bloom, i) for i in range(500))
    assert store.read_point("t", "k", 123).count() == 1


def test_bloomless_members_kept_and_stats_compose(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    df = spark.createDataFrame([(i, f"v{i}") for i in range(100)], "k long, val string")
    store.write("t", df, bloom_col="k", stats_col="k")
    store.append(
        "t",
        spark.createDataFrame([(i, f"v{i}") for i in range(100, 200)], "k long, val string"),
    )  # neither bloom nor stats on this member
    # bloom rejects 150 on member 0; member 1 has no metadata → kept
    assert len(store.point_members("t", "k", 150)) == 1
    assert store.read_point("t", "k", 150).count() == 1
    # stats interval alone prunes a > max probe even where bloom FPs could not
    assert len(store.point_members("t", "k", 10)) == 2  # member 1 conservatively kept
    assert store.read_point("t", "k", 10).count() == 1


def test_partitioned_blooms_and_deletes_compose(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    df = spark.createDataFrame(
        [(i, "odd" if i % 2 else "even", f"v{i}") for i in range(200)],
        "k long, par string, val string",
    )
    store.write("t", df, partition_by=["par"], bloom_col="k")
    ms = store._manifest("t")["members"]
    assert len(ms) == 2 and all("bloom" in m for m in ms)
    # k=7 lives only in the odd partition; the even member's bloom rejects it
    assert len(store.point_members("t", "k", 7)) == 1
    assert [r["val"] for r in store.read_point("t", "k", 7).collect()] == ["v7"]
    store.delete_rows("t", spark.createDataFrame([(7,)], "k long"), "k")
    assert store.read_point("t", "k", 7).count() == 0


def test_unsupported_type_raises_and_null_probe_raises(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    df = spark.createDataFrame([(1.5, "x")], "k double, val string")
    with pytest.raises(ValueError, match="representation-stable"):
        store.write("t", df, bloom_col="k")
    store.write("t2", _mk(spark, ["a"]), bloom_col="k")
    with pytest.raises(ValueError, match="NULL"):
        store.point_members("t2", "k", None)


def test_nulls_in_column_are_skipped_not_inserted(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    df = spark.createDataFrame([("a", "1"), (None, "2"), ("b", "3")], "k string, val string")
    store.write("t", df, bloom_col="k")
    assert store.read_point("t", "k", "a").count() == 1
    # the null row is still in the table (blooms prune scans, not rows)
    assert store.read("t").count() == 3


def test_sizing_cap_and_compaction_conservatism(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    df = spark.range(0, 50000).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("val")
    )
    store.write("t", df, bloom_col="k")
    b = store._manifest("t")["members"][0]["bloom"]["k"]
    assert b["bits"] == 1 << 17  # cap: saturates gracefully, never grows past 16 KB
    for i in range(17):  # push the member group past compact's threshold
        store.append(
            "t",
            spark.createDataFrame([(50000 + i, f"x{i}")], "k long, val string"),
            bloom_col="k",
        )
    assert store.compact("t", max_members=16) is not None
    # the rewritten segment carries NO bloom (conservative, like stats) —
    # but point reads stay exact: bloom-less members are always opened
    ms = store._manifest("t")["members"]
    assert len(ms) == 1 and "bloom" not in ms[0]
    assert store.read_point("t", "k", 42).count() == 1
    assert store.read_point("t", "k", 50016).count() == 1
