"""Column-stats file skipping (storage.read_range — the Iceberg
min/max-stats scan-pruning analog): range-clustered appends record each
member's [min, max]; a range read opens only intersecting members, the
exact filter still applies, stats-less members are kept conservatively,
and merge-on-read deletes compose."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark.storage import TableStore


def _mk(spark, lo, hi):
    return spark.createDataFrame([(i, f"v{i}") for i in range(lo, hi)], "k long, val string")


def test_range_scan_prunes_members_and_stays_exact(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    store.write("t", _mk(spark, 0, 100), stats_col="k")
    store.append("t", _mk(spark, 100, 200), stats_col="k")
    store.append("t", _mk(spark, 200, 300), stats_col="k")
    assert [m.get("stats") for m in store._manifest("t")["members"]] == [
        {"k": [0, 99]}, {"k": [100, 199]}, {"k": [200, 299]}
    ]
    # manifest-level pruning: a narrow range touches ONE member
    assert len(store.range_members("t", "k", 150, 160)) == 1
    df = store.read_range("t", "k", 150, 160)
    assert sorted(r["k"] for r in df.collect()) == list(range(150, 161))
    # the skipped segments' files are never opened
    files = df.inputFiles()
    assert files and all("seg00001" in f for f in files)
    # boundary-spanning range opens exactly the two intersecting members
    assert len(store.range_members("t", "k", 99, 100)) == 2
    assert sorted(r["k"] for r in store.read_range("t", "k", 99, 100).collect()) == [99, 100]


def test_statless_members_are_kept_conservatively(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    store.write("t", _mk(spark, 0, 50), stats_col="k")
    store.append("t", _mk(spark, 50, 100))  # no stats on this member
    assert len(store.range_members("t", "k", 10, 20)) == 2  # stats-less kept
    assert sorted(r["k"] for r in store.read_range("t", "k", 10, 20).collect()) == list(
        range(10, 21)
    )
    assert sorted(r["k"] for r in store.read_range("t", "k", 60, 62).collect()) == [60, 61, 62]


def test_stats_on_partitioned_members_and_deletes_compose(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    df = spark.createDataFrame(
        [(i, "odd" if i % 2 else "even", f"v{i}") for i in range(100)],
        "k long, par string, val string",
    )
    store.write("t", df, partition_by=["par"], stats_col="k")
    store.append(
        "t",
        spark.createDataFrame(
            [(i, "odd" if i % 2 else "even", f"v{i}") for i in range(100, 200)],
            "k long, par string, val string",
        ),
        stats_col="k",
    )
    # 4 members (2 segments x 2 partitions), each with its own interval
    ms = store._manifest("t")["members"]
    assert len(ms) == 4 and all("stats" in m for m in ms)
    assert len(store.range_members("t", "k", 0, 99)) == 2
    got = store.read_range("t", "k", 40, 45)
    assert sorted(r["k"] for r in got.collect()) == list(range(40, 46))
    # MoR delete composes with the pruned read
    store.delete_rows("t", spark.createDataFrame([(42,)], "k long"), "k")
    assert sorted(r["k"] for r in store.read_range("t", "k", 40, 45).collect()) == [
        40, 41, 43, 44, 45
    ]
