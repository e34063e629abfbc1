"""Partition-spec evolution (storage.evolve_partition_spec): a
metadata-only unpartitioned -> partitioned commit.  Old members scan
with a residual filter, new members prune, compact migrates the old
group to the new spec, and metadata counts refuse rather than lie."""

from __future__ import annotations

import pytest

from spider_spark.storage import TableStore


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "store"))


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id", "CASE WHEN id % 3 = 0 THEN 'en' WHEN id % 3 = 1 THEN 'de' ELSE 'fr' END AS lang"
    )


def _ids(df):
    return sorted(r.id for r in df.collect())


def test_evolution_is_metadata_only_and_reads_stay_exact(spark, store):
    store.write("t", _df(spark, 0, 30))
    store.append("t", _df(spark, 30, 60))
    pre_members = {m["path"] for m in store._manifest("t")["members"]}
    store.evolve_partition_spec("t", "lang")
    man = store._manifest("t")
    assert man["partition_col"] == "lang"
    assert {m["path"] for m in man["members"]} == pre_members  # no rewrite
    # full read: old members keep their PHYSICAL lang column values
    rows = store.read("t").collect()
    assert len(rows) == 60
    assert all(r.lang == ["en", "de", "fr"][r.id % 3] for r in rows)
    # appends after evolution are partitioned under the new spec
    store.append("t", _df(spark, 60, 90))
    new = [m for m in store._manifest("t")["members"] if m["path"] not in pre_members]
    assert sorted({m["value"] for m in new}) == ["de", "en", "fr"]
    assert _ids(store.read("t")) == list(range(90))


def test_read_partitions_residual_filters_old_members(spark, store):
    store.write("t", _df(spark, 0, 30))
    store.evolve_partition_spec("t", "lang")
    store.append("t", _df(spark, 30, 60))
    out = store.read_partitions("t", ["en"])
    assert _ids(out) == [i for i in range(60) if i % 3 == 0]
    # the pruned-file set includes ALL pre-spec members (they can hold
    # any value) but only the matching post-spec member
    files = store.partition_files("t", ["en"])
    assert len(files) == 2  # 1 old segment + 1 lang=en subdir
    assert any("lang=en" in f for f in files)
    assert not any("lang=de" in f or "lang=fr" in f for f in files)


def test_compact_migrates_prespec_group_to_new_spec(spark, store):
    for i in range(5):
        if store.exists("t"):
            store.append("t", _df(spark, i * 10, (i + 1) * 10))
        else:
            store.write("t", _df(spark, 0, 10))
    store.evolve_partition_spec("t", "lang")
    assert store.compact("t", max_members=3) is not None
    man = store._manifest("t")
    assert not any(store._pre_spec(man, m) for m in man["members"])
    assert sorted({m["value"] for m in man["members"]}) == ["de", "en", "fr"]
    assert _ids(store.read("t")) == list(range(50))
    # post-migration, partition pruning is exact again
    files = store.partition_files("t", ["fr"])
    assert all("lang=fr" in f for f in files)
    assert _ids(store.read_partitions("t", ["fr"])) == [
        i for i in range(50) if i % 3 == 2
    ]


def test_count_rows_refuses_partition_counts_over_prespec(spark, store):
    store.write("t", _df(spark, 0, 30))
    store.evolve_partition_spec("t", "lang")
    assert store.count_rows("t") == 30  # unrestricted stays metadata-only
    with pytest.raises(ValueError, match="pre-evolution"):
        store.count_rows("t", values=["en"])
    store.compact("t", max_members=0)
    assert store.count_rows("t", values=["en"]) == 10


def test_evolution_guards(spark, store):
    store.write("t", _df(spark, 0, 10), partition_by=["lang"])
    with pytest.raises(ValueError, match="already partitioned"):
        store.evolve_partition_spec("t", "lang")
    store.write("u", _df(spark, 0, 10))
    with pytest.raises(ValueError, match="not a column"):
        store.evolve_partition_spec("u", "nope")


def test_time_travel_keeps_old_spec_and_txn_survives(spark, store):
    store.append_txn("t", _df(spark, 0, 20), "s1", 3)
    v0 = store.current_version("t")
    store.evolve_partition_spec("t", "lang")
    # snapshot before the evolution still reads as unpartitioned
    assert _ids(store.read_at("t", version=v0)) == list(range(20))
    # evolution inherits the exactly-once watermark
    assert store.last_txn("t", "s1") == 3
    assert store.append_txn("t", _df(spark, 0, 20), "s1", 3) is None
