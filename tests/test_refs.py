"""Branch/tag refs on the TableStore (Iceberg refs analog): branch
isolation, fast-forward publish + its CAS, tag immutability across
publishes, and snapshot expiry honoring refs."""

import pytest

from spider_spark.storage import ConcurrentCommitError, TableStore


def _ids(spark, lo, hi, gen):
    return spark.range(lo, hi).selectExpr("id AS doc_id", f"'{gen}' AS gen")


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "store"))


def test_branch_isolated_until_fast_forward(spark, store):
    store.write("t", _ids(spark, 0, 100, "a"))
    store.create_branch("t", "audit")
    store.append_to_branch("t", "audit", _ids(spark, 100, 150, "b"))
    store.append_to_branch("t", "audit", _ids(spark, 150, 180, "c"))
    assert store.read("t").count() == 100  # main untouched across 2 commits
    assert store.read_ref("t", "audit").count() == 180
    store.fast_forward("t", "audit")
    assert store.read("t").count() == 180
    assert sorted(
        r["gen"] for r in store.read("t").select("gen").distinct().collect()
    ) == ["a", "b", "c"]


def test_fast_forward_cas_rejects_concurrent_main_commit(spark, store):
    store.write("t", _ids(spark, 0, 10, "a"))
    store.create_branch("t", "audit")
    store.append_to_branch("t", "audit", _ids(spark, 10, 20, "b"))
    store.append("t", _ids(spark, 90, 95, "m"))  # main advances under the branch
    with pytest.raises(ConcurrentCommitError):
        store.fast_forward("t", "audit")
    # main's concurrent rows were never at risk
    assert store.read("t").count() == 15


def test_tag_pins_snapshot_across_publishes(spark, store):
    store.write("t", _ids(spark, 0, 50, "a"))
    store.create_tag("t", "train-v1")
    store.create_branch("t", "next")
    store.append_to_branch("t", "next", _ids(spark, 50, 80, "b"))
    store.fast_forward("t", "next")
    assert store.read("t").count() == 80
    assert store.read_ref("t", "train-v1").count() == 50  # tag is frozen
    with pytest.raises(ValueError):
        store.create_tag("t", "train-v1")  # immutable: no overwrite
    with pytest.raises(ValueError):
        store.append_to_branch("t", "train-v1", _ids(spark, 0, 1, "x"))


def test_branch_reusable_after_fast_forward(spark, store):
    store.write("t", _ids(spark, 0, 10, "a"))
    store.create_branch("t", "audit")
    store.append_to_branch("t", "audit", _ids(spark, 10, 20, "b"))
    store.fast_forward("t", "audit")
    # base advanced to head: the next audit cycle works without re-branching
    store.append_to_branch("t", "audit", _ids(spark, 20, 30, "c"))
    assert store.read("t").count() == 20
    store.fast_forward("t", "audit")
    assert store.read("t").count() == 30


def test_expire_snapshots_keeps_refd_versions(spark, store):
    store.write("t", _ids(spark, 0, 10, "a"))
    store.create_tag("t", "v1")
    for j in range(5):
        store.append("t", _ids(spark, 10 * (j + 1), 10 * (j + 2), f"g{j}"))
    store.expire_snapshots(keep=1)
    # the tag's manifest AND its segment data survived the expiry
    assert store.read_ref("t", "v1").count() == 10
    assert store.read("t").count() == 60


def test_ref_hygiene(spark, store):
    store.write("t", _ids(spark, 0, 5, "a"))
    with pytest.raises(ValueError):
        store.create_tag("t", "bad/name")
    with pytest.raises(ValueError):
        store.ref("t", "nope")
    store.create_tag("t", "v1")
    assert store.refs("t")["v1"]["kind"] == "tag"
    store.drop_ref("t", "v1")
    assert store.refs("t") == {}
    with pytest.raises(ValueError):
        store.drop_ref("t", "v1")
