"""Write-audit-publish staged snapshots (storage.stage_append/publish —
the Iceberg WAP analog): staged rows are durable and auditable via
time-travel but invisible to readers until the atomic publish; a
concurrent commit poisons the publish (CAS on the staged parent); an
abandoned stage never surfaces and its version number is never reused."""

from __future__ import annotations

import pytest

from spider_spark.storage import ConcurrentCommitError, TableStore


def _mk(spark, lo, hi):
    return spark.createDataFrame([(i, f"v{i}") for i in range(lo, hi)], "k long, val string")


def _ks(df):
    return sorted(r["k"] for r in df.collect())


def test_stage_audit_publish(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    store.write("t", _mk(spark, 0, 10))
    v = store.stage_append("t", _mk(spark, 10, 20))
    # invisible to readers, auditable via the staged snapshot
    assert _ks(store.read("t")) == list(range(10))
    assert _ks(store.read_at("t", version=v)) == list(range(20))
    # publish is a pointer flip: no rewrite, rows appear atomically
    store.publish("t", v)
    assert _ks(store.read("t")) == list(range(20))
    # a normal append continues on top of the published snapshot
    store.append("t", _mk(spark, 20, 22))
    assert _ks(store.read("t")) == list(range(22))


def test_publish_respects_concurrent_commits(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    store.write("t", _mk(spark, 0, 5))
    v = store.stage_append("t", _mk(spark, 5, 10))
    store.append("t", _mk(spark, 100, 102))  # another writer lands first
    with pytest.raises(ConcurrentCommitError, match="re-stage"):
        store.publish("t", v)
    # the winner's rows survive; the stale stage stays invisible
    assert _ks(store.read("t")) == list(range(5)) + [100, 101]
    with pytest.raises(ValueError, match="not staged"):
        store.publish("t", store.current_version("t"))


def test_abandoned_stage_is_harmless_and_version_not_reused(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    store.write("t", _mk(spark, 0, 5))
    v_staged = store.stage_append("t", _mk(spark, 5, 10))  # never published
    v_next = store.append("t", _mk(spark, 10, 12))
    assert v_next != v_staged  # the staged version's segment was not clobbered
    assert _ks(store.read("t")) == list(range(5)) + [10, 11]
    # the stale stage can still be audited until snapshots expire...
    assert _ks(store.read_at("t", version=v_staged)) == list(range(10))
    store.commit_round(1)
    store.expire_snapshots(keep=1)
    # ...and the published table is untouched by the cleanup
    assert _ks(store.read("t")) == list(range(5)) + [10, 11]
