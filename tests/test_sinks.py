"""Foreign-sink escape hatch (sinks.py) — the reference's MySQL/Mongo
dup-key-skip landing path (db_config.py:16-61, phone_book.py:219-221) as
a per-partition batched keyed upsert.  The injected client is a REAL
cross-process unique-key store (O_EXCL file-per-key), because local-mode
python workers are separate processes and must race through the
filesystem like real executors race through a DB's unique index."""

from __future__ import annotations

import pytest

from spider_spark.sinks import FileBackedKeyStore, batched, write_foreign


def _store(tmp_path, name="ops"):
    return str(tmp_path / name)


def test_keyed_upsert_dedups_and_counts(spark, tmp_path):
    root = _store(tmp_path)
    df = spark.createDataFrame(
        [("u1", 10), ("u2", 20), ("u1", 30), ("u3", 5), ("u2", 20)],
        "url string, score int",
    ).repartition(4)
    n = write_foreign(df, lambda pid: FileBackedKeyStore(root, "url"), key="url")
    assert n == 3
    rows = {r["url"]: r for r in FileBackedKeyStore(root, "url").read_all()}
    assert sorted(rows) == ["u1", "u2", "u3"]
    # first-wins is DETERMINISTIC: the representative for u1 is the row
    # with the smallest payload ordering (score 10), not arrival order
    assert rows["u1"]["score"] == 10


def test_rerun_is_noop_under_store_idempotence(spark, tmp_path):
    """The at-least-once story: a whole re-run (the task-retry analog —
    same rows, same store) writes 0 new rows and changes nothing."""
    root = _store(tmp_path)
    df = spark.createDataFrame(
        [("u1", 1), ("u2", 2)], "url string, score int"
    )
    first = write_foreign(df, lambda pid: FileBackedKeyStore(root, "url"), key="url")
    before = sorted(
        (r["url"], r["score"]) for r in FileBackedKeyStore(root, "url").read_all()
    )
    again = write_foreign(df, lambda pid: FileBackedKeyStore(root, "url"), key="url")
    assert (first, again) == (2, 0)
    after = sorted(
        (r["url"], r["score"]) for r in FileBackedKeyStore(root, "url").read_all()
    )
    assert before == after


def test_small_batches_and_wide_partitions(spark, tmp_path):
    """batch_size bounds memory, never correctness: 100 keys through
    batch_size=7 over 8 partitions land exactly once each."""
    root = _store(tmp_path)
    df = spark.range(100).selectExpr("concat('k', id) as k", "id as v").repartition(8)
    n = write_foreign(
        df, lambda pid: FileBackedKeyStore(root, "k"), key="k", batch_size=7
    )
    assert n == 100
    assert len(FileBackedKeyStore(root, "k").read_all()) == 100


def test_missing_key_raises(spark, tmp_path):
    df = spark.createDataFrame([("a",)], "x string")
    with pytest.raises(ValueError, match="key column"):
        write_foreign(df, lambda pid: FileBackedKeyStore(_store(tmp_path), "k"), key="k")
    with pytest.raises(ValueError, match="batch_size"):
        write_foreign(
            df, lambda pid: FileBackedKeyStore(_store(tmp_path), "x"),
            key="x", batch_size=0,
        )


def test_sink_crawl_documents_shape(spark, tmp_path):
    """The actual use: push a crawl's documents (nested span rows) out to
    the operational store — nested structs serialize through
    asDict(recursive=True), key = url."""
    root = _store(tmp_path)
    df = spark.createDataFrame(
        [
            ("http://h0.example/p1", [{"kind": "title", "text": "T", "media_ref": "", "offset": 0}]),
            ("http://h0.example/p2", [{"kind": "title", "text": "U", "media_ref": "", "offset": 0}]),
        ],
        "url string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    n = write_foreign(df, lambda pid: FileBackedKeyStore(root, "url"), key="url")
    assert n == 2
    got = {r["url"]: r for r in FileBackedKeyStore(root, "url").read_all()}
    assert got["http://h0.example/p1"]["spans"][0]["kind"] == "title"


def test_batched_utility():
    assert list(batched(range(7), 3)) == [[0, 1, 2], [3, 4, 5], [6]]
    assert list(batched([], 3)) == []
