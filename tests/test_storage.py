from __future__ import annotations

from spider_spark.storage import TableStore


def test_write_read_append_merge(spark, tmp_path):
    st = TableStore(spark, str(tmp_path))
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    st.write("t", df)
    assert st.read("t").count() == 2

    st.append("t", spark.createDataFrame([(3, "c")], ["k", "v"]))
    assert st.read("t").count() == 3

    # MERGE: update k=2, insert k=4
    st.merge_upsert("t", spark.createDataFrame([(2, "B"), (4, "d")], ["k", "v"]), key="k")
    rows = {r["k"]: r["v"] for r in st.read("t").collect()}
    assert rows == {1: "a", 2: "B", 3: "c", 4: "d"}


def test_manifest_restore(spark, tmp_path):
    st = TableStore(spark, str(tmp_path))
    st.write("t", spark.createDataFrame([(1,)], ["k"]))
    st.commit_round(1)
    v1 = st.current_version("t")
    # a crashed half-round: new version written, no manifest
    st.write("t", spark.createDataFrame([(1,), (2,)], ["k"]))
    assert st.current_version("t") != v1
    rid = st.restore_last_committed()
    assert rid == 1
    assert st.current_version("t") == v1
    assert st.read("t").count() == 1


def test_expire_snapshots_keeps_current(spark, tmp_path):
    st = TableStore(spark, str(tmp_path))
    for i in range(5):
        st.write("t", spark.createDataFrame([(i,)], ["k"]))
    st.expire_snapshots(keep=2)
    assert st.read("t").collect()[0]["k"] == 4
