"""Iceberg add-column schema evolution on the TableStore: appends may
extend the schema additively; old segments are never rewritten and read
back null-filled; time-travel keeps serving each snapshot with its own
snapshot-time schema; the fail-fast schema gate stays hard for
non-additive drift (ADVICE r2/r3 behavior preserved)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_spark.storage import TableStore


def _store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "store"))


def test_append_with_new_column_evolves_and_nullfills(spark, tmp_path):
    st = _store(spark, tmp_path)
    st.write("t", spark.range(3).select(F.col("id"), F.lit("a").alias("tag")))
    st.append(
        "t",
        spark.range(3, 5).select(
            F.col("id"), F.lit("b").alias("tag"), (F.col("id") * 10).alias("score")
        ),
        allow_evolution=True,
    )
    rows = {r["id"]: (r["tag"], r["score"]) for r in st.read("t").collect()}
    assert rows == {0: ("a", None), 1: ("a", None), 2: ("a", None),
                    3: ("b", 30), 4: ("b", 40)}
    assert st.read("t").columns == ["id", "tag", "score"], (
        "evolved columns append at the end of the committed order"
    )


def test_evolution_marks_new_column_nullable(spark, tmp_path):
    st = _store(spark, tmp_path)
    st.write("t", spark.range(2).select("id"))
    # lit() literals are non-null in the incoming frame; the committed
    # manifest must still record the column nullable (old rows are null)
    st.append(
        "t", spark.range(2, 3).select("id", F.lit(7).alias("extra")),
        allow_evolution=True,
    )
    assert st.read("t").schema["extra"].nullable


def test_append_without_flag_still_fails_fast(spark, tmp_path):
    st = _store(spark, tmp_path)
    st.write("t", spark.range(2).select("id"))
    with pytest.raises(ValueError, match="schema mismatch"):
        st.append("t", spark.range(2, 3).select("id", F.lit(7).alias("extra")))


def test_evolution_never_allows_missing_columns_or_type_drift(spark, tmp_path):
    st = _store(spark, tmp_path)
    st.write("t", spark.range(2).select("id", F.lit("a").alias("tag")))
    with pytest.raises(ValueError, match="schema mismatch"):
        st.append("t", spark.range(2, 3).select("id"), allow_evolution=True)
    with pytest.raises(ValueError, match="type mismatch"):
        st.append(
            "t",
            spark.range(2, 3).select("id", F.lit(1).alias("tag")),
            allow_evolution=True,
        )


def test_time_travel_serves_snapshot_time_schema(spark, tmp_path):
    st = _store(spark, tmp_path)
    st.write("t", spark.range(2).select("id"))
    st.commit_round(1)
    st.append(
        "t", spark.range(2, 4).select("id", F.lit("x").alias("note")),
        allow_evolution=True,
    )
    st.commit_round(2)
    assert st.read_at("t", round_id=1).columns == ["id"]
    as_of_2 = st.read_at("t", round_id=2)
    assert as_of_2.columns == ["id", "note"]
    assert {r["id"]: r["note"] for r in as_of_2.collect()} == {
        0: None, 1: None, 2: "x", 3: "x"
    }


def test_partitioned_table_evolution_keeps_pruned_reads(spark, tmp_path):
    st = _store(spark, tmp_path)
    base = spark.range(4).select(
        "id", F.when(F.col("id") < 2, "pending").otherwise("fetched").alias("state")
    )
    st.write("t", base, partition_by=["state"])
    st.append(
        "t",
        spark.range(4, 6).select(
            "id", F.lit("pending").alias("state"), F.lit(1).alias("gen")
        ),
        partition_by=["state"],
        allow_evolution=True,
    )
    got = {r["id"]: r["gen"] for r in st.read_partitions("t", ["pending"]).collect()}
    assert got == {0: None, 1: None, 4: 1, 5: 1}, (
        "partition-pruned read must see evolved column with old rows null-filled"
    )
