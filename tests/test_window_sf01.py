"""sf0.1 smoke for the graded window (VERDICT r3 #5): the full value
compare stays at sf0.01 (tests/test_oracle.py) for speed, but
data-dependent failures — vacuity like round 3's q5, or cap
interactions like d2's bucket cap — can appear only at a larger SF.
This module runs every graded-window query on Spark AND DuckDB at
sf0.1 and checks row counts only."""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.1"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module", autouse=True)
def ansi_on(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield
    spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _window_names():
    from spider_spark.catalog import GRADED_WINDOW

    return list(GRADED_WINDOW)


@pytest.mark.parametrize("name", _window_names())
def test_window_rowcount_matches_at_sf01(spark, ddb, name):
    from spider_spark.catalog import ORACLES, QUERIES

    spark_n = QUERIES[name](spark, SF_DIR).count()
    oracle_n = ddb.sql(f"SELECT COUNT(*) FROM ({ORACLES[name]})").fetchone()[0]
    assert spark_n == oracle_n, f"{name}: spark {spark_n} vs oracle {oracle_n} at sf0.1"
    assert spark_n > 0, f"{name}: vacuous at sf0.1"


def _norm(rows):
    out = []
    for r in rows:
        out.append(tuple(
            round(v, 6) if isinstance(v, float) else tuple(v) if isinstance(v, list) else v
            for v in r
        ))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def test_window_values_match_at_sf01(spark, ddb):
    """Full VALUE compare of every graded entry at the SF the driver
    grades (the row-count smoke above cannot catch value-level
    divergence that only appears at sf0.1, e.g. engine rounding edges on
    data absent at sf0.01).  One pass, all 50 entries."""
    from spider_spark.catalog import GRADED_WINDOW, ORACLES, QUERIES

    bad = []
    for name in GRADED_WINDOW:
        srows = _norm([tuple(r) for r in QUERIES[name](spark, SF_DIR).collect()])
        orows = _norm([tuple(r) for r in ddb.sql(ORACLES[name]).fetchall()])
        if srows != orows:
            bad.append(name)
    assert not bad, f"value mismatch vs oracle at sf0.1: {bad}"
