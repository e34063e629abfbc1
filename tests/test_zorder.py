"""Z-order (Morton) interleave: the monotone-bound property that makes
box->z-span pruning conservative-correct, plus Spark/SQL/python
formula agreement (c18_zorder_scan rests on all three)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from spider_spark.functions.zorder import (
    z_box_bounds,
    z_interleave,
    z_sql,
    z_value,
)


def test_interleave_known_values():
    assert z_interleave(0, 0) == 0
    assert z_interleave(1, 0) == 1
    assert z_interleave(0, 1) == 2
    assert z_interleave(255, 255) == 65535
    # x bit5 -> z bit10, y bit6 -> z bit13
    assert z_interleave(32, 64) == 1024 + 8192


def test_monotone_bound_property_brute_force():
    """For every point inside a box, z(point) lies inside the box's
    z-span — the exact property the manifest prune relies on.  Checked
    exhaustively on a 6-bit grid over a spread of boxes."""
    bits = 6
    zs = [[z_interleave(x, y, bits) for y in range(64)] for x in range(64)]
    boxes = [
        (0, 0, 63, 63),
        (5, 9, 20, 33),
        (32, 0, 63, 31),
        (17, 17, 17, 17),
        (1, 62, 2, 63),
    ]
    for xlo, ylo, xhi, yhi in boxes:
        zlo, zhi = z_box_bounds(xlo, ylo, xhi, yhi, bits)
        for x in range(xlo, xhi + 1):
            for y in range(ylo, yhi + 1):
                assert zlo <= zs[x][y] <= zhi


def test_interleave_is_bijective():
    bits = 5
    seen = {z_interleave(x, y, bits) for x in range(32) for y in range(32)}
    assert len(seen) == 1024 and min(seen) == 0 and max(seen) == 1023


def test_rejects_out_of_range():
    with pytest.raises(ValueError):
        z_interleave(256, 0, bits=8)
    with pytest.raises(ValueError):
        z_interleave(0, -1, bits=8)


def test_spark_and_sql_forms_match_python(spark):
    """The JVM column expression and the DuckDB SQL rendering compute
    the identical Morton code as the python reference."""
    rows = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 23)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", z_value("x", "y", bits=8)).collect()
    }
    duck = duckdb.connect()
    sql_rows = duck.execute(
        f"SELECT x, y, {z_sql('x', 'y')} AS z FROM (SELECT unnest(?) AS x, unnest(?) AS y)",
        [[r[0] for r in rows], [r[1] for r in rows]],
    ).fetchall()
    sql_got = {(x, y): z for x, y, z in sql_rows}
    for x, y in rows:
        want = z_interleave(x, y, bits=8)
        assert got[(x, y)] == want
        assert sql_got[(x, y)] == want
