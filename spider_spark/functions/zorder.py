"""Z-order (Morton) interleaving — multi-dimensional data clustering
for manifest-level file skipping (the Delta ``OPTIMIZE ZORDER BY`` /
Iceberg sort-order analog).

One-dimensional min/max stats (storage.append(stats_col=...)) prune a
range scan on ONE column; a table queried by 2-D boxes (e.g. crawl
depth x host bucket, or time x priority) gets no pruning on the second
dimension.  Interleaving the bits of both coordinates into a single
z-value and range-clustering segments by z makes ONE stats column serve
both dimensions: a box query's z-span [z(xlo,ylo), z(xhi,yhi)] prunes
every segment whose z-interval is disjoint.

Correctness of the prune rests on the monotone-bound property (gated by
tests/test_zorder.py): for xlo <= x <= xhi and ylo <= y <= yhi,

    z(xlo, ylo) <= z(x, y) <= z(xhi, yhi)

because interleaving is monotone in each coordinate with the other held
fixed, so z(x, y) >= z(xlo, y) >= z(xlo, ylo) (and dually above).  The
z-span is a SUPERSET of the box, so pruning is conservative and the
exact box filter is always re-applied after the scan — stats only
prune, never answer (same contract as storage.read_range).

All expressions are pure integer bit math (shift/and/or): the Spark
form stays inside whole-stage codegen with no UDF, and ``z_sql``
renders the identical formula for a DuckDB oracle, so z-values are
engine-exact.  Inputs must be non-negative and < 2**bits.

Reference capability: the reference crawler's MySQL tables index by
(source, date) pairs (db_config.py:16-61 table layouts); z-clustering
is the lakehouse-native form of that composite locality at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def z_interleave(x: int, y: int, bits: int = 8) -> int:
    """Python-side Morton code: x bits at even positions, y at odd."""
    if x < 0 or y < 0 or x >= (1 << bits) or y >= (1 << bits):
        raise ValueError(f"coordinates must be in [0, 2**{bits})")
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def z_box_bounds(xlo: int, ylo: int, xhi: int, yhi: int, bits: int = 8) -> tuple[int, int]:
    """[z-min, z-max] of the axis-aligned box — the conservative prune
    span (superset of the box's z-values; see module docstring)."""
    if xlo > xhi or ylo > yhi:
        raise ValueError("empty box")
    return z_interleave(xlo, ylo, bits), z_interleave(xhi, yhi, bits)


def z_value(x: Column | str, y: Column | str, bits: int = 8) -> Column:
    """JVM-only Morton code of two non-negative integer columns —
    a fold of shift/and/or terms, fully inside whole-stage codegen."""
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    xc, yc = xc.cast("long"), yc.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i))
        z = z.bitwiseOR(F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def z_sql(x_expr: str, y_expr: str, bits: int = 8) -> str:
    """The identical Morton formula as a DuckDB SQL expression (for
    construct->derive identity oracles)."""
    terms = []
    for i in range(bits):
        terms.append(f"(((({x_expr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y_expr}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"
