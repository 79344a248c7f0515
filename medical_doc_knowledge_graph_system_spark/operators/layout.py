"""Z-order (Morton) data layout: the multi-dimensional clustering key
behind Delta/Iceberg `OPTIMIZE ZORDER BY` — interleave the bits of two
bucketized columns so that range predicates on EITHER column prune most
files, not just the one the table happens to be sorted by.

Everything here is pure integer arithmetic (shift-right, mask, multiply
by a power of two), so the key is engine-exact by construction — no
floats, no hashing, and a DuckDB oracle can recompute it with `>>`/`&`.

Scale shape: the key is a per-row projection (no shuffle); laying the
table out is ONE repartitionByRange/sort on the key (the same cost as
any global sort-write); the payoff is measured by `zorder_stats` — each
output file's bounding box over BOTH dimensions, which is exactly the
min/max column statistics a lakehouse scan planner prunes with.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(x: Column, y: Column, bits: int = 10) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integral
    columns into a 2·bits-bit Morton key (x in the even positions, y in
    the odd). Callers clamp/bucketize upstream — the key only looks at
    the low ``bits`` bits. Pure column arithmetic: the bit places are
    multiplications by power-of-two literals, identical on any engine."""
    terms = []
    for i in range(bits):
        xb = F.shiftright(x, i).bitwiseAND(F.lit(1))
        yb = F.shiftright(y, i).bitwiseAND(F.lit(1))
        terms.append(xb * F.lit(1 << (2 * i)) + yb * F.lit(1 << (2 * i + 1)))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z.cast("long")


def zorder_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 10,
    n_files: int = 64,
) -> DataFrame:
    """Assign each row to one of ``n_files`` files by Morton-key range and
    report every file's min/max bounding box over BOTH dimensions plus
    its row count — the column statistics a scan planner skips files
    with. Under a z-order layout each file's box is small in x AND y
    simultaneously (a single-column sort gives tight boxes in one
    dimension and full-range boxes in the other).

    ``n_files`` must divide the 4^bits key space (both powers of two).
    Output: (file_id, n_rows, min_x, max_x, min_y, max_y).
    """
    space = 1 << (2 * bits)
    if space % n_files:
        raise ValueError("n_files must divide the 4^bits key space")
    per = space // n_files
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    keyed = df.select(
        x.alias("__x"),
        y.alias("__y"),
        morton_key(x, y, bits=bits).alias("__z"),
    )
    return (
        keyed.groupBy(
            F.expr(f"__z div {per}").cast("long").alias("file_id")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("__x").cast("long").alias("min_x"),
            F.max("__x").cast("long").alias("max_x"),
            F.min("__y").cast("long").alias("min_y"),
            F.max("__y").cast("long").alias("max_y"),
        )
    )
