"""Multi-dimensional data layout: Z-order (Morton-curve) clustering.

The 100 TB problem this solves: parquet min/max row-group pruning only
works along the sort order. Sorting by `l_partkey` makes partkey
predicates cheap but leaves `l_suppkey` stats useless — every row
group spans the full suppkey range. Interleaving the bits of BOTH
columns into one z-value and range-sorting by it bounds every row
group to a small rectangle in (x, y) space, so point/range predicates
on EITHER dimension prune most row groups (the layout trick behind
Delta/Iceberg `OPTIMIZE ZORDER BY`, public knowledge; see also Morton,
1966).

Everything here is closed-form integer expression work — bucketize to
a 16-bit rank via exact integer arithmetic, spread bits with the
classic magic-number shifts, OR the two spreads together — so the
whole construction runs JVM-side inside whole-stage codegen and is
reproducible bit-for-bit in any engine with shifts (the DuckDB oracle
replays it verbatim). One range-exchange (`repartitionByRange` on the
z-value) is the only shuffle, identical in shape to any global sort
the writer would already pay for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Magic-number bit spread: 16-bit value -> even bit positions of a
# 32-bit value (x86-era interleave trick, public domain folklore).
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits16(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` so bit i lands at bit 2i."""
    out = col.cast("bigint")
    for shift, mask in _SPREAD_STEPS:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(mask))
    return out


def bucket16_expr(col: str, vmin: str, vmax: str) -> Column:
    """Order-preserving map of column ``col`` in [vmin, vmax] onto
    [0, 65536). Exact integer arithmetic (`* 65536 div (range+1)`) —
    no floats, so Spark and the oracle agree bit-for-bit. Inputs up to
    ~2^46 are safe from 64-bit overflow ((v - vmin) * 65536 < 2^63).
    Takes column NAMES (not Columns) because integer `div` is only
    reachable through SQL-expression text."""
    return F.expr(
        f"(cast({col} as bigint) - cast({vmin} as bigint)) * 65536 "
        f"div (cast({vmax} as bigint) - cast({vmin} as bigint) + 1)"
    )


def morton_zvalue(x16: Column, y16: Column) -> Column:
    """Interleave two 16-bit bucket ranks into one 32-bit z-value
    (x in even bits, y in odd bits)."""
    return spread_bits16(x16).bitwiseOR(F.shiftleft(spread_bits16(y16), 1))


def with_zvalue(
    df: DataFrame,
    x_col: str,
    y_col: str,
    out_col: str = "zval",
) -> DataFrame:
    """Add a Morton z-value over two integer columns.

    The per-column min/max come from one tiny scalar aggregate that is
    broadcast back onto the table (an O(|stats|) = O(1) broadcast, not
    a shuffle of the data). At 100 TB these bounds would come from
    table-level statistics / footer metadata instead of a scan — the
    expression downstream is identical.
    """
    stats = df.agg(
        F.min(x_col).alias("_xmin"),
        F.max(x_col).alias("_xmax"),
        F.min(y_col).alias("_ymin"),
        F.max(y_col).alias("_ymax"),
    )
    joined = df.crossJoin(F.broadcast(stats))
    xb = bucket16_expr(x_col, "_xmin", "_xmax")
    yb = bucket16_expr(y_col, "_ymin", "_ymax")
    return joined.withColumn(out_col, morton_zvalue(xb, yb)).drop(
        "_xmin", "_xmax", "_ymin", "_ymax"
    )


def zorder_write(
    df: DataFrame,
    x_col: str,
    y_col: str,
    path: str,
    num_files: int = 8,
) -> None:
    """Write ``df`` parquet clustered on the z-curve of (x_col, y_col).

    ``repartitionByRange`` on the z-value gives contiguous, balanced
    curve segments per file (range exchange = the writer's one
    shuffle); the within-partition sort makes every ROW GROUP a curve
    segment too, so footer min/max stats are tight rectangles in both
    dimensions. Read-side pruning needs no cooperation — it is plain
    parquet stats pruning, which Spark/DuckDB/Trino all already do.
    """
    (
        with_zvalue(df, x_col, y_col)
        .repartitionByRange(num_files, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(path)
    )
