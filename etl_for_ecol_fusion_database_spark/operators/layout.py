"""X9 data-layout operators: Z-order (Morton) clustering for multi-column
data skipping.

At 100 TB, scan pruning is the difference between touching 1% and 100% of
files: parquet footers carry per-column min/max, and engines skip files
whose ranges exclude the predicate.  A single-column sort gives perfect
skipping on ONE column; Z-ordering interleaves the bits of two (or more)
bucketed key columns so that files stay roughly contiguous in BOTH
dimensions — point/range predicates on either column prune most files.

The z-value is pure integer bit arithmetic (shift/mask/or), so it is
portable to any engine and the driver oracle checks it exactly.  The
layout writer is ``repartitionByRange(zval).sortWithinPartitions(zval)``:
range partitioning gives equal-sized output files of contiguous z-ranges
(one shuffle), and the within-partition sort is the narrow final step —
the standard OPTIMIZE ZORDER BY shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(a: Column, b: Column, *, bits: int = 10) -> Column:
    """Morton code of two non-negative ints bucketed to ``bits`` bits:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.  Flat
    shift/mask/or expression tree — whole-stage codegen, no UDF."""
    out: Column | None = None
    for i in range(bits):
        ta = F.shiftleft(F.shiftrightunsigned(a, i).bitwiseAND(F.lit(1).cast("long")), 2 * i)
        tb = F.shiftleft(
            F.shiftrightunsigned(b, i).bitwiseAND(F.lit(1).cast("long")), 2 * i + 1
        )
        out = ta.bitwiseOR(tb) if out is None else out.bitwiseOR(ta).bitwiseOR(tb)
    return out


def zorder_assignment(
    df: DataFrame,
    col_a: Column,
    col_b: Column,
    *,
    bits: int = 10,
    rows_per_file: int = 1 << 12,
) -> DataFrame:
    """Attach the z-value and a coarse target-file id (top z bits) to each
    row — the assignment half of a Z-order rewrite, kept separate from the
    write so the driver can value-check it.  ``file_id = zval >> shift``
    groups 2^shift consecutive z-codes per file."""
    shift = max((2 * bits) - max(rows_per_file.bit_length() - 1, 1), 1)
    zval = z_value(col_a, col_b, bits=bits)
    return df.select(
        "*",
        zval.alias("zval"),
        F.shiftrightunsigned(zval, shift).alias("file_id"),
    )


def zorder_write_layout(df: DataFrame, zval_col: str = "zval") -> DataFrame:
    """The layout shuffle itself: range-partition on the z-value (equal
    contiguous z-ranges per output file) and sort within partitions — the
    OPTIMIZE ZORDER shape.  Returned (not written) so callers pick the
    sink; follow with ``.write.parquet(...)``."""
    return df.repartitionByRange(F.col(zval_col)).sortWithinPartitions(zval_col)
