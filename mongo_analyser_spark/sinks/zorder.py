"""Z-order (Morton) clustered parquet layout: multi-dimensional data
skipping for scans that filter on MORE than one column.

The range-clustered sink (sinks/export.py) sorts by ONE key, so zone
maps prune only that column's predicates.  Interleaving the bits of two
bucketed dimensions into a Morton key and sorting by IT gives row groups
that are tight rectangles in BOTH dimensions — the standard lakehouse
layout trick (Delta/Iceberg `OPTIMIZE ZORDER BY`) expressed as plain
integer Column arithmetic Catalyst evaluates in codegen.

At 100 TB: `repartitionByRange(morton)` + `sortWithinPartitions(morton)`
is one range shuffle at write time; every future scan filtering on
either (or both) dimensions skips row groups via parquet min/max stats —
write once, prune forever.  The key arithmetic is engine-portable
(shifts/masks on BIGINT), so the oracle can verify keys bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension in the interleaved key (16 ⇒ 32-bit Morton key)
ZBITS = 16


def bucket16(col: Column, lo: float, hi: float) -> Column:
    """Map a numeric column onto the [0, 65535] bucket grid for Morton
    interleaving: linear scale, clamped at both ends (out-of-range
    VALUES land in the edge buckets, never error; a degenerate RANGE is
    a caller bug and raises here, at expression-build time)."""
    if hi <= lo:
        raise ValueError(f"bucket16 requires hi > lo, got [{lo}, {hi}]")
    scaled = (col.cast("double") - lo) * ((2**ZBITS - 1) / (hi - lo))
    return F.least(
        F.lit(2**ZBITS - 1), F.greatest(F.lit(0), F.floor(scaled))
    ).cast("long")


def morton_key(x: Column, y: Column) -> Column:
    """Interleave the low 16 bits of two bucketed longs: x's bit i lands
    at position 2i+1, y's at 2i.  Pure shift/mask arithmetic — identical
    in any engine with 64-bit integers, fully inside codegen."""
    key = F.lit(0).cast("long")
    for i in range(ZBITS):
        xbit = F.shiftleft(
            F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        ybit = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i)
        key = key.bitwiseOR(xbit).bitwiseOR(ybit)
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    x: Column,
    y: Column,
    num_files: int = 4,
) -> None:
    """Write ``df`` as parquet clustered by the Morton key of two
    bucketed dimensions (pass `bucket16(...)` columns).  One range
    shuffle; the key itself is dropped from the stored schema."""
    keyed = df.withColumn("__z", morton_key(x, y))
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
