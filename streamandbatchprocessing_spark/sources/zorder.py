"""Z-order (Morton) clustering — multi-dimensional data skipping.

Range-partitioning a table on ONE column gives perfect file-level
min/max pruning on that column and none on any other. Interleaving the
bits of TWO (or more) quantized columns into a single Morton value and
range-writing on THAT gives every file a compact rectangle in the
multi-dimensional key space — so parquet min/max statistics prune files
for predicates on EITHER dimension (or both). This is the layout Delta
Lake's OPTIMIZE ZORDER BY builds; here it is expressed with nothing but
native Spark: an integer-arithmetic projection (whole-stage codegen),
``repartitionByRange`` on the z-value, and a per-partition sort.

Reference parity: like bucketing (`sources/bucketed.py`), the reference
has no physical-layout control (partition-only writes,
``SparkManager.scala:28-37``) — this module is part of the 100-TB
extension surface. At scale the z-write is one range shuffle, amortized
over every subsequent multi-dimensional scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits per dimension in the Morton code. 12 bits × 2 dims = 24-bit
#: z-values: 4096 cells per axis is plenty of resolution for file-level
#: skipping (files ≫ cells would waste sort effort; files ≪ cells is
#: the usual regime).
ZORDER_BITS = 12


def quantize(col: Column, lo: int, hi: int, bits: int = ZORDER_BITS) -> Column:
    """Affine-quantize an integer column into [0, 2^bits) with exact
    BIGINT arithmetic (no doubles — deterministic on any engine, no
    boundary drift). ``lo``/``hi`` are the column's min/max, collected
    once at write time (a 2-value driver collect per dimension)."""
    span = max(hi - lo, 1)
    scaled = (col.cast("long") - F.lit(lo)) * F.lit((1 << bits) - 1)
    # Exact integer floor-div: subtract the remainder first, so the
    # double division is of an exactly-divisible integer (< 2^53) and
    # therefore exact — no boundary drift from float quotients.
    return (
        (scaled - F.pmod(scaled, F.lit(span))) / F.lit(span)
    ).cast("long")


def morton2(x: Column, y: Column, bits: int = ZORDER_BITS) -> Column:
    """Interleave the low ``bits`` of two quantized columns into one
    Morton value — a chain of shift/and/or built-ins, fully inside
    whole-stage codegen (no UDF)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    dim_a: str,
    dim_b: str,
    path: str,
    n_files: int = 16,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """Write ``df`` re-clustered on the Morton interleave of two integer
    dimensions and return the re-read.

    One range shuffle on the z-value (``repartitionByRange`` samples the
    z distribution, so files are balanced even when the key space is
    skewed) + a within-partition sort so row groups inside each file
    stay z-contiguous. The z column itself is dropped before the write:
    it is layout metadata, not data — re-derivable from the dimensions.
    """
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(dim_a), F.max(dim_a), F.min(dim_b), F.max(dim_b)
    ).first()
    if lo_a is None or lo_b is None:
        # Empty input (or all-null dimensions): there is nothing to
        # cluster — write the empty relation as-is so callers still get
        # a readable table with the right schema instead of a TypeError
        # from int(None) below.
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)
    z = morton2(
        quantize(F.col(dim_a), int(lo_a), int(hi_a), bits),
        quantize(F.col(dim_b), int(lo_b), int(hi_b), bits),
        bits,
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return df.sparkSession.read.parquet(path)
