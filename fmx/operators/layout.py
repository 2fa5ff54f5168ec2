"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional scan pruning.

A 100 TB table sorted on one column prunes parquet row-groups on that
column only; queries filtering the OTHER dimension read everything.
Interleaving the bits of two (bucketized) sort keys gives a single
Z-value whose total order is locality-preserving in both dimensions —
files then carry tight min/max ranges for both columns and the reader
prunes either predicate.  This is the layout trick behind
Delta/Iceberg `OPTIMIZE ZORDER BY`; here it is a plain column
expression + `repartitionByRange` write, nothing engine-private.

Pure bit arithmetic (shift/and/multiply) — whole-stage codegen on the
Spark side, replayable verbatim in DuckDB for the oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["z_value", "z_value_sql", "write_zordered"]


def z_value(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    int columns: x occupies even bit positions, y odd.  ``bits=8``
    covers 256x256 buckets — plenty for file-level clustering (you
    bucketize real keys into this range first; finer bits only help
    once you have > 2^16 files)."""
    parts = []
    for b in range(bits):
        parts.append(F.shiftright(x, b).bitwiseAND(F.lit(1))
                     * F.lit(1 << (2 * b)))
        parts.append(F.shiftright(y, b).bitwiseAND(F.lit(1))
                     * F.lit(1 << (2 * b + 1)))
    return reduce(lambda a, c: a + c, parts).cast("bigint")


def z_value_sql(x: str, y: str, bits: int = 8) -> str:
    """The identical Morton interleave as engine-portable SQL text
    (DuckDB oracle side)."""
    parts = []
    for b in range(bits):
        parts.append(f"((({x} >> {b}) & 1) * {1 << (2 * b)})")
        parts.append(f"((({y} >> {b}) & 1) * {1 << (2 * b + 1)})")
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


def write_zordered(df: DataFrame, path: str, x: Column, y: Column,
                   bits: int = 8, num_files: int = 8) -> None:
    """Write ``df`` as parquet clustered on the Z-value of (x, y):
    range-partition into ``num_files`` Z-ranges, sort within each —
    every output file then holds one compact Z-interval, i.e. a tight
    min/max box in BOTH dimensions, and readers filtering either
    column skip whole files via row-group stats.  No global sort: the
    range exchange samples Z boundaries, the sort is per-partition."""
    z = z_value(x, y, bits).alias("_z")
    (df.withColumn("_z", z)
       .repartitionByRange(num_files, "_z")
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode("overwrite").parquet(path))
