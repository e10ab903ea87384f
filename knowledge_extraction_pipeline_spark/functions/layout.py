"""Data-layout functions: Morton (Z-order) keys for multi-dimensional
locality. Sorting or range-partitioning a write by zorder_key(x, y) clusters
rows that are close in BOTH dimensions into the same files, so parquet
min/max column statistics prune two-dimensional predicates — the standard
layout optimization for large scan-heavy tables (Delta/Iceberg OPTIMIZE
ZORDER does the same thing at the table-maintenance layer).

Pure bit-arithmetic JVM expressions (shift/and/or) — whole-stage-codegen
friendly, no UDF, and bit-identical in any SQL engine with integer shifts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low `bits` bits of two non-negative integer columns
    into one Morton key: x's bit i lands at position 2i, y's at 2i+1.
    Result < 2^(2·bits); bits <= 31 keeps everything in long range.
    Inputs are masked to `bits` bits, so larger values wrap rather than
    corrupt neighbouring bit positions."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    acc = F.lit(0).cast("long")
    xl, yl = x.cast("long"), y.cast("long")
    for i in range(bits):
        acc = (acc
               + F.shiftleft(F.shiftright(xl, i).bitwiseAND(F.lit(1)), 2 * i)
               + F.shiftleft(F.shiftright(yl, i).bitwiseAND(F.lit(1)),
                             2 * i + 1))
    return acc


def zorder_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical Morton-key expression as portable SQL text (used by
    the DuckDB oracle; also valid Spark SQL)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(df, path: str, x: str, y: str, bits: int = 16,
                   n_files: int = 8) -> None:
    """Write `df` clustered by the Morton key of (x, y): range-partition on
    the key so each output file owns a contiguous Z-curve segment, sort
    within partitions so row groups are locally clustered too. Files then
    carry tight min/max stats on BOTH x and y simultaneously, so a reader
    filtering either (or both) dimensions prunes whole files — the OPTIMIZE
    ZORDER table-maintenance pattern, expressed as a plain parquet write."""
    from pyspark.sql import functions as F

    z = zorder_key(F.col(x), F.col(y), bits=bits)
    (df.withColumn("_z", z)
       .repartitionByRange(n_files, "_z")
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode("overwrite").parquet(path))
