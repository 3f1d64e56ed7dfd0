"""Z-order (Morton-curve) data layout for multi-column data skipping
— the OPTIMIZE ZORDER analog for plain parquet tables: interleave the
bits of two filter columns so that range-partitioning + sorting by the
single z-value co-locates rows that are close in BOTH dimensions.
Files then carry tight min/max stats on both columns at once, and a
2-D predicate prunes most files where a 1-D sort could only prune on
its leading column.

Scale shape: the z-value is pure bit algebra in whole-stage codegen
(no UDF); the layout pass is ONE repartitionByRange exchange on the
z-value plus an in-partition sort (no global sort). Cell ids
(``z div 2^k``) give a deterministic fixed grid for bucketing/stats
without sampling — that is what the oracle checks, while the
range-layout half is verified by the file-stats tightness test
(tests/test_zorder.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` of two non-negative
    integer columns: a's bit i → z bit 2i, b's bit i → z bit 2i+1."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    z = F.lit(0).cast("long")
    al = a.cast("long")
    bl = b.cast("long")
    for i in range(bits):
        abit = F.shiftright(al, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(bl, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return z


def z_value_sql(a: str, b: str, bits: int = 16) -> str:
    """The identical interleave as ANSI SQL (DuckDB-runnable) for
    oracle pairing."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zorder_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_partitions: int,
    bits: int = 16,
) -> DataFrame:
    """Re-layout ``df`` for 2-D data skipping: one range exchange on
    the z-value, sorted within partitions — each output file covers a
    contiguous z-range, i.e. a small rectangle in (col_a, col_b)
    space. Write the result with ``.write.parquet`` to materialize the
    skipping-friendly files."""
    z = z_value(F.col(col_a), F.col(col_b), bits)
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_partitions, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
