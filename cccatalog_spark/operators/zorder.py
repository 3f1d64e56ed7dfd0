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


def _hilbert_steps(bits: int) -> list[int]:
    return [1 << i for i in range(bits - 1, -1, -1)]


def hilbert_value_frame(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 4,
    out_col: str = "h",
) -> DataFrame:
    """Hilbert-curve index of two ``bits``-bit non-negative integer
    coordinates (the xy2d walk, quadrant-rotation form) — the
    data-layout key whose consecutive cells are ALWAYS Manhattan
    distance 1 apart, vs Z-order's long diagonal jumps: better range-
    scan locality for two-dimensional clustering keys at identical
    cost (Faloutsos & Roseman, PODS'89 measured exactly this trade).

    Appends ``out_col``; pure integer column algebra unrolled per
    bit-plane (``bits`` rounds of masked compares/negations — each
    round references only the previous round's columns, so the plan
    grows linearly, the zorder.z_value discipline).
    """
    if not 1 <= bits <= 16:
        raise ValueError("bits must be in [1, 16]")
    out = df.withColumn("_hx", F.col(x_col).cast("long")) \
        .withColumn("_hy", F.col(y_col).cast("long")) \
        .withColumn("_hd", F.lit(0).cast("long"))
    for s in _hilbert_steps(bits):
        rx = F.when(
            F.col("_hx").bitwiseAND(F.lit(s)) > 0, F.lit(1)
        ).otherwise(F.lit(0))
        ry = F.when(
            F.col("_hy").bitwiseAND(F.lit(s)) > 0, F.lit(1)
        ).otherwise(F.lit(0))
        d = F.col("_hd") + F.lit(s * s) * (
            (F.lit(3) * rx).bitwiseXOR(ry)
        )
        nx = (
            F.when(
                (ry == 0) & (rx == 1), F.lit(s - 1) - F.col("_hy")
            )
            .when(ry == 0, F.col("_hy"))
            .otherwise(F.col("_hx"))
        )
        ny = (
            F.when(
                (ry == 0) & (rx == 1), F.lit(s - 1) - F.col("_hx")
            )
            .when(ry == 0, F.col("_hx"))
            .otherwise(F.col("_hy"))
        )
        # materialize THIS round's columns before the next references
        # them (select barrier keeps expressions non-nested)
        out = out.select(
            *[c for c in out.columns if c not in ("_hx", "_hy", "_hd")],
            nx.alias("_hx"),
            ny.alias("_hy"),
            d.alias("_hd"),
        )
    return out.select(
        *[c for c in out.columns if c not in ("_hx", "_hy", "_hd")],
        F.col("_hd").alias(out_col),
    )


def hilbert_sql_ctes(
    src_cte: str,
    x: str,
    y: str,
    bits: int = 4,
    keep: str = "",
) -> tuple[list[str], str]:
    """The identical walk as a DuckDB CTE chain for oracle pairing:
    returns (cte_list, final_cte_name); the final CTE carries
    ``keep`` columns plus ``hd`` (the Hilbert index). Each CTE only
    references the previous one, mirroring the frame builder's
    select-barrier rounds."""
    keep_cols = f"{keep}, " if keep else ""
    ctes = [
        f"""hil0 AS (SELECT {keep_cols}CAST({x} AS BIGINT) AS hx,
               CAST({y} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd
        FROM {src_cte})"""
    ]
    for t, s in enumerate(_hilbert_steps(bits), start=1):
        ctes.append(
            f"""hil{t} AS (SELECT {keep_cols}
            CASE WHEN (CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END) = 0
                  AND (CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END) = 1
                 THEN {s - 1} - hy
                 WHEN (CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END) = 0
                 THEN hy ELSE hx END AS hx,
            CASE WHEN (CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END) = 0
                  AND (CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END) = 1
                 THEN {s - 1} - hx
                 WHEN (CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END) = 0
                 THEN hx ELSE hy END AS hy,
            hd + {s * s} * xor(3 * (CASE WHEN (hx & {s}) > 0
                                         THEN 1 ELSE 0 END),
                               (CASE WHEN (hy & {s}) > 0
                                     THEN 1 ELSE 0 END)) AS hd
        FROM hil{t - 1})"""
        )
    return ctes, f"hil{len(_hilbert_steps(bits))}"
