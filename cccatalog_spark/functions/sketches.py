"""Cardinality sketches (LLM-pipeline ops beyond the reference).

KMV — k-minimum-values distinct-count sketch (Bar-Yossef et al. 2002,
"Counting distinct elements in a data stream"): hash every value into
a uniform 60-bit space, keep the k smallest DISTINCT hashes per group;
if fewer than k exist the count is exact, else estimate
``(k-1) * 2^60 / h_k`` where ``h_k`` is the k-th smallest hash.

Why KMV here instead of HyperLogLog: the estimate is a pure function
of a deterministic hash (md5), so it is reproducible across engines —
the DuckDB oracle recomputes the identical number, giving the sketch a
hard correctness gate (Spark's native ``approx_count_distinct`` HLL++
and DuckDB's HLL disagree by construction, so they can only be
rows-only checked). Error is ~1/sqrt(k-2) relative.

Scale shape: one exchange on the group key; the k-smallest selection
is a window sort (spillable, no driver collect, no per-group
collect_set of the full distinct set). At 100 TB you'd pre-aggregate
``distinct(group, hash)`` map-side (the .distinct() below does —
partial aggregation before the shuffle) so the sorted data per group
is the distinct-hash set, not the raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HASH_SPACE = float(1 << 60)  # 15 hex digits


def _hash60(c) -> "F.Column":
    """Uniform 60-bit integer hash from md5 (engine-portable: the
    oracle re-derives the same value from the same hex digits)."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
    *,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col`` via a KMV
    sketch. Returns ``group_cols + [n_hashes, out_col]`` where
    ``out_col`` is a double: exact when the group has < k distinct
    values, else the KMV estimate rounded to 2 decimals.
    """
    h = (
        df.select(*group_cols, _hash60(F.col(value_col)).alias("_h"))
        .distinct()  # partial agg map-side, then one exchange
    )
    w = Window.partitionBy(*group_cols).orderBy("_h")
    topk = h.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= k
    )
    agg = topk.groupBy(*group_cols).agg(
        F.count("*").alias("n_hashes"),
        F.max(F.when(F.col("_rn") == k, F.col("_h"))).alias("_hk"),
    )
    est = F.when(
        F.col("n_hashes") < k, F.col("n_hashes").cast("double")
    ).otherwise(
        F.round(F.lit((k - 1) * _HASH_SPACE) / F.col("_hk"), 2)
    )
    return agg.withColumn(out_col, est).drop("_hk")


# -- HyperLogLog ------------------------------------------------------------

_HLL_M = 256  # registers (b = 8 bucket bits)
_HLL_W = 60 - 8  # payload bits per hash after bucketing
# alpha_m * m^2 folded to one double literal so Spark and the SQL
# oracle evaluate the bit-identical constant
_HLL_ALPHA_M2 = 0.7213 / (1.0 + 1.079 / _HLL_M) * float(_HLL_M * _HLL_M)


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    out_col: str = "hll_distinct",
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate (Flajolet et al. 2007)
    with md5-deterministic registers, so — unlike the engine-native
    HLL++ — the DuckDB oracle recomputes the IDENTICAL estimate.

    Register j = h mod 256 takes max over rho(h div 256), where rho is
    1 + the trailing-zero count of the 52-bit payload (trailing-zero
    rank is the classic PCSA/HLL variant — identical analysis to
    leading-zero rank for a uniform hash, and exactly computable in
    integer arithmetic in both engines via ``w & -w``). Estimate is
    alpha_m·m²/Z with the small-range linear-counting correction
    (E ≤ 2.5m and V > 0 → m·ln(m/V)).

    Scale shape vs KMV above: ONE exchange keyed (group, register) with
    map-side partial max — state per group is 256 registers, not k
    sorted hashes, and no window sort. This is the mergeable-sketch
    shape you'd feed a rollup at 100 TB.
    """
    reg = hll_registers(df, group_cols, value_col)
    return hll_estimate(reg, group_cols, out_col=out_col)


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """The mergeable HLL state: ``(group_cols..., _j, _m)`` — max rho
    per register. Registers merge by a further groupBy-max (max is
    associative/idempotent), which is what lets daily partials roll up
    to coarser grains without touching raw rows (operators/
    rollup_state.py)."""
    m = _HLL_M
    h = df.select(*group_cols, _hash60(F.col(value_col)).alias("_h"))
    b = h.select(
        *group_cols,
        (F.col("_h") % m).alias("_j"),
        F.expr(f"_h div {m}").alias("_w"),
    )
    rho = F.when(F.col("_w") == 0, F.lit(_HLL_W + 1)).otherwise(
        F.round(F.log2(F.expr("_w & -_w"))).cast("int") + 1
    )
    return (
        b.withColumn("_rho", rho)
        .groupBy(*group_cols, "_j")
        .agg(F.max("_rho").alias("_m"))
    )


def hll_estimate(
    reg: DataFrame, group_cols: list[str], *, out_col: str = "hll_distinct"
) -> DataFrame:
    """Fold a register frame (``hll_registers`` output, possibly
    re-merged to a coarser grain) into the HLL estimate."""
    m = _HLL_M
    agg = reg.groupBy(*group_cols).agg(
        F.count("*").cast("int").alias("n_used"),
        F.sum(F.pow(F.lit(2.0), -F.col("_m"))).alias("_zu"),
    )
    v = (F.lit(m) - F.col("n_used")).cast("double")
    z = v + F.col("_zu")  # empty registers contribute 2^0 = 1 each
    e_raw = F.lit(_HLL_ALPHA_M2) / z
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (F.col("n_used") < m),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(e_raw)
    return agg.select(
        *group_cols, "n_used", F.round(est, 4).alias(out_col)
    )
