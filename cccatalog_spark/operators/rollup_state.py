"""Mergeable partial-aggregate state: build fine-grain partials once,
re-aggregate them to any coarser grain without touching raw rows — the
incremental-rollup pattern that makes daily→weekly→monthly reporting
O(partials) instead of O(raw) at 100 TB (and what Spark itself does
map-side inside one job; this operator materializes the same algebra
ACROSS jobs/days).

State carried per grain bucket:

- algebraic aggregates: count, sum, min, max (merge = sum/sum/min/max;
  avg is derived at read time as sum/count, never stored);
- distinct-count: HyperLogLog registers (functions/sketches.
  hll_registers) — merge = groupBy-max over registers, and because max
  is associative and idempotent the merged estimate is IDENTICAL to
  the estimate computed directly from raw rows, which is how the
  oracle checks the whole path exactly.

Scale shape: partials are one exchange keyed by the fine grain;
merging partials is an exchange over partial rows only (days, not
events). Late data re-lands in its fine-grain bucket and the merge is
simply re-run over the affected buckets — the same bucket-selective
idea as streaming/loader.py's MERGE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cccatalog_spark.functions.sketches import hll_estimate, hll_registers


def build_partials(
    df: DataFrame,
    grain_col: str,
    value_col: str,
    distinct_col: str,
) -> tuple[DataFrame, DataFrame]:
    """(scalars, registers) partial state keyed by ``grain_col``.
    scalars: (grain, n, sum_v, min_v, max_v); registers: HLL state for
    ``distinct_col`` at the same grain."""
    scalars = df.groupBy(grain_col).agg(
        F.count("*").alias("n"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )
    regs = hll_registers(df, [grain_col], distinct_col)
    return scalars, regs


def merge_partials(
    scalars: DataFrame,
    regs: DataFrame,
    fine_col: str,
    coarse: F.Column,
    *,
    round_to: int = 2,
) -> DataFrame:
    """Re-aggregate partial state to the grain of ``coarse`` (an
    expression over ``fine_col``): returns one row per coarse bucket
    with (n_rows, sum_v, avg_v, min_v, max_v, approx_distinct).
    Touches only partial rows — never the raw table."""
    c = coarse.alias("_g")
    sc = scalars.select(c, "n", "sum_v", "min_v", "max_v").groupBy("_g").agg(
        F.sum("n").alias("n_rows"),
        F.sum("sum_v").alias("_sum"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )
    merged_regs = (
        regs.select(c, "_j", "_m").groupBy("_g", "_j").agg(F.max("_m").alias("_m"))
    )
    est = hll_estimate(merged_regs, ["_g"], out_col="approx_distinct")
    out = sc.join(est.select("_g", "approx_distinct"), "_g")
    return out.select(
        F.col("_g"),
        "n_rows",
        F.round(F.col("_sum"), round_to).alias("sum_v"),
        F.round(F.col("_sum") / F.col("n_rows"), round_to + 2).alias("avg_v"),
        "min_v",
        "max_v",
        "approx_distinct",
    )
