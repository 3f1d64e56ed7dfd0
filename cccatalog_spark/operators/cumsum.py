"""Scale-safe GLOBAL running sum — the two-phase prefix-sum that
replaces the single-partition window.

A plain ``sum().over(Window.orderBy(...))`` with no partitionBy plans
as ``Exchange SinglePartition`` + one sorting task holding the whole
dataset — the classic scale cliff (Spark even logs a warning). The
distributed form here:

1. range-partition by the global order and sort within partitions
   (parallel, spillable — the same machinery as a global sort);
2. per-partition running sums via a window PARTITIONED by the
   physical partition id (streaming over each sorted partition);
3. per-partition totals (one tiny aggregate, ≤ #partitions rows)
   turned into per-partition starting offsets by a driver-free
   broadcast join;
4. row prefix = local prefix + partition offset.

The result is invariant to where the range boundaries fall (every
row's true prefix total is partition-independent), so the sampled
boundaries of ``repartitionByRange`` do not affect the output — with
integer weights the result is exact; with doubles it is one specific
association order (round downstream as usual).

Used by q117's vocabulary-coverage truncation ("smallest vocabulary
covering 95% of token mass") — any "take until global fraction"
policy is this operator + one filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_running_sum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    *,
    out_col: str = "running",
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds ``out_col`` = inclusive prefix sum of ``value_col`` in the
    total order given by ``order_cols`` (must be total for a
    deterministic result). No single-partition exchange anywhere in
    the plan."""
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"
    )
    d = (
        df.repartitionByRange(int(n), *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.withColumn("_local", F.sum(value_col).over(w_local))
    totals = local.groupBy("_pid").agg(F.sum(value_col).alias("_ptot"))
    w_off = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the offsets frame is ≤ #partitions rows — the single-partition
    # window HERE is over a bounded catalog, not the data
    offsets = totals.withColumn(
        "_off", F.sum("_ptot").over(w_off) - F.col("_ptot")
    ).select("_pid", "_off")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_local") + F.col("_off"))
        .drop("_pid", "_local", "_off")
    )
