"""Two-phase global running sum (operators/cumsum.py): exact prefix
sums without a single-partition exchange."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cccatalog_spark.operators.cumsum import global_running_sum


def test_matches_single_partition_window(spark):
    df = spark.range(1000).select(
        F.col("id"), ((F.col("id") * 37) % 101).alias("w")
    )
    two_phase = {
        r["id"]: r["running"]
        for r in global_running_sum(
            df, [F.asc("id")], "w", num_partitions=7
        ).collect()
    }
    w = Window.orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = {
        r["id"]: r["running"]
        for r in df.withColumn("running", F.sum("w").over(w)).collect()
    }
    assert two_phase == naive


def test_partition_count_does_not_change_result(spark):
    df = spark.range(500).select(F.col("id"), F.lit(1).alias("w"))
    for n in (1, 3, 16):
        got = global_running_sum(df, [F.asc("id")], "w", num_partitions=n)
        rows = {r["id"]: r["running"] for r in got.collect()}
        assert rows == {i: i + 1 for i in range(500)}, n


def test_no_single_partition_exchange_over_data(spark):
    df = spark.range(10_000).select(F.col("id"), F.lit(1).alias("w"))
    plan = (
        global_running_sum(df, [F.asc("id")], "w", num_partitions=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the data path is rangepartitioned; the only SinglePartition
    # exchange allowed is the ≤8-row offsets catalog
    data_side = plan.split("BroadcastExchange")[0]
    assert "rangepartitioning" in data_side
    assert "Exchange SinglePartition" not in data_side

    # the naive global window DOES show the anti-pattern
    w = Window.orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive_plan = (
        df.withColumn("r", F.sum("w").over(w))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" in naive_plan
