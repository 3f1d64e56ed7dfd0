"""Compaction planning + table checksums (operators/maintenance.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cccatalog_spark.operators.maintenance import (
    compaction_summary,
    plan_compaction,
    table_checksum,
)


def _files(spark, rows):
    return spark.createDataFrame(rows, "g string, f long, sz long")


def test_compaction_bins_hand_computed(spark):
    rows = [
        ("a", 1, 50), ("a", 2, 40), ("a", 3, 40),   # cum_before 0,50,90
        ("a", 4, 300),                              # cum_before 130 -> bin 1
        ("a", 5, 10),                               # cum_before 430 -> bin 4
        ("b", 1, 10),
    ]
    plan = {
        (r["g"], r["f"]): r["bin"]
        for r in plan_compaction(
            _files(spark, rows), "g", "sz", ["f"], 100
        ).collect()
    }
    assert plan == {
        ("a", 1): 0, ("a", 2): 0, ("a", 3): 0,
        ("a", 4): 1, ("a", 5): 4, ("b", 1): 0,
    }
    with pytest.raises(ValueError):
        plan_compaction(_files(spark, rows), "g", "sz", ["f"], 0)


def test_compaction_summary_accounts_every_byte(spark):
    rows = [("a", i, 30) for i in range(10)] + [("b", 0, 1000)]
    plan = plan_compaction(_files(spark, rows), "g", "sz", ["f"], 100)
    summ = compaction_summary(plan, "g", "sz").collect()
    assert sum(r["bin_bytes"] for r in summ) == 30 * 10 + 1000
    assert sum(r["n_files"] for r in summ) == 11
    # group a packs ~3 files of 30 per 100-byte bin
    a_bins = {r["bin"]: r["n_files"] for r in summ if r["g"] == "a"}
    assert max(a_bins.values()) >= 3


def test_checksum_invariant_under_layout_and_order(spark):
    df = spark.range(1000).select(
        F.col("id").alias("a"), (F.col("id") * 7 % 31).alias("b")
    )
    base = {
        r["bucket"]: (r["n_rows"], r["checksum"])
        for r in table_checksum(df, ["a", "b"]).collect()
    }
    shuffled = df.orderBy(F.rand(7)).repartition(17)
    got = {
        r["bucket"]: (r["n_rows"], r["checksum"])
        for r in table_checksum(shuffled, ["a", "b"]).collect()
    }
    assert got == base


def test_checksum_localizes_single_row_change(spark):
    df = spark.range(1000).select(
        F.col("id").alias("a"), F.lit("x").alias("b")
    )
    tampered = df.withColumn(
        "b", F.when(F.col("a") == 123, F.lit("y")).otherwise(F.col("b"))
    )
    base = {r["bucket"]: r["checksum"] for r in table_checksum(df, ["a", "b"]).collect()}
    tamp = {r["bucket"]: r["checksum"] for r in table_checksum(tampered, ["a", "b"]).collect()}
    diff = [b for b in set(base) | set(tamp) if base.get(b) != tamp.get(b)]
    assert 1 <= len(diff) <= 2  # old row's bucket and/or new row's bucket
