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


def test_versioned_table_time_travel_and_vacuum(spark, tmp_path):
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    from cccatalog_spark.streaming.loader import VersionedUpsertTable

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
    )
    t = VersionedUpsertTable(
        spark, str(tmp_path / "t"), ["k"], schema, keep_versions=2
    )
    for i in range(4):
        batch = spark.createDataFrame([(j, i) for j in range(5)], schema)
        t.merge_batch(batch, i)
    # 4 commits: first archives nothing; then v0, v1, v2; keep 2 -> v1, v2
    assert t.versions() == [1, 2]
    assert {r["v"] for r in t.read().collect()} == {3}
    assert {r["v"] for r in t.read_version(2).collect()} == {2}
    # CDF between v2 and head: all 5 keys updated 2 -> 3
    cdf = t.changes_since(2, ["v"]).collect()
    assert all(r["change_type"] == "update" for r in cdf)
    assert len(cdf) == 5
    import pytest

    with pytest.raises(FileNotFoundError):
        t.read_version(0)


def test_versioned_table_stale_writer_cannot_commit(spark, tmp_path):
    from pyspark.sql import types as T

    from cccatalog_spark.streaming.loader import (
        StaleWriterError,
        VersionedUpsertTable,
    )

    schema = T.StructType([T.StructField("k", T.LongType())])
    path = str(tmp_path / "t2")
    w1 = VersionedUpsertTable(spark, path, ["k"], schema)
    w2 = VersionedUpsertTable(spark, path, ["k"], schema)  # supersedes w1
    batch = spark.createDataFrame([(1,)], schema)
    import pytest

    with pytest.raises(StaleWriterError):
        w1.merge_batch(batch, 0)
    w2.merge_batch(batch, 0)
    assert w2.read().count() == 1
