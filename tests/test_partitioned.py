"""Hive-layout partitioned table (sources/partitioned.py): round-trip
fidelity, directory-pruning plan shape, and the dynamic-overwrite
guarantee that untouched partitions stay byte-identical."""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import functions as F

from cccatalog_spark.sources.partitioned import PartitionedTable


def _table(tmp):
    return PartitionedTable(
        os.path.join(tmp, "t"),
        "month",
        F.date_format("ts", "yyyy-MM"),
    )


def _rows(spark):
    return spark.createDataFrame(
        [
            (1, "2024-01-05 10:00:00", "a"),
            (2, "2024-01-20 11:00:00", "b"),
            (3, "2024-02-01 09:00:00", "c"),
            (4, "2024-03-15 08:00:00", "d"),
        ],
        "id long, ts string, payload string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _file_digests(root):
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                with open(p, "rb") as fh:
                    out[os.path.relpath(p, root)] = hashlib.md5(
                        fh.read()
                    ).hexdigest()
    return out


def test_round_trip_and_layout(spark):
    tmp = tempfile.mkdtemp(prefix="ccc_ptest_")
    t = _table(tmp)
    t.write(_rows(spark))
    # Hive directory layout, one dir per month
    dirs = sorted(
        d for d in os.listdir(t.path) if d.startswith("month=")
    )
    assert dirs == ["month=2024-01", "month=2024-02", "month=2024-03"]
    back = t.read(spark)
    assert back.count() == 4
    got = {r["id"]: r["month"] for r in back.collect()}
    assert got == {1: "2024-01", 2: "2024-01", 3: "2024-02", 4: "2024-03"}


def test_partition_filter_prunes_directories(spark):
    tmp = tempfile.mkdtemp(prefix="ccc_ptest_")
    t = _table(tmp)
    t.write(_rows(spark))
    scan = t.read(spark).where(F.col("month") == "2024-01")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "month" in plan.split("PartitionFilters")[1].split("]")[0]
    # the pruned scan never touches the other months' rows
    assert scan.count() == 2
    # data filters do NOT appear as partition filters
    data_scan = t.read(spark).where(F.col("payload") == "a")
    dplan = data_scan._jdf.queryExecution().executedPlan().toString()
    pf = dplan.split("PartitionFilters: [")[1].split("]")[0]
    assert "payload" not in pf


def test_dynamic_overwrite_leaves_other_partitions_byte_identical(spark):
    tmp = tempfile.mkdtemp(prefix="ccc_ptest_")
    t = _table(tmp)
    t.write(_rows(spark))
    before = _file_digests(t.path)

    patch = spark.createDataFrame(
        [(5, "2024-02-10 12:00:00", "c2")],
        "id long, ts string, payload string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    t.overwrite_partitions(patch)

    after = _file_digests(t.path)
    untouched_before = {
        k: v for k, v in before.items() if "month=2024-02" not in k
    }
    untouched_after = {
        k: v for k, v in after.items() if "month=2024-02" not in k
    }
    assert untouched_before == untouched_after  # same files, same bytes
    back = {r["id"]: r["payload"] for r in t.read(spark).collect()}
    # february fully replaced (id 3 gone, id 5 present); others intact
    assert back == {1: "a", 2: "b", 4: "d", 5: "c2"}


def test_dynamic_partition_pruning_on_dim_join(spark):
    """Star-schema DPP: joining the partitioned fact to a FILTERED dim
    on the partition column injects a runtime dynamicpruning subquery
    into the fact scan's PartitionFilters — the fact side reads only
    the dim-selected partitions even though the selected months are
    unknown at plan time. The optimizer feature a 100 TB star join
    lives on; pinned here so a session-conf regression can't silently
    turn it off."""
    tmp = tempfile.mkdtemp(prefix="ccc_dpp_")
    t = _table(tmp)
    t.write(_rows(spark))
    dim = spark.createDataFrame(
        [("2024-01", "keep"), ("2024-02", "drop"), ("2024-03", "drop")],
        "month string, tag string",
    )
    fact = t.read(spark)
    joined = fact.join(dim.where(F.col("tag") == "keep"), "month")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "dynamicpruning" in pf.lower()
    assert joined.count() == 2  # only month=2024-01 rows survive
