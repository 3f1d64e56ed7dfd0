"""Streaming loader: oldest-first drain, per-batch MERGE semantics,
idempotent snapshot commit (§2.9 loader DAG behaviors)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cccatalog_spark.streaming.loader import (
    ParquetUpsertTable,
    start_tsv_upsert_stream,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("val", T.StringType()),
        T.StructField("num", T.DoubleType()),
    ]
)


def _write_tsv(path: str, rows: list[str], mtime: float) -> None:
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")
    os.utime(path, (mtime, mtime))


def test_stream_merges_batches_oldest_first(spark, tmp_path):
    watch = tmp_path / "in"
    watch.mkdir()
    now = time.time()
    # batch 1: two keys; batch 2 (newer): updates k=1 (num only, val \N),
    # inserts k=3 — newest-non-null must keep k=1's val from batch 1
    _write_tsv(str(watch / "b1.tsv"), ["1\tone\t1.0", "2\ttwo\t2.0"], now - 120)
    _write_tsv(str(watch / "b2.tsv"), ["1\t\\N\t10.0", "3\tthree\t3.0"], now - 60)

    table = ParquetUpsertTable(spark, str(tmp_path / "tbl"), ["k"], SCHEMA)
    q = start_tsv_upsert_stream(
        spark, str(watch), table, SCHEMA, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    out = {r["k"]: r for r in table.read().collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["val"] == "one"  # null in newer batch didn't clobber
    assert out[1]["num"] == 10.0  # newer non-null won
    assert out[3]["val"] == "three"


def test_stream_dedups_within_batch(spark, tmp_path):
    watch = tmp_path / "in"
    watch.mkdir()
    _write_tsv(
        str(watch / "b.tsv"), ["7\ta\t1.0", "7\tb\t2.0"], time.time() - 60
    )
    table = ParquetUpsertTable(spark, str(tmp_path / "tbl"), ["k"], SCHEMA)
    q = start_tsv_upsert_stream(
        spark, str(watch), table, SCHEMA, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    assert table.read().count() == 1


def test_stateful_running_counts_across_batches(spark, tmp_path):
    """applyInPandasWithState: state must carry across micro-batches
    (two files, maxFilesPerTrigger=1 → two triggers)."""
    import time

    from cccatalog_spark.streaming.stateful import running_counts

    watch = tmp_path / "in"
    watch.mkdir()
    now = time.time()
    _write_tsv(str(watch / "b1.tsv"), ["a\t1", "a\t2", "b\t3"], now - 120)
    _write_tsv(str(watch / "b2.tsv"), ["a\t4", "c\t5"], now - 60)

    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )
    stream = (
        spark.readStream.option("sep", "\t")
        .option("maxFilesPerTrigger", "1")
        .schema(schema)
        .csv(str(watch))
    )
    q = (
        running_counts(stream, "k")
        .writeStream.format("memory")
        .queryName("running_counts_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM running_counts_test").collect()
    # update mode: one emission per key per touched trigger; the LAST
    # emission per key is the running total across batches
    last = {}
    for r in rows:
        last[r["k"]] = r["n"]  # later triggers append later
    assert last == {"a": 3, "b": 1, "c": 1}
    # 'a' must have been emitted twice (batch1: 2, batch2: 3)
    a_vals = [r["n"] for r in rows if r["k"] == "a"]
    assert sorted(a_vals) == [2, 3]


def test_parquet_upsert_table_snapshot_swap(spark, tmp_path):
    table = ParquetUpsertTable(spark, str(tmp_path / "tbl"), ["k"], SCHEMA)
    b1 = spark.createDataFrame([(1, "x", 1.0)], SCHEMA)
    table.merge_batch(b1, 0)
    b2 = spark.createDataFrame([(1, None, 5.0), (2, "y", 2.0)], SCHEMA)
    table.merge_batch(b2, 1)
    out = {r["k"]: r for r in table.read().collect()}
    assert out[1]["val"] == "x" and out[1]["num"] == 5.0
    assert out[2]["val"] == "y"
    # no staging leftovers
    assert not [p for p in os.listdir(tmp_path) if "staging" in p]
