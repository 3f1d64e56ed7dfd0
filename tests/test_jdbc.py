"""S11 JDBC upsert sink against the Derby in-memory DB bundled with
Spark: MERGE semantics survive the DB roundtrip, the staging-table
swap is atomic, and the sink duck-types into the stream loader
(util/loader/sql.py:97-271 semantics)."""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import types as T

from cccatalog_spark.sources.jdbc import JdbcUpsertTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("val", T.StringType()),
        T.StructField("num", T.DoubleType()),
    ]
)


def _table(spark, **kw):
    db = f"memory:db_{uuid.uuid4().hex[:12]};create=true"
    return JdbcUpsertTable(
        spark, f"jdbc:derby:{db}", "tgt", ["k"], SCHEMA, **kw
    )


def test_jdbc_merge_newest_non_null_roundtrip(spark):
    t = _table(spark, partition_column="k")
    t.merge_batch(
        spark.createDataFrame([(1, "one", 1.0), (2, "two", 2.0)], SCHEMA), 0
    )
    t.merge_batch(
        spark.createDataFrame([(1, None, 10.0), (3, "three", 3.0)], SCHEMA), 1
    )
    rows = {r["k"]: (r["val"], r["num"]) for r in t.read().collect()}
    assert rows == {
        1: ("one", 10.0),  # null in newer batch didn't clobber val
        2: ("two", 2.0),
        3: ("three", 3.0),
    }


def test_jdbc_read_empty_before_first_batch(spark):
    t = _table(spark)
    assert t.read().count() == 0
    assert t.read().schema == SCHEMA


def test_jdbc_sink_composes_with_stream_loader(spark, tmp_path):
    from cccatalog_spark.streaming.loader import start_tsv_upsert_stream

    watch = tmp_path / "in"
    watch.mkdir()
    now = time.time()
    for i, rows in enumerate(
        [["1\tone\t1.0", "2\ttwo\t2.0"], ["1\t\\N\t10.0", "3\tthree\t3.0"]]
    ):
        p = str(watch / f"b{i}.tsv")
        with open(p, "w") as f:
            f.write("\n".join(rows) + "\n")
        os.utime(p, (now - 120 + i * 60, now - 120 + i * 60))

    t = _table(spark)
    q = start_tsv_upsert_stream(
        spark, str(watch), t, SCHEMA, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    rows = {r["k"]: (r["val"], r["num"]) for r in t.read().collect()}
    assert rows == {1: ("one", 10.0), 2: ("two", 2.0), 3: ("three", 3.0)}
