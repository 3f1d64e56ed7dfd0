"""Stream-stream interval join (streaming/joins.py): cross-batch
matches through symmetric keyed state, gap bounds, key isolation."""

from __future__ import annotations

import os
import time
import uuid

import pytest

from pyspark.sql import functions as F

from cccatalog_spark.streaming.joins import interval_join_streams


def _write_batches(spark, base, name, batches):
    """batches: list of [(id, user, sec), ...] -> one file each,
    mtimes ordered so the file source drains them in order."""
    src = os.path.join(base, name)
    os.makedirs(src)
    now = time.time()
    for i, rows in enumerate(batches):
        path = os.path.join(src, f"b{i}.tsv")
        with open(path, "w") as f:
            for r in rows:
                f.write("\t".join(str(x) for x in r) + "\n")
        os.utime(path, (now - 300 + i * 60,) * 2)
    return src


def _read(spark, src, id_alias, ts_alias):
    return (
        spark.readStream.option("sep", "\t")
        .schema("event_id long, user_id long, sec long")
        .option("maxFilesPerTrigger", "1")
        .csv(src)
        .select(
            F.col("event_id").alias(id_alias),
            "user_id",
            F.timestamp_seconds(F.col("sec")).alias(ts_alias),
        )
    )


def test_interval_join_cross_batch_and_bounds(spark, tmp_path):
    base = str(tmp_path / f"ssj_{uuid.uuid4().hex[:6]}")
    os.makedirs(base)
    # left: clicks. batch0 has user 1 @t=100 and user 2 @t=100
    # right: purchases. batch0 user 2 @t=150 (same-batch match);
    # batch1 user 1 @t=200 (cross-batch match), user 1 @t=2000 (out of
    # gap), user 3 @t=150 (no click)
    lsrc = _write_batches(
        spark, base, "l", [[(10, 1, 100), (11, 2, 100)], []]
    )
    rsrc = _write_batches(
        spark,
        base,
        "r",
        [[(20, 2, 150)], [(21, 1, 200), (22, 1, 2000), (23, 3, 150)]],
    )
    joined = interval_join_streams(
        _read(spark, lsrc, "l_id", "l_ts"),
        _read(spark, rsrc, "r_id", "r_ts"),
        "user_id",
        "l_ts",
        "r_ts",
        max_gap="5 minutes",
        watermark="1 hour",
    ).select(
        "l_id", "r_id", "user_id",
        F.unix_seconds("l_ts").alias("ls"),
        F.unix_seconds("r_ts").alias("rs"),
    )
    sink = f"tsj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["l_id"], r["r_id"], r["user_id"])
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    )
    # user 2 same-batch, user 1 cross-batch; out-of-gap and unmatched
    # keys excluded; each pair exactly once
    assert got == [(10, 21, 1), (11, 20, 2)]


def test_interval_join_requires_distinct_ts_names(spark):
    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError):
        interval_join_streams(df, df, "value", "timestamp", "timestamp")


def test_enrich_stream_joins_current_dim_snapshot(spark, tmp_path):
    import os
    import time
    import uuid

    from cccatalog_spark.streaming.joins import enrich_stream

    src = str(tmp_path / "in")
    os.makedirs(src)
    now = time.time()
    for i, rows in enumerate([[(1, 7, 100)], [(2, 8, 200), (3, 9, 300)]]):
        p = os.path.join(src, f"b{i}.tsv")
        with open(p, "w") as f:
            for r in rows:
                f.write("\t".join(map(str, r)) + "\n")
        os.utime(p, (now - 300 + i * 60,) * 2)
    dim = spark.createDataFrame(
        [(7, "gold"), (8, "silver")], "user_id long, tier string"
    )
    stream = (
        spark.readStream.option("sep", "\t")
        .schema("event_id long, user_id long, sec long")
        .option("maxFilesPerTrigger", "1")
        .csv(src)
    )
    sink = f"enr_{uuid.uuid4().hex[:8]}"
    q = (
        enrich_stream(stream, dim, ["user_id"], how="left")
        .select("event_id", "user_id", "tier")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        tuple(r) for r in spark.sql(f"SELECT * FROM {sink}").collect()
    )
    # left join: unmatched user 9 keeps the row with null tier
    assert got == [(1, 7, "gold"), (2, 8, "silver"), (3, 9, None)]
