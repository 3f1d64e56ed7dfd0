"""Streaming tumbling windows with watermark: end-to-end through a
file stream into a memory sink, including late-row handling, plus the
reingestion schedule policy."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cccatalog_spark.plans.schedules import (
    reingestion_day_shifts,
    reingestion_schedule,
)
from cccatalog_spark.streaming.windows import tumbling_counts

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("kind", T.StringType()),
    ]
)


def test_tumbling_counts_stream(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        "2024-01-01T10:05:00\ta",
        "2024-01-01T10:55:00\ta",
        "2024-01-01T11:05:00\tb",
        "2024-01-01T10:10:00\ta",  # in-window duplicate hour, still on time
    ]
    (src / "one.tsv").write_text("\n".join(rows) + "\n")

    stream = (
        spark.readStream.option("sep", "\t").schema(SCHEMA).csv(str(src))
    )
    agg = tumbling_counts(stream, "ts", "kind", window="1 hour",
                          watermark="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["kind"]): r["n"]
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    assert got[("2024-01-01 10:00:00", "a")] == 3
    assert got[("2024-01-01 11:00:00", "b")] == 1


def test_reingestion_day_shifts():
    # reference strategy shape: daily for a week, weekly for a month,
    # monthly-ish beyond (image-data-reingestion-strategy.md:52-120)
    assert reingestion_day_shifts([(1, 2), (7, 3)]) == [1, 2, 9, 16, 23]
    assert reingestion_day_shifts([]) == []


def test_reingestion_schedule_dates():
    base = dt.date(2024, 3, 10)
    days = reingestion_schedule(base, [(1, 2), (7, 1)])
    assert days == [
        dt.date(2024, 3, 10),
        dt.date(2024, 3, 9),
        dt.date(2024, 3, 8),
        dt.date(2024, 3, 1),
    ]


def test_append_mode_emits_only_watermark_passed_windows(spark, tmp_path):
    """Append-mode emission contract pinned on this Spark version:
    after the stream drains (availableNow + a final no-data batch),
    exactly the windows whose END the final watermark passed have been
    emitted; open windows stay in state and never reach the sink."""
    import os
    import time

    src = tmp_path / "src"
    src.mkdir()
    T0 = 1767225600
    b0 = "\n".join(f"{T0 + i * 60}\tk{i % 2}" for i in range(10))
    b1 = f"{T0 + 720}\tk0"
    now = time.time()
    for i, content in enumerate([b0, b1]):
        p = str(src / f"b{i}.tsv")
        with open(p, "w") as f:
            f.write(content + "\n")
        os.utime(p, (now - 120 + i * 60, now - 120 + i * 60))

    stream = (
        spark.readStream.option("sep", "\t")
        .schema("sec long, k string")
        .option("maxFilesPerTrigger", "1")
        .csv(str(src))
    )
    agg = (
        stream.select(F.timestamp_seconds("sec").alias("ts"), "k")
        .withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "5 minutes"), F.col("k"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("append_pin")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["s"] - T0, r["k"]): r["n"]
        for r in spark.sql(
            "SELECT unix_timestamp(window.start) s, k, n FROM append_pin"
        ).collect()
    }
    # final watermark = (T0+720) - 300 = T0+420: window [0,300) closed
    # and emitted; [300,600) and [600,900) still open → absent
    assert got == {(0, "k0"): 3, (0, "k1"): 2}


def test_late_row_drop_contract(spark, tmp_path):
    """Pin the late-record drop rule q81 relies on (this Spark
    version): a row in batch N is dropped iff its window end <= the
    watermark in force during batch N-1 (state already evicted). A
    late row whose window is still open — even one far behind the
    current watermark — is absorbed, not dropped."""
    import os
    import time

    src = tmp_path / "src"
    src.mkdir()
    T0 = 1767225600
    batches = [
        f"{T0 + 60}\tk\n{T0 + 120}\tk",  # window [0,300) n=2
        f"{T0 + 900}\tk",   # next batch's wm -> 600: [0,300) evicted then
        f"{T0 + 1200}\tk",  # batch running with wm=600 evicts+emits [0,300)
        f"{T0 + 90}\tk",    # late row for the emitted window -> dropped
    ]
    now = time.time()
    for i, content in enumerate(batches):
        p = str(src / f"b{i}.tsv")
        with open(p, "w") as f:
            f.write(content + "\n")
        os.utime(p, (now - 300 + i * 60, now - 300 + i * 60))

    stream = (
        spark.readStream.option("sep", "\t")
        .schema("sec long, k string")
        .option("maxFilesPerTrigger", "1")
        .csv(str(src))
    )
    agg = (
        stream.select(F.timestamp_seconds("sec").alias("ts"), "k")
        .withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "5 minutes"), F.col("k"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_drop_pin")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dropped = sum(
        o.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for o in p.get("stateOperators", [])
    )
    got = {
        (r["s"] - T0, r["k"]): r["n"]
        for r in spark.sql(
            "SELECT unix_timestamp(window.start) s, k, n FROM late_drop_pin"
        ).collect()
    }
    # the late T0+90 row was dropped (not re-emitted, not absorbed):
    # [0,300) emitted exactly once with the original n=2
    assert dropped == 1
    assert got[(0, "k")] == 2


# ---------------------------------------------------------------------------
# session_counts (streaming merging-session windows)
# ---------------------------------------------------------------------------

def test_session_windows_merge_across_batches(spark, tmp_path):
    import os
    import time
    import uuid

    from cccatalog_spark.streaming.windows import session_counts

    base = str(tmp_path / "sess")
    src = os.path.join(base, "in")
    os.makedirs(src)
    # batch0: user 1 @100, @1000 (one session, gap < 1800)
    # batch1: @2800 extends it (1000+1800=2800 boundary-equal MERGES);
    #         @99999 starts a fresh session; user 2 independent @50
    batches = [
        [(1, 1, 100), (2, 1, 1000), (3, 2, 50)],
        [(4, 1, 2800), (5, 1, 99999)],
    ]
    now = time.time()
    for i, rows in enumerate(batches):
        p = os.path.join(src, f"b{i}.tsv")
        with open(p, "w") as f:
            for r in rows:
                f.write("\t".join(map(str, r)) + "\n")
        os.utime(p, (now - 300 + i * 60,) * 2)

    stream = (
        spark.readStream.option("sep", "\t")
        .schema("event_id long, user_id long, sec long")
        .option("maxFilesPerTrigger", "1")
        .csv(src)
        .select("user_id", F.timestamp_seconds(F.col("sec")).alias("ts"))
    )
    sink = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        session_counts(stream, "ts", "user_id")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["user_id"], r["session_start"].timestamp(),
         r["session_end"].timestamp(), r["n_events"])
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    )
    assert got == [
        (1, 100.0, 4600.0, 3),      # cross-batch + boundary-equal merge
        (1, 99999.0, 101799.0, 1),  # fresh session after the gap
        (2, 50.0, 1850.0, 1),
    ]
