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
