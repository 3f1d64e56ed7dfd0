"""As-of and interval join semantics on crafted micro-frames:
boundary inclusion/exclusion, ties, unmatched rows, bucket-boundary
independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from cccatalog_spark.operators.temporal import asof_join, interval_join


def _ts(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    for name, dtype in df.dtypes:
        if name.endswith("ts") and dtype == "string":
            df = df.withColumn(name, F.col(name).cast("timestamp"))
    return df


def test_asof_join_latest_at_or_before(spark):
    left = _ts(
        spark,
        [
            (1, "2024-01-01 10:00:00", "l1"),
            (1, "2024-01-01 12:00:00", "l2"),
            (1, "2024-01-01 08:00:00", "l0"),  # before any right row
            (2, "2024-01-01 10:00:00", "l3"),  # no right rows at all
        ],
        "k int, ts string, tag string",
    )
    right = _ts(
        spark,
        [
            (1, "2024-01-01 09:00:00", 100.0),
            (1, "2024-01-01 12:00:00", 200.0),  # exact tie with l2
        ],
        "k int, ts string, v double",
    )
    out = {
        r["tag"]: r["v_asof"]
        for r in asof_join(
            left, right, on="k", ts="ts", right_cols=["v"]
        ).collect()
    }
    assert out == {"l1": 100.0, "l2": 200.0, "l0": None, "l3": None}


def test_interval_join_boundaries_and_bucket_independence(spark):
    events = _ts(
        spark,
        [
            (1, "2024-01-01 10:00:00", "on_start"),   # inclusive
            (1, "2024-01-01 10:44:59", "inside"),
            (1, "2024-01-01 10:45:00", "on_end"),     # exclusive
            (1, "2024-01-01 09:59:59", "before"),
            (2, "2024-01-01 10:10:00", "other_key"),
        ],
        "k int, ts string, tag string",
    )
    intervals = _ts(
        spark,
        [(1, "2024-01-01 10:00:00", "2024-01-01 10:45:00")],
        "k int, start_ts string, end_ts string",
    )
    for bucket in ("1 hour", "15 minutes"):
        got = sorted(
            r["tag"]
            for r in interval_join(
                events, intervals, on="k", ts="ts",
                start="start_ts", end="end_ts", bucket=bucket,
            ).collect()
        )
        assert got == ["inside", "on_start"], bucket


def test_interval_join_overlapping_windows_yield_pairs(spark):
    events = _ts(
        spark, [(1, "2024-01-01 10:30:00", "e")], "k int, ts string, tag string"
    )
    intervals = _ts(
        spark,
        [
            (1, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
            (1, "2024-01-01 10:15:00", "2024-01-01 10:45:00"),
        ],
        "k int, start_ts string, end_ts string",
    )
    out = interval_join(
        events, intervals, on="k", ts="ts", start="start_ts", end="end_ts"
    )
    assert out.count() == 2  # one pair per containing window


def test_resample_ffill_model(spark):
    import datetime as dt

    import pyspark.sql.functions as F

    from cccatalog_spark.operators.temporal import resample_ffill

    d = dt.date
    rows = [
        # key a: obs on day 1 and 4 -> days 2,3 filled with day-1 value
        ("a", d(2024, 1, 1), 10.0),
        ("a", d(2024, 1, 1), 20.0),   # same-day second obs -> mean 15
        ("a", d(2024, 1, 4), 40.0),
        # key b: single day -> single grid row, no gaps
        ("b", d(2024, 2, 10), 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, day date, v double")
    out = {
        (r["k"], str(r["day"])): (r["value"], r["is_gap"])
        for r in resample_ffill(df, "k", F.col("day"), F.col("v")).collect()
    }
    assert out[("a", "2024-01-01")] == (15.0, False)
    assert out[("a", "2024-01-02")] == (15.0, True)
    assert out[("a", "2024-01-03")] == (15.0, True)
    assert out[("a", "2024-01-04")] == (40.0, False)
    assert out[("b", "2024-02-10")] == (5.0, False)
    assert len(out) == 5


def test_crawl_schedule_spacing_and_default_delay(spark):
    from cccatalog_spark.operators.temporal import crawl_schedule

    frontier = spark.createDataFrame(
        [
            (1, "a.com", 50), (2, "a.com", 90), (3, "a.com", 90),
            (4, "x.io", 10),
        ],
        "id long, host string, priority long",
    )
    delays = spark.createDataFrame([("a.com", 2.0)], "host string, delay_s double")
    got = {
        r["id"]: (r["rank"], r["fetch_at"])
        for r in crawl_schedule(frontier, "id", "host", "priority", delays)
        .collect()
    }
    # a.com: priority 90 (id 2), 90 (id 3 tiebreak), 50 -> delay 2.0
    assert got[2] == (1, 0.0)
    assert got[3] == (2, 2.0)
    assert got[1] == (3, 4.0)
    # x.io absent from dim -> default 1.0
    assert got[4] == (1, 0.0)


def test_sessionize_gap_semantics(spark):
    import pyspark.sql.functions as F

    from cccatalog_spark.operators.temporal import sessionize

    rows = [
        ("u", 0), ("u", 100), ("u", 200),     # session 1
        ("u", 4000),                           # gap > 3600 -> session 2
        ("u", 4100), ("u", 8000),              # gap 3900 -> session 3
        ("v", 50),                             # separate key
    ]
    df = spark.createDataFrame(rows, "k string, sec long")
    out = {
        (r["k"], r["sec"]): r["session_id"]
        for r in sessionize(df, "k", "sec", 3600).collect()
    }
    assert out[("u", 0)] == out[("u", 100)] == out[("u", 200)] == 1
    assert out[("u", 4000)] == out[("u", 4100)] == 2
    assert out[("u", 8000)] == 3
    assert out[("v", 50)] == 1


def test_match_event_sequence_greedy_semantics(spark):
    """Pinned CEP semantics: skip-past-last-row, reluctant skip,
    window-violation retries from anchor+1, exhaustion ends scan."""
    from cccatalog_spark.operators.temporal import match_event_sequence

    rows = [
        # user 1: A x B A B -> one match (1st A with 1st B); the
        # second A+B pair starts after the match end -> second match
        (1, 1, "A", 10), (1, 2, "x", 11), (1, 3, "B", 12),
        (1, 4, "A", 20), (1, 5, "B", 25),
        # user 2: A .. B too far (window 5), retry finds A(t=8)->B(t=9)
        (2, 1, "A", 0), (2, 2, "A", 8), (2, 3, "B", 9),
        # user 3: A only -> no match
        (3, 1, "A", 5),
    ]
    df = spark.createDataFrame(rows, ["u", "eid", "t", "sec"])
    out = {
        (r.u, r.match_n): (r.start_sec, r.end_sec)
        for r in match_event_sequence(
            df, "u", "sec", "t", ["A", "B"], within=5, tiebreak_col="eid"
        ).collect()
    }
    assert out == {
        (1, 1): (10, 12),
        (1, 2): (20, 25),
        (2, 1): (8, 9),
    }


def test_match_event_sequence_three_steps_and_no_window(spark):
    from cccatalog_spark.operators.temporal import match_event_sequence

    rows = [
        (1, i, t, i)
        for i, t in enumerate(["A", "B", "C", "A", "C", "B", "C"])
    ]
    df = spark.createDataFrame(rows, ["u", "eid", "t", "sec"])
    out = [
        (r.match_n, r.start_sec, r.end_sec)
        for r in match_event_sequence(
            df, "u", "sec", "t", ["A", "B", "C"], tiebreak_col="eid"
        ).collect()
    ]
    # match 1: A(0) B(1) C(2); match 2: A(3) -> next B is 5 -> C(6)
    assert sorted(out) == [(1, 0, 2), (2, 3, 6)]
