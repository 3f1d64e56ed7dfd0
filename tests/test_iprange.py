"""Bucketed numeric/CIDR range join (operators/iprange.py)."""

from __future__ import annotations

from cccatalog_spark.operators.iprange import range_join


def _frames(spark):
    pts = spark.createDataFrame(
        [(1, 5), (2, 70000), (3, 70001), (4, 200000), (5, 131072)],
        "pid long, ip long",
    )
    iv = spark.createDataFrame(
        [
            ("a", 0, 10),            # within one bucket
            ("b", 65000, 70000),     # spans a 2^16 bucket boundary
            ("c", 131072, 131072),   # single-point interval on boundary
            ("d", 0, 300000),        # spans many buckets; overlaps a/b/c
        ],
        "block string, lo long, hi long",
    )
    return pts, iv


def test_range_join_exact_matches(spark):
    pts, iv = _frames(spark)
    out = range_join(pts, "ip", iv, "lo", "hi", shift=16)
    got = sorted((r["pid"], r["block"]) for r in out.collect())
    assert got == [
        (1, "a"), (1, "d"),
        (2, "b"), (2, "d"),
        (3, "d"),            # 70001 just past b's closed end
        (4, "d"),
        (5, "c"), (5, "d"),
    ]


def test_range_join_no_duplicate_rows_across_buckets(spark):
    pts, iv = _frames(spark)
    out = range_join(pts, "ip", iv, "lo", "hi", shift=8)  # d spans ~1200 buckets
    rows = [(r["pid"], r["block"]) for r in out.collect()]
    assert len(rows) == len(set(rows))  # one row per (point, interval)
    assert sorted(rows) == sorted(
        (r["pid"], r["block"])
        for r in range_join(pts, "ip", iv, "lo", "hi", shift=16).collect()
    )


def test_range_join_left_keeps_unmatched(spark):
    pts = _frames(spark)[0]
    iv = _frames(spark)[1].where("block = 'a'")
    out = range_join(pts, "ip", iv, "lo", "hi", shift=16, how="left")
    by_pid = {r["pid"]: r["block"] for r in out.collect()}
    assert by_pid[1] == "a" and by_pid[4] is None
    assert len(by_pid) == 5


def test_range_join_negative_domain(spark):
    # floor (not truncate-toward-zero) bucketing: a point at -1 and an
    # interval [-100, -1] must meet even though they straddle bucket 0
    pts = spark.createDataFrame(
        [(1, -1), (2, -70000), (3, 5)], "pid long, ip long"
    )
    iv = spark.createDataFrame(
        [("neg", -100, -1), ("span", -70000, 10)],
        "block string, lo long, hi long",
    )
    out = range_join(pts, "ip", iv, "lo", "hi", shift=16)
    got = sorted((r["pid"], r["block"]) for r in out.collect())
    assert got == [(1, "neg"), (1, "span"), (2, "span"), (3, "span")]
