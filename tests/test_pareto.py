"""2-D Pareto frontier / skyline (operators/pareto.py)."""

from __future__ import annotations

from cccatalog_spark.operators.pareto import pareto_frontier_2d


def _brute(points):
    """Quadratic dominance oracle over (x, y) tuples."""
    pts = set(points)
    front = set()
    for p in pts:
        if not any(
            q[0] >= p[0] and q[1] >= p[1] and q != p
            for q in pts
            if (q[0] > p[0] or q[1] > p[1])
        ):
            front.add(p)
    return front


def _run(spark, rows, n_buckets=4):
    df = spark.createDataFrame(rows, "id long, x double, y long")
    out = pareto_frontier_2d(df, "x", "y", "id", n_buckets=n_buckets)
    return {(r["x"], r["y"]): (r["n_rows"], r["rep_id"]) for r in out.collect()}


def test_frontier_matches_brute_force(spark):
    rows = [
        (1, 1.0, 9), (2, 2.0, 7), (3, 3.0, 5), (4, 4.0, 1),
        (5, 2.5, 7), (6, 0.5, 10), (7, 3.0, 4), (8, 1.5, 3),
    ]
    got = _run(spark, rows)
    assert set(got) == _brute([(x, y) for _, x, y in rows])
    # dominated interior point is gone
    assert (1.5, 3) not in got and (3.0, 4) not in got


def test_duplicate_points_collapse_with_count_and_min_id(spark):
    rows = [(3, 2.0, 5), (1, 2.0, 5), (2, 1.0, 1)]
    got = _run(spark, rows)
    assert got == {(2.0, 5): (2, 1)}  # (1.0,1) dominated; dup counted


def test_equal_x_keeps_only_top_y(spark):
    rows = [(1, 2.0, 5), (2, 2.0, 9), (3, 1.0, 10)]
    got = _run(spark, rows)
    assert set(got) == {(2.0, 9), (1.0, 10)}


def test_bucket_count_does_not_change_result(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, float(rng.randint(0, 20)) / 2, rng.randint(0, 50))
        for i in range(200)
    ]
    a = _run(spark, rows, n_buckets=1)
    b = _run(spark, rows, n_buckets=16)
    assert a == b
    assert set(a) == _brute([(x, y) for _, x, y in rows])
