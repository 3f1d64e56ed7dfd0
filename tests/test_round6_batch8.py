"""Unit tests for round-6 batch-8 operators: Borda fusion, Kendall's
W, Cronbach's alpha, caliper matching, Davies-Bouldin."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- Borda
def test_borda_fuse_points(spark):
    from cccatalog_spark.operators.retrieval import borda_fuse

    r1 = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["id", "rnk"])
    r2 = spark.createDataFrame([(2, 1), (1, 2)], ["id", "rnk"])
    out = {
        r["id"]: (r["n_lists"], r["borda_points"])
        for r in borda_fuse([r1, r2], "id", list_len=3, k=10).collect()
    }
    # list_len 3 -> points = 4 - rnk
    assert out[1] == (2, (4 - 1) + (4 - 2))
    assert out[2] == (2, (4 - 2) + (4 - 1))
    assert out[3] == (1, 1)


def test_borda_total_order_and_k(spark):
    from cccatalog_spark.operators.retrieval import borda_fuse

    r1 = spark.createDataFrame([(i, i + 1) for i in range(5)], ["id", "rnk"])
    top = borda_fuse([r1], "id", list_len=5, k=2).collect()
    assert [r["id"] for r in top] == [0, 1]


# ------------------------------------------------------------- Kendall W
def test_kendalls_w_perfect_agreement(spark):
    from cccatalog_spark.operators.preferences import kendalls_w

    rows = [
        (i, rk, float(i)) for i in range(10) for rk in ("a", "b", "c")
    ]
    df = spark.createDataFrame(rows, ["item", "rk", "v"])
    r = kendalls_w(df, "item", "rk", "v").collect()[0]
    assert r["n_items"] == 10 and r["m_rankers"] == 3
    assert r["w"] == pytest.approx(1.0, abs=1e-9)


def test_kendalls_w_matches_scipy_formula(spark):
    from cccatalog_spark.operators.preferences import kendalls_w

    vals = {
        "a": [3.0, 1.0, 2.0, 4.0],
        "b": [1.0, 2.0, 3.0, 4.0],
        "c": [2.0, 2.0, 1.0, 4.0],  # tie inside ranker c
    }
    rows = [
        (i, rk, vals[rk][i]) for i in range(4) for rk in ("a", "b", "c")
    ]
    df = spark.createDataFrame(rows, ["item", "rk", "v"])
    r = kendalls_w(df, "item", "rk", "v").collect()[0]

    # reference with average ranks + tie correction
    def ranks(v):
        order = sorted(range(len(v)), key=lambda i: v[i])
        rr = [0.0] * len(v)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and v[order[j]] == v[order[i]]:
                j += 1
            for t in order[i:j]:
                rr[t] = (i + 1 + j) / 2.0
            i = j
        return rr

    m, n = 3, 4
    R = [0.0] * n
    tsum = 0.0
    for rk in vals:
        rr = ranks(vals[rk])
        for i in range(n):
            R[i] += rr[i]
        from collections import Counter

        for t in Counter(vals[rk]).values():
            tsum += t**3 - t
    num = 12 * sum(x * x for x in R) - 3 * m * m * n * (n + 1) ** 2
    den = m * m * (n**3 - n) - m * tsum
    assert r["w"] == pytest.approx(num / den, abs=1e-6)


# -------------------------------------------------------------- Cronbach
def test_cronbach_alpha_reference(spark):
    from cccatalog_spark.operators.experiments import cronbach_alpha

    rng = np.random.default_rng(5)
    latent = rng.normal(size=60)
    items = np.stack(
        [latent + 0.3 * rng.normal(size=60) for _ in range(3)], axis=1
    )
    df = spark.createDataFrame(
        [tuple(map(float, row)) for row in items], ["i1", "i2", "i3"]
    )
    r = cronbach_alpha(df, ["i1", "i2", "i3"]).collect()[0]
    k = 3
    iv = items.var(axis=0, ddof=1).sum()
    tv = items.sum(axis=1).var(ddof=1)
    ref = k / (k - 1) * (1 - iv / tv)
    assert r["n"] == 60 and r["k"] == 3
    assert r["alpha"] == pytest.approx(ref, abs=1e-6)
    assert r["alpha"] > 0.8  # strongly correlated items
    with pytest.raises(ValueError):
        cronbach_alpha(df, ["i1"])


# ------------------------------------------------------- caliper matching
def test_caliper_matching_known_att(spark):
    from cccatalog_spark.operators.experiments import caliper_matching

    # controls at x=10 (y=1.0) and x=50 (y=3.0); treated at x=12 (y=2.0,
    # matches only the x=10 control) and x=100 (no match)
    rows = [
        (1, True, 12.0, 2.0),
        (2, True, 100.0, 9.9),
        (3, False, 10.0, 1.0),
        (4, False, 50.0, 3.0),
    ]
    df = spark.createDataFrame(rows, ["id", "tr", "x", "y"])
    r = caliper_matching(df, "id", "tr", "x", "y", caliper=5.0).collect()[0]
    assert r["n_treated"] == 2
    assert r["n_matched"] == 1
    assert r["match_rate"] == pytest.approx(0.5)
    assert r["att"] == pytest.approx(2.0 - 1.0, abs=1e-9)


def test_caliper_matching_averages_controls_in_radius(spark):
    from cccatalog_spark.operators.experiments import caliper_matching

    rows = [
        (1, True, 0.0, 5.0),
        (2, False, 1.0, 1.0),
        (3, False, -1.0, 3.0),
    ]
    df = spark.createDataFrame(rows, ["id", "tr", "x", "y"])
    r = caliper_matching(df, "id", "tr", "x", "y", caliper=2.0).collect()[0]
    assert r["att"] == pytest.approx(5.0 - 2.0, abs=1e-9)


# --------------------------------------------------------- Davies-Bouldin
def test_davies_bouldin_reference(spark):
    from cccatalog_spark.operators.cluster_eval import davies_bouldin

    rng = np.random.default_rng(9)
    clusters = {
        0: rng.normal([0, 0], 0.3, size=(20, 2)),
        1: rng.normal([5, 0], 0.3, size=(20, 2)),
        2: rng.normal([0, 5], 0.8, size=(20, 2)),
    }
    rows = [
        (int(c), v.tolist()) for c, pts in clusters.items() for v in pts
    ]
    df = spark.createDataFrame(rows, ["c", "v"])
    r = davies_bouldin(df, "v", "c").collect()[0]

    mus = {c: pts.mean(axis=0) for c, pts in clusters.items()}
    ss = {
        c: float(np.mean(np.linalg.norm(pts - mus[c], axis=1)))
        for c, pts in clusters.items()
    }
    db = np.mean(
        [
            max(
                (ss[i] + ss[j]) / np.linalg.norm(mus[i] - mus[j])
                for j in clusters
                if j != i
            )
            for i in clusters
        ]
    )
    assert r["k"] == 3
    assert r["db_index"] == pytest.approx(db, abs=1e-6)


def test_davies_bouldin_tighter_is_lower(spark):
    from cccatalog_spark.operators.cluster_eval import davies_bouldin

    def mk(spread):
        rng = np.random.default_rng(1)
        rows = []
        for c, center in ((0, [0.0, 0.0]), (1, [10.0, 0.0])):
            for v in rng.normal(center, spread, size=(15, 2)):
                rows.append((c, v.tolist()))
        return spark.createDataFrame(rows, ["c", "v"])

    tight = davies_bouldin(mk(0.2), "v", "c").collect()[0]["db_index"]
    loose = davies_bouldin(mk(2.0), "v", "c").collect()[0]["db_index"]
    assert tight < loose
