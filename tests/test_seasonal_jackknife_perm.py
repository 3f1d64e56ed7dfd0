"""seasonal_decompose (operators/temporal.py), jackknife_ratio and
permutation_test (operators/experiments.py)."""

from __future__ import annotations

import math

from cccatalog_spark.operators.experiments import (
    jackknife_ratio,
    permutation_test,
)
from cccatalog_spark.operators.temporal import seasonal_decompose


def _series(period=4, cycles=5, trend_slope=2.0, amp=(3.0, -1.0, -3.0, 1.0)):
    rows = []
    for t in range(period * cycles):
        rows.append((t, trend_slope * t + amp[t % period]))
    return rows


def test_seasonal_decompose_recovers_components(spark):
    # pure linear trend + exact period-4 seasonal, no noise:
    # classical decomposition recovers both exactly (even period ->
    # 2xMA of a linear trend is the trend itself)
    rows = _series()
    df = spark.createDataFrame(rows, "t long, y double")
    out = {r["t"]: r for r in seasonal_decompose(df, "t", "y", 4).collect()}
    assert len(out) == 20
    # edge rows (first/last half-window) have null trend
    assert out[0]["trend"] is None and out[1]["trend"] is None
    assert out[19]["trend"] is None
    mid = out[8]
    assert abs(mid["trend"] - 2.0 * 8) < 1e-6
    assert abs(mid["seasonal"] - 3.0) < 1e-6  # phase 0 amplitude
    assert abs(mid["resid"]) < 1e-6
    # seasonal components sum to ~0 over one period
    s = sum(out[t]["seasonal"] for t in range(4, 8))
    assert abs(s) < 1e-6


def test_seasonal_decompose_odd_period(spark):
    rows = [(t, float(t % 3)) for t in range(12)]
    df = spark.createDataFrame(rows, "t long, y double")
    out = {r["t"]: r for r in seasonal_decompose(df, "t", "y", 3).collect()}
    # constant-mean pure seasonal: trend = mean(0,1,2) = 1 everywhere
    assert abs(out[5]["trend"] - 1.0) < 1e-6
    assert abs(out[5]["seasonal"] - (5 % 3 - 1.0)) < 1e-6
    assert abs(out[5]["resid"]) < 1e-6


def test_jackknife_ratio_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    y = rng.rand(30) * 10 + 5
    x = rng.rand(30) + 1
    rows = [("g", float(a), float(b)) for a, b in zip(y, x)]
    df = spark.createDataFrame(rows, "grp string, y double, x double")
    out = jackknife_ratio(df, "grp", "y", "x").collect()[0]
    loo = np.array(
        [(y.sum() - y[i]) / (x.sum() - x[i]) for i in range(len(y))]
    )
    se = math.sqrt((len(y) - 1) / len(y) * ((loo - loo.mean()) ** 2).sum())
    assert out["n"] == 30
    assert abs(out["ratio"] - round(float(y.sum() / x.sum()), 6)) < 1e-6
    assert abs(out["se_jack"] - se) < 1e-5
    assert abs((out["ci_hi"] - out["ci_lo"]) - 2 * 1.96 * se) < 1e-3


def test_jackknife_ratio_degenerate_guards(spark):
    # n=1 group: se undefined; group with sx - x_i = 0: se undefined
    rows = [("a", 2.0, 3.0), ("b", 1.0, 0.0), ("b", 1.0, 5.0)]
    df = spark.createDataFrame(rows, "grp string, y double, x double")
    out = {r["group"]: r for r in jackknife_ratio(df, "grp", "y", "x").collect()}
    assert out["a"]["se_jack"] is None
    assert out["a"]["ratio"] is not None
    # b: one LOO has sx - x = 0 -> that replica is null -> nr < n -> null se
    assert out["b"]["se_jack"] is None


def test_permutation_test_detects_separation(spark):
    # wildly separated groups: observed diff far beyond any relabeling
    rows = [("a", f"i{i}", 100.0 + i) for i in range(30)] + [
        ("b", f"j{i}", 0.0 + i) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "grp string, id string, x double")
    out = permutation_test(df, "grp", "x", "a", "b", k=99, id_col="id").collect()[0]
    assert out["n_a"] == 30 and out["n_b"] == 30
    assert out["observed_diff"] == 100.0
    assert out["k"] == 99
    assert out["p_value"] == round(1 / 100, 6)


def test_permutation_test_null_under_exchangeability(spark):
    # identical distributions: p should be large (not significant)
    rows = [("a", f"i{i}", float(i % 7)) for i in range(40)] + [
        ("b", f"j{i}", float((i + 3) % 7)) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "grp string, id string, x double")
    out = permutation_test(df, "grp", "x", "a", "b", k=99, id_col="id").collect()[0]
    assert out["p_value"] > 0.2
