"""spearman_corr / kendall_tau_b (operators/dependence.py) and
mann_kendall_trend (operators/temporal.py)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy sweep; excluded from the fast loop (-m "not slow")

from cccatalog_spark.operators.dependence import kendall_tau_b, spearman_corr
from cccatalog_spark.operators.temporal import mann_kendall_trend


def test_spearman_perfect_monotone(spark):
    # y = x^3 is nonlinear but perfectly monotone: rho = 1
    rows = [(float(x), float(x) ** 3) for x in range(-5, 6)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = spearman_corr(df, "x", "y").collect()[0]
    assert out["n"] == 11 and out["rho"] == 1.0


def test_spearman_matches_scipy_style_ties(spark):
    # hand-computable with ties: x=[1,2,2,3], y=[1,3,2,4]
    # mid-ranks x: [1, 2.5, 2.5, 4]; y: [1, 3, 2, 4]
    import numpy as np

    rx = np.array([1.0, 2.5, 2.5, 4.0])
    ry = np.array([1.0, 3.0, 2.0, 4.0])
    expected = float(np.corrcoef(rx, ry)[0, 1])
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 3.0), (2.0, 2.0), (3.0, 4.0)],
        "x double, y double",
    )
    out = spearman_corr(df, "x", "y").collect()[0]
    assert abs(out["rho"] - round(expected, 6)) < 1e-6


def test_kendall_tau_hand_computed(spark):
    # x=[1,2,3,4], y=[1,3,2,4]: C=5, D=1, no ties -> tau = 4/6
    df = spark.createDataFrame(
        [(1, 1), (2, 3), (3, 2), (4, 4)], "x int, y int"
    )
    out = kendall_tau_b(df, "x", "y").collect()[0]
    assert out["concordant"] == 5 and out["discordant"] == 1
    assert abs(out["tau_b"] - round(4 / 6, 6)) < 1e-6


def test_kendall_tau_b_tie_correction(spark):
    # all x tied: denominator term (n0 - n1) = 0 -> tau null
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 3)], "x int, y int"
    )
    out = kendall_tau_b(df, "x", "y").collect()[0]
    assert out["tau_b"] is None
    assert out["concordant"] == 0 and out["discordant"] == 0


def test_kendall_tau_matches_scipy_if_available(spark):
    try:
        from scipy.stats import kendalltau
    except ImportError:
        import pytest

        pytest.skip("scipy not installed")
    xs = [1, 2, 2, 3, 4, 4, 5, 6]
    ys = [2, 1, 3, 3, 5, 4, 7, 6]
    df = spark.createDataFrame(list(zip(xs, ys)), "x int, y int")
    out = kendall_tau_b(df, "x", "y").collect()[0]
    assert abs(out["tau_b"] - round(float(kendalltau(xs, ys).statistic), 6)) < 1e-6


def test_mann_kendall_strict_increase(spark):
    rows = [(t, float(t)) for t in range(10)]
    df = spark.createDataFrame(rows, "t long, v double")
    out = mann_kendall_trend(df, "t", "v").collect()[0]
    assert out["s"] == 45  # all 45 pairs concordant
    assert out["trend"] == "increasing"
    assert out["p_value"] < 0.01


def test_mann_kendall_flat_is_no_trend(spark):
    rows = [(t, 5.0) for t in range(10)]
    df = spark.createDataFrame(rows, "t long, v double")
    out = mann_kendall_trend(df, "t", "v").collect()[0]
    assert out["s"] == 0 and out["z"] == 0.0
    assert out["p_value"] == 1.0 and out["trend"] == "no_trend"


def test_mann_kendall_tie_variance(spark):
    # alternating ties shrink var_s via the tie term
    rows = [(0, 1.0), (1, 1.0), (2, 2.0), (3, 2.0), (4, 3.0)]
    df = spark.createDataFrame(rows, "t long, v double")
    out = mann_kendall_trend(df, "t", "v").collect()[0]
    # n=5: base var = 5*4*15/18; ties: two pairs t=2 -> 2*1*9 each
    assert abs(out["var_s"] - (5 * 4 * 15 - 2 * (2 * 1 * 9)) / 18.0) < 1e-6
    assert out["s"] == 8
