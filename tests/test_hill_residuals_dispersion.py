"""hill_tail_index (operators/corpus_stats.py), chi2_cell_residuals
(operators/dependence.py), dispersion_report (operators/temporal.py)."""

from __future__ import annotations

import math

from cccatalog_spark.operators.corpus_stats import hill_tail_index
from cccatalog_spark.operators.dependence import chi2_cell_residuals
from cccatalog_spark.operators.temporal import dispersion_report


def test_hill_recovers_pareto_index(spark):
    # exact Pareto(alpha=2) quantile grid: x_i = (1 - i/n)^(-1/2)
    n = 2000
    rows = [((1 - (i + 0.5) / n) ** -0.5,) for i in range(n)]
    df = spark.createDataFrame(rows, "v double")
    out = hill_tail_index(df, "v", k=100).collect()[0]
    assert out["n"] == n and out["k"] == 100
    assert abs(out["alpha"] - 2.0) < 0.35  # Hill se = alpha/10 here
    assert abs(out["se"] - out["alpha"] / 10) < 1e-4


def test_hill_hand_computed_small(spark):
    # values 1..10, k=3: x_(4)=7, top = {10, 9, 8}
    df = spark.createDataFrame([(float(v),) for v in range(1, 11)], "v double")
    out = hill_tail_index(df, "v", k=3).collect()[0]
    expected = 3.0 / (
        math.log(10 / 7) + math.log(9 / 7) + math.log(8 / 7)
    )
    assert out["x_k1"] == 7.0
    assert abs(out["alpha"] - expected) < 1e-5


def test_hill_degenerate_all_equal(spark):
    df = spark.createDataFrame([(5.0,)] * 20, "v double")
    out = hill_tail_index(df, "v", k=3).collect()[0]
    assert out["alpha"] is None


def test_chi2_residuals_planted_association(spark):
    # x=a strongly prefers y=1
    rows = (
        [("a", "1")] * 40 + [("a", "2")] * 10
        + [("b", "1")] * 10 + [("b", "2")] * 40
    )
    df = spark.createDataFrame(rows, "x string, y string")
    out = {(r["x"], r["y"]): r for r in chi2_cell_residuals(df, "x", "y").collect()}
    # diagonal cells positive, off-diagonal negative, symmetric here
    assert out[("a", "1")]["adj_residual"] > 2
    assert out[("a", "2")]["adj_residual"] < -2
    assert abs(
        out[("a", "1")]["adj_residual"] + out[("a", "2")]["adj_residual"]
    ) < 1e-6
    # expected counts: row 50 * col 50 / 100 = 25
    assert out[("a", "1")]["expected"] == 25.0


def test_chi2_residuals_independent_near_zero(spark):
    rows = [(x, y) for x in "ab" for y in "12" for _ in range(25)]
    df = spark.createDataFrame(rows, "x string, y string")
    out = chi2_cell_residuals(df, "x", "y").collect()
    assert all(abs(r["adj_residual"]) < 1e-9 for r in out)


def test_dispersion_poisson_vs_bursty(spark):
    # regular: one event every day -> var 0, fano 0
    reg = [("reg", t) for t in range(10)]
    # bursty: all 10 events on day 0, span forced to 10 by one event day 9
    burst = [("burst", 0)] * 9 + [("burst", 9)]
    df = spark.createDataFrame(reg + burst, "grp string, t long")
    out = {r["group"]: r for r in dispersion_report(df, "grp", "t").collect()}
    assert out["reg"]["fano"] == 0.0 and out["reg"]["span"] == 10
    b = out["burst"]
    assert b["span"] == 10 and b["n_events"] == 10
    # mean 1; var = (81 + 1)/10 - 1 = 7.2 -> fano 7.2
    assert abs(b["fano"] - 7.2) < 1e-6


def test_dispersion_counts_zero_days_in_span(spark):
    # two events on day 0 and day 4: span 5, mean 0.4
    df = spark.createDataFrame(
        [("g", 0), ("g", 4)], "grp string, t long"
    )
    out = dispersion_report(df, "grp", "t").collect()[0]
    assert out["span"] == 5
    assert abs(out["mean"] - 0.4) < 1e-6
    # var = 2/5 - 0.16 = 0.24; fano = 0.6 (underdispersed vs poisson)
    assert abs(out["fano"] - 0.6) < 1e-6
