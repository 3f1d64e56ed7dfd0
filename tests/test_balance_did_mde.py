"""covariate_balance, diff_in_diff, mde_curve
(operators/experiments.py)."""

from __future__ import annotations

import math

from cccatalog_spark.operators.experiments import (
    covariate_balance,
    diff_in_diff,
    mde_curve,
)


def test_covariate_balance_detects_imbalance(spark):
    rows = [("a", float(v), 1.0) for v in range(100)] + [
        ("b", float(v) + 50, 1.0) for v in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, x double, flat double")
    out = {r["covariate"]: r for r in
           covariate_balance(df, "g", "a", "b", ["x", "flat"]).collect()}
    # x shifted by ~1.7 sd -> unbalanced; flat identical -> smd null/0
    assert not out["x"]["balanced"]
    assert abs(out["x"]["smd"] + 50 / math.sqrt((841.67 + 841.67) / 2)) < 0.01
    assert out["flat"]["smd"] is None  # zero variance both sides
    assert out["x"]["n_a"] == 100 and out["x"]["n_b"] == 100


def test_covariate_balance_binary_covariate(spark):
    rows = [("a", 1)] * 80 + [("a", 0)] * 20 + [("b", 1)] * 50 + [("b", 0)] * 50
    df = spark.createDataFrame(rows, "g string, flag int")
    out = covariate_balance(df, "g", "a", "b", ["flag"]).collect()[0]
    assert out["mean_a"] == 0.8 and out["mean_b"] == 0.5
    assert not out["balanced"]


def test_diff_in_diff_recovers_planted_effect(spark):
    rows = []
    for i in range(50):
        base = float(i % 7)
        rows.append((False, False, 10.0 + base))
        rows.append((False, True, 12.0 + base))   # common trend +2
        rows.append((True, False, 20.0 + base))
        rows.append((True, True, 25.0 + base))    # trend +2 plus effect +3
    df = spark.createDataFrame(rows, "treated boolean, post boolean, v double")
    out = diff_in_diff(df, "treated", "post", "v").collect()[0]
    assert abs(out["did"] - 3.0) < 1e-6
    assert out["ci_lo"] < 3.0 < out["ci_hi"]
    assert out["mean_c_pre"] == 12.94  # 10 + mean(i%7 over 0..49)


def test_diff_in_diff_small_cell_guard(spark):
    rows = [(False, False, 1.0), (False, True, 2.0), (False, True, 2.5),
            (True, False, 3.0), (True, False, 3.5), (True, True, 4.0),
            (True, True, 4.5), (False, False, 1.5)]
    df = spark.createDataFrame(rows, "treated boolean, post boolean, v double")
    out = diff_in_diff(df, "treated", "post", "v").collect()[0]
    assert out["se"] is not None  # all cells have exactly 2
    rows2 = rows[1:]  # now (F,F) has 1 row
    df2 = spark.createDataFrame(rows2, "treated boolean, post boolean, v double")
    assert diff_in_diff(df2, "treated", "post", "v").collect()[0]["se"] is None


def test_mde_shrinks_with_sample(spark):
    rows = []
    for t in range(5):
        for i in range(30):
            rows.append((t, "a", float(i % 10)))
            rows.append((t, "b", float((i + 3) % 10)))
    df = spark.createDataFrame(rows, "t long, g string, v double")
    out = sorted(
        mde_curve(df, "g", "t", "v", "a", "b").collect(),
        key=lambda r: r["t"],
    )
    mdes = [r["mde"] for r in out]
    assert all(a > b for a, b in zip(mdes, mdes[1:]))  # strictly shrinking
    # day 5 vs day 1: se scales ~ 1/sqrt(5)
    assert abs(mdes[-1] / mdes[0] - 1 / math.sqrt(5)) < 0.02
    assert out[-1]["n_a"] == 150
