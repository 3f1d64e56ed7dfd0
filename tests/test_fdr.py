"""BH-FDR + closed-form chi-square tail (operators/fdr.py) and
Mann-Whitney U (operators/experiments.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cccatalog_spark.operators.experiments import mann_whitney_u
from cccatalog_spark.operators.fdr import bh_fdr, chi2_sf_even_df


def test_chi2_sf_closed_forms(spark):
    df = spark.createDataFrame([(2.0,), (6.0,)], "x double")
    out = df.select(
        "x",
        chi2_sf_even_df(F.col("x"), 2).alias("p2"),
        chi2_sf_even_df(F.col("x"), 4).alias("p4"),
        chi2_sf_even_df(F.col("x"), 6).alias("p6"),
    ).collect()
    for r in out:
        h = r["x"] / 2
        assert abs(r["p2"] - math.exp(-h)) < 1e-12
        assert abs(r["p4"] - math.exp(-h) * (1 + h)) < 1e-12
        assert abs(r["p6"] - math.exp(-h) * (1 + h + h * h / 2)) < 1e-12


def test_chi2_sf_rejects_odd_df(spark):
    with pytest.raises(ValueError):
        chi2_sf_even_df(F.lit(1.0), 3)


def _verdicts(spark, ps, alpha):
    df = spark.createDataFrame(
        [(f"h{i}", p) for i, p in enumerate(ps)], "key string, p double"
    )
    rows = bh_fdr(df, "key", "p", alpha=alpha).collect()
    return {r["key"]: r for r in rows}


def test_bh_basic_cutoff(spark):
    out = _verdicts(spark, [0.01, 0.02, 0.03, 0.5], alpha=0.1)
    # crits 0.025/0.05/0.075/0.1 -> k = 3
    assert [out[f"h{i}"]["significant"] for i in range(4)] == [
        True, True, True, False,
    ]
    assert out["h0"]["rank"] == 1 and out["h0"]["m"] == 4
    assert out["h3"]["bh_crit"] == 0.1


def test_bh_step_up_rescues_smaller_p(spark):
    # rank 1 fails its own crit (0.03 > 0.025) but rank 2 passes
    # (0.035 <= 0.05) -> step-up marks BOTH significant
    out = _verdicts(spark, [0.03, 0.035], alpha=0.05)
    assert out["h0"]["significant"] and out["h1"]["significant"]


def test_bh_none_significant(spark):
    out = _verdicts(spark, [0.5, 0.8, 0.9], alpha=0.05)
    assert not any(r["significant"] for r in out.values())


def _mw(spark, a_vals, b_vals):
    rows = [(float(v), "a") for v in a_vals] + [
        (float(v), "b") for v in b_vals
    ]
    df = spark.createDataFrame(rows, "x double, grp string")
    return mann_whitney_u(df, "grp", "x", "a", "b").collect()[0]


def test_mann_whitney_no_ties(spark):
    r = _mw(spark, [1, 2, 3], [4, 5, 6])
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["u_a"] == 0.0
    assert abs(r["z"] - (-4.5) / math.sqrt(5.25)) < 1e-6


def test_mann_whitney_tie_correction(spark):
    r = _mw(spark, [1, 1, 2], [2, 3, 3])
    # mid-ranks 1.5/3.5/5.5; R_a = 6.5, U_a = 0.5;
    # sigma = sqrt(0.75 * (7 - 18/30)) = sqrt(4.8)
    assert r["u_a"] == 0.5
    assert abs(r["z"] - (0.5 - 4.5) / math.sqrt(4.8)) < 1e-6


def test_mann_whitney_all_tied_null_z(spark):
    r = _mw(spark, [5, 5], [5, 5])
    assert r["u_a"] == 2.0  # pure mid-rank mass
    assert r["z"] is None


def test_poisson_bootstrap_ci(spark):
    from cccatalog_spark.operators.experiments import (
        poisson_bootstrap_ci,
    )

    rows = [(i, float(100 + (i * 37) % 41)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, x double")
    r = poisson_bootstrap_ci(df, "id", "x", b=40, alpha=0.1).collect()[0]
    mean = sum(v for _, v in rows) / len(rows)
    assert abs(r["point"] - round(mean, 6)) < 1e-9
    assert r["ci_lo"] <= r["point"] <= r["ci_hi"]
    # interval is tight for n=400 (sd ~ 12, se ~ 0.6)
    assert r["ci_hi"] - r["ci_lo"] < 5.0
    assert r["b"] == 40 and r["n"] == 400
    # deterministic end to end
    r2 = poisson_bootstrap_ci(df, "id", "x", b=40, alpha=0.1).collect()[0]
    assert r2.asDict() == r.asDict()


def test_poisson_bootstrap_alpha_guard(spark):
    from cccatalog_spark.operators.experiments import (
        poisson_bootstrap_ci,
    )

    df = spark.createDataFrame([(1, 1.0)], "id long, x double")
    with pytest.raises(ValueError):
        poisson_bootstrap_ci(df, "id", "x", alpha=0.0)


def test_bh_null_p_excluded(spark):
    df = spark.createDataFrame(
        [("a", None), ("b", 0.01), ("c", 0.5)], "key string, p double"
    )
    out = {r["key"]: r for r in bh_fdr(df, "key", "p", alpha=0.05).collect()}
    assert "a" not in out           # null p carries no evidence
    assert out["b"]["m"] == 2       # m counts only testable hypotheses
    assert out["b"]["rank"] == 1 and out["b"]["significant"]
    assert not out["c"]["significant"]


def test_poisson_bootstrap_null_id_excluded(spark):
    from cccatalog_spark.operators.experiments import (
        poisson_bootstrap_ci,
    )

    clean = [(i, 10.0 + i % 5) for i in range(100)]
    df = spark.createDataFrame(
        clean + [(None, 1e9)], "id long, x double"
    )
    r = poisson_bootstrap_ci(df, "id", "x", b=20).collect()[0]
    mean = sum(v for _, v in clean) / len(clean)
    # the null-id outlier is excluded from point AND replicas
    assert abs(r["point"] - round(mean, 6)) < 1e-9
    assert r["n"] == 100
    assert r["ci_lo"] <= r["point"] <= r["ci_hi"] < 1e6


def test_kaplan_meier_textbook(spark):
    from cccatalog_spark.operators.experiments import kaplan_meier

    # classic toy: events at t=1 (1 of 5), t=3 (2 of 3); censored at
    # t=2 and t=4
    rows = [
        (1, 1, 1), (2, 2, 0), (3, 3, 1), (4, 3, 1), (5, 4, 0),
    ]
    df = spark.createDataFrame(rows, "sid long, dur long, ev int")
    got = {r["t"]: r for r in kaplan_meier(df, "dur", "ev").collect()}
    assert set(got) == {1, 3}
    assert got[1]["n_risk"] == 5 and got[1]["n_events"] == 1
    assert got[1]["survival"] == 0.8
    assert got[3]["n_risk"] == 3 and got[3]["n_events"] == 2
    assert got[3]["survival"] == round(0.8 * (1 / 3), 6)


def test_kaplan_meier_all_die_hits_zero(spark):
    from cccatalog_spark.operators.experiments import kaplan_meier

    df = spark.createDataFrame(
        [(1, 1, 1), (2, 2, 1)], "sid long, dur long, ev int"
    )
    got = {r["t"]: r["survival"] for r in kaplan_meier(df, "dur", "ev").collect()}
    assert got[1] == 0.5 and got[2] == 0.0
