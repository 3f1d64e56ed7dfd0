"""Sinkhorn entropic-OT transport plan (operators/ot.py)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy sweep; excluded from the fast loop (-m "not slow")
from pyspark.sql import functions as F

from cccatalog_spark.operators.ot import sinkhorn_transport


def _plan(spark, rows, targets, eps=1.0, iters=25):
    df = spark.createDataFrame([(r,) for r in rows], "src int")
    return sinkhorn_transport(
        df, "src", targets, cost_fn=lambda s, t: F.abs(s - t),
        epsilon=eps, iterations=iters,
    ).collect()


def test_marginals_match(spark):
    rows = [0] * 10 + [1] * 30 + [2] * 60
    targets = {0: 50.0, 1: 30.0, 2: 20.0}
    out = _plan(spark, rows, targets)
    col = {}
    row = {}
    for r in out:
        col[r["dst"]] = col.get(r["dst"], 0.0) + r["mass"]
        row[r["src"]] = row.get(r["src"], 0.0) + r["mass"]
    # column marginals exact after the final v scaling (up to the
    # round-6 output quantization); row marginals converge
    assert abs(col[0] - 0.5) < 1e-5
    assert abs(col[1] - 0.3) < 1e-5
    assert abs(col[2] - 0.2) < 1e-5
    assert abs(row[0] - 0.1) < 1e-3
    assert abs(row[2] - 0.6) < 1e-3


def test_identity_marginals_stay_put(spark):
    # a == b: the entropic plan keeps most mass on the diagonal
    rows = [0] * 25 + [1] * 50 + [2] * 25
    targets = {0: 25.0, 1: 50.0, 2: 25.0}
    out = {(r["src"], r["dst"]): r["mass"]
           for r in _plan(spark, rows, targets, eps=0.25)}
    diag = out[(0, 0)] + out[(1, 1)] + out[(2, 2)]
    assert diag > 0.7
    for (i, j), m in out.items():
        # adjacent moves always beat 2-step moves from the same source
        if abs(i - j) == 2:
            assert m < out[(i, i)]


def test_move_share_is_conditional_distribution(spark):
    rows = [0] * 40 + [3] * 60
    targets = {0: 10.0, 1: 40.0, 2: 30.0, 3: 20.0}
    out = _plan(spark, rows, targets)
    share = {}
    for r in out:
        share[r["src"]] = share.get(r["src"], 0.0) + r["move_share"]
        assert r["mass"] >= 0.0
    # move_share sums to ~1 per source row (it is T_ij / a_i)
    assert abs(share[0] - 1.0) < 1e-3
    assert abs(share[3] - 1.0) < 1e-3


def test_smaller_epsilon_sharpens_plan(spark):
    rows = [0] * 50 + [2] * 50
    targets = {0: 50.0, 2: 50.0}
    soft = {(r["src"], r["dst"]): r["mass"]
            for r in _plan(spark, rows, targets, eps=4.0)}
    sharp = {(r["src"], r["dst"]): r["mass"]
             for r in _plan(spark, rows, targets, eps=0.5)}
    assert sharp[(0, 0)] > soft[(0, 0)]
    assert sharp[(0, 2)] < soft[(0, 2)]


def test_rejects_bad_targets(spark):
    df = spark.createDataFrame([(0,)], "src int")
    with pytest.raises(ValueError):
        sinkhorn_transport(df, "src", {}, cost_fn=lambda s, t: F.abs(s - t))
    with pytest.raises(ValueError):
        sinkhorn_transport(
            df, "src", {0: 1.0, 1: 0.0}, cost_fn=lambda s, t: F.abs(s - t)
        )
