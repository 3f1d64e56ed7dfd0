"""fleiss_kappa (operators/labeling.py) and JL projection/audit
(operators/similarity.py)."""

from __future__ import annotations

import math

from cccatalog_spark.operators.labeling import fleiss_kappa
from cccatalog_spark.operators.similarity import (
    jl_distortion_audit,
    jl_project,
    jl_signs,
)


def test_fleiss_kappa_textbook(spark):
    # Fleiss 1971-style: perfect agreement -> kappa = 1
    rows = [(f"i{i}", "a") for i in range(5) for _ in range(3)]
    df = spark.createDataFrame(rows, "item string, cat string")
    out = fleiss_kappa(df, "item", "cat", 3).collect()[0]
    assert out["p_bar"] == 1.0
    # single category: P_e = 1 -> kappa undefined
    assert out["kappa"] is None

    # two categories, perfect agreement per item, split across items
    rows2 = [(f"i{i}", "a") for i in range(3) for _ in range(3)] + [
        (f"j{i}", "b") for i in range(3) for _ in range(3)
    ]
    df2 = spark.createDataFrame(rows2, "item string, cat string")
    out2 = fleiss_kappa(df2, "item", "cat", 3).collect()[0]
    assert out2["p_bar"] == 1.0 and out2["kappa"] == 1.0


def test_fleiss_kappa_hand_computed(spark):
    # 2 items, 3 raters: item1 = (a,a,b), item2 = (b,b,b)
    rows = [("1", "a"), ("1", "a"), ("1", "b"),
            ("2", "b"), ("2", "b"), ("2", "b")]
    df = spark.createDataFrame(rows, "item string, cat string")
    out = fleiss_kappa(df, "item", "cat", 3).collect()[0]
    # P_1 = (4+1-3)/6 = 1/3; P_2 = (9-3)/6 = 1; P_bar = 2/3
    assert abs(out["p_bar"] - 2 / 3) < 1e-6
    # p_a = 2/6, p_b = 4/6 -> P_e = 1/9 + 4/9 = 5/9
    assert abs(out["p_e"] - 5 / 9) < 1e-6
    assert abs(out["kappa"] - (2 / 3 - 5 / 9) / (1 - 5 / 9)) < 1e-6


def test_fleiss_kappa_drops_partial_panels(spark):
    rows = [("1", "a"), ("1", "a"), ("1", "b"), ("2", "a")]
    df = spark.createDataFrame(rows, "item string, cat string")
    out = fleiss_kappa(df, "item", "cat", 3).collect()[0]
    assert out["n_items"] == 1 and out["n_dropped"] == 1


def test_jl_signs_deterministic_pm1(spark):
    r1 = jl_signs(8, 4, seed=7)
    r2 = jl_signs(8, 4, seed=7)
    assert r1 == r2
    assert all(v in (1.0, -1.0) for row in r1 for v in row)
    assert jl_signs(8, 4, seed=8) != r1


def test_jl_project_hand_computed(spark):
    rows = [[1.0, -1.0, 1.0], [1.0, 1.0, 1.0]]
    df = spark.createDataFrame([([2.0, 4.0, 6.0],)], "v array<double>")
    out = df.select(jl_project("v", rows).alias("p")).collect()[0]["p"]
    k = math.sqrt(2)
    assert abs(out[0] - (2 - 4 + 6) / k) < 1e-9
    assert abs(out[1] - 12 / k) < 1e-9


def test_jl_distortion_identity_when_full_rank(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    vecs = [(i, [float(x) for x in rng.rand(32)]) for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id int, embedding array<double>")
    out = jl_distortion_audit(
        df, "embedding", "vec_id", out_dim=32, in_dim=32
    ).collect()[0]
    assert out["n_pairs"] == 39
    # k = d sign projection is an isometry up to the sign flips:
    # P = diag-free ±1 matrix is NOT orthogonal, so just sanity-band
    assert 0.0 < out["mean_ratio"] < 40.0
    # frac_within in [0, 1]
    assert 0.0 <= out["frac_within"] <= 1.0


def test_jl_distortion_concentrates(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    vecs = [(i, [float(x) for x in rng.randn(64)]) for i in range(100)]
    df = spark.createDataFrame(vecs, "vec_id int, embedding array<double>")
    out = jl_distortion_audit(
        df, "embedding", "vec_id", out_dim=16, in_dim=64, eps=0.9
    ).collect()[0]
    # with random gaussian data the ratio concentrates around 1;
    # k=16 is loose (var ~ 2/k), so band generously
    assert 0.5 < out["mean_ratio"] < 1.6
    assert out["frac_within"] > 0.4
