"""KNN-Shapley (operators/valuation.py) against an independent numpy
implementation of the Jia et al. recursion, plus the efficiency
property (values sum to v(full) - v(empty) per probe)."""

from __future__ import annotations

import numpy as np
import pytest


def _numpy_knn_shapley(train_x, train_y, probe_x, probe_y, k):
    """Direct transcription of the VLDB'19 recursion, per probe."""
    n = len(train_x)
    values = np.zeros(n)
    for px, py in zip(probe_x, probe_y):
        sims = np.array(
            [
                round(
                    float(
                        np.dot(t, px)
                        / (np.linalg.norm(t) * np.linalg.norm(px))
                    ),
                    6,
                )
                for t in train_x
            ]
        )
        # descending similarity == ascending distance; id tiebreak
        order = sorted(range(n), key=lambda i: (-sims[i], i))
        s = np.zeros(n)
        last = order[-1]
        s[last] = (1.0 if train_y[last] == py else 0.0) / n
        for pos in range(n - 2, -1, -1):
            i, j = order[pos], order[pos + 1]
            ind_i = 1.0 if train_y[i] == py else 0.0
            ind_j = 1.0 if train_y[j] == py else 0.0
            rank = pos + 1
            s[i] = s[j] + (ind_i - ind_j) / k * min(k, rank) / rank
        values += s
    return values / len(probe_x)


def _toy(seed=7, n=40, d=8, n_probe=3, classes=3):
    rng = np.random.RandomState(seed)
    train_x = rng.randn(n, d)
    train_y = rng.randint(0, classes, n)
    probe_x = rng.randn(n_probe, d)
    probe_y = rng.randint(0, classes, n_probe)
    return train_x, train_y, probe_x, probe_y


def test_knn_shapley_matches_numpy(spark):
    from cccatalog_spark.operators.valuation import knn_shapley

    train_x, train_y, probe_x, probe_y = _toy()
    k = 5
    expect = _numpy_knn_shapley(train_x, train_y, probe_x, probe_y, k)

    train = spark.createDataFrame(
        [
            (int(i), [float(v) for v in train_x[i]], int(train_y[i]))
            for i in range(len(train_x))
        ],
        ["vec_id", "embedding", "label"],
    )
    probes = spark.createDataFrame(
        [
            (1000 + int(i), [float(v) for v in probe_x[i]], int(probe_y[i]))
            for i in range(len(probe_x))
        ],
        ["vec_id", "embedding", "label"],
    )
    out = {
        r["vec_id"]: r["shapley"]
        for r in knn_shapley(train, probes, k=k).collect()
    }
    assert len(out) == len(train_x)
    for i, e in enumerate(expect):
        assert out[i] == pytest.approx(e, abs=2e-6)


def test_knn_shapley_efficiency_property(spark):
    """Sum of values over training points equals
    v(full) - v(empty) = 1[KNN(full) majority-ish utility]: in the
    Jia formulation the per-probe utility is the fraction of the K
    nearest neighbours with the probe's label, and v(empty) = 0, so
    sum_i s_i == mean over probes of (hits in top-K) / K."""
    from cccatalog_spark.operators.valuation import knn_shapley

    train_x, train_y, probe_x, probe_y = _toy(seed=13, n=30, n_probe=4)
    k = 3
    total = 0.0
    for px, py in zip(probe_x, probe_y):
        sims = np.array(
            [
                round(
                    float(
                        np.dot(t, px)
                        / (np.linalg.norm(t) * np.linalg.norm(px))
                    ),
                    6,
                )
                for t in train_x
            ]
        )
        order = sorted(range(len(train_x)), key=lambda i: (-sims[i], i))
        hits = sum(1.0 for i in order[:k] if train_y[i] == py)
        total += hits / k
    total /= len(probe_x)

    train = spark.createDataFrame(
        [
            (int(i), [float(v) for v in train_x[i]], int(train_y[i]))
            for i in range(len(train_x))
        ],
        ["vec_id", "embedding", "label"],
    )
    probes = spark.createDataFrame(
        [
            (1000 + int(i), [float(v) for v in probe_x[i]], int(probe_y[i]))
            for i in range(len(probe_x))
        ],
        ["vec_id", "embedding", "label"],
    )
    vals = [
        r["shapley"] for r in knn_shapley(train, probes, k=k).collect()
    ]
    assert sum(vals) == pytest.approx(total, abs=1e-4)


def test_knn_shapley_all_same_label_uniform_tail(spark):
    """When every training point shares the probe's label, the
    recursion gives s_i = 1/N beyond rank K (each contributes only
    through the base term chain)."""
    from cccatalog_spark.operators.valuation import knn_shapley

    rng = np.random.RandomState(3)
    n, k = 12, 3
    train = spark.createDataFrame(
        [(i, [float(v) for v in rng.randn(4)], 1) for i in range(n)],
        ["vec_id", "embedding", "label"],
    )
    probes = spark.createDataFrame(
        [(99, [float(v) for v in rng.randn(4)], 1)],
        ["vec_id", "embedding", "label"],
    )
    out = knn_shapley(train, probes, k=k).collect()
    for r in out:
        assert r["shapley"] == pytest.approx(1.0 / n, abs=1e-6)
