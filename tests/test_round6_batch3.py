"""Unit tests for round-6 batch-3: embedding alignment/uniformity and
the 1R decision stump."""

from __future__ import annotations

import math

import numpy as np
import pytest


def test_alignment_uniformity_matches_numpy(spark):
    from cccatalog_spark.operators.embedding_quality import (
        alignment_uniformity,
    )

    rng = np.random.RandomState(11)
    n, d = 40, 6
    vecs = rng.randn(n, d)
    labels = rng.randint(0, 4, n)
    df = spark.createDataFrame(
        [
            (int(i), [float(v) for v in vecs[i]], int(labels[i]))
            for i in range(n)
        ],
        ["vec_id", "embedding", "label"],
    )
    out = alignment_uniformity(df).collect()[0]

    # positive pairs: consecutive ids within each label
    pos = []
    for lab in set(labels.tolist()):
        ids = sorted(i for i in range(n) if labels[i] == lab)
        pos += [
            float(((vecs[a] - vecs[b]) ** 2).sum())
            for a, b in zip(ids, ids[1:])
        ]
    unif = [
        float(((vecs[i] - vecs[i + 1]) ** 2).sum()) for i in range(n - 1)
    ]
    assert out["n_pos_pairs"] == len(pos)
    assert out["n_unif_pairs"] == n - 1
    assert out["alignment"] == pytest.approx(
        sum(pos) / len(pos), abs=1e-5
    )
    assert out["uniformity"] == pytest.approx(
        math.log(sum(math.exp(-2 * x) for x in unif) / len(unif)),
        abs=1e-5,
    )


def test_alignment_collapsed_space(spark):
    from cccatalog_spark.operators.embedding_quality import (
        alignment_uniformity,
    )

    # all vectors identical: alignment 0 (perfect), uniformity 0 (worst)
    df = spark.createDataFrame(
        [(i, [1.0, 2.0], i % 2) for i in range(10)],
        ["vec_id", "embedding", "label"],
    )
    out = alignment_uniformity(df).collect()[0]
    assert out["alignment"] == 0.0 and out["uniformity"] == 0.0


def test_decision_stump_perfect_split(spark):
    from cccatalog_spark.operators.classifier import decision_stump

    rows = [(float(i), i < 10) for i in range(20)]
    df = spark.createDataFrame(rows, ["x", "y"])
    r = decision_stump(df, "x", "y").collect()[0]
    assert r["threshold"] == 9.0
    assert r["gain"] == pytest.approx(math.log(2), abs=1e-6)
    assert r["n_left"] == 10 and r["pos_left"] == 10
    assert r["n_right"] == 10 and r["pos_right"] == 0


def test_decision_stump_matches_sklearn_style_scan(spark):
    from cccatalog_spark.operators.classifier import decision_stump

    rng = np.random.RandomState(5)
    xs = rng.randint(0, 15, 200).astype(float)
    ys = (xs + rng.randn(200) * 3 > 7).tolist()
    df = spark.createDataFrame(
        [(float(x), bool(y)) for x, y in zip(xs, ys)], ["x", "y"]
    )

    def H(p, n):
        if n == 0 or p == 0 or p == n:
            return 0.0
        q = p / n
        return -q * math.log(q) - (1 - q) * math.log(1 - q)

    n, p = len(xs), sum(ys)
    best = None
    for t in sorted(set(xs.tolist()))[:-1]:
        nl = int((xs <= t).sum())
        pl = sum(y for x, y in zip(xs, ys) if x <= t)
        g = round(
            H(p, n) - nl / n * H(pl, nl) - (n - nl) / n * H(p - pl, n - nl),
            6,
        )
        if best is None or g > best[1]:
            best = (t, g)
    r = decision_stump(df, "x", "y").collect()[0]
    assert r["threshold"] == best[0]
    assert r["gain"] == pytest.approx(best[1], abs=2e-6)


def test_decision_stump_no_signal(spark):
    from cccatalog_spark.operators.classifier import decision_stump

    # target independent of feature and perfectly balanced per value:
    # every split has zero gain; argmax tiebreak picks the smallest x
    rows = [(float(i % 4), bool(j)) for i in range(16) for j in (0, 1)]
    df = spark.createDataFrame(rows, ["x", "y"])
    r = decision_stump(df, "x", "y").collect()[0]
    assert r["gain"] == pytest.approx(0.0, abs=1e-9)
    assert r["threshold"] == 0.0
