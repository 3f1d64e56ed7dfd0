"""Bradley-Terry preference ranking (operators/preferences.py)."""

from __future__ import annotations


def test_bradley_terry_recovers_strength_order(spark):
    import random

    from cccatalog_spark.operators.preferences import bradley_terry

    rng = random.Random(5)
    s = {0: 1.0, 1: 2.0, 2: 3.0, 3: 4.0}
    rows = []
    for _ in range(1500):
        a, b = rng.sample(list(s), 2)
        w = a if rng.random() < s[a] / (s[a] + s[b]) else b
        rows.append((w, b if w == a else a))
    df = spark.createDataFrame(rows, "winner int, loser int")
    pi = {
        r["item"]: r["pi"]
        for r in bradley_terry(df, iterations=8).collect()
    }
    assert pi[0] < pi[1] < pi[2] < pi[3]
    assert abs(sum(pi.values()) - 1.0) < 1e-9
    # ratios should approximate the true 1:2:3:4 within sampling noise
    assert 1.5 < pi[3] / pi[1] < 2.7


def test_bradley_terry_dominant_item_takes_mass(spark):
    from cccatalog_spark.operators.preferences import bradley_terry

    # item 9 beats everyone always; its MLE strength diverges, so
    # after fixed rounds it should hold most of the mass
    rows = [(9, j) for j in range(3) for _ in range(10)]
    rows += [(0, 1), (1, 2), (2, 0)]  # cycle among the rest
    df = spark.createDataFrame(rows, "winner int, loser int")
    pi = {
        r["item"]: r["pi"]
        for r in bradley_terry(df, iterations=6).collect()
    }
    assert pi[9] > 0.8
    assert all(pi[9] > pi[j] for j in range(3))
