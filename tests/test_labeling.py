"""Dawid-Skene crowd-label aggregation (operators/labeling.py)."""

from __future__ import annotations


def test_dawid_skene_beats_majority_vote(spark):
    import random

    from cccatalog_spark.operators.labeling import dawid_skene_binary

    rng = random.Random(11)
    # 2 strong workers (0.95) vs 3 weak near-coin workers (0.55):
    # majority vote follows the noisy trio on many items; DS learns
    # the confusion rates and should recover truth more often
    rel = [0.95, 0.95, 0.55, 0.55, 0.55]
    rows, truth = [], {}
    for i in range(300):
        t = rng.randint(0, 1)
        truth[i] = t
        for w, r in enumerate(rel):
            l = t if rng.random() < r else 1 - t
            rows.append((i, w, l))
    df = spark.createDataFrame(rows, "item long, w int, l int")
    ds = {
        r["item"]: r["label"]
        for r in dawid_skene_binary(df, "item", "w", "l", rounds=3)
        .collect()
    }
    by_item = {}
    for i, w, l in rows:
        by_item.setdefault(i, []).append(l)
    mv = {i: int(sum(ls) * 2 > len(ls)) for i, ls in by_item.items()}
    acc_ds = sum(ds[i] == truth[i] for i in truth) / len(truth)
    acc_mv = sum(mv[i] == truth[i] for i in truth) / len(truth)
    assert acc_ds >= acc_mv
    assert acc_ds > 0.9


def test_dawid_skene_unanimous_labels_confident(spark):
    from cccatalog_spark.operators.labeling import dawid_skene_binary

    rows = [(i, w, i % 2) for i in range(20) for w in range(3)]
    df = spark.createDataFrame(rows, "item long, w int, l int")
    out = {
        r["item"]: (r["mu"], r["label"])
        for r in dawid_skene_binary(df, "item", "w", "l").collect()
    }
    for i in range(20):
        mu, lab = out[i]
        assert lab == i % 2
        assert mu > 0.99 if i % 2 else mu < 0.01


def test_krippendorff_alpha_hand_example(spark):
    from cccatalog_spark.operators.labeling import (
        krippendorff_alpha_nominal,
    )

    rows = [
        (1, "A", "x"), (1, "B", "x"),
        (2, "A", "x"), (2, "B", "y"),
        (3, "A", "y"), (3, "B", "y"),
        (4, "A", "x"),  # single rating: excluded
    ]
    df = spark.createDataFrame(rows, "item long, rater string, v string")
    r = krippendorff_alpha_nominal(df, "item", "rater", "v").collect()[0]
    # hand: n=6, D_o = 2/6, n_x = n_y = 3, D_e = 18/30
    assert r["n_items"] == 3 and r["n_pairable_values"] == 6
    assert abs(r["d_o"] - 1 / 3) < 1e-6
    assert abs(r["d_e"] - 0.6) < 1e-6
    assert abs(r["alpha"] - (1 - (1 / 3) / 0.6)) < 1e-6


def test_krippendorff_alpha_perfect_and_chance(spark):
    from cccatalog_spark.operators.labeling import (
        krippendorff_alpha_nominal,
    )

    perfect = spark.createDataFrame(
        [(i, r, str(i % 2)) for i in range(10) for r in "ABC"],
        "item long, rater string, v string",
    )
    assert (
        krippendorff_alpha_nominal(perfect, "item", "rater", "v")
        .collect()[0]["alpha"]
        == 1.0
    )
    # systematic disagreement: every item rated x by A and y by B
    anti = spark.createDataFrame(
        [(i, "A", "x") for i in range(10)]
        + [(i, "B", "y") for i in range(10)],
        "item long, rater string, v string",
    )
    assert (
        krippendorff_alpha_nominal(anti, "item", "rater", "v")
        .collect()[0]["alpha"]
        < 0
    )


def test_krippendorff_alpha_single_value_null(spark):
    from cccatalog_spark.operators.labeling import (
        krippendorff_alpha_nominal,
    )

    df = spark.createDataFrame(
        [(i, r, "same") for i in range(5) for r in "AB"],
        "item long, rater string, v string",
    )
    r = krippendorff_alpha_nominal(df, "item", "rater", "v").collect()[0]
    assert r["alpha"] is None and r["d_o"] == 0.0
