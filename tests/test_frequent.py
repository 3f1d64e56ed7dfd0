"""Heavy hitters (operators/frequent.py): exactness vs a Counter
model, Misra-Gries compression behavior, and the guarantee precondition."""

from __future__ import annotations

from collections import Counter

import pytest

from cccatalog_spark.operators.frequent import _mg_summaries, heavy_hitters


def _items(spark, xs, parts=2):
    return spark.createDataFrame(
        [(x,) for x in xs], "item string"
    ).repartition(parts)


def _model(xs, min_share):
    c = Counter(xs)
    n = len(xs)
    import math

    thr = math.ceil(min_share * n)
    return {
        k: (v, round(v / n, 6)) for k, v in c.items() if v >= thr
    }


def _check(spark, xs, min_share, capacity, parts=2):
    got = {
        r["item"]: (r["cnt"], r["share"])
        for r in heavy_hitters(
            _items(spark, xs, parts), "item", min_share, capacity
        ).collect()
    }
    assert got == _model(xs, min_share)


def test_exact_above_and_below_threshold(spark):
    xs = ["a"] * 5 + ["b"] * 3 + list("cdefghij")
    _check(spark, xs, min_share=0.18, capacity=16)  # thr=3: a,b


def test_compression_never_loses_a_heavy_hitter(spark):
    # tiny capacity forces constant summary compression; the exact
    # rescan must still return precisely the true heavy hitters
    xs = ["hot"] * 40 + [f"u{i}" for i in range(60)]
    _check(spark, xs, min_share=0.25, capacity=4, parts=3)


def test_adversarial_order_single_partition(spark):
    # distractors first so the hot item arrives into a full summary
    xs = [f"u{i}" for i in range(30)] + ["hot"] * 20
    _check(spark, xs, min_share=0.3, capacity=8, parts=1)


def test_mg_summary_capacity_bound(spark):
    xs = [f"u{i}" for i in range(100)] + ["hot"] * 50
    s = _mg_summaries(_items(spark, xs, parts=2), "item", 4).collect()
    per_part = Counter()
    for r in s:
        per_part[None] += 1
    assert len(s) <= 2 * 4  # <= parts x capacity rows


def test_min_share_guarantee_precondition(spark):
    with pytest.raises(ValueError):
        heavy_hitters(_items(spark, ["a"]), "item", 0.001, capacity=10)


def test_association_rules_hand_computed(spark):
    from cccatalog_spark.operators.frequent import association_rules

    # 5 baskets; milk+bread co-occur 3x, eggs is frequent but
    # independent-ish, salt appears once (pruned by support)
    baskets = [
        (1, "milk"), (1, "bread"), (1, "eggs"),
        (2, "milk"), (2, "bread"),
        (3, "milk"), (3, "bread"), (3, "salt"),
        (4, "eggs"), (4, "milk"),
        (5, "eggs"), (5, "bread"), (5, "bread"),  # dup item collapses
    ]
    df = spark.createDataFrame(baskets, "b long, item string")
    rules = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(df, "b", "item", min_support=0.4).collect()
    }
    mb = rules[("milk", "bread")]
    assert mb["pair_n"] == 3
    assert abs(mb["support"] - 0.6) < 1e-9
    assert abs(mb["confidence"] - 3 / 4) < 1e-6
    assert abs(mb["lift"] - (3 * 5) / (4 * 4)) < 1e-6
    bm = rules[("bread", "milk")]
    assert abs(bm["confidence"] - 3 / 4) < 1e-6
    assert abs(bm["lift"] - mb["lift"]) < 1e-9  # lift is symmetric
    # salt pruned (1 basket < 2-basket floor); its pairs never counted
    assert not any("salt" in k for k in rules)


def test_association_rules_confidence_floor_and_apriori(spark):
    from cccatalog_spark.operators.frequent import association_rules

    baskets = [(i, "a") for i in range(10)] + [
        (i, "b") for i in range(5)
    ] + [(0, "rare")]
    df = spark.createDataFrame(baskets, "b long, item string")
    # a=>b conf 0.5, b=>a conf 1.0; floor 0.8 keeps only b=>a
    out = association_rules(
        df, "b", "item", min_support=0.2, min_confidence=0.8
    ).collect()
    assert [(r["antecedent"], r["consequent"]) for r in out] == [("b", "a")]
    assert out[0]["confidence"] == 1.0 and abs(out[0]["lift"] - 1.0) < 1e-9
