"""Fellegi–Sunter record linkage (operators/linkage.py)."""

from __future__ import annotations

import math

from cccatalog_spark.operators.linkage import (
    fellegi_sunter_score,
    field_weights,
    score_py,
)


def _labeled(spark):
    # 4 matches, 4 unmatches; field f1 agrees on 3/4 matches and 1/4
    # unmatches, f2 agrees on 4/4 matches and 2/4 unmatches
    rows = [
        (True, True, True), (True, True, True),
        (True, True, True), (True, False, True),
        (False, True, False), (False, False, True),
        (False, False, False), (False, False, True),
    ]
    return spark.createDataFrame(
        rows, "is_match boolean, f1 boolean, f2 boolean"
    )


def test_field_weights_laplace_smoothed(spark):
    w = field_weights(_labeled(spark), ["f1", "f2"]).collect()[0]
    m1, u1 = (3 + 1) / (4 + 2), (1 + 1) / (4 + 2)
    m2, u2 = (4 + 1) / (4 + 2), (2 + 1) / (4 + 2)
    assert abs(w["f1__wa"] - math.log(m1 / u1)) < 1e-12
    assert abs(w["f1__wd"] - math.log((1 - m1) / (1 - u1))) < 1e-12
    assert abs(w["f2__wa"] - math.log(m2 / u2)) < 1e-12
    assert abs(w["f2__wd"] - math.log((1 - m2) / (1 - u2))) < 1e-12


def test_scores_match_python_twin_and_threshold(spark):
    labeled = _labeled(spark)
    cands = spark.createDataFrame(
        [(1, True, True), (2, True, False), (3, False, False)],
        "pair_id long, f1 boolean, f2 boolean",
    )
    m = [(3 + 1) / 6, (4 + 1) / 6]
    u = [(1 + 1) / 6, (2 + 1) / 6]
    exp = {
        1: score_py([True, True], m, u),
        2: score_py([True, False], m, u),
        3: score_py([False, False], m, u),
    }
    out = {
        r["pair_id"]: r["score"]
        for r in fellegi_sunter_score(
            cands, labeled, ["f1", "f2"], threshold=-100.0
        ).collect()
    }
    for k, v in exp.items():
        assert abs(out[k] - round(v, 6)) < 1e-9, k
    # agreement everywhere must outscore disagreement everywhere
    assert out[1] > out[2] > out[3]
    # threshold filters
    kept = fellegi_sunter_score(
        cands, labeled, ["f1", "f2"], threshold=exp[1] - 1e-9
    ).collect()
    assert [r["pair_id"] for r in kept] == [1]


def test_score_columns_preserved(spark):
    labeled = _labeled(spark)
    cands = spark.createDataFrame(
        [(1, 9, True, True)], "a long, b long, f1 boolean, f2 boolean"
    )
    out = fellegi_sunter_score(cands, labeled, ["f1", "f2"], -100.0)
    assert out.columns == ["a", "b", "f1", "f2", "score"]
