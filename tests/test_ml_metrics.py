"""ML evaluation metrics vs hand/Python models (sklearn-free)."""

from __future__ import annotations

from cccatalog_spark.operators.ml_metrics import (
    pr_curve,
    auc,
    classification_report,
    ece,
)


def _auc_model(pairs):
    """Exact AUC by pair counting (ties = 0.5)."""
    pos = [p for p, y in pairs if y == 1]
    neg = [p for p, y in pairs if y == 0]
    wins = 0.0
    for pp in pos:
        for pn in neg:
            wins += 1.0 if pp > pn else (0.5 if pp == pn else 0.0)
    return wins / (len(pos) * len(neg))


def test_auc_matches_pair_counting_with_ties(spark):
    pairs = [
        (0.9, 1), (0.8, 1), (0.8, 0), (0.7, 0), (0.6, 1),
        (0.5, 0), (0.5, 1), (0.5, 0), (0.2, 0), (0.1, 1),
    ]
    df = spark.createDataFrame(pairs, "p double, y int")
    row = auc(df, "p", "y").collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (5, 5)
    assert abs(row["auc"] - _auc_model(pairs)) < 1e-12


def test_auc_perfect_and_inverted(spark):
    perfect = [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)]
    df = spark.createDataFrame(perfect, "p double, y int")
    assert auc(df, "p", "y").collect()[0]["auc"] == 1.0
    inv = [(p, 1 - y) for p, y in perfect]
    df2 = spark.createDataFrame(inv, "p double, y int")
    assert auc(df2, "p", "y").collect()[0]["auc"] == 0.0


def test_ece_hand_computed(spark):
    # bin 0.0-0.1: two rows conf .05, acc 0 -> |0-.05| * 2/4
    # bin 0.9-1.0: two rows conf .95, acc 1 -> |1-.95| * 2/4
    rows = [(0.05, 0), (0.05, 0), (0.95, 1), (0.95, 1)]
    df = spark.createDataFrame(rows, "p double, y int")
    out = ece(df, "p", "y", n_bins=10).collect()[0]
    assert out["n"] == 4
    assert abs(out["ece"] - 0.05) < 1e-12


def test_classification_report_model(spark):
    rows = [  # (y, yhat)
        (0, 0), (0, 0), (0, 1),
        (1, 1), (1, 0),
        (2, 2),
        (3, 2),          # class 3 never predicted -> precision 0 guard
    ]
    df = spark.createDataFrame(rows, "y int, yhat int")
    rep = {r["class"]: r for r in classification_report(df, "yhat", "y").collect()}
    assert rep[0]["tp"] == 2 and rep[0]["fp"] == 1 and rep[0]["fn"] == 1
    assert abs(rep[0]["precision"] - 2 / 3) < 1e-12
    assert abs(rep[0]["recall"] - 2 / 3) < 1e-12
    assert rep[1]["tp"] == 1 and rep[1]["fp"] == 1 and rep[1]["fn"] == 1
    assert rep[2]["tp"] == 1 and rep[2]["fp"] == 1 and rep[2]["fn"] == 0
    assert rep[3]["tp"] == 0 and rep[3]["precision"] == 0.0
    assert rep[3]["f1"] == 0.0


def test_pr_curve_hand_computed(spark):
    rows = [(0.9, 1), (0.7, 1), (0.6, 0), (0.3, 1), (0.1, 0)]
    df = spark.createDataFrame(rows, "p double, y int")
    out = {r["threshold"]: r for r in pr_curve(df, "p", "y", [0.5, 0.8]).collect()}
    # t=0.5: preds {0.9, 0.7, 0.6} -> tp=2 fp=1 fn=1
    assert (out[0.5]["tp"], out[0.5]["fp"], out[0.5]["fn"]) == (2, 1, 1)
    assert abs(out[0.5]["precision"] - 2 / 3) < 1e-12
    assert abs(out[0.5]["recall"] - 2 / 3) < 1e-12
    # t=0.8: preds {0.9} -> tp=1 fp=0 fn=2
    assert (out[0.8]["tp"], out[0.8]["fp"], out[0.8]["fn"]) == (1, 0, 2)
    assert out[0.8]["precision"] == 1.0
    assert abs(out[0.8]["recall"] - 1 / 3) < 1e-12


def test_cohens_kappa_hand_computed(spark):
    from cccatalog_spark.operators.ml_metrics import cohens_kappa

    # classic 2x2 example: a=(20 yes, 30 no), b=(25 yes, 25 no),
    # agreement on 15 yes + 20 no = 35/50
    rows = (
        [("y", "y")] * 15 + [("y", "n")] * 5
        + [("n", "y")] * 10 + [("n", "n")] * 20
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["n"] == 50
    assert abs(r["po"] - 0.7) < 1e-9
    pe = (20 / 50) * (25 / 50) + (30 / 50) * (25 / 50)
    assert abs(r["pe"] - pe) < 1e-6
    assert abs(r["kappa"] - (0.7 - pe) / (1 - pe)) < 1e-6


def test_cohens_kappa_degenerate_single_class(spark):
    from cccatalog_spark.operators.ml_metrics import cohens_kappa

    df = spark.createDataFrame([("x", "x")] * 4, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["po"] == 1.0 and r["pe"] == 1.0 and r["kappa"] == 1.0


def test_cohens_kappa_disjoint_label_sets(spark):
    from cccatalog_spark.operators.ml_metrics import cohens_kappa

    # no shared class between annotators: pe = 0, po = 0, kappa = 0
    df = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "a string, b string"
    )
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["po"] == 0.0 and r["pe"] == 0.0 and r["kappa"] == 0.0


def _bleu_py(cand, ref, max_n=4):
    from collections import Counter
    import math

    ct, rt = cand.split(), ref.split()
    logs = []
    for n in range(1, max_n + 1):
        cg = Counter(
            tuple(ct[i:i + n]) for i in range(len(ct) - n + 1)
        )
        rg = Counter(
            tuple(rt[i:i + n]) for i in range(len(rt) - n + 1)
        )
        clip = sum(min(c, rg[g]) for g, c in cg.items())
        logs.append(math.log((clip + 1) / (sum(cg.values()) + 1)))
    if not ct:
        return 0.0
    bp = math.exp(min(0.0, 1.0 - len(rt) / len(ct)))
    return bp * math.exp(sum(logs) / max_n)


def test_bleu_matches_python_model(spark):
    from cccatalog_spark.operators.ml_metrics import bleu_scores

    pairs = [
        (1, "the cat sat on the mat", "the cat sat on the mat"),
        (2, "the cat the cat on mat", "the cat sat on the mat"),
        (3, "completely different words here", "the cat sat on the mat"),
        (4, "short", "the cat sat on the mat"),
        (5, "", "the cat sat"),
    ]
    df = spark.createDataFrame(pairs, "pid long, cand string, ref string")
    out = {
        r["pid"]: r for r in bleu_scores(df, "pid", "cand", "ref").collect()
    }
    for pid, cand, ref in pairs:
        assert abs(out[pid]["bleu"] - round(_bleu_py(cand, ref), 6)) < 2e-6, pid
    assert out[1]["bleu"] == 1.0  # identical -> exactly 1
    assert out[5]["bleu"] == 0.0  # empty candidate
    assert out[2]["bleu"] < out[1]["bleu"]
    # disjoint words score below the clipped-repeat candidate, which
    # scores below the verbatim one (ordering sanity on the smoothing)
    assert out[3]["bleu"] < out[2]["bleu"]


def test_fit_temperature_recovers_true_scale(spark):
    import random

    from cccatalog_spark.operators.ml_metrics import fit_temperature

    rng = random.Random(3)
    import math

    rows = []
    for _ in range(4000):
        x = rng.uniform(-4, 4)
        p = 1 / (1 + math.exp(-x / 2.0))  # true temperature 2
        rows.append((x, 1.0 if rng.random() < p else 0.0))
    df = spark.createDataFrame(rows, "logit double, y double")
    r = fit_temperature(df, "logit", "y").collect()[0]
    assert 1.5 <= r["temperature"] <= 2.75


def test_conformal_threshold_rank_semantics(spark):
    from cccatalog_spark.operators.ml_metrics import conformal_threshold

    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)], "score double"
    )
    r = conformal_threshold(df, "score", alpha=0.1).collect()[0]
    # k = ceil(101*0.9) = 91 -> 91st smallest of 1..100 is 91
    assert r["n"] == 100 and r["k"] == 91 and r["qhat"] == 91.0
    import pytest

    with pytest.raises(ValueError):
        conformal_threshold(df, "score", alpha=0.0)


def test_group_fairness_hand_computed(spark):
    from cccatalog_spark.operators.ml_metrics import group_fairness_report

    rows = [
        # group a: 2 pos (1 predicted), 2 neg (1 predicted)
        ("a", True, True), ("a", True, False),
        ("a", False, True), ("a", False, False),
        # group b: all positives, perfect predictions
        ("b", True, True), ("b", True, True),
    ]
    df = spark.createDataFrame(rows, "g string, y boolean, yh boolean")
    out = {
        r["g"]: r
        for r in group_fairness_report(df, "g", "y", "yh").collect()
    }
    assert out["a"]["tpr"] == 0.5 and out["a"]["fpr"] == 0.5
    assert out["b"]["tpr"] == 1.0 and out["b"]["fpr"] is None
    assert out["a"]["tpr_gap"] == 0.5  # 1.0 - 0.5, null fpr ignored
    assert out["a"]["pos_rate_gap"] == 0.5


def test_isotonic_pools_violators(spark):
    from cccatalog_spark.operators.ml_metrics import isotonic_calibration

    # bins 0..3 with raw accs 0.2, 0.6, 0.4, 0.8: PAV pools bins 1-2
    # (violation) to (0.6*10+0.4*10)/20 = 0.5
    rows = []
    accs = [0.2, 0.6, 0.4, 0.8]
    for b, acc in enumerate(accs):
        p = (b + 0.5) / 4.0
        n_pos = int(acc * 10)
        rows += [(p, 1)] * n_pos + [(p, 0)] * (10 - n_pos)
    df = spark.createDataFrame(rows, "p double, y int")
    got = {
        r["bin"]: r
        for r in isotonic_calibration(df, "p", "y", n_bins=4).collect()
    }
    assert got[0]["iso_acc"] == 0.2
    assert got[1]["iso_acc"] == 0.5 and got[2]["iso_acc"] == 0.5
    assert got[3]["iso_acc"] == 0.8
    # raw accs preserved
    assert [got[b]["raw_acc"] for b in range(4)] == accs
    # monotone
    vals = [got[b]["iso_acc"] for b in range(4)]
    assert vals == sorted(vals)


def test_brier_identity_up_to_binning(spark):
    from cccatalog_spark.operators.ml_metrics import brier_decomposition

    # forecasts exactly at bin centers, labels matching rates:
    # perfect reliability (conf == acc within bin up to center offset)
    rows = [(0.05, 0)] * 9 + [(0.05, 1)] + [(0.95, 1)] * 9 + [(0.95, 0)]
    df = spark.createDataFrame(rows, "p double, y int")
    got = brier_decomposition(df, "p", "y", n_bins=10).collect()[0]
    assert got["n"] == 20
    assert got["uncertainty"] == 0.25          # ybar = 0.5
    # conf 0.05 vs acc 0.1 -> rel = (0.05)^2 = 0.0025
    assert got["reliability"] == 0.0025
    # acc 0.1/0.9 vs ybar 0.5 -> res = 0.16
    assert got["resolution"] == 0.16
    # identity holds exactly here (within-bin forecast variance 0)
    assert got["brier"] == round(0.0025 - 0.16 + 0.25, 6)


def test_cumulative_gains_concentrated_positives(spark):
    from cccatalog_spark.operators.ml_metrics import cumulative_gains

    rows = [(0.95, 1)] * 5 + [(0.05, 0)] * 45
    df = spark.createDataFrame(rows, "p double, y int")
    got = {
        r["bin"]: r for r in cumulative_gains(df, "p", "y").collect()
    }
    # top bin captures ALL positives with 10% of rows -> lift 10
    assert got[9]["gain"] == 1.0
    assert got[9]["cum_frac_rows"] == 0.1
    assert got[9]["lift"] == 10.0
    assert got[0]["gain"] == 1.0 and got[0]["lift"] == 1.0
