"""operators/classifier vs independent pure-Python/numpy references:
NB log-probabilities and priors recomputed by hand; logistic-GD
weights recomputed with a dense numpy implementation of the same
fixed-iteration schedule."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from cccatalog_spark.operators.classifier import (
    logreg_predict,
    logreg_train,
    nb_score,
    nb_train,
    with_bias,
)

DOCS = [
    (0, "spark table scan join", "en"),
    (1, "der tisch und der stuhl", "de"),
    (2, "join scan filter table scan", "en"),
    (3, "und der baum und", "de"),
    (4, "table join window", "en"),
    (5, "", "en"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def _py_nb(train):
    counts: dict[tuple[str, str], int] = {}
    label_tok: dict[str, int] = {}
    label_docs: dict[str, int] = {}
    vocab = set()
    for _, text, lab in train:
        label_docs[lab] = label_docs.get(lab, 0) + 1
        for t in text.split():
            counts[(t, lab)] = counts.get((t, lab), 0) + 1
            label_tok[lab] = label_tok.get(lab, 0) + 1
            vocab.add(t)
    v = len(vocab)
    n_docs = sum(label_docs.values())
    out = {}
    for lab in label_docs:
        denom = label_tok.get(lab, 0) + v
        out[lab] = {
            "prior": math.log(label_docs[lab] / n_docs),
            "fallback": math.log(1.0 / denom),
            "tok": {
                t: math.log((c + 1.0) / denom)
                for (t, L), c in counts.items()
                if L == lab
            },
        }
    return out


def test_nb_model_matches_hand_computation(spark, docs):
    model = nb_train(docs, "text", "lang")
    ref = _py_nb(DOCS)
    stats = {
        r["label"]: r for r in model.label_stats.collect()
    }
    assert set(stats) == set(ref)
    for lab, m in ref.items():
        assert stats[lab]["log_prior"] == pytest.approx(m["prior"], abs=1e-12)
        assert stats[lab]["log_fallback"] == pytest.approx(
            m["fallback"], abs=1e-12
        )
    for r in model.token_logprob.collect():
        assert r["log_prob"] == pytest.approx(
            ref[r["label"]]["tok"][r["token"]], abs=1e-12
        )


def test_nb_score_matches_hand_computation(spark, docs):
    model = nb_train(docs, "text", "lang")
    ref = _py_nb(DOCS)
    test = spark.createDataFrame(
        [(10, "table join unseen"), (11, "")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["label"]): r["score"]
        for r in nb_score(test, model, "text", "doc_id").collect()
    }
    # every (doc, label) pair present, empty doc scores the prior only
    assert len(got) == 2 * len(ref)
    for lab, m in ref.items():
        want = m["prior"] + sum(
            m["tok"].get(t, m["fallback"])
            for t in "table join unseen".split()
        )
        assert got[(10, lab)] == pytest.approx(want, abs=1e-10)
        assert got[(11, lab)] == pytest.approx(m["prior"], abs=1e-12)


def _np_logreg(rows, y, dim, iterations, lr):
    # rows: list of (doc, bucket, x); bias bucket -1 mapped to col 0
    ids = sorted({d for d, _, _ in rows})
    idx = {d: i for i, d in enumerate(ids)}
    X = np.zeros((len(ids), dim + 1))
    for d, b, x in rows:
        X[idx[d], b + 1] += x
    yv = np.array([y[d] for d in ids])
    w = np.zeros(dim + 1)
    for _ in range(iterations):
        p = 1.0 / (1.0 + np.exp(-X @ w))
        w = w - lr * (X.T @ (p - yv)) / len(ids)
    return ids, idx, X, w


def test_logreg_matches_numpy(spark):
    rows = [
        (0, 0, 2.0), (0, 1, -1.0),
        (1, 0, -3.0), (1, 2, 1.0),
        (2, 1, 1.0), (2, 2, 2.0),
        (3, 0, 1.0),
    ]
    y = {0: 1.0, 1: 0.0, 2: 1.0, 3: 0.0}
    feats = spark.createDataFrame(
        rows, "doc_id long, bucket int, weight double"
    )
    docs = spark.createDataFrame(
        [(d,) for d in y], "doc_id long"
    )
    fb = with_bias(feats, docs, "doc_id")
    labels = spark.createDataFrame(
        [(d, v) for d, v in y.items()], "doc_id long, y double"
    )
    w = logreg_train(fb, labels, 3, iterations=4, lr=0.3)
    got = {r["j"]: r["w"] for r in w.collect()}
    bias_rows = [(d, -1, 1.0) for d in y]
    _, _, X, ref = _np_logreg(rows + bias_rows, y, 3, 4, 0.3)
    assert set(got) == {-1, 0, 1, 2}
    for j, wj in got.items():
        assert wj == pytest.approx(ref[j + 1], abs=1e-10)
    # prediction path agrees with numpy sigmoid scores
    probs = {
        r["doc_id"]: r["prob"]
        for r in logreg_predict(fb, w, id_col="doc_id").collect()
    }
    ref_p = 1.0 / (1.0 + np.exp(-X @ ref))
    ids = sorted(y)
    for i, d in enumerate(ids):
        assert probs[d] == pytest.approx(ref_p[i], abs=1e-10)


def test_logreg_learns_separable_signal(spark):
    # bucket 0 positive iff y=1 — weights must move in the right
    # direction and separate the classes after a few rounds
    rows = [(d, 0, 1.0 if d % 2 == 0 else -1.0) for d in range(20)]
    feats = spark.createDataFrame(
        rows, "doc_id long, bucket int, weight double"
    )
    docs = feats.select("doc_id").distinct()
    labels = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, 1.0).otherwise(0.0).alias("y"),
    )
    w = logreg_train(
        with_bias(feats, docs, "doc_id"), labels, 1,
        iterations=8, lr=1.0,
    )
    probs = logreg_predict(
        with_bias(feats, docs, "doc_id"), w, id_col="doc_id"
    )
    joined = probs.join(labels, "doc_id").collect()
    for r in joined:
        assert (r["prob"] > 0.5) == (r["y"] == 1.0)
