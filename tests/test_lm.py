"""Bigram-LM perplexity scoring (operators/lm.py) against a
hand-computed Python model, including the cross-corpus unseen-bigram
fallback."""

from __future__ import annotations

import math
from collections import Counter

from cccatalog_spark.operators.lm import bigram_lm_score, bigram_model


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _model(texts):
    pairs, heads, vocab = Counter(), Counter(), set()
    for t in texts:
        ws = t.lower().split()
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            pairs[(a, b)] += 1
            heads[a] += 1
    return pairs, heads, float(len(vocab))


def _nll(text, pairs, heads, v):
    ws = text.lower().split()
    lps = [
        math.log((pairs[(a, b)] + 1.0) / (heads[a] + v))
        for a, b in zip(ws, ws[1:])
    ]
    return len(lps), round(-sum(lps) / len(lps), 6)


def test_self_trained_matches_python_model(spark):
    texts = ["the cat sat", "the cat ran", "a dog sat", "the end"]
    pairs, heads, v = _model(texts)
    got = {
        r["doc_id"]: r
        for r in bigram_lm_score(_docs(spark, texts), "text", "doc_id").collect()
    }
    for i, t in enumerate(texts):
        n, nll = _nll(t, pairs, heads, v)
        assert got[i]["n_bigrams"] == n
        assert got[i]["nll"] == nll
    # repeated bigram ("the cat") scores lower NLL than one-off ("a dog")
    assert got[0]["nll"] < got[2]["nll"]


def test_short_docs_emit_no_row(spark):
    got = bigram_lm_score(
        _docs(spark, ["solo", "", "two words"]), "text", "doc_id"
    ).collect()
    assert [r["doc_id"] for r in got] == [2]


def test_cross_corpus_unseen_bigrams_get_smoothed_floor(spark):
    train_texts = ["the cat sat on the mat"]
    target_texts = ["zebra quux"]  # fully unseen words
    model = bigram_model(_docs(spark, train_texts), "text", "doc_id")
    got = bigram_lm_score(
        _docs(spark, target_texts), "text", "doc_id", model=model
    ).collect()
    v = 5.0  # the, cat, sat, on, mat
    expect = round(-math.log(1.0 / v), 6)
    assert len(got) == 1
    assert got[0]["nll"] == expect
