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


def test_kneser_ney_hand_computed(spark):
    from cccatalog_spark.operators.lm import kneser_ney_score

    # corpus: doc1 "a b a b", doc2 "a c"
    # bigrams: (a,b)x2, (b,a)x1, (a,c)x1
    # pairs: ab=2, ba=1, ac=1; heads: a: ch=3 n1f=2; b: ch=1 n1f=1
    # cont: b: n1b=1, a: n1b=1, c: n1b=1; bt=3, vs=3
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_bigrams"], r["nll"])
        for r in kneser_ney_score(docs, "text", "doc_id").collect()
    }
    D = 0.75
    p_ab = (2 - D) / 3 + D * 2 / 3 * (1 / 3)
    p_ba = (1 - D) / 1 + D * 1 / 1 * (1 / 3)
    p_ac = (1 - D) / 3 + D * 2 / 3 * (1 / 3)
    import math

    nll1 = -(math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    nll2 = -math.log(p_ac)
    assert out[1][0] == 3 and abs(out[1][1] - nll1) < 1e-6
    assert out[2][0] == 1 and abs(out[2][1] - nll2) < 1e-6


def test_kneser_ney_cross_corpus_floors_unseen(spark):
    from cccatalog_spark.operators.lm import (
        kneser_ney_model,
        kneser_ney_score,
    )

    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    model = kneser_ney_model(train, "text", "doc_id")
    target = spark.createDataFrame(
        [(9, "z q")], "doc_id long, text string"
    )
    rows = kneser_ney_score(
        target, "text", "doc_id", model=model
    ).collect()
    import math

    # unseen head z -> pure continuation; unseen tail q -> floor
    # 1/(vs+bt) = 1/6
    assert rows[0]["n_bigrams"] == 1
    assert abs(rows[0]["nll"] - (-math.log(1 / 6))) < 1e-6


def test_min_k_prob_matches_python_model(spark):
    from cccatalog_spark.operators.lm import min_k_prob_score

    texts = [
        "the cat sat on the mat",
        "the cat sat the cat sat the cat sat",
        "a dog ran far away today quickly",
    ]
    pairs, heads, v = _model(texts)
    got = {
        r["doc_id"]: r
        for r in min_k_prob_score(
            _docs(spark, texts), "text", "doc_id", frac=0.4
        ).collect()
    }
    for i, t in enumerate(texts):
        ws = t.lower().split()
        nlls = sorted(
            (
                -math.log((pairs[(a, b)] + 1.0) / (heads[a] + v))
                for a, b in zip(ws, ws[1:])
            ),
            reverse=True,
        )
        take = max(1, math.ceil(0.4 * len(nlls)))
        assert got[i]["n_bigrams"] == len(nlls)
        assert got[i]["n_scored"] == take
        assert got[i]["mink_nll"] == round(sum(nlls[:take]) / take, 6)
    # the repetitive doc's worst-case tail is still predictable ->
    # lower min-k score than the all-one-off doc
    assert got[1]["mink_nll"] < got[2]["mink_nll"]


def test_min_k_singleton_floor(spark):
    from cccatalog_spark.operators.lm import min_k_prob_score

    # one bigram -> frac*1 rounds up to the at-least-one floor
    got = min_k_prob_score(
        _docs(spark, ["two words"]), "text", "doc_id", frac=0.2
    ).collect()
    assert len(got) == 1 and got[0]["n_scored"] == 1


def test_perplexity_partition_bands(spark):
    from cccatalog_spark.operators.lm import perplexity_partition

    rows = [
        (i, "the cat sat " * (1 + i % 3), "en") for i in range(6)
    ] + [(10 + i, f"w{i} x{i} y{i} z{i}", "de") for i in range(3)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    out = perplexity_partition(
        docs, "text", "doc_id", "lang", n_buckets=3
    ).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    # each language is banded independently into 1..3, equal frequency
    assert sorted(r["ppl_bucket"] for r in by_lang["en"]) == [1, 1, 2, 2, 3, 3]
    assert sorted(r["ppl_bucket"] for r in by_lang["de"]) == [1, 2, 3]
    # banding follows ascending nll within each language
    for rs in by_lang.values():
        for a in rs:
            for b in rs:
                if a["nll"] < b["nll"]:
                    assert a["ppl_bucket"] <= b["ppl_bucket"]
