"""TF-IDF keyword extraction, document-PMI collocations, and the
derandomized JL random projection against brute-force Python/numpy
models."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from cccatalog_spark.operators.corpus_stats import pmi_pairs
from cccatalog_spark.operators.features import random_projection
from cccatalog_spark.operators.retrieval import tfidf_top_terms


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


TEXTS = [
    "spark merge join merge merge filter",
    "spark filter window window agg",
    "merge join agg filter spark spark",
    "rare unique singleton spark",
]


def test_tfidf_matches_sklearn_formula(spark):
    n = len(TEXTS)
    tf = [Counter(t.lower().split()) for t in TEXTS]
    df = Counter(term for c in tf for term in c)
    want = {}
    for i, c in enumerate(tf):
        scored = sorted(
            (
                (round(cnt * (math.log((1 + n) / (1 + df[t])) + 1), 6), t, cnt)
                for t, cnt in c.items()
            ),
            key=lambda x: (-x[0], x[1]),
        )[:3]
        for rank, (s, t, cnt) in enumerate(scored, 1):
            want[(i, t)] = (cnt, s, rank)
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["tfidf"], r["rank"])
        for r in tfidf_top_terms(_docs(spark, TEXTS), "text", "doc_id", k=3).collect()
    }
    assert got == want


def test_tfidf_universal_term_gets_floor_weight(spark):
    # 'spark' is in every doc -> idf = ln(1)+1 = 1 -> tfidf == tf
    rows = tfidf_top_terms(_docs(spark, TEXTS), "text", "doc_id", k=10).collect()
    for r in rows:
        if r["term"] == "spark":
            assert r["tfidf"] == float(r["tf"])


def test_pmi_matches_brute_force(spark):
    texts = [
        "a b c", "a b d", "a b e", "a b f", "a b g",
        "x y", "x y", "x y", "p q", "p r",
    ]
    n = len(texts)
    present = [set(t.split()) for t in texts]
    co = Counter()
    df = Counter()
    for s in present:
        for t in s:
            df[t] += 1
        for x in s:
            for y in s:
                if x < y:
                    co[(x, y)] += 1
    want = {}
    for (x, y), c in co.items():
        if c >= 3:
            want[(x, y)] = (
                c,
                round(math.log((c / n) / ((df[x] / n) * (df[y] / n))), 6),
            )
    got = {
        (r["term_a"], r["term_b"]): (r["co_docs"], r["pmi"])
        for r in pmi_pairs(
            _docs(spark, texts), "text", "doc_id", min_count=3, k=100
        ).collect()
    }
    assert got == want
    # x/y co-occur exclusively -> highest PMI collocation
    top = max(got.items(), key=lambda kv: kv[1][1])
    assert top[0] == ("x", "y")


def test_pmi_multiplicity_ignored(spark):
    # repeated tokens inside one doc count once (presence-based)
    texts = ["a a a b", "a b", "c d", "c d", "c d"]
    got = {
        (r["term_a"], r["term_b"]): r["co_docs"]
        for r in pmi_pairs(
            _docs(spark, texts), "text", "doc_id", min_count=1, k=100
        ).collect()
    }
    assert got[("a", "b")] == 2


def _sign_matrix(in_dim, out_dim):
    m = np.zeros((in_dim, out_dim))
    for i in range(in_dim):
        for j in range(out_dim):
            m[i, j] = np.sign(((i * 31 + j * 17) % 7) - 3)
    return m


def test_random_projection_matches_numpy(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 16).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    want = vecs @ _sign_matrix(16, 4)
    got = {}
    for r in random_projection(df, "embedding", "vec_id", out_dim=4).collect():
        got[(r["vec_id"], r["dim"])] = r["value"]
    assert len(got) == 20 * 4
    for i in range(20):
        for j in range(4):
            assert abs(got[(i, j)] - round(want[i, j], 6)) < 1e-9


def test_random_projection_preserves_relative_distance(spark):
    # JL sanity: a vector pair that is close in 64-d stays closer in
    # the projection than a far pair (no exactness claim, just order)
    rng = np.random.RandomState(11)
    base = rng.randn(64)
    near = base + 0.01 * rng.randn(64)
    far = rng.randn(64)
    df = spark.createDataFrame(
        [(0, [float(x) for x in base]),
         (1, [float(x) for x in near]),
         (2, [float(x) for x in far])],
        "vec_id long, embedding array<double>",
    )
    out = defaultdict(dict)
    for r in random_projection(df, "embedding", "vec_id", out_dim=8).collect():
        out[r["vec_id"]][r["dim"]] = r["value"]
    p = {i: np.array([out[i][j] for j in range(8)]) for i in out}
    assert np.linalg.norm(p[0] - p[1]) < np.linalg.norm(p[0] - p[2])
