"""Feature hashing (operators/features.py) against a Python model:
bucket/sign derivation, collision cancellation, unsigned variant."""

from __future__ import annotations

import hashlib

import pytest

from cccatalog_spark.operators.features import hashed_bow


def _model(text, dim=64, signed=True):
    out = {}
    for t in text.lower().split():
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        j = h % dim
        s = 1 if (not signed or (h // dim) % 2 == 0) else -1
        out[j] = out.get(j, 0) + s
    return {j: w for j, w in out.items() if w != 0}


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_hashed_bow_matches_python_model(spark):
    texts = ["the cat sat on the mat", "cat cat dog", "unique tokens here"]
    got: dict[int, dict[int, int]] = {}
    for r in hashed_bow(_docs(spark, texts), "text", "doc_id").collect():
        got.setdefault(r["doc_id"], {})[r["bucket"]] = r["weight"]
    for i, t in enumerate(texts):
        assert got.get(i, {}) == _model(t), i


def test_hashed_bow_unsigned_counts(spark):
    texts = ["a a a b"]
    rows = hashed_bow(
        _docs(spark, texts), "text", "doc_id", signed=False
    ).collect()
    want = _model(texts[0], signed=False)
    assert {r["bucket"]: r["weight"] for r in rows} == want
    assert sum(want.values()) == 4  # unsigned = plain counts


def test_hashed_bow_dim_bound_and_validation(spark):
    texts = [" ".join(f"tok{i}" for i in range(500))]
    rows = hashed_bow(_docs(spark, texts), "text", "doc_id", dim=16).collect()
    assert all(0 <= r["bucket"] < 16 for r in rows)
    assert len(rows) <= 16  # output bounded by dim, not vocabulary
    with pytest.raises(ValueError):
        hashed_bow(_docs(spark, texts), "text", "doc_id", dim=1)
