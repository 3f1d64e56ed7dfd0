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


def test_covariance_matrix_matches_numpy_and_np_path(spark):
    import numpy as np

    from cccatalog_spark.operators.features import (
        covariance_matrix,
        covariance_matrix_np,
    )

    rng = np.random.RandomState(3)
    X = rng.randn(200, 6)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "id long, v array<double>",
    )
    want = np.cov(X, rowvar=False, bias=True)  # population covariance
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in covariance_matrix(df, "v", 6).collect()
    }
    assert len(got) == 21  # upper triangle of 6x6
    for (i, j), c in got.items():
        assert i <= j
        assert abs(c - want[i - 1, j - 1]) < 1e-9, (i, j)

    got_np = {
        (r["i"], r["j"]): r["cov"]
        for r in covariance_matrix_np(df.repartition(7), "v", 6).collect()
    }
    assert set(got_np) == set(got)
    for k in got:
        assert abs(got_np[k] - got[k]) < 1e-9, k


def test_pca_power_matches_numpy_eigendecomposition(spark):
    """3 power iterations from 1/sqrt(d) already land within 1e-3 of
    numpy's top eigenvector (up to sign) on a well-separated spectrum,
    and the Rayleigh quotient is within 1e-3 relative of lambda_1."""
    import numpy as np
    from cccatalog_spark.operators.features import (
        pca_power_component,
        pca_project,
    )

    rng = np.random.default_rng(7)
    d = 8
    # strong first component: x = z * u + small noise
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    z = rng.normal(size=400) * 5.0
    data = np.outer(z, u) + rng.normal(size=(400, d)) * 0.3
    rows = [(int(i), [float(v) for v in row]) for i, row in enumerate(data)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    comp = pca_power_component(df, "embedding", d, n_iter=8)
    got = comp.orderBy("i").collect()
    v_hat = np.array([r.loading for r in got])
    lam_hat = got[0].eigenvalue

    cov = np.cov(data.T, bias=True)
    w, vecs = np.linalg.eigh(cov)
    v_np = vecs[:, -1]
    lam_np = w[-1]
    assert abs(abs(float(v_hat @ v_np)) - 1.0) < 1e-3
    assert abs(lam_hat - lam_np) / lam_np < 1e-3
    assert abs(np.linalg.norm(v_hat) - 1.0) < 1e-9

    proj = pca_project(df, "embedding", "vec_id", comp).collect()
    want = data @ v_hat
    got_p = {r.vec_id: r.pc1 for r in proj}
    for i in range(400):
        assert abs(got_p[i] - want[i]) < 1e-6


def test_sif_embed_downweights_frequent_words(spark):
    from cccatalog_spark.operators.features import (
        hash_word_vector,
        sif_embed,
    )
    from pyspark.sql import functions as F

    # 'the' dominates the corpus; with SIF weights a doc of pure 'the'
    # must pool to a much smaller-magnitude raw vector than a doc of
    # the same word appearing once
    docs = spark.createDataFrame(
        [(1, "the " * 50 + "cat"), (2, "unique words only here")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["emb"]
        for r in sif_embed(
            docs, "text", "doc_id", dim=4, remove_common=False
        ).collect()
    }
    import math

    n1 = math.sqrt(sum(x * x for x in out[1]))
    n2 = math.sqrt(sum(x * x for x in out[2]))
    assert n1 < n2

    # hash vectors are deterministic and bounded
    hv = spark.range(1).select(
        hash_word_vector(F.lit("cat"), 4).alias("v")
    ).collect()[0]["v"]
    hv2 = spark.range(1).select(
        hash_word_vector(F.lit("cat"), 4).alias("v")
    ).collect()[0]["v"]
    assert hv == hv2 and all(-1.0 <= x <= 1.0 for x in hv)


def test_sif_common_component_removed_is_orthogonal(spark):
    from cccatalog_spark.operators.features import (
        pca_power_component,
        sif_embed,
    )

    rows = [
        (i, "shared prefix tokens " + ("alpha " if i % 2 else "beta ") * 3)
        for i in range(12)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cleaned = sif_embed(docs, "text", "doc_id", dim=4)
    # after removal, projecting the cleaned embeddings onto their OWN
    # first component of the ORIGINAL pooled matrix ~ 0 is hard to
    # assert directly; instead check the removed frame's projection on
    # the original direction is ~0 by recomputing loadings on the raw
    # pooled frame
    raw = sif_embed(docs, "text", "doc_id", dim=4, remove_common=False)
    loads = {
        r["i"]: r["loading"]
        for r in pca_power_component(raw, "emb", 4).collect()
    }
    for r in cleaned.collect():
        proj = sum(r["emb"][i] * loads[i + 1] for i in range(4))
        assert abs(proj) < 1e-9
