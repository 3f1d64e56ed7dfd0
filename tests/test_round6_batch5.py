"""Unit tests for round-6 batch-5: ARI/NMI clustering agreement."""

from __future__ import annotations

import math

import numpy as np
import pytest


def _ari_nmi(a, b):
    """Reference implementation from the contingency definition."""
    from collections import Counter

    n = len(a)
    cells = Counter(zip(a, b))
    ra = Counter(a)
    rb = Counter(b)

    def c2(x):
        return x * (x - 1) / 2

    sij = sum(c2(v) for v in cells.values())
    sa = sum(c2(v) for v in ra.values())
    sb = sum(c2(v) for v in rb.values())
    e = sa * sb / c2(n)
    ari = (sij - e) / ((sa + sb) / 2 - e) if (sa + sb) / 2 != e else None
    mi = sum(
        (v / n) * math.log(v * n / (ra[x] * rb[y]))
        for (x, y), v in cells.items()
    )
    ha = -sum((v / n) * math.log(v / n) for v in ra.values())
    hb = -sum((v / n) * math.log(v / n) for v in rb.values())
    nmi = 2 * mi / (ha + hb) if (ha + hb) > 0 else None
    return ari, nmi


def test_agreement_identical_partitions(spark):
    from cccatalog_spark.operators.cluster_eval import clustering_agreement

    rows = [(i % 3, i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, ["a", "b"])
    r = clustering_agreement(df, "a", "b").collect()[0]
    assert r["ari"] == pytest.approx(1.0, abs=1e-9)
    assert r["nmi"] == pytest.approx(1.0, abs=1e-9)
    assert r["n"] == 30 and r["n_clusters_a"] == 3


def test_agreement_matches_reference(spark):
    from cccatalog_spark.operators.cluster_eval import clustering_agreement

    rng = np.random.RandomState(9)
    a = rng.randint(0, 4, 100).tolist()
    b = [(x if rng.rand() < 0.7 else int(rng.randint(0, 4))) for x in a]
    want_ari, want_nmi = _ari_nmi(a, b)
    df = spark.createDataFrame(list(zip(a, b)), ["a", "b"])
    r = clustering_agreement(df, "a", "b").collect()[0]
    assert r["ari"] == pytest.approx(want_ari, abs=1e-6)
    assert r["nmi"] == pytest.approx(want_nmi, abs=1e-6)


def test_agreement_matches_sklearn_if_available(spark):
    pytest.importorskip("sklearn")
    from sklearn.metrics import (
        adjusted_rand_score,
        normalized_mutual_info_score,
    )

    from cccatalog_spark.operators.cluster_eval import clustering_agreement

    rng = np.random.RandomState(3)
    a = rng.randint(0, 5, 80).tolist()
    b = rng.randint(0, 3, 80).tolist()
    df = spark.createDataFrame(list(zip(a, b)), ["a", "b"])
    r = clustering_agreement(df, "a", "b").collect()[0]
    assert r["ari"] == pytest.approx(adjusted_rand_score(a, b), abs=1e-6)
    assert r["nmi"] == pytest.approx(
        normalized_mutual_info_score(a, b), abs=1e-6
    )


def test_agreement_single_cluster_degenerate(spark):
    from cccatalog_spark.operators.cluster_eval import clustering_agreement

    # both partitions trivial: H(A)+H(B)=0, ARI denominator 0 -> NULLs
    df = spark.createDataFrame([(1, 1)] * 5, ["a", "b"])
    r = clustering_agreement(df, "a", "b").collect()[0]
    assert r["ari"] is None and r["nmi"] is None


def test_padding_waste_hand_case(spark):
    from cccatalog_spark.operators.packing import padding_waste_sweep

    # docs of 3, 5, 9 tokens at L=4: chunks 1+2+3=6, slots 24,
    # waste 1-17/24; overflow 2/3 of docs
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d e"), (3, "a b c d e f g h i")],
        ["doc_id", "text"],
    )
    out = {
        r["max_len"]: r
        for r in padding_waste_sweep(df, "text", lengths=[4, 16]).collect()
    }
    r4 = out[4]
    assert r4["chunks"] == 6 and r4["padded_slots"] == 24
    assert r4["total_tokens"] == 17
    assert r4["waste_frac"] == pytest.approx(round(1 - 17 / 24, 6))
    assert r4["overflow_doc_frac"] == pytest.approx(round(2 / 3, 6))
    r16 = out[16]
    assert r16["chunks"] == 3 and r16["overflow_doc_frac"] == 0.0
