"""Corpus drift (operators/corpus_stats.py): JSD against a Python
model, identity/disjoint bounds, vocabulary accounting."""

from __future__ import annotations

import math
from collections import Counter

from cccatalog_spark.operators.corpus_stats import js_divergence


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _jsd_model(texts_a, texts_b):
    ca = Counter(w for t in texts_a for w in t.lower().split())
    cb = Counter(w for t in texts_b for w in t.lower().split())
    na, nb = sum(ca.values()), sum(cb.values())
    jsd = 0.0
    for term in set(ca) | set(cb):
        p, q = ca.get(term, 0) / na, cb.get(term, 0) / nb
        m = (p + q) / 2.0
        if p > 0:
            jsd += 0.5 * p * math.log(p / m)
        if q > 0:
            jsd += 0.5 * q * math.log(q / m)
    return round(jsd, 6)


def test_jsd_matches_model(spark):
    a = ["the cat sat", "dogs bark loud"]
    b = ["the cat ran", "birds sing"]
    row = js_divergence(_docs(spark, a), _docs(spark, b), "text").collect()[0]
    assert row["jsd"] == _jsd_model(a, b)
    assert row["vocab_a"] == 6 and row["vocab_b"] == 5
    assert row["vocab_shared"] == 2  # the, cat


def test_jsd_identity_is_zero(spark):
    a = ["alpha beta gamma", "beta beta delta"]
    row = js_divergence(_docs(spark, a), _docs(spark, a), "text").collect()[0]
    assert row["jsd"] == 0.0
    assert row["vocab_shared"] == row["vocab_a"] == row["vocab_b"]


def test_jsd_disjoint_is_ln2(spark):
    a = ["aa bb cc"]
    b = ["xx yy zz"]
    row = js_divergence(_docs(spark, a), _docs(spark, b), "text").collect()[0]
    assert row["jsd"] == round(math.log(2.0), 6)
    assert row["vocab_shared"] == 0


def test_zipf_fit_recovers_power_law_slope(spark):
    """A corpus drawn exactly from freq(rank) = C * rank^-1.2 fits
    slope -1.2 with r2 ~ 1; a flat (uniform) corpus fits slope ~ 0."""
    words = [f"w{i}" for i in range(1, 41)]
    zipf_text = " ".join(
        " ".join([w] * max(1, int(round(200 * (i + 1) ** -1.2))))
        for i, w in enumerate(words)
    )
    flat_text = " ".join(" ".join([w] * 5) for w in words)
    df = spark.createDataFrame(
        [("zipf", zipf_text), ("flat", flat_text)], ["source", "text"]
    )
    from cccatalog_spark.operators.corpus_stats import zipf_fit

    out = {r.source: r for r in zipf_fit(df, "text", "source").collect()}
    assert abs(out["zipf"].slope + 1.2) < 0.12
    assert out["zipf"].r2 > 0.97
    assert abs(out["flat"].slope) < 1e-9
    assert out["flat"].n_terms == 40


def test_psi_identical_distributions_near_zero(spark):
    from cccatalog_spark.operators.corpus_stats import (
        population_stability_index,
    )

    rows = [(float(i % 50),) for i in range(500)]
    ref = spark.createDataFrame(rows, "score double")
    out = population_stability_index(ref, ref, "score", n_bins=10)
    psi = out.collect()[0]["psi"]
    assert abs(psi) < 1e-9


def test_psi_shift_detected_and_clamped(spark):
    from cccatalog_spark.operators.corpus_stats import (
        population_stability_index,
    )

    ref = spark.createDataFrame(
        [(float(i),) for i in range(100)], "score double"
    )
    # hard right shift: many current values beyond ref max land in the
    # last bin via the clamp instead of vanishing
    cur = spark.createDataFrame(
        [(float(i) + 80.0,) for i in range(100)], "score double"
    )
    rows = {r["bin"]: r for r in
            population_stability_index(ref, cur, "score", n_bins=5)
            .collect()}
    assert rows[0]["psi"] > 0.25
    assert sum(r["n_cur"] for r in rows.values()) == 100
    assert rows[4]["n_cur"] == 100  # bin 4 starts at 79.2; all of 80..179 clamp there


def test_psi_nulls_excluded(spark):
    from cccatalog_spark.operators.corpus_stats import (
        population_stability_index,
    )

    base = [(float(i),) for i in range(50)]
    ref = spark.createDataFrame(base, "score double")
    cur = spark.createDataFrame(
        base + [(None,)] * 9, "score double"
    )
    out = population_stability_index(ref, cur, "score", n_bins=5)
    assert sum(r["n_cur"] for r in out.collect()) == 50


def test_lexical_diversity_profile(spark):
    from cccatalog_spark.operators.corpus_stats import (
        lexical_diversity_profile,
    )

    df = spark.createDataFrame(
        [
            ("rich", "one two three four five"),
            ("poor", "spam spam spam spam ham"),
        ],
        "src string, text string",
    )
    out = {
        r["grp"]: r
        for r in lexical_diversity_profile(df, "src", "text").collect()
    }
    rich, poor = out["rich"], out["poor"]
    assert rich["n_tokens"] == 5 and rich["n_types"] == 5
    assert rich["ttr"] == 1.0 and rich["hapax_share"] == 1.0
    # all-hapax text: sum(c^2) = N -> K exactly 0
    assert rich["yule_k"] == 0.0
    assert poor["n_types"] == 2 and poor["ttr"] == 0.4
    assert poor["hapax_share"] == 0.5
    # K = 1e4 * (16 + 1 - 5) / 25 = 4800
    assert poor["yule_k"] == 4800.0
    assert poor["yule_k"] > rich["yule_k"]


def test_heaps_law_fit_growth_vs_templated(spark):
    from cccatalog_spark.operators.corpus_stats import heaps_law_fit

    # growing corpus: every doc introduces fresh words alongside a
    # shared core -> beta well inside (0, 1)
    grow = [
        (i, "the a of " + " ".join(f"w{i}_{j}" for j in range(5)))
        for i in range(40)
    ]
    g = heaps_law_fit(
        spark.createDataFrame(grow, "doc_id long, text string"),
        "doc_id", "text",
    ).collect()[0]
    assert g["total_tokens"] == 40 * 8
    assert g["vocab"] == 3 + 200
    assert 0.5 < g["beta"] < 1.0

    # templated corpus: vocabulary saturates immediately -> beta ~ 0
    flat = [(i, "spam ham eggs spam ham eggs") for i in range(40)]
    f = heaps_law_fit(
        spark.createDataFrame(flat, "doc_id long, text string"),
        "doc_id", "text",
    ).collect()[0]
    assert f["vocab"] == 3
    assert f["beta"] < 0.1
    assert f["beta"] < g["beta"]


def test_emd_1d_known_distances(spark):
    from cccatalog_spark.operators.corpus_stats import emd_1d

    # identical distributions -> 0
    rows = [(float(v), "a") for v in (1, 2, 3)] + [
        (float(v), "b") for v in (1, 2, 3)
    ]
    df = spark.createDataFrame(rows, "x double, g string")
    r = emd_1d(df, "g", "x", "a", "b").collect()[0]
    assert r["emd"] == 0.0 and r["n_a"] == 3 and r["n_b"] == 3

    # b = a shifted by +2 -> EMD exactly 2
    rows = [(float(v), "a") for v in (0, 1, 2)] + [
        (float(v) + 2.0, "b") for v in (0, 1, 2)
    ]
    df = spark.createDataFrame(rows, "x double, g string")
    r = emd_1d(df, "g", "x", "a", "b").collect()[0]
    assert abs(r["emd"] - 2.0) < 1e-9

    # point masses at 0 and 5 -> EMD 5
    rows = [(0.0, "a"), (5.0, "b")]
    df = spark.createDataFrame(rows, "x double, g string")
    r = emd_1d(df, "g", "x", "a", "b").collect()[0]
    assert r["emd"] == 5.0


def test_js_matrix_symmetric_inputs_and_disjoint_bound(spark):
    import math

    from cccatalog_spark.operators.corpus_stats import (
        js_divergence_matrix,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c", "g1"),
            (2, "a b c", "g2"),       # identical dist to g1
            (3, "x y z", "g3"),       # disjoint from both
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        (r["group_a"], r["group_b"]): r
        for r in js_divergence_matrix(docs, "text", "lang").collect()
    }
    # identical distributions -> jsd 0
    assert got[("g1", "g2")]["jsd"] == 0.0
    assert got[("g1", "g2")]["n_shared_terms"] == 3
    # fully disjoint -> jsd = ln 2 exactly (no shared terms row exists,
    # so the pair is ABSENT from the matrix — the absent-mass identity
    # only fires when at least one term is shared)
    assert ("g1", "g3") not in got


def test_js_matrix_partial_overlap_hand_computed(spark):
    import math

    from cccatalog_spark.operators.corpus_stats import (
        js_divergence_matrix,
    )

    # g1: a a b ; g2: a c c -> shared term 'a' with p=2/3, q=1/3
    docs = spark.createDataFrame(
        [(1, "a a b", "g1"), (2, "a c c", "g2")],
        "doc_id long, text string, lang string",
    )
    got = js_divergence_matrix(docs, "text", "lang").collect()[0]
    p, q = 2 / 3, 1 / 3
    m = (p + q) / 2
    expect = (
        0.5 * p * math.log(p / m)
        + 0.5 * q * math.log(q / m)
        + 0.5 * math.log(2.0) * (2.0 - p - q)
    )
    assert got["n_shared_terms"] == 1
    assert got["jsd"] == round(expect, 6)
