"""Unit tests for round-6 batch-10: Markov hitting time and
Cavnar-Trenkle rank-profile language ID."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy sweep; excluded from the fast loop (-m "not slow")


def test_hitting_time_deterministic_chain(spark):
    from cccatalog_spark.operators.temporal import markov_hitting_time

    # chain a -> b -> target for every user: h(b)=1, h(a)=2
    rows = []
    for u in range(5):
        rows += [(u, 1, "a"), (u, 2, "b"), (u, 3, "t")]
    df = spark.createDataFrame(rows, ["u", "o", "s"])
    out = {
        r["state"]: r
        for r in markov_hitting_time(df, "u", "o", "s", "t", 8).collect()
    }
    assert out["b"]["hitting_time"] == pytest.approx(1.0, abs=1e-9)
    assert out["a"]["hitting_time"] == pytest.approx(2.0, abs=1e-9)
    assert out["b"]["p_to_target"] == pytest.approx(1.0)
    assert out["a"]["p_to_target"] == pytest.approx(0.0)


def test_hitting_time_truncation_and_mixing(spark):
    from cccatalog_spark.operators.temporal import markov_hitting_time

    # from 'a': half the users go straight to t, half loop a -> a -> t
    rows = []
    for u in range(4):
        rows += [(u, 1, "a"), (u, 2, "t")]
    for u in range(4, 8):
        rows += [(u, 1, "a"), (u, 2, "a"), (u, 3, "t")]
    df = spark.createDataFrame(rows, ["u", "o", "s"])
    r = {
        x["state"]: x
        for x in markov_hitting_time(df, "u", "o", "s", "t", 20).collect()
    }["a"]
    # P(a->t) = 8/12, P(a->a) = 4/12; E[h] = 1/(2/3) = 1.5 (geometric)
    assert r["p_to_target"] == pytest.approx(8 / 12, abs=1e-6)
    assert r["hitting_time"] == pytest.approx(1.5, abs=1e-3)  # 20-hop trunc


def test_hitting_time_horizon_caps(spark):
    from cccatalog_spark.operators.temporal import markov_hitting_time

    # pure self-loop never reaches the target: h = horizon exactly
    rows = [(1, i, "a") for i in range(6)] + [(2, 1, "a"), (2, 2, "t")]
    df = spark.createDataFrame(rows, ["u", "o", "s"])
    r = {
        x["state"]: x
        for x in markov_hitting_time(df, "u", "o", "s", "t", 4).collect()
    }["a"]
    assert r["hitting_time"] <= 4.0 + 1e-9


def test_hitting_time_nontarget_sink_not_scored_as_target(spark):
    from cccatalog_spark.operators.temporal import markov_hitting_time

    # a -> d where d is a dead end (no outgoing transitions): the
    # chain never reaches 't', so truncated h(a) = horizon, not 1.
    # 't' appears elsewhere so the target exists in the chain.
    rows = [(1, 1, "a"), (1, 2, "d"), (2, 1, "b"), (2, 2, "t")]
    df = spark.createDataFrame(rows, ["u", "o", "s"])
    out = {
        x["state"]: x
        for x in markov_hitting_time(df, "u", "o", "s", "t", 6).collect()
    }
    # h(a) = 1 + h5(d) = 1 + 5 = 6 == horizon (E[min(steps, H)] with
    # steps = inf); the old coalesce-to-0 convention reported 1.0.
    assert out["a"]["hitting_time"] == pytest.approx(6.0, abs=1e-9)
    assert out["b"]["hitting_time"] == pytest.approx(1.0, abs=1e-9)


def test_langid_profile_separable_langs(spark):
    from cccatalog_spark.operators.langid_profile import (
        rank_profile_langid_eval,
    )

    rows = []
    for i in range(20):
        rows.append((2 * i, "aa", "aaa bbb aaa ccc aaa"))
        rows.append((2 * i + 1, "aa", "aaa ccc aaa bbb"))
        rows.append((1000 + 2 * i, "zz", "zzz yyy zzz xxx zzz"))
        rows.append((1001 + 2 * i, "zz", "zzz xxx zzz yyy"))
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = {
        r["lang"]: r
        for r in rank_profile_langid_eval(
            df, "text", "doc_id", "lang", k=10
        ).collect()
    }
    # disjoint alphabets: every held-out doc classifies correctly
    for lang in ("aa", "zz"):
        assert out[lang]["accuracy"] == pytest.approx(1.0)
        assert out[lang]["n_correct"] == out[lang]["n_docs"] == 20


def test_langid_profile_counts_split(spark):
    from cccatalog_spark.operators.langid_profile import (
        rank_profile_langid_eval,
    )

    rows = [(i, "aa", "abc def ghi") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = rank_profile_langid_eval(df, "text", "doc_id", "lang").collect()
    assert out[0]["n_docs"] == 5  # odd ids only


# ------------------------------------------------------ seasonality strength
def test_seasonality_strength_pure_cycle(spark):
    import math

    from cccatalog_spark.operators.temporal import (
        seasonal_decompose,
        seasonality_strength,
    )
    from pyspark.sql import functions as F

    rows = [(t, 10.0 + [0, 3, -3, 1, -1, 2, -2][t % 7]) for t in range(56)]
    df = spark.createDataFrame(rows, ["t", "y"])
    dec = seasonal_decompose(df, "t", "y", period=7)
    r = seasonality_strength(dec).collect()[0]
    assert r["f_seasonal"] == pytest.approx(1.0, abs=1e-4)  # no noise


def test_seasonality_strength_pure_noise(spark):
    from cccatalog_spark.operators.temporal import (
        seasonal_decompose,
        seasonality_strength,
    )
    from pyspark.sql import functions as F
    import numpy as np

    rng = np.random.default_rng(2)
    rows = [(t, float(v)) for t, v in enumerate(rng.normal(0, 1, 70))]
    df = spark.createDataFrame(rows, ["t", "y"])
    dec = seasonal_decompose(df, "t", "y", period=7)
    r = seasonality_strength(dec).collect()[0]
    assert r["f_seasonal"] < 0.9  # noise never reads as a clean cycle


# ----------------------------------------------------------------- JB test
def test_jarque_bera_normal_vs_skewed(spark):
    import numpy as np

    from cccatalog_spark.operators.stats import jarque_bera

    rng = np.random.default_rng(4)
    norm = spark.createDataFrame(
        [(float(v),) for v in rng.normal(0, 1, 2000)], ["x"]
    )
    skewed = spark.createDataFrame(
        [(float(v),) for v in rng.exponential(1.0, 2000)], ["x"]
    )
    rn = jarque_bera(norm, "x").collect()[0]
    rs = jarque_bera(skewed, "x").collect()[0]
    assert abs(rn["skewness"]) < 0.2 and abs(rn["kurtosis"] - 3) < 0.5
    assert rs["jb"] > 100 > rn["jb"]


def test_jarque_bera_numpy_reference(spark):
    import numpy as np

    from cccatalog_spark.operators.stats import jarque_bera

    x = np.array([1.0, 2.0, 2.0, 3.0, 7.0, 9.0])
    df = spark.createDataFrame([(float(v),) for v in x], ["x"])
    r = jarque_bera(df, "x").collect()[0]
    m = x.mean()
    m2 = ((x - m) ** 2).mean()
    m3 = ((x - m) ** 3).mean()
    m4 = ((x - m) ** 4).mean()
    s, k = m3 / m2**1.5, m4 / m2**2
    assert r["skewness"] == pytest.approx(s, abs=1e-6)
    assert r["kurtosis"] == pytest.approx(k, abs=1e-6)
    assert r["jb"] == pytest.approx(
        len(x) / 6 * (s**2 + (k - 3) ** 2 / 4), abs=1e-5
    )


# -------------------------------------------------------------------- Theil
def test_theil_decomposition_identity_and_reference(spark):
    import math

    from cccatalog_spark.operators.stats import theil_decomposition

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 14.0)]
    df = spark.createDataFrame(rows, ["g", "x"])
    r = theil_decomposition(df, "g", "x").collect()[0]
    xs = [x for _, x in rows]
    n, mu = len(xs), sum(xs) / len(xs)
    total = sum(x / (n * mu) * math.log(x / mu) for x in xs)
    groups = {"a": [1.0, 2.0, 3.0], "b": [10.0, 14.0]}
    between = sum(
        sum(v) / (n * mu) * math.log((sum(v) / len(v)) / mu)
        for v in groups.values()
    )
    assert r["theil_total"] == pytest.approx(total, abs=1e-6)
    assert r["theil_between"] == pytest.approx(between, abs=1e-6)
    assert r["theil_within"] == pytest.approx(total - between, abs=1e-6)
    assert r["theil_within"] >= 0 and r["theil_between"] >= 0


def test_theil_equal_values_zero(spark):
    from cccatalog_spark.operators.stats import theil_decomposition

    df = spark.createDataFrame([("g", 5.0)] * 10, ["g", "x"])
    r = theil_decomposition(df, "g", "x").collect()[0]
    assert r["theil_total"] == pytest.approx(0.0, abs=1e-9)
