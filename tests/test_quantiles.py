"""Exact distributed quantiles (operators/quantiles.py) against
Python's exact sorted-list model, forcing multiple histogram-refine
rounds with tiny bins/thresholds."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy sweep; excluded from the fast loop (-m "not slow")

import math
import random

from cccatalog_spark.operators.quantiles import (
    exact_quantiles,
    exact_quantiles_df,
)


def _disc(values, f):
    s = sorted(values)
    k = max(1, math.ceil(f * len(s)))
    return s[k - 1]


def test_matches_percentile_disc_model(spark):
    rng = random.Random(7)
    vals = [rng.gauss(100.0, 25.0) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    fr = [0.0, 0.1, 0.5, 0.9, 0.99, 1.0]
    got = exact_quantiles(
        df, "x", fr, bins=8, tail_threshold=40, max_rounds=64
    )
    for f, v in got:
        assert v == _disc(vals, f), f


def test_heavy_duplicates_and_skew(spark):
    # 90% identical values, a few outliers: degenerate bins must not
    # stall or mis-rank.
    vals = [42.0] * 900 + [i * 1e6 for i in range(1, 101)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    fr = [0.05, 0.5, 0.905, 0.95]
    got = exact_quantiles(df, "x", fr, bins=4, tail_threshold=10)
    for f, v in got:
        assert v == _disc(vals, f), f


def test_nulls_ignored_and_empty(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (3.0,), (None,), (2.0,)], "x double"
    )
    got = dict(exact_quantiles(df, "x", [0.5], tail_threshold=1))
    assert got[0.5] == 2.0
    empty = df.where("x > 100")
    assert exact_quantiles(empty, "x", [0.5]) == [(0.5, None)]


def test_df_wrapper_schema(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    out = exact_quantiles_df(spark, df, "x", [0.25, 0.75], tail_threshold=5)
    rows = {r["fraction"]: r["value"] for r in out.collect()}
    assert rows == {0.25: 24.0, 0.75: 74.0}


def test_column_stats_rows(spark):
    from cccatalog_spark.operators.stats import column_stats

    rows = [(float(i), float(i % 10)) for i in range(100)] + [(None, 5.0)]
    df = spark.createDataFrame(rows, "a double, b double")
    out = {
        r["column"]: r
        for r in column_stats(
            spark, df, ["a", "b"], quantile_kwargs={"tail_threshold": 5}
        ).collect()
    }
    a = out["a"]
    assert (a["n_rows"], a["n_nulls"], a["min"], a["max"], a["ndv"]) == (
        101, 1, 0.0, 99.0, 100,
    )
    assert (a["p25"], a["p50"], a["p75"]) == (24.0, 49.0, 74.0)
    b = out["b"]
    assert (b["n_nulls"], b["ndv"], b["min"], b["max"]) == (0, 10, 0.0, 9.0)


def test_weighted_median_model(spark):
    from cccatalog_spark.operators.quantiles import weighted_median

    rows = [
        # group g: values 1(w5), 10(w1): half of 6 is 3 -> crossing at 1
        ("g", 1, 5), ("g", 10, 1),
        # group h: 1(w1), 2(w1), 3(w2): half of 4 -> crossing at 2
        ("h", 1, 1), ("h", 2, 1), ("h", 3, 2),
        # group i: single row
        ("i", 42, 7),
    ]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = {
        r["g"]: (r["wmedian"], r["total_weight"])
        for r in weighted_median(df, "g", "v", "w").collect()
    }
    assert got == {"g": (1, 6), "h": (2, 4), "i": (42, 7)}


# ---------------------------------------------------------------------------
# property tests: histogram refinement vs sorted-list truth under
# adversarial value distributions
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_vals = st.lists(
    st.one_of(
        st.floats(
            min_value=-1e12, max_value=1e12,
            allow_nan=False, allow_infinity=False,
        ),
        st.sampled_from([0.0, -0.0, 1e-300, -1e-300, 42.0]),
        st.integers(min_value=-5, max_value=5).map(float),
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(vals=_vals, f=st.sampled_from([0.0, 0.25, 0.5, 0.9, 1.0]))
def test_exact_quantiles_property(spark, vals, f):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = dict(
        exact_quantiles(df, "x", [f], bins=4, tail_threshold=3)
    )[f]
    assert got == _disc(vals, f)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-100, max_value=100),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_weighted_median_property(spark, rows):
    from cccatalog_spark.operators.quantiles import weighted_median

    df = spark.createDataFrame(
        [("g", v, w) for v, w in rows], "g string, v long, w long"
    )
    got = weighted_median(df, "g", "v", "w").collect()[0]
    # model: smallest v whose cumulative weight reaches half the total
    total = sum(w for _, w in rows)
    cum = 0
    want = None
    for v, w in sorted(rows):
        cum += w
        if cum * 2 >= total:
            want = v
            break
    assert got["wmedian"] == want
    assert got["total_weight"] == total


def test_histogram_partials_merge_equals_direct(spark):
    """Merging fine-grain partials gives byte-identical state to
    building at the coarse grain directly (fixed boundaries =>
    exactly mergeable)."""
    from cccatalog_spark.operators.quantiles import (
        histogram_partials,
        merge_histogram_partials,
    )

    rows = [(i % 3, i % 7, float(i % 50)) for i in range(500)]
    df = spark.createDataFrame(rows, ["g", "sub", "v"])
    fine = histogram_partials(df, ["g", "sub"], "v", lo=0.0, hi=50.0, n_bins=10)
    merged = {
        (r.g, r.bin): r.n
        for r in merge_histogram_partials(fine, ["g"]).collect()
    }
    direct = {
        (r.g, r.bin): r.n
        for r in histogram_partials(df, ["g"], "v", lo=0.0, hi=50.0, n_bins=10).collect()
    }
    assert merged == direct


def test_histogram_quantile_error_bounded_by_bin_width(spark):
    """The upper-edge estimate is >= the exact quantile and within one
    bin width of it; outliers clamp to edge bins."""
    from cccatalog_spark.operators.quantiles import (
        histogram_partials,
        quantiles_from_histogram,
    )
    import numpy as np

    vals = [float(v) for v in range(1, 1001)] + [-5.0, 1e9]  # outliers clamp
    df = spark.createDataFrame([(0, v) for v in vals], ["g", "v"])
    hist = histogram_partials(df, ["g"], "v", lo=0.0, hi=1000.0, n_bins=100)
    out = {
        r.fraction: r.q_est
        for r in quantiles_from_histogram(
            hist, ["g"], [0.5, 0.9], lo=0.0, hi=1000.0, n_bins=100
        ).collect()
    }
    exact_p50 = float(np.quantile(vals, 0.5, method="inverted_cdf"))
    assert exact_p50 <= out[0.5] <= exact_p50 + 10.0 + 1e-9
    exact_p90 = float(np.quantile(vals, 0.9, method="inverted_cdf"))
    assert exact_p90 <= out[0.9] <= exact_p90 + 10.0 + 1e-9


def test_trimmed_mean_udaf_matches_numpy(spark):
    from cccatalog_spark.operators.stats import trimmed_mean_udaf
    from pyspark.sql import functions as F
    import numpy as np

    vals = [float(v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 100]]
    df = spark.createDataFrame([(0, v) for v in vals], ["g", "v"])
    tm = trimmed_mean_udaf(0.1)
    got = df.groupBy("g").agg(tm(F.col("v")).alias("m")).first()["m"]
    a = np.sort(np.array(vals))
    want = a[1:-1].mean()  # 10% of 10 = 1 trimmed each side
    assert abs(got - want) < 1e-12
    # trim too aggressive for a tiny group -> falls back to plain mean
    small = spark.createDataFrame([(0, 1.0), (0, 3.0)], ["g", "v"])
    tm9 = trimmed_mean_udaf(0.9)
    got2 = small.groupBy("g").agg(tm9(F.col("v")).alias("m")).first()["m"]
    assert got2 == 2.0


def test_quantile_normalize_calibrates_groups(spark):
    from cccatalog_spark.operators.quantiles import quantile_normalize

    # lenient grader scores 50-100, harsh grader 0-50: same latent
    # ordering, incomparable scales
    rows = [(i, "lenient", 50.0 + i) for i in range(51)] + [
        (100 + i, "harsh", float(i)) for i in range(51)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, score double")
    out = quantile_normalize(df, "id", "grp", "score", grid=100).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["group"], []).append(
            (r["value"], r["normalized"])
        )
    for grp, pairs in by_group.items():
        pairs.sort()
        vals = [n for _, n in pairs]
        # monotone non-decreasing in the raw score within each group
        assert vals == sorted(vals)
    # after calibration the two groups' normalized medians coincide
    med = {
        g: sorted(n for _, n in prs)[len(prs) // 2]
        for g, prs in by_group.items()
    }
    assert abs(med["lenient"] - med["harsh"]) < 1e-9
    # and equal within-group percentiles map to equal pooled values
    top = {g: max(n for _, n in prs) for g, prs in by_group.items()}
    assert abs(top["lenient"] - top["harsh"]) < 1e-9


def test_quantile_normalize_single_group_rank_preserving(spark):
    from cccatalog_spark.operators.quantiles import quantile_normalize

    rows = [(i, "g", float(v)) for i, v in enumerate([5, 1, 9, 3, 7])]
    df = spark.createDataFrame(rows, "id long, grp string, score double")
    out = {
        r["id"]: r for r in
        quantile_normalize(df, "id", "grp", "score", grid=100).collect()
    }
    # pct_rank spans [0, 1]; normalized endpoints hit pooled min/max
    assert out[1]["pct_rank"] == 0.0
    assert out[2]["pct_rank"] == 1.0
    assert out[1]["normalized"] == 1.0
    assert out[2]["normalized"] == 9.0
