"""k-anonymity screens (operators/privacy.py)."""

from __future__ import annotations

import hashlib

import pytest

from cccatalog_spark.operators.privacy import (
    k_anonymity_audit,
    k_anonymity_summary,
)


def test_k_anonymity_audit_flags_small_groups(spark):
    rows = (
        [("en", "web")] * 5 + [("en", "book")] * 2 + [("de", "web")] * 1
    )
    df = spark.createDataFrame(rows, "lang string, source string")
    out = {
        (r["lang"], r["source"]): (r["n"], r["at_risk"])
        for r in k_anonymity_audit(df, ["lang", "source"], 3).collect()
    }
    assert out == {
        ("en", "web"): (5, False),
        ("en", "book"): (2, True),
        ("de", "web"): (1, True),
    }


def test_k_anonymity_summary_verdict(spark):
    rows = [("en", "web")] * 5 + [("en", "book")] * 2
    df = spark.createDataFrame(rows, "lang string, source string")
    s = k_anonymity_summary(df, ["lang", "source"], 3).collect()[0]
    assert s["n_groups"] == 2 and s["n_risky_groups"] == 1
    assert s["n_risky_rows"] == 2 and not s["k_anonymous"]
    assert abs(s["risky_row_share"] - 2 / 7) < 1e-6
    ok = k_anonymity_summary(df, ["lang", "source"], 2).collect()[0]
    assert ok["k_anonymous"]


def test_k_anonymity_nulls_group(spark):
    df = spark.createDataFrame(
        [("en",), (None,), (None,)], "lang string"
    )
    out = {
        r["lang"]: r["n"]
        for r in k_anonymity_audit(df, ["lang"], 2).collect()
    }
    assert out == {"en": 1, None: 2}


def test_k_anonymity_empty_cols_raises(spark):
    df = spark.createDataFrame([("x",)], "lang string")
    with pytest.raises(ValueError):
        k_anonymity_audit(df, [], 2)


def test_dp_noisy_counts_derandomized_laplace(spark):
    import math

    from cccatalog_spark.operators.privacy import dp_noisy_counts

    rows = [("a",)] * 100 + [("b",)] * 50 + [("c",)] * 3
    df = spark.createDataFrame(rows, "lang string")
    out = {
        r["group"]: r["n_noised"]
        for r in dp_noisy_counts(df, "lang", epsilon=0.5).collect()
    }
    true = {"a": 100, "b": 50, "c": 3}
    for g, n in true.items():
        # replay the md5-derandomized inverse-CDF draw in Python
        h = hashlib.md5(f"dp:{g}".encode()).hexdigest()[:12]
        u = (int(h, 16) + 0.5) / 16**12
        noise = -2.0 * math.copysign(1.0, u - 0.5) * math.log(
            1 - 2 * abs(u - 0.5)
        )
        assert abs(out[g] - max(0.0, n + noise)) < 1e-5
    # determinism: same salt -> same release
    again = {
        r["group"]: r["n_noised"]
        for r in dp_noisy_counts(df, "lang", epsilon=0.5).collect()
    }
    assert again == out


def test_dp_noisy_counts_guards(spark):
    import pytest as _pytest

    from cccatalog_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame([("a",)], "lang string")
    with _pytest.raises(ValueError):
        dp_noisy_counts(df, "lang", epsilon=0.0)
    # floor at zero: tiny count with large noise scale never negative
    out = dp_noisy_counts(df, "lang", epsilon=0.01).collect()
    assert out[0]["n_noised"] >= 0.0


def test_dp_noisy_counts_null_category_still_noised(spark):
    from cccatalog_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame(
        [("a",)] * 40 + [(None,)] * 30, "lang string"
    )
    out = {
        r["group"]: r["n_noised"]
        for r in dp_noisy_counts(df, "lang", epsilon=1.0).collect()
    }
    # null category is released WITH Laplace noise, not as a constant
    assert None in out
    assert out[None] != 0.0 and abs(out[None] - 30.0) < 30.0
    assert out[None] != 30.0
