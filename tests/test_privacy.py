"""k-anonymity screens (operators/privacy.py)."""

from __future__ import annotations

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
