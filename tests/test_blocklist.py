"""Phrase blocklist matching (operators/blocklist.py)."""

from __future__ import annotations

import pytest

from cccatalog_spark.operators.blocklist import phrase_match_report


def _report(spark, docs, phrases):
    df = spark.createDataFrame(docs, "id long, txt string")
    rows = phrase_match_report(df, "id", "txt", phrases).collect()
    return {r["id"]: r.asDict() for r in rows}


def test_token_boundaries_not_substrings(spark):
    out = _report(
        spark,
        [(1, "a classy glass act"), (2, "high class act")],
        ["class"],
    )
    # "classy" and "glass" must NOT hit; the standalone token must
    assert 1 not in out
    assert out[2]["n_matches"] == 1
    assert out[2]["first_pos"] == 2


def test_multi_token_phrases_and_report_shape(spark):
    out = _report(
        spark,
        [
            (1, "the Slow, QUERY ran a slow query twice"),
            (2, "slow but not that kind of query"),
            (3, "big table scan here"),
        ],
        ["slow query", "big table scan"],
    )
    # normalization folds case and punctuation: two contiguous hits
    assert out[1]["n_matches"] == 2
    assert out[1]["n_phrases"] == 1
    assert out[1]["phrases"] == "slow query"
    assert out[1]["first_pos"] == 2
    assert 2 not in out  # tokens present but never contiguous
    assert out[3]["phrases"] == "big table scan"
    assert out[3]["first_pos"] == 1


def test_overlapping_and_sorted_phrase_list(spark):
    out = _report(
        spark,
        [(1, "big table scan on a big table")],
        ["big table", "big table scan"],
    )
    # both phrases hit; 'big table' twice (positions 1 and 6)
    assert out[1]["n_matches"] == 3
    assert out[1]["phrases"] == "big table|big table scan"


def test_phrase_normalization_dedup(spark):
    out = _report(spark, [(1, "x spam ham y")], ["  SPAM ", "spam", "ham"])
    assert out[1]["n_phrases"] == 2


def test_empty_phrases_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "id long, txt string")
    with pytest.raises(ValueError):
        phrase_match_report(df, "id", "txt", ["", "   "])


def test_phrase_punctuation_normalized_like_documents(spark):
    out = _report(
        spark,
        [(1, "please don't buy this"), (2, "do not buy")],
        ["Don't  Buy!"],
    )
    assert out[1]["n_matches"] == 1
    assert out[1]["phrases"] == "don t buy"
    assert 2 not in out
