"""Unit tests for round-6 batch-4: Horvitz-Thompson estimation,
vocabulary overlap matrix, vocabulary novelty."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_ht_estimate_equal_probs_recovers_srs(spark):
    from cccatalog_spark.operators.sampling import ht_estimate

    # equal π = 0.5: n_hat = 2n, mean_hat = sample mean, deff = 1
    rows = [(float(v), 0.5) for v in (2.0, 4.0, 6.0, 8.0)]
    df = spark.createDataFrame(rows, ["y", "pi"])
    r = ht_estimate(df, "y", "pi").collect()[0]
    assert r["n_sampled"] == 4
    assert r["n_hat"] == pytest.approx(8.0)
    assert r["total_hat"] == pytest.approx(40.0)
    assert r["mean_hat"] == pytest.approx(5.0)
    assert r["deff"] == pytest.approx(1.0)


def test_ht_estimate_unequal_probs(spark):
    from cccatalog_spark.operators.sampling import ht_estimate

    # one row at π=0.1 stands for 10 units, one at π=1.0 for itself
    df = spark.createDataFrame(
        [(10.0, 0.1), (1.0, 1.0)], ["y", "pi"]
    )
    r = ht_estimate(df, "y", "pi").collect()[0]
    assert r["n_hat"] == pytest.approx(11.0)
    assert r["total_hat"] == pytest.approx(101.0)
    assert r["mean_hat"] == pytest.approx(101.0 / 11.0, abs=1e-6)
    # deff = n*Σw²/(Σw)² = 2*101/121
    assert r["deff"] == pytest.approx(2 * 101 / 121, abs=1e-6)


def test_vocab_overlap_matrix_hand_counts(spark):
    from cccatalog_spark.operators.corpus_stats import vocab_overlap_matrix

    df = spark.createDataFrame(
        [
            ("s1", "a b c"),
            ("s1", "c d"),
            ("s2", "b c e"),
            ("s3", "x y"),
        ],
        ["src", "text"],
    )
    out = {
        (r["group_a"], r["group_b"]): r
        for r in vocab_overlap_matrix(df, "text", "src").collect()
    }
    r = out[("s1", "s2")]
    # V1={a,b,c,d}, V2={b,c,e}: common 2, union 5
    assert r["vocab_a"] == 4 and r["vocab_b"] == 3
    assert r["common"] == 2 and r["jaccard"] == pytest.approx(0.4)
    # s3 shares nothing -> absent
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_vocab_novelty_first_period_is_all_new(spark):
    from cccatalog_spark.operators.corpus_stats import vocab_novelty

    df = spark.createDataFrame(
        [
            (0, "a b a"),
            (0, "c"),
            (1, "a b d"),
            (2, "a b c d"),
        ],
        ["p", "text"],
    )
    out = {
        r["period"]: r
        for r in vocab_novelty(df, "text", F.col("p")).collect()
    }
    assert out[0]["token_novelty"] == 1.0
    assert out[0]["new_distinct"] == 3 and out[0]["n_tokens"] == 4
    # period 1: tokens a,b,d -> only d new (1/3)
    assert out[1]["new_tokens"] == 1
    assert out[1]["token_novelty"] == pytest.approx(round(1 / 3, 6))
    # period 2: nothing new
    assert out[2]["new_tokens"] == 0 and out[2]["distinct_novelty"] == 0.0


def test_banned_phrase_audit_counts(spark):
    from cccatalog_spark.operators.lines import banned_phrase_audit

    df = spark.createDataFrame(
        [
            (1, "buy now buy now and relax"),
            (2, "nothing here"),
            (3, "buy nowhere"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["phrase"]: r
        for r in banned_phrase_audit(
            df, "text", "doc_id", ["buy now", "relax", "zzz"]
        ).collect()
    }
    # "buy nowhere" contains "buy now" as a substring (exact-substring
    # semantics, deliberately not word-boundary)
    assert out["buy now"]["docs_hit"] == 2
    assert out["buy now"]["occurrences"] == 3
    assert out["buy now"]["hit_rate"] == pytest.approx(
        round(2 / 3, 6)
    )
    assert out["relax"]["docs_hit"] == 1
    assert out["zzz"]["docs_hit"] == 0 and out["zzz"]["occurrences"] == 0
