"""ROUGE-N (operators/eval_text.py) and Good-Turing spectrum
(operators/lm.good_turing_counts)."""

from __future__ import annotations

from cccatalog_spark.operators.eval_text import rouge_n
from cccatalog_spark.operators.lm import good_turing_counts


def _rouge(spark, cand, ref, n=2):
    df = spark.createDataFrame(
        [(1, cand, ref)], "id long, cand string, ref string"
    )
    return rouge_n(df, "id", "cand", "ref", n=n).collect()[0]


def test_rouge2_identical_texts(spark):
    r = _rouge(spark, "the cat sat on the mat", "the cat sat on the mat")
    assert r["precision"] == 1.0 and r["recall"] == 1.0 and r["f1"] == 1.0
    assert r["n_overlap"] == r["n_cand"] == r["n_ref"] == 5


def test_rouge2_clipping_multiset(spark):
    # candidate repeats "a b" three times; reference has it once:
    # clipped overlap = 1, n_cand = 5 bigrams
    r = _rouge(spark, "a b a b a b", "a b", n=2)
    assert r["n_overlap"] == 1
    assert r["n_cand"] == 5 and r["n_ref"] == 1
    assert r["precision"] == 0.2 and r["recall"] == 1.0
    assert abs(r["f1"] - 2 * 0.2 * 1.0 / 1.2) < 1e-6


def test_rouge2_disjoint_and_rouge1(spark):
    r = _rouge(spark, "x y z", "p q r")
    assert r["n_overlap"] == 0 and r["f1"] == 0.0
    r1 = _rouge(spark, "the cat", "the dog", n=1)
    assert r1["n_overlap"] == 1
    assert r1["precision"] == 0.5 and r1["recall"] == 0.5


def test_good_turing_known_spectrum(spark):
    # 3 words once, 2 words twice, 1 word three times:
    # N1=3, N2=2, N3=1; r*(1) = 2*N2/N1 = 4/3; r*(2) = 3*N3/N2 = 1.5
    words = ["a", "b", "c", "d", "d", "e", "e", "f", "f", "f"]
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    out = {r["r"]: r for r in good_turing_counts(df, "text").collect()}
    assert out[1]["n_r"] == 3 and out[2]["n_r"] == 2 and out[3]["n_r"] == 1
    assert abs(out[1]["r_star"] - 4 / 3) < 1e-6
    assert out[2]["r_star"] == 1.5
    assert out[3]["r_star"] is None          # N4 = 0 -> standard cutoff
    assert abs(out[1]["mass_share"] - 0.3) < 1e-9


def test_good_turing_trigram_order(spark):
    df = spark.createDataFrame(
        [("a b c a b c",), ("a b c x y z",)], "text string"
    )
    out = {r["r"]: r for r in
           good_turing_counts(df, "text", n=3).collect()}
    # trigram "a b c" occurs 3 times (twice in doc 1 incl. overlap? no:
    # doc1 grams: "a b c","b c a","c a b","a b c" -> 2; doc2: 1) = 3
    assert out[1]["n_r"] >= 4      # the singletons
    assert out[3]["n_r"] == 1      # "a b c"


def test_rouge_l_hand_computed(spark):
    from cccatalog_spark.operators.eval_text import rouge_l

    pairs = spark.createDataFrame(
        [
            # LCS("a b c d", "a x c d") = "a c d" = 3
            (1, "a b c d", "a x c d"),
            # in-order non-contiguous match ROUGE-2 would score 0
            (2, "police killed the gunman", "the gunman police killed"),
            (3, "same text here", "same text here"),
        ],
        "pid long, cand string, ref string",
    )
    got = {
        r["pid"]: r for r in rouge_l(pairs, "pid", "cand", "ref").collect()
    }
    assert got[1]["lcs_len"] == 3
    assert got[1]["precision"] == 0.75 and got[1]["recall"] == 0.75
    # "the gunman" preserved in order -> LCS 2 (either direction)
    assert got[2]["lcs_len"] == 2
    assert got[3]["f1"] == 1.0


def test_rouge_l_truncates_to_max_tokens(spark):
    from cccatalog_spark.operators.eval_text import rouge_l

    pairs = spark.createDataFrame(
        [(1, "a b c d e f", "a b c d e f")],
        "pid long, cand string, ref string",
    )
    got = rouge_l(pairs, "pid", "cand", "ref", max_tokens=3).collect()[0]
    assert got["n_cand"] == 3 and got["lcs_len"] == 3
