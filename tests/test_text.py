"""Unicode normalization + invisible-character stripping
(functions/text.unicode_normalize / strip_invisibles): composition,
compatibility folding, and the layout-preserving control strip."""

from __future__ import annotations

from pyspark.sql import functions as F

from cccatalog_spark.functions.text import strip_invisibles, unicode_normalize


def test_unicode_normalize_composes_nfc(spark):
    # decomposed e + U+0301 / n + U+0303 compose; None passes through
    df = spark.createDataFrame(
        [("cafe\u0301",), ("n\u0303o",), (None,)], "t string"
    )
    got = [
        r["n"]
        for r in df.select(unicode_normalize(F.col("t")).alias("n")).collect()
    ]
    assert got == ["caf\u00e9", "\u00f1o", None]


def test_unicode_normalize_nfkc_folds_compat_forms(spark):
    # fi ligature (U+FB01) and fullwidth digits are NFKC-folded,
    # untouched by NFC
    df = spark.createDataFrame([("\ufb01le \uff11\uff12",)], "t string")
    row = df.select(
        unicode_normalize(F.col("t"), "NFKC").alias("k"),
        unicode_normalize(F.col("t"), "NFC").alias("c"),
    ).first()
    assert row["k"] == "file 12"
    assert row["c"] == "\ufb01le \uff11\uff12"


def test_strip_invisibles_removes_zero_width_keeps_layout(spark):
    df = spark.createDataFrame(
        [("a\u200bb\u200dc\ufeffd\x00e\tf\ng",)], "t string"
    )
    row = df.select(strip_invisibles(F.col("t")).alias("c")).first()
    assert row["c"] == "abcde\tf\ng"


def test_readability_signals_hand_computed(spark):
    from cccatalog_spark.functions.text import readability_signals

    df = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),
            (2, "no terminal punctuation here"),
        ],
        "id long, text string",
    )
    out = {
        r["id"]: r["sig"]
        for r in df.select(
            "id", readability_signals(F.col("text")).alias("sig")
        ).collect()
    }
    s1 = out[1]
    # 6 words, 2 sentences; vowel groups: e,a,a,e,o,a = 6 syllables
    assert s1["n_words"] == 6 and s1["n_sentences"] == 2
    assert s1["n_syllables"] == 6
    assert abs(
        s1["flesch"] - round(206.835 - 1.015 * 3.0 - 84.6 * 1.0, 4)
    ) < 1e-9
    assert abs(
        s1["fk_grade"] - round(0.39 * 3.0 + 11.8 * 1.0 - 15.59, 4)
    ) < 1e-9
    # sentence floor at 1 when no terminal punctuation
    assert out[2]["n_sentences"] == 1
