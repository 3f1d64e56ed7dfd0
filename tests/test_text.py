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
