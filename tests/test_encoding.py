"""Mojibake detection/repair (functions/encoding.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cccatalog_spark.functions.encoding import (
    MOJIBAKE_MAP,
    mojibake_artifact_count,
    mojibake_score,
    recode_latin1_utf8,
    repair_mojibake,
)


def _one(spark, s, expr):
    df = spark.createDataFrame([(s,)], "s string")
    return df.select(expr(F.col("s")).alias("v")).collect()[0]["v"]


def test_map_is_true_cp1252_double_decode():
    # every artifact is exactly the repaired char's UTF-8 bytes viewed
    # through CP1252 — the map can't drift from the encoding it claims
    for art, fix in MOJIBAKE_MAP[:-1]:  # last entry normalizes NBSP->space
        assert fix.encode("utf-8").decode("cp1252") == art
    art, fix = MOJIBAKE_MAP[-1]
    assert art == "Â " and fix == " "


def test_count_and_score(spark):
    s = "cafÃ© donâ€™t Ã¼ber â€œquoteâ€¦"
    assert _one(spark, s, mojibake_artifact_count) == 5
    assert _one(spark, "plain ascii", mojibake_artifact_count) == 0
    assert _one(spark, s, mojibake_score) > 0.1
    assert _one(spark, "", mojibake_score) == 0.0


def test_replace_chain_repair(spark):
    s = "cafÃ© donâ€™t Ã¼ber â€œquoteâ€¦"
    assert _one(spark, s, repair_mojibake) == "café don’t über “quote…"
    clean = "already clean – with “real” punctuation"
    assert _one(spark, clean, repair_mojibake) == clean


def test_recode_matches_python_codecs(spark):
    originals = [
        "café don’t über “quote…",
        "naïve — em-dash™ €5 œuvre",
        "señor niño straße",
    ]
    for orig in originals:
        damaged = orig.encode("utf-8").decode("cp1252")
        assert _one(spark, damaged, recode_latin1_utf8) == orig


def test_recode_guard_passes_through(spark):
    # half an artifact: byte view is malformed UTF-8 -> unchanged
    assert _one(spark, "broken Ã half", recode_latin1_utf8) == "broken Ã half"
    # genuinely multilingual text is not double-decoded -> unchanged
    assert _one(spark, "中文 text", recode_latin1_utf8) == "中文 text"
    assert _one(spark, "plain", recode_latin1_utf8) == "plain"
