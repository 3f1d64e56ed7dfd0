"""Phonetic blocking for record linkage: a Soundex code as pure
column algebra, engine-portable by construction.

Blocking keys are how a linkage pass avoids the all-pairs join: names
that *sound* alike land in the same block and only within-block pairs
are scored (Fellegi-Sunter pipelines, Newcombe 1959).  The classic
American Soundex is usually a per-row procedural loop; here it is a
translate + fixed regexp chain so the SAME definition runs codegen-side
in Spark and in the DuckDB oracle:

1. lowercase, strip non-letters;
2. map every letter to its class digit
   (bfpv→1 cgjkqsxz→2 dt→3 l→4 mn→5 r→6, vowels/h/w/y→0);
3. collapse runs of equal digits (six fixed ``NN+ → N`` replaces — no
   backreferences, so RE2 (DuckDB) and Java regex agree);
4. drop the first letter's own digit, drop the zeros, keep 3 digits
   zero-padded, prefix the first letter.

This is the vowel-separated variant (SQL Server semantics): the
classic "h/w are transparent between consonants" refinement is NOT
applied — 'ashcraft' → A226 here vs A261 with the refinement —
documented so the blocking contract is exact.  Soundex('robert') =
R163, ('tymczak') = T522, ('pfister') = P236, ('honeyman') = H555,
all equal to the classic table.

The reference's linkage surface is exact-URL matching
(src/ImageURLs sql joins); phonetic blocking is extension-layer, the
same role q353's Jaro-Winkler candidates play but with O(1) per-row
key computation instead of a scored prefix join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LETTERS = "abcdefghijklmnopqrstuvwxyz"
_DIGITS = "01230120022455012623010202"


def soundex_code(col: Column) -> Column:
    """Soundex (vowel-separated variant, see module docstring) of the
    first run of letters in ``col``; NULL when no letter is present."""
    word = F.lower(F.regexp_replace(col, "[^A-Za-z]", ""))
    first = F.upper(F.substring(word, 1, 1))
    digits = F.translate(word, _LETTERS, _DIGITS)
    for d in "123456":
        digits = F.regexp_replace(digits, f"{d}{d}+", d)
    digits = F.regexp_replace(digits, "00+", "0")
    tail = F.regexp_replace(F.substring(digits, 2, 2_000_000), "0", "")
    code = F.concat(first, F.rpad(F.substring(tail, 1, 3), 3, "0"))
    return F.when(F.length(word) > 0, code)


def soundex_blocked_pairs(
    df: DataFrame,
    word_col: str,
    count_col: str,
    *,
    max_lev: int = 2,
) -> DataFrame:
    """Within-block linkage candidates over a distinct-word catalog:
    words sharing a Soundex code, scored with exact Levenshtein (the
    identical builtin in Spark and DuckDB), kept when the distance is
    ``<= max_lev``.  Pair order is canonical (word_a < word_b).

    Scale: the join is keyed by the 4-char code, so candidates are
    sum over blocks of |block|^2 — the point of blocking; the input
    here is the *distinct-word* catalog (vocabulary-sized, not
    corpus-sized), the standard first stage of linkage at scale.
    """
    w = df.select(
        F.col(word_col).alias("word"),
        F.col(count_col).alias("n"),
        soundex_code(F.col(word_col)).alias("code"),
    ).where(F.col("code").isNotNull())
    a = w.select(
        F.col("word").alias("word_a"),
        F.col("n").alias("n_a"),
        "code",
    )
    b = w.select(
        F.col("word").alias("word_b"),
        F.col("n").alias("n_b"),
        F.col("code").alias("code_b"),
    )
    return (
        a.join(b, (F.col("code") == F.col("code_b")))
        .where(F.col("word_a") < F.col("word_b"))
        .withColumn(
            "lev", F.levenshtein(F.col("word_a"), F.col("word_b"))
        )
        .where(F.col("lev") <= max_lev)
        .select("code", "word_a", "word_b", "n_a", "n_b", "lev")
    )
