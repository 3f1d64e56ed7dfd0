"""Text-analysis column functions for the training-data pipeline layer:
tokenization, quality scoring, n-gram language ID, shingling, and
document fingerprinting. All pure Column expressions (whole-stage
codegen) — no Python UDFs in the hot path.

These extend the reference's surface (BASELINE.json north star): the
reference has only per-row sanitizers; a 100 TB documents table needs
these as first-class distributed transforms.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "was"],
    "es": ["el", "la", "los", "las", "es"],
    "fr": ["le", "la", "les", "est", "et"],
    "de": ["der", "die", "das", "und", "ist"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty strings removed."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# GPT-2-family pre-tokenizer shape: contraction suffixes, space-glued
# letter runs, digit runs, punctuation runs. Chosen to behave
# identically under Java regex (Spark) and RE2 (DuckDB) so oracle
# checks are exact.
BPE_PRETOKEN_RE = (
    r"'(?:s|d|m|t|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"
)


def bpe_tokens(text: Column) -> Column:
    """BPE-style pre-tokens (the unit an LLM tokenizer would merge
    from); the realistic token-budget estimator for training-data
    accounting, vs the whitespace `tokens` above."""
    return F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_RE), F.lit(0))


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text))


def distinct_token_ratio(text: Column) -> Column:
    t = tokens(text)
    return F.size(F.array_distinct(t)) / F.greatest(F.size(t), F.lit(1))


def stopword_ratio(text: Column) -> Column:
    t = tokens(text)
    sw = F.filter(t, lambda x: F.lower(x).isin(*STOPWORDS))
    return F.size(sw) / F.greatest(F.size(t), F.lit(1))


def quality_score(text: Column) -> Column:
    """Length/punctuation/stopword composite in [0,1] — the standard
    cheap pre-filter for LLM training corpora."""
    n = token_count(text)
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    diversity = distinct_token_ratio(text)
    sw = stopword_ratio(text)
    sw_score = F.lit(1.0) - F.abs(sw - F.lit(0.3))
    return F.round((len_score + diversity + sw_score) / 3.0, 6)


def lang_id(text: Column) -> Column:
    """Marker-token vote language ID. Deterministic, SQL-expressible;
    ties broken by language code order.

    Single pass over the token array: one ``aggregate`` accumulates
    all per-language counters at once (the naive per-language
    ``size(filter(...))`` form re-inlines the tokenize expression once
    per language via projection collapse), then the counts array —
    evaluated exactly once as a ``zip_with`` child — is reduced to the
    winning struct. Tie-break: struct compare on (score, rank) where
    rank decreases along the alphabet, so the alphabetically-first
    language wins ties — replicable as an ordered CASE chain in SQL
    oracles.
    """
    langs = sorted(LANG_MARKERS)
    n = len(langs)
    t = tokens(text)
    zeros = F.array_repeat(F.lit(0), n)
    counts = F.aggregate(
        t,
        zeros,
        lambda acc, x: F.zip_with(
            acc,
            F.array(
                *[
                    F.lower(x).isin(*LANG_MARKERS[lang]).cast("int")
                    for lang in langs
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    rank_lang = F.array(
        *[
            F.struct(F.lit(n - i).alias("rank"), F.lit(lang).alias("lang"))
            for i, lang in enumerate(langs)
        ]
    )
    best = F.array_max(
        F.zip_with(
            counts,
            rank_lang,
            lambda c, rl: F.struct(
                c.alias("score"), rl["rank"].alias("rank"),
                rl["lang"].alias("lang"),
            ),
        )
    )
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-gram shingle array (distinct), the MinHash/Jaccard input."""
    t = tokens(text)
    n = F.size(t)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(t, i, k), " "))
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: min md5 over 5-gram shingles (a 1-hash
    MinHash / winnowing-style rolling signature); md5 of the whole
    normalized text when too short to shingle."""
    sh = shingles(text, 5)
    norm = F.array_join(tokens(text), " ")
    return F.coalesce(
        F.array_min(F.transform(sh, lambda s: F.md5(s))), F.md5(norm)
    )
