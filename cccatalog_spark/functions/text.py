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

    Single pass over the token array with ONE literal-map probe per
    token: each marker token maps to a bigint whose 12-bit fields hold
    one increment per language containing it (markers shared between
    languages — 'la' in es AND fr — just set two fields), so the fold
    is ``acc + map[lower(token)]``: no per-token array allocation, no
    per-language isin chain, ``lower`` evaluated once. The ``finish``
    lambda unpacks the fields and takes the (score, rank) argmax —
    inside the aggregate, so the packed accumulator is a lambda
    variable and projection collapse can never re-inline the fold (the
    repo's q23 perf lesson). Tie-break: rank decreases along the
    alphabet, so the alphabetically-first language wins ties —
    replicable as an ordered CASE chain in SQL oracles.

    Field width caps per-language marker counts at 4095 per document;
    beyond that a field would carry — irrelevant below ~4k repeated
    marker tokens, and a clamp in the fold would cost more than it
    protects at that margin.
    """
    langs = sorted(LANG_MARKERS)
    n = len(langs)
    width = 12
    mask = (1 << width) - 1
    packed_inc: dict[str, int] = {}
    for i, lang in enumerate(langs):
        for marker in LANG_MARKERS[lang]:
            packed_inc[marker] = packed_inc.get(marker, 0) + (1 << (width * i))
    marker_map = F.create_map(
        *[
            F.lit(x)
            for marker in sorted(packed_inc)
            for x in (marker, packed_inc[marker])
        ]
    )

    def finish(packed: Column) -> Column:
        best = F.array_max(
            F.array(
                *[
                    F.struct(
                        F.shiftright(packed, width * i)
                        .bitwiseAND(F.lit(mask))
                        .alias("score"),
                        F.lit(n - i).alias("rank"),
                        F.lit(lang).alias("lang"),
                    )
                    for i, lang in enumerate(langs)
                ]
            )
        )
        return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))

    return F.aggregate(
        tokens(text),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc
        + F.coalesce(
            F.try_element_at(marker_map, F.lower(x)), F.lit(0).cast("bigint")
        ),
        finish,
    )


def bind_once(value: Column, body) -> Column:
    """Evaluate ``value`` ONCE and hand the result to ``body`` as a
    bound lambda variable.

    Higher-order-function lambdas get no common-subexpression
    elimination (and no whole-stage codegen), so an expression like
    ``transform(idx, i -> slice(tokens(text), i, k))`` re-runs the
    whole tokenize per array element — O(|doc|) re-evaluations of an
    O(|doc|) expression.  Binding through a 1-element ``transform``
    forces a single evaluation while staying a pure Column function
    (guide §1.2 per-task work; measured: the shingle explode's worst
    draws drop ~5x, q264's trigram spectrum ~1.6x on min-of-3)."""
    return F.element_at(F.transform(F.array(value), body), 1)


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-gram shingle array (distinct), the MinHash/Jaccard input.

    Guarded for documents shorter than k tokens: F.sequence(1, 0)
    counts DOWN in Spark, which would feed slice an invalid start of 0
    (greatest(...) alone does not prevent that)."""

    def body(t: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(t) - (k - 1))
        return F.when(
            F.size(t) >= k,
            F.array_distinct(
                F.transform(
                    idx, lambda i: F.array_join(F.slice(t, i, k), " ")
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    return bind_once(tokens(text), body)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: min md5 over 5-gram shingles (a 1-hash
    MinHash / winnowing-style rolling signature); md5 of the whole
    normalized text when too short to shingle."""
    sh = shingles(text, 5)
    norm = F.array_join(tokens(text), " ")
    return F.coalesce(
        F.array_min(F.transform(sh, lambda s: F.md5(s))), F.md5(norm)
    )


# ---------------------------------------------------------------------------
# Gopher-style document quality rules (Rae et al. 2021, "Scaling
# Language Models: Methods, Analysis & Insights from Training Gopher",
# Appendix A1.1 — the public filter set most LLM corpus pipelines
# reuse). Pure column algebra: one narrow pass, no UDF, no shuffle.
# ---------------------------------------------------------------------------

def gopher_signals(text: Column) -> Column:
    """struct of the Gopher quality signals for one document:

    - n_words, mean_word_len (whitespace words)
    - symbol_ratio: '#' and '...' occurrences per word
    - bullet_frac / ellipsis_frac: lines starting with a bullet /
      ending with an ellipsis
    - dup_line_frac: 1 - distinct/total lines (repetition signal)
    - alpha_word_frac: words containing ≥1 alphabetic char
    - stopword_hits: words from the stopword set (lowercased)

    Ratios round to 6 decimals so results are engine-portable.
    """
    words = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    sum_len = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ell = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / 3
    lines = F.split(text, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullets = F.filter(
        lines, lambda ln: F.ltrim(ln).rlike(r"^[-*•]")
    )
    ellipses = F.filter(lines, lambda ln: ln.endswith("..."))
    alpha = F.filter(words, lambda w: w.rlike("[a-zA-Z]"))
    stops = F.filter(
        words, lambda w: F.lower(w).isin(*STOPWORDS)
    )
    return F.struct(
        n_words.alias("n_words"),
        F.round(sum_len / nw, 6).alias("mean_word_len"),
        F.round((n_hash + n_ell) / nw, 6).alias("symbol_ratio"),
        F.round(F.size(bullets) / n_lines, 6).alias("bullet_frac"),
        F.round(F.size(ellipses) / n_lines, 6).alias("ellipsis_frac"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(lines)) / n_lines, 6
        ).alias("dup_line_frac"),
        F.round(F.size(alpha) / nw, 6).alias("alpha_word_frac"),
        F.size(stops).alias("stopword_hits"),
    )


def gopher_keep(sig: Column) -> Column:
    """The Gopher keep decision (A1.1 thresholds, doc-length bounds
    relaxed to this corpus's scale): a document survives iff every
    rule passes."""
    return (
        (sig["n_words"] >= 5)
        & (sig["n_words"] <= 100000)
        & (sig["mean_word_len"] >= 2)
        & (sig["mean_word_len"] <= 12)
        & (sig["symbol_ratio"] < 0.1)
        & (sig["bullet_frac"] <= 0.9)
        & (sig["ellipsis_frac"] <= 0.3)
        & (sig["dup_line_frac"] < 0.3)
        & (sig["alpha_word_frac"] > 0.8)
        & (sig["stopword_hits"] >= 1)
    )


# ---------------------------------------------------------------------------
# PII redaction (training-data scrub step): emails, phone numbers, and
# IP literals replaced with typed tokens. Patterns stay in the
# Java/RE2 common subset so the same regex runs engine-side and in the
# DuckDB oracle. Pure regexp_replace chain — narrow, codegen'd, no UDF.
# ---------------------------------------------------------------------------

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = (
    r"\b((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
    r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b"
)
PII_PHONE_RE = r"\+?[0-9]{1,3}[-. ]\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"


def pii_counts(text: Column) -> Column:
    """struct(n_email, n_ip, n_phone) found in the document. IPs are
    counted before phones on the ORIGINAL text, phones on the
    ip-redacted text — same sequencing as redaction, so counts always
    agree with what pii_redact removed."""
    no_email = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    no_ip = F.regexp_replace(no_email, PII_IP_RE, "<IP>")
    return F.struct(
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), 0)).alias(
            "n_email"
        ),
        F.size(F.regexp_extract_all(no_email, F.lit(PII_IP_RE), 0)).alias(
            "n_ip"
        ),
        F.size(F.regexp_extract_all(no_ip, F.lit(PII_PHONE_RE), 0)).alias(
            "n_phone"
        ),
    )


def pii_redact(text: Column) -> Column:
    """Email → IP → phone redaction chain (ordering matters: emails
    can contain digit runs, IPs would otherwise match phone shapes)."""
    step = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    step = F.regexp_replace(step, PII_IP_RE, "<IP>")
    return F.regexp_replace(step, PII_PHONE_RE, "<PHONE>")


# invisible / control characters a crawl corpus drags in: C0+C1
# controls (minus \t \n \r, which are layout), zero-width
# space/joiners, and the BOM. Written in \x{...} notation so the SAME
# pattern text is a valid Java regex (Spark) and RE2 (DuckDB oracle).
INVISIBLES_PATTERN = (
    r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f\x{200b}-\x{200d}\x{feff}]"
)


def strip_invisibles(text: Column) -> Column:
    """Remove control and zero-width characters (pure column algebra,
    whole-stage codegen) — the cheap half of crawl-text cleanup; run
    AFTER ``unicode_normalize`` so NFC can't re-introduce composed
    forms containing them."""
    return F.regexp_replace(text, INVISIBLES_PATTERN, "")


def unicode_normalize(text: Column, form: str = "NFC") -> Column:
    """Unicode normalization (NFC/NFKC/NFD/NFKD) of a string column —
    the mojibake/decomposed-codepoint repair step every crawl corpus
    needs before hashing, shingling, or tokenizing (the SAME text can
    arrive composed and decomposed; exact dedup and n-gram fingerprints
    silently split unless normalized first).

    Spark has no built-in normalizer, so this is the documented
    Python-surface exception: an Arrow-batched pandas UDF over
    ``unicodedata.normalize`` (stdlib, pure, no codec boundary).
    asNondeterministic is the usual plan pin — single evaluation, no
    filter/generator duplication — not a semantics statement; the
    function is pure. Oracle parity: DuckDB's ``nfc_normalize`` for
    the NFC form.
    """
    import pandas as pd  # noqa: F401 (signature typing)
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s):
        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    return _norm.asNondeterministic()(text)


def readability_signals(text: Column) -> Column:
    """Flesch reading-ease and Flesch–Kincaid grade as a struct
    ``(n_words, n_sentences, n_syllables, flesch, fk_grade)`` — the
    classic cheap readability quality signal (too-low reading ease
    flags word-salad/keyword-stuffed pages; absurdly high flags
    trivial/boilerplate text).

    Syllables are approximated as vowel-group runs (``[aeiouy]+`` over
    the lowercased text), sentences as terminal-punctuation runs
    (``[.!?]+``, floored at 1) — both deterministic regex counts whose
    pattern text is byte-identical Java regex (Spark) and RE2 (DuckDB),
    so the oracle is exact. Pure column algebra, whole-stage codegen.
    """
    w = token_count(text).cast("double")
    s = F.greatest(
        F.regexp_count(text, F.lit(r"[.!?]+")), F.lit(1)
    ).cast("double")
    syl = F.greatest(
        F.regexp_count(F.lower(text), F.lit(r"[aeiouy]+")), F.lit(1)
    ).cast("double")
    wps = w / s
    spw = syl / F.greatest(w, F.lit(1.0))
    return F.struct(
        w.cast("long").alias("n_words"),
        s.cast("long").alias("n_sentences"),
        syl.cast("long").alias("n_syllables"),
        F.round(206.835 - 1.015 * wps - 84.6 * spw, 4).alias("flesch"),
        F.round(0.39 * wps + 11.8 * spw - 15.59, 4).alias("fk_grade"),
    )


# Unicode scripts the mix screen distinguishes, in fixed priority
# order (first wins dominant-script ties). Java regex (Spark) uses
# \p{IsXxx} block/script names; RE2 (DuckDB oracle) uses \p{Xxx} —
# the map keeps both spellings paired so engine and oracle stay
# byte-equivalent in intent.
SCRIPTS: list[tuple[str, str, str]] = [
    ("latin", r"\p{IsLatin}", r"\p{Latin}"),
    ("cyrillic", r"\p{IsCyrillic}", r"\p{Cyrillic}"),
    ("greek", r"\p{IsGreek}", r"\p{Greek}"),
    ("han", r"\p{IsHan}", r"\p{Han}"),
    ("arabic", r"\p{IsArabic}", r"\p{Arabic}"),
]


def script_profile(text: Column) -> Column:
    """Per-document Unicode script histogram + dominance — the
    encoding/mojibake screen that catches double-encoded pages,
    transliteration mixes, and wrong-charset scrapes that language-ID
    (``lang_id`` above) misreads. Struct fields:

    - ``n_<script>`` letter counts for each entry in :data:`SCRIPTS`;
    - ``n_letters``: all Unicode letters (``\\p{L}``);
    - ``dominant``: the max-count script (priority order on ties,
      ``'none'`` when the text has no letters);
    - ``mix_ratio``: 1 − dominant/letters, rounded to 6 — near 0 for
      clean single-script text, high for mojibake or mixed scripts.

    Pure regexp_count column algebra: one pass per script class,
    whole-stage codegen, no UDF; replays in RE2 for the oracle.
    """
    counts = {
        name: F.regexp_count(text, F.lit(java_pat)).cast("long")
        for name, java_pat, _ in SCRIPTS
    }
    letters = F.regexp_count(text, F.lit(r"\p{L}")).cast("long")
    mx = F.greatest(*counts.values())
    dom = F.lit("none")
    # reversed so the FIRST script in SCRIPTS wins ties (outermost when)
    for name, _, _ in reversed(SCRIPTS):
        dom = F.when(
            (mx > 0) & (counts[name] == mx), F.lit(name)
        ).otherwise(dom)
    mix = F.when(
        letters > 0,
        F.round(1.0 - mx.cast("double") / letters.cast("double"), 6),
    ).otherwise(F.lit(0.0))
    return F.struct(
        *[counts[n].alias(f"n_{n}") for n, _, _ in SCRIPTS],
        letters.alias("n_letters"),
        dom.alias("dominant"),
        mix.alias("mix_ratio"),
    )
