"""Luhn-validated payment-card detection — the precision upgrade over
the bare ``\\d{13,19}`` PII regex (functions/text.pii_counts): random
digit runs (order ids, timestamps, phone numbers) fail the Luhn
checksum 90% of the time, so validating candidates cuts false
positives an order of magnitude before redaction ever edits a
document.

Pure column algebra end to end (regexp extraction, digit-array
transforms, one aggregate fold) — whole-stage codegen, and the same
arithmetic replays in DuckDB list functions for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 13+ digits allowing single space/dash separators between digits.
# Deliberately UNBOUNDED above: greedy maximal-munch consumes an
# entire digit run, so a 25-digit order id becomes ONE over-long
# candidate (dropped by the 13-19 length gate in card_candidates)
# instead of a 19-digit prefix that could pass Luhn by chance (~10%).
# This is the lookaround-free digit-boundary guard — RE2 (DuckDB
# oracle) has no lookbehind, but leftmost-greedy matching is
# identical under Java regex and RE2.
CARD_CANDIDATE_RE = r"(?:\d[ -]?){12,}\d"


def luhn_valid(digits: Column) -> Column:
    """True iff the digit string passes the Luhn checksum: from the
    RIGHT, double every second digit, subtract 9 from doubles > 9,
    total must divide by 10. Empty/non-digit input returns false."""
    ds = F.reverse(F.split(digits, ""))
    # after split, elements are single chars; filter any strays
    ds = F.filter(ds, lambda c: (c >= "0") & (c <= "9"))
    terms = F.transform(
        ds,
        lambda c, i: F.when(
            i % 2 == 1,
            # doubled digit with 9-wrap: 2d - 9 if 2d > 9 else 2d
            F.when(
                c.cast("int") * 2 > 9, c.cast("int") * 2 - 9
            ).otherwise(c.cast("int") * 2),
        ).otherwise(c.cast("int")),
    )
    total = F.aggregate(terms, F.lit(0), lambda acc, t: acc + t)
    return (F.size(ds) > 0) & (total % 10 == 0)


def card_candidates(text: Column) -> Column:
    """Array of normalized (digits-only) card-number candidates found
    in the text; validate each with :func:`luhn_valid`. A candidate
    is a MAXIMAL separator-allowed digit run normalizing to 13-19
    digits — longer runs (concatenated ids, timestamps) are rejected
    whole rather than prefix-scored."""
    raw = F.regexp_extract_all(text, F.lit(CARD_CANDIDATE_RE), F.lit(0))
    norm = F.transform(raw, lambda s: F.regexp_replace(s, r"[ -]", ""))
    return F.filter(
        norm, lambda s: (F.length(s) >= 13) & (F.length(s) <= 19)
    )


def card_counts(text: Column) -> Column:
    """Struct ``(n_candidates, n_valid)``: digit runs that look like
    cards vs runs that pass Luhn — the redaction decision input."""
    cands = card_candidates(text)
    valid = F.filter(cands, luhn_valid)
    return F.struct(
        F.size(cands).alias("n_candidates"),
        F.size(valid).alias("n_valid"),
    )


# IBAN candidates: country code + check digits + 10-30 alphanumerics.
# Unbounded upper repetition for the same maximal-munch boundary
# guard as CARD_CANDIDATE_RE; the 15-34 length gate rejects over-long
# runs whole.
IBAN_CANDIDATE_RE = r"[A-Z]{2}[0-9]{2}[A-Z0-9]{10,}"


def iban_valid(s: Column) -> Column:
    """True iff ``s`` passes the IBAN ISO 13616 mod-97 check: move
    the first 4 chars to the end, map letters to two digits (A=10 …
    Z=35), and the left fold ``acc = (acc·10 + d) mod 97`` over the
    digit stream must end at 1. Same incremental-mod arithmetic
    replays in DuckDB ``list_reduce``, so the check is oracle-exact
    (the number itself can be 60+ digits — never materialized)."""
    re = F.concat(F.substring(s, 5, 64), F.substring(s, 1, 4))
    chars = F.filter(F.split(re, ""), lambda c: c != "")
    digs = F.flatten(
        F.transform(
            chars,
            lambda c: F.when(
                (c >= "0") & (c <= "9"), F.array(F.ascii(c) - 48)
            ).otherwise(
                F.array(
                    F.floor((F.ascii(c) - 55) / 10).cast("int"),
                    (F.ascii(c) - 55) % 10,
                )
            ),
        )
    )
    folded = F.aggregate(
        digs, F.lit(0), lambda acc, d: (acc * 10 + d) % 97
    )
    return (F.length(s) >= 15) & (F.length(s) <= 34) & (folded == 1)


def iban_counts(text: Column) -> Column:
    """Struct ``(n_candidates, n_valid)`` over IBAN-shaped runs in
    the text — the account-number layer of the PII screen (cards are
    :func:`card_counts`)."""
    raw = F.regexp_extract_all(text, F.lit(IBAN_CANDIDATE_RE), F.lit(0))
    cands = F.filter(
        raw, lambda s: (F.length(s) >= 15) & (F.length(s) <= 34)
    )
    valid = F.filter(cands, iban_valid)
    return F.struct(
        F.size(cands).alias("n_candidates"),
        F.size(valid).alias("n_valid"),
    )
