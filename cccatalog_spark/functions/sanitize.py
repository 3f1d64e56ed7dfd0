"""Column-level sanitizers — F1-F5 in SURVEY §2.8.

The reference implements these as per-row Python string methods
(common/storage/columns.py:30-118). Here each is a pure Column
expression so it stays inside whole-stage codegen (no Python in the
hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sanitize_string(c: Column) -> Column:
    """Collapse whitespace runs to one space, ``"``→``'``, strip
    backspaces, escape backslashes (columns.py:30-42).

    Order matters: backslash-escape first so later replacements never
    introduce new backslashes to double-escape.
    """
    c = F.regexp_replace(c, r"\\", r"\\\\")
    c = F.regexp_replace(c, "\x08", "")
    c = F.regexp_replace(c, '"', "'")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def enforce_char_limit(c: Column, limit: int, truncate: bool = True) -> Column:
    """Over-limit strings are truncated or nulled (columns.py:44-57)."""
    over = F.length(c) > limit
    if truncate:
        return F.when(over, F.substring(c, 1, limit)).otherwise(c)
    return F.when(over, F.lit(None).cast("string")).otherwise(c)


def int_coerce(c: Column) -> Column:
    """Best-effort ``int(float(x))`` cast, else null (columns.py:70-86).

    ``try_cast`` (not ``cast``): Spark 4 runs under ANSI mode, where a
    malformed cast throws — the reference's contract is null-on-failure.
    """
    return c.try_cast("double").try_cast("int")


def bool_coerce(c: Column) -> Column:
    """Map truthy/falsy spellings to boolean, else null
    (columns.py:99-118): {'true','t','1','yes'} → true, inverse → false.
    """
    lc = F.lower(F.trim(c.cast("string")))
    return (
        F.when(lc.isin("true", "t", "1", "yes", "y"), F.lit(True))
        .when(lc.isin("false", "f", "0", "no", "n"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )
