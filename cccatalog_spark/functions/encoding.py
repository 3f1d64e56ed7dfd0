"""Mojibake (encoding-damage) detection and repair — the ftfy-shaped
cleanup every web-scale text pipeline runs before tokenization.

The dominant corruption in crawled text is UTF-8 bytes re-decoded as
Latin-1/Windows-1252: each non-ASCII code point explodes into 2-3
artifact characters ("café" -> "cafÃ©", a right single quote ->
"â€™"). Two complementary tools:

- ``repair_mojibake`` / ``mojibake_artifact_count``: a FIXED,
  ordered artifact table covering the high-frequency Latin-1/
  Windows-1252 damage, implemented as pure string algebra
  (``replace`` chains) — exactly replayable in any ANSI engine, so
  the oracle can pin it.
- ``recode_latin1_utf8``: the generic repair — re-encode the string
  as Latin-1 bytes and re-decode them as UTF-8, undoing ANY UTF-8-
  as-Latin-1 double decode in one JVM-side expression (encode/
  decode builtins, no UDF). Not ANSI-replayable (DuckDB has no
  Latin-1 codec), so it is test-pinned against Python's codecs
  rather than oracle-paired.

Scale shape: all of it is per-row column algebra inside whole-stage
codegen — no shuffle, no UDF, no state.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (artifact, repaired) — UTF-8 byte sequences of common code points
# as seen through a Latin-1/Windows-1252 decode. Ordered: no entry's
# artifact is a substring of an earlier entry's artifact, so a
# sequential replace chain is exact. The trailing-space form of the
# NBSP artifact ("Â ") keeps bare "Â" usable in legit text.
MOJIBAKE_MAP: list[tuple[str, str]] = [
    ("â€™", "’"),   # â€™  -> right single quote
    ("â€œ", "“"),   # â€œ  -> left double quote
    ("â€“", "–"),   # â€“  -> en dash
    ("â€¦", "…"),   # â€¦  -> ellipsis
    ("Ã©", "é"),         # Ã©   -> é
    ("Ã¨", "è"),         # Ã¨   -> è
    ("Ã¡", "á"),         # Ã¡   -> á
    ("Ã±", "ñ"),         # Ã±   -> ñ
    ("Ã§", "ç"),         # Ã§   -> ç
    ("Ã¤", "ä"),         # Ã¤   -> ä
    ("Ã¶", "ö"),         # Ã¶   -> ö
    ("Ã¼", "ü"),         # Ã¼   -> ü
    ("Â ", " "),              # Â+NBSP -> space
]


def mojibake_artifact_count(col: Column) -> Column:
    """Total occurrences of known mojibake artifacts (integer).
    Counted per artifact via the length-delta trick
    ``(len(s) - len(replace(s, art, ''))) / len(art)`` — identical
    semantics in every ANSI engine."""
    total = F.lit(0).cast("long")
    for art, _ in MOJIBAKE_MAP:
        total = total + (
            (F.length(col) - F.length(F.replace(col, F.lit(art), F.lit(""))))
            / F.lit(len(art))
        ).cast("long")
    return total


def mojibake_score(col: Column) -> Column:
    """Artifacts per character, in [0, ~0.5] — threshold ~0.001 flags
    a damaged doc. Double; round before comparing across engines."""
    return mojibake_artifact_count(col) / F.greatest(
        F.length(col).cast("double"), F.lit(1.0)
    )


def repair_mojibake(col: Column) -> Column:
    """Apply the fixed artifact table as an ordered replace chain."""
    out = col
    for art, fix in MOJIBAKE_MAP:
        out = F.replace(out, F.lit(art), F.lit(fix))
    return out


# Windows-1252's 27 printable extensions over Latin-1: code point as
# CP1252 shows it -> the C1 code point at its byte position, so a
# subsequent ISO-8859-1 encode reproduces the original byte exactly.
_CP1252_BYTES = [
    (0x80, 0x20AC), (0x82, 0x201A), (0x83, 0x0192), (0x84, 0x201E),
    (0x85, 0x2026), (0x86, 0x2020), (0x87, 0x2021), (0x88, 0x02C6),
    (0x89, 0x2030), (0x8A, 0x0160), (0x8B, 0x2039), (0x8C, 0x0152),
    (0x8E, 0x017D), (0x91, 0x2018), (0x92, 0x2019), (0x93, 0x201C),
    (0x94, 0x201D), (0x95, 0x2022), (0x96, 0x2013), (0x97, 0x2014),
    (0x98, 0x02DC), (0x99, 0x2122), (0x9A, 0x0161), (0x9B, 0x203A),
    (0x9C, 0x0153), (0x9E, 0x017E), (0x9F, 0x0178),
]
_CP1252_FROM = "".join(chr(cp) for _, cp in _CP1252_BYTES)
_CP1252_TO = "".join(chr(b) for b, _ in _CP1252_BYTES)

# After the CP1252 translate, every char of a truly double-decoded
# string is a stand-in for one byte (< 0x100). This regex accepts
# exactly the strings whose byte view is well-formed UTF-8 (RFC 3629
# table, incl. the surrogate and overlong exclusions) — the guard
# that keeps Spark 4's strict MALFORMED_CHARACTER_CODING encode/decode
# from ever seeing an undecodable row.
_UTF8_VALID_RE = (
    "^(?:[\x01-\x7f]"
    "|[\xc2-\xdf][\x80-\xbf]"
    "|\xe0[\xa0-\xbf][\x80-\xbf]"
    "|[\xe1-\xec\xee\xef][\x80-\xbf]{2}"
    "|\xed[\x80-\x9f][\x80-\xbf]"
    "|\xf0[\x90-\xbf][\x80-\xbf]{2}"
    "|[\xf1-\xf3][\x80-\xbf]{3}"
    "|\xf4[\x80-\x8f][\x80-\xbf]{2})*$"
)


def recode_latin1_utf8(col: Column) -> Column:
    """Generic double-decode repair: the Windows-1252/Latin-1 view of
    the damaged string IS the original UTF-8 byte sequence; rebuild
    those bytes (CP1252 extensions translated to their C1 byte
    positions, then an ISO-8859-1 encode) and re-decode them as
    UTF-8 — undoing ANY UTF-8-as-CP1252 double decode in one
    codegen-side expression chain. Rows whose byte view is not
    well-formed UTF-8 (i.e. not actually double-decoded, or only
    partially damaged) pass through unchanged — the CASE guard keeps
    Spark's strict charset coders from throwing."""
    b = F.translate(col, _CP1252_FROM, _CP1252_TO)
    return F.when(
        b.rlike(_UTF8_VALID_RE),
        F.decode(F.encode(b, "ISO-8859-1"), "UTF-8"),
    ).otherwise(col)


def mojibake_sql_count(expr: str) -> str:
    """The DuckDB/ANSI twin of :func:`mojibake_artifact_count` over a
    SQL expression string — used by oracle authors."""
    parts = []
    for art, _ in MOJIBAKE_MAP:
        a = art.replace("'", "''")
        parts.append(
            f"CAST((length({expr}) - length(replace({expr}, '{a}', '')))"
            f" / {len(art)} AS BIGINT)"
        )
    return "(" + " + ".join(parts) + ")"


def mojibake_sql_repair(expr: str) -> str:
    """The DuckDB/ANSI twin of :func:`repair_mojibake`."""
    out = expr
    for art, fix in MOJIBAKE_MAP:
        a = art.replace("'", "''")
        f_ = fix.replace("'", "''")
        out = f"replace({out}, '{a}', '{f_}')"
    return out
