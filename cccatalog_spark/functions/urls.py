"""URL column functions — F6/F19 in SURVEY §2.8 (pure parts only).

The reference validates URLs with tldextract and probes TLS
(common/urls.py) — the network-effectful pieces stay ingestion-side
(SURVEY §4.3.4). The engine keeps the pure string algebra: scheme
stripping, domain extraction, and the per-provider key normalization
used by the CC-tags merge join (dags/scripts/merge_cc_tags.py:28-66).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_scheme(url: Column) -> Column:
    """``https://a/b`` → ``a/b`` (merge_cc_tags.py:31-38)."""
    return F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")


def url_domain(url: Column) -> Column:
    """Registrable host portion: text between scheme and first ``/``."""
    return F.split_part(strip_scheme(url), F.lit("/"), F.lit(1))


def url_path(url: Column) -> Column:
    """Path+query portion after the host (empty string if none)."""
    no_scheme = strip_scheme(url)
    host = F.split_part(no_scheme, F.lit("/"), F.lit(1))
    return F.substring(no_scheme, F.length(host) + 1, 1 << 20)


def basic_url_valid(url: Column) -> Column:
    """Pure-logic subset of F6: scheme + dotted host (no TLD table)."""
    return url.rlike(r"^https?://[^/\s]+\.[^/\s]+")


# ---------------------------------------------------------------------------
# J6 — per-provider CC-tags merge-key normalization
# (dags/scripts/merge_cc_tags.py:28-66)
# ---------------------------------------------------------------------------

def strip_url_schema_pg(url: Column) -> Column:
    """The merge script's exact key-side scheme strip
    (merge_cc_tags.py:31-38): a Postgres LTRIM over the CHARACTER SET
    of 'https://' — quirks included (leading 'h'/'t'/'p'/'s'/':'/'/'
    runs are eaten too) — because both join sides must compute the
    identical key, fidelity beats prettiness. Spark's
    TRIM(LEADING ... FROM ...) has the same charset semantics, as does
    DuckDB's two-argument ltrim (oracle side)."""
    return (
        F.when(url.startswith("https://"), _charset_ltrim(url, "https:/"))
        .when(url.startswith("http://"), _charset_ltrim(url, "http:/"))
        .otherwise(url)
    )


def _charset_ltrim(c: Column, charset: str) -> Column:
    """TRIM(LEADING <charset> FROM c) as a Column (no F.ltrim charset
    overload in pyspark)."""
    return F.call_function("ltrim", F.lit(charset), c)


def _charset_rtrim(c: Column, charset: str) -> Column:
    return F.call_function("rtrim", F.lit(charset), c)


def cc_merge_key(url: Column, provider_table: str) -> Column:
    """Provider-specific computed join key for the CC-tags merge
    (merge_cc_tags.py:41-66):

    - museums_victoria: SPLIT_PART(stripped, '-', 1) — victoria image
      URLs differ only in a '-<size>' suffix;
    - science_museum:   RTRIM(SPLIT_PART(REVERSE(stripped), '/', 1),
      'medium|large') — reversed last path segment, size-charset
      trimmed;
    - met:              SPLIT_PART(REVERSE(stripped), '/', 1) —
      reversed last path segment.

    Any other provider gets the generic scheme-strip + trailing-slash
    key (the pre-existing F19 normalization).
    """
    stripped = strip_url_schema_pg(url)
    if "museums_victoria" in provider_table:
        return F.split_part(stripped, F.lit("-"), F.lit(1))
    if "science_museum" in provider_table:
        return _charset_rtrim(
            F.split_part(F.reverse(stripped), F.lit("/"), F.lit(1)),
            "medium|large",
        )
    if "met" in provider_table:
        return F.split_part(F.reverse(stripped), F.lit("/"), F.lit(1))
    return F.regexp_replace(strip_scheme(url), "/+$", "")
