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
