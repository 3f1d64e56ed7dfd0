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


# ---------------------------------------------------------------------------
# F6 — full URL validation against a public-suffix table
# (common/urls.py:16-53 validate_url_string / add_url_scheme:80-95).
# The TLS-support probe (_test_domain_for_tls_support, urls.py:111-123)
# is a network effect and stays ingestion-side; the engine's
# deterministic policy is: preserve an explicit scheme, default
# schemeless input to https.
# ---------------------------------------------------------------------------

# Snapshot of common entries from the Public Suffix List
# (publicsuffix.org, Mozilla-maintained public data) — the same table
# tldextract bundles. A deployment ships the full list the same way:
# one small broadcast dimension. Multi-label entries are what make
# longest-match non-trivial.
PUBLIC_SUFFIX_SNAPSHOT: list[str] = [
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "io", "co", "us", "uk", "de", "fr", "jp", "au", "br", "ca", "cn",
    "es", "eu", "fi", "in", "it", "nl", "no", "nz", "pl", "ru", "se",
    "ch", "cz", "dk", "at", "be", "kr", "mx", "museum", "example",
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "org.au", "net.au", "edu.au", "gov.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.br", "org.br", "net.br", "gov.br",
    "co.nz", "org.nz", "net.nz", "govt.nz",
    "co.in", "org.in", "net.in", "gov.in", "ac.in",
    "com.cn", "org.cn", "net.cn", "gov.cn", "edu.cn",
    "co.kr", "or.kr", "go.kr", "com.mx", "org.mx", "gob.mx",
]

_IPV4_RE = (
    r"^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
    r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"
)


def add_url_scheme_col(url: Column, scheme: str = "https") -> Column:
    """add_url_scheme (urls.py:80-95) as Column algebra: strip any
    existing ``http(s):/*`` prefix, trim surrounding ``/`` runs, and
    prepend ``<scheme>://``. NULL-safe."""
    stripped = F.trim(url)
    no_scheme = F.regexp_replace(stripped, r"^https*:/*", "")
    bare = F.call_function("btrim", no_scheme, F.lit("/"))
    return F.concat(F.lit(scheme + "://"), bare)


def upgrade_url_scheme(url: Column) -> Column:
    """Deterministic engine form of _add_best_scheme (urls.py:98-108):
    explicit scheme preserved (normalized to one of http/https),
    schemeless input defaults to https. The per-domain TLS probe that
    would downgrade to http is a network call — ingestion-side."""
    is_http = F.trim(url).rlike(r"^http:/")
    return F.when(is_http, add_url_scheme_col(url, "http")).otherwise(
        add_url_scheme_col(url, "https")
    )


def url_host(url: Column) -> Column:
    """Lowercased authority of a schemed URL (port/path/query cut)."""
    return F.lower(
        F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)", 1)
    )


def validate_urls(
    df,
    url_col: str,
    out_col: str = "valid_url",
    *,
    suffixes: list[str] | None = None,
):
    """F6 validate_url_string (urls.py:16-53) as a DataFrame operator:
    adds ``out_col`` = scheme-upgraded URL when the host has a
    registrable domain (≥1 label + a known public suffix, longest-match
    like tldextract) or is a literal IPv4 address; NULL otherwise.

    Plan shape (scale-safe): candidate suffixes of each host (≤ label
    count, so ≤ ~6 rows per URL) are exploded and broadcast-joined
    against the tiny suffix dimension; a groupBy over the row's
    original columns keeps it one shuffle whose width is the candidate
    fan-out, never a cross product. The suffix table is list-driven —
    swap in the full PSL file at deployment, same plan.
    """
    from pyspark.sql import functions as F  # noqa: F811 (local alias)

    spark = df.sparkSession
    suffix_df = spark.createDataFrame(
        [(s,) for s in (suffixes or PUBLIC_SUFFIX_SNAPSHOT)],
        "_suffix string",
    )

    up = upgrade_url_scheme(F.col(url_col))
    host = url_host(up)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # every label-suffix of the host INCLUDING the whole host: tldextract
    # picks the longest PSL match, and when that match is the entire
    # host (e.g. 'co.uk') the domain is empty ⇒ invalid — so validity
    # below requires the longest match to be strictly shorter than the
    # host, leaving ≥1 domain label in front.
    cands = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )

    base_cols = df.columns
    work = (
        df.withColumn("_upgraded", up)
        .withColumn("_host", host)
        .withColumn("_cand", F.explode_outer(cands))
    )
    matched = (
        work.join(
            F.broadcast(suffix_df),
            work["_cand"] == suffix_df["_suffix"],
            "left",
        )
        .groupBy(*base_cols, "_upgraded", "_host")
        .agg(F.max(F.length("_suffix")).alias("_sfx_len"))
    )
    ok = (
        F.col("_sfx_len").isNotNull()
        & (F.col("_sfx_len") < F.length("_host"))
    ) | F.col("_host").rlike(_IPV4_RE)
    return matched.withColumn(
        out_col, F.when(ok, F.col("_upgraded"))
    ).drop("_upgraded", "_host", "_sfx_len")


# ---------------------------------------------------------------------------
# F7/F8 engine halves — TLS-support policy and redirect rewrite
# (common/urls.py:98-123 _add_best_scheme/_test_domain_for_tls_support;
# urls.py:56-77 rewrite_redirected_url). The network probes run
# ingestion-side and produce small result TABLES (domain→tls_supported,
# url→final_url — the reference memoizes exactly these mappings in
# lru_caches); the engine applies them as broadcast joins, which is the
# distributed form of that cache.
# ---------------------------------------------------------------------------

def apply_tls_policy(df, url_col: str, tls_probes, out_col: str = "best_url"):
    """_add_best_scheme with the probe table injected: a url whose
    host probed tls_supported=true upgrades to https, a host that
    probed false downgrades to http, an unprobed host keeps the
    deterministic default (https). One broadcast hash join on the
    (bounded, per-provider) probe dimension."""
    up = upgrade_url_scheme(F.col(url_col))
    host = url_host(up)
    dim = tls_probes.select(
        F.col("domain").alias("_dom"), F.col("tls_supported").alias("_tls")
    )
    joined = df.withColumn("_up", up).withColumn("_host", host).join(
        F.broadcast(dim), F.col("_host") == F.col("_dom"), "left"
    )
    best = (
        F.when(F.col("_tls") == False,  # noqa: E712 (Column op)
               add_url_scheme_col(F.col("_up"), "http"))
        .otherwise(add_url_scheme_col(F.col("_up"), "https"))
    )
    return joined.withColumn(out_col, best).drop(
        "_up", "_host", "_dom", "_tls"
    )


def rewrite_redirects(df, url_col: str, redirects, out_col: str = "final_url"):
    """rewrite_redirected_url (urls.py:56-77) with the redirect map
    injected: urls found in the (url→final_url) table rewrite to their
    resolved target, everything else passes through unchanged.
    Broadcast left join — the distributed lru_cache."""
    dim = redirects.select(
        F.col("url").alias("_src"), F.col("final_url").alias("_dst")
    )
    return (
        df.join(F.broadcast(dim), F.col(url_col) == F.col("_src"), "left")
        .withColumn(out_col, F.coalesce(F.col("_dst"), F.col(url_col)))
        .drop("_src", "_dst")
    )


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a hostname, most-specific first:
    ``a.b.co`` → [``a.b.co``, ``b.co``, ``co``]. Pure column algebra
    (no explode here — callers explode when they join)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n - i + 1), "."),
    )


def blocklist_mark(
    df, url_col: str, blocked_domains: list[str], out_col: str = "is_blocked"
):
    """UT1-style domain blocklist with subdomain inheritance: a URL is
    blocked when its host IS a blocked domain or any dot-suffix of the
    host is (``ads.evil.org`` inherits a block on ``evil.org``).

    Mechanism: explode the host's dot-suffixes and equi-join the
    blocklist — turning the "endswith any of N patterns" scan (an
    O(rows × N) non-equi predicate, a BroadcastNestedLoopJoin in plan
    terms — the q33/J4 lesson) into one broadcast HASH join on the
    suffix, O(rows × labels). The blocklist side is deduplicated and
    broadcast; real UT1 lists (~millions of domains) still hash-join
    fine, just not broadcast — same plan shape, one shuffle.

    Returns the input frame + a boolean ``out_col``. Row identity is
    preserved via the frame's own columns (groupBy on all of them is
    avoided — the mark is computed on distinct hosts, then re-joined
    on the host, so the wide text columns never pass through the
    explode).
    """
    spark = df.sparkSession
    bl = spark.createDataFrame(
        [(b,) for b in sorted(set(blocked_domains))], "__suffix string"
    )
    host = url_host(F.col(url_col))
    hosts = df.select(host.alias("__host")).distinct()
    marked = (
        hosts.select(
            "__host", F.explode(host_suffixes(F.col("__host"))).alias("__suffix")
        )
        .join(F.broadcast(bl), "__suffix", "inner")
        .select("__host")
        .distinct()
        .withColumn("__blocked", F.lit(True))
    )
    return (
        df.withColumn("__host", host)
        .join(F.broadcast(marked), "__host", "left")
        .withColumn(out_col, F.coalesce("__blocked", F.lit(False)))
        .drop("__host", "__blocked")
    )


def canonicalize_url(url: Column) -> Column:
    """Full crawl-frontier URL canonicalization (the dedup key a
    frontier uses so `HTTP://Host:80/a/?b=2&utm_x=1&a=1#f` and
    `http://host/a?a=1&b=2` collapse): lowercase scheme+host, strip
    the scheme's default port, drop the fragment, strip trailing path
    slashes (bare root stays "/"), drop tracking params (utm_*,
    fbclid), and sort the surviving query params.

    Pure column algebra (regex part-split + array sort/filter/join) —
    runs in the scan stage, no UDF, no shuffle; sibling of the
    merge-key normalizer (F19, ``cc_merge_key``) which serves tag
    keys, not frontier identity."""
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    raw_path = F.regexp_extract(
        url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1
    )
    trimmed = F.regexp_replace(raw_path, "/+$", "")
    path = F.when(trimmed == "", F.lit("/")).otherwise(trimmed)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.startswith("utm_")
            & ~p.startswith("fbclid"),
        )
    )
    canon_q = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(
            F.lit("")
        ),
    )


def robots_decisions(
    df,
    url_col: str,
    rules,
    *,
    out_col: str = "allowed",
):
    """robots.txt directive evaluation, engine-side: ``rules`` is a
    (host, rule_path, allow) frame — the PARSED robots state a crawler
    caches per host (fetching/parsing robots.txt is ingestion-side,
    like S5). A URL's verdict is the longest ``rule_path`` that
    prefix-matches its path (most-specific wins; on a length tie the
    allow rule wins, per Google's spec); no matching rule → allowed.

    Plan shape: broadcast hash join on the HOST key with the prefix
    test as a residual filter (never a nested-loop over rules × urls),
    then one per-URL argmax. Rules tables are bounded (per-host
    directives), so the broadcast holds even for million-host crawls;
    a giant rule set hash-joins on the same host key instead.
    """
    host = url_host(F.col(url_col))
    path_raw = F.regexp_extract(
        F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1
    )
    path = F.when(path_raw == "", F.lit("/")).otherwise(path_raw)
    base = df.withColumn("__host", host).withColumn("__path", path)
    matched = (
        base.join(F.broadcast(rules), F.col("__host") == rules["host"], "left")
        .withColumn(
            "__hit",
            F.col("rule_path").isNotNull()
            & F.col("__path").startswith(F.col("rule_path")),
        )
        .groupBy(*df.columns)
        .agg(
            F.max(
                F.when(
                    F.col("__hit"),
                    F.struct(
                        F.length("rule_path").alias("l"),
                        F.col("allow").cast("int").alias("a"),
                    ),
                )
            ).alias("__best")
        )
    )
    return matched.withColumn(
        out_col,
        F.when(F.col("__best").isNull(), F.lit(True)).otherwise(
            F.col("__best.a") == 1
        ),
    ).drop("__best")


def query_params(url: Column) -> Column:
    """Ordered (pos, key, value) structs for a URL's query string —
    duplicate keys preserved (``str_to_map`` would last-win them
    away), fragment stripped. Pure column algebra: this is the HOT
    path; :func:`make_query_params_udtf` is the same contract as a
    Python UDTF for the API surface (SURVEY §2.10), pinned equal by
    test and kept OUT of hot plans (row-at-a-time Python)."""
    qs = F.when(
        url.contains("?"),
        F.split(F.split(url, r"\?", 2)[1], "#", 2)[0],
    )
    parts = F.filter(F.split(qs, "&"), lambda kv: kv != "")
    idx = F.when(
        F.size(parts) > 0, F.sequence(F.lit(0), F.size(parts) - 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.zip_with(
        idx,
        parts,
        lambda i, kv: F.struct(
            i.alias("pos"),
            F.split(kv, "=", 2)[0].alias("key"),
            F.coalesce(F.split(kv, "=", 2)[1], F.lit("")).alias("value"),
        ),
    )


def make_query_params_udtf():
    """Python UDTF form of :func:`query_params` (Spark 4 ``@udtf``):
    one URL row → N (pos, key, value) rows, for SQL LATERAL use.
    Registered on demand — the engine's UDTF API surface — but the
    expression form above is what queries should use (stays in
    whole-stage codegen)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, key string, value string")
    class QueryParamsUDTF:
        def eval(self, url: str):
            if not url or "?" not in url:
                return
            qs = url.split("?", 1)[1].split("#", 1)[0]
            pos = 0
            for kv in qs.split("&"):
                if kv == "":
                    continue
                k, _, v = kv.partition("=")
                yield pos, k, v
                pos += 1

    return QueryParamsUDTF
