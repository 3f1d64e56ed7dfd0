"""Scalar function library (F1-F19 families): sanitizers, license
resolution, URL algebra, popularity math, JSONB merge — value-level
checks on literal rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cccatalog_spark.functions.json_merge import jsonb_object_merge
from cccatalog_spark.functions.licenses import (
    canonical_license_url,
    license_from_path,
    resolve_license_pair,
)
from cccatalog_spark.functions.popularity import (
    percentile_disc,
    popularity_constant,
    standardized_popularity,
    zero_guard,
)
from cccatalog_spark.functions.sanitize import (
    bool_coerce,
    enforce_char_limit,
    int_coerce,
    sanitize_string,
)
from cccatalog_spark.functions.text import lang_id, quality_score, token_count
from cccatalog_spark.functions.urls import (
    basic_url_valid,
    strip_scheme,
    url_domain,
    url_path,
)


def _one(spark, col, value=None, typ="string"):
    df = spark.createDataFrame([(value,)], f"v {typ}")
    return df.select(col.alias("out")).collect()[0]["out"]


# --- sanitize (F1-F4) -------------------------------------------------------

@pytest.mark.parametrize(
    "raw,want",
    [
        ('hello  "world"\t\n x', "hello 'world' x"),
        ("  padded  ", "padded"),
        ("back\\slash", "back\\\\slash"),
    ],
)
def test_sanitize_string(spark, raw, want):
    assert _one(spark, sanitize_string(F.col("v")), raw) == want


def test_enforce_char_limit(spark):
    assert _one(spark, enforce_char_limit(F.col("v"), 3, True), "abcdef") == "abc"
    assert _one(spark, enforce_char_limit(F.col("v"), 3, False), "abcdef") is None
    assert _one(spark, enforce_char_limit(F.col("v"), 10, False), "abc") == "abc"


@pytest.mark.parametrize(
    "raw,want", [("42", 42), ("3.9", 3), ("junk", None), (None, None)]
)
def test_int_coerce(spark, raw, want):
    assert _one(spark, int_coerce(F.col("v")), raw) == want


@pytest.mark.parametrize(
    "raw,want",
    [("true", True), ("T", True), ("f", False), ("0", False), ("maybe", None)],
)
def test_bool_coerce(spark, raw, want):
    assert _one(spark, bool_coerce(F.col("v")), raw) == want


# --- licenses (F9/F10) ------------------------------------------------------

@pytest.mark.parametrize(
    "url,lic,ver",
    [
        ("https://creativecommons.org/licenses/by-sa/4.0/", "by-sa", "4.0"),
        ("http://creativecommons.org/publicdomain/zero/1.0/", "cc0", "1.0"),
        ("http://creativecommons.org/publicdomain/mark/1.0/", "pdm", "1.0"),
        ("https://example.org/nothing/", None, None),
    ],
)
def test_license_from_path(spark, url, lic, ver):
    out = _one(spark, license_from_path(F.col("v")), url)
    assert out["license"] == lic
    assert out["license_version"] == ver


def test_resolve_license_pair(spark):
    df = spark.createDataFrame([(" BY-SA ", "4")], "l string, v string")
    out = df.select(
        resolve_license_pair(F.col("l"), F.col("v")).alias("o")
    ).collect()[0]["o"]
    assert out["license"] == "by-sa"
    assert out["license_version"] == "4.0"


def test_canonical_license_url(spark):
    df = spark.createDataFrame([("by", "4.0"), ("cc0", None)], "l string, v string")
    rows = df.select(
        canonical_license_url(F.col("l"), F.col("v")).alias("u")
    ).collect()
    assert rows[0]["u"] == "https://creativecommons.org/licenses/by/4.0/"
    assert rows[1]["u"] == "https://creativecommons.org/publicdomain/zero/1.0/"


# --- urls (F6/F19) ----------------------------------------------------------

def test_url_algebra(spark):
    u = "https://img.example.org/a/b?x=1"
    assert _one(spark, strip_scheme(F.col("v")), u) == "img.example.org/a/b?x=1"
    assert _one(spark, url_domain(F.col("v")), u) == "img.example.org"
    assert _one(spark, url_path(F.col("v")), u) == "/a/b?x=1"
    assert _one(spark, basic_url_valid(F.col("v")), u) is True
    assert _one(spark, basic_url_valid(F.col("v")), "notaurl") is False


# --- popularity math (A8/A9/F17/F18) ---------------------------------------

def test_percentile_disc_matches_postgres_semantics(spark):
    # values 1..10: percentile_disc(0.85) = element ceil(8.5)=9
    df = spark.createDataFrame([(float(i),) for i in range(1, 11)], "v double")
    out = df.agg(percentile_disc(F.col("v"), 0.85).alias("p")).collect()[0]["p"]
    assert out == 9.0
    out50 = df.agg(percentile_disc(F.col("v"), 0.5).alias("p")).collect()[0]["p"]
    assert out50 == 5.0


def test_percentile_cont_matches_duckdb_quantile_cont(spark, duck):
    # the cont surface beside disc (round-7 verdict minor item):
    # Spark percentile == DuckDB quantile_cont, pinned on an
    # interpolating case (0.85 over 1..10 -> 1 + 0.85*9 = 8.65) and
    # on irregular values/quantiles
    from cccatalog_spark.functions.popularity import percentile_cont

    vals = [1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 128.0, 256.0, 512.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    for p in (0.85, 0.5, 0.33, 0.0, 1.0):
        got = df.agg(percentile_cont(F.col("v"), p).alias("p")).collect()[0]["p"]
        want = duck.execute(
            "SELECT quantile_cont(v, ?) FROM (SELECT unnest(?::DOUBLE[]) AS v)",
            [p, vals],
        ).fetchone()[0]
        assert got == pytest.approx(want, abs=1e-12), p


def test_popularity_scalar_math(spark):
    df = spark.createDataFrame([(0.0,), (85.0,)], "v double")
    rows = df.select(
        zero_guard(F.col("v")).alias("g"),
        popularity_constant(zero_guard(F.col("v")), F.lit(0.85)).alias("c"),
    ).collect()
    assert rows[0]["g"] == 1.0
    assert abs(rows[1]["c"] - (0.15 / 0.85) * 85.0) < 1e-9
    s = _one(
        spark,
        standardized_popularity(F.lit(15.0), F.lit(15.0)),
        None,
    )
    assert abs(s - 0.5) < 1e-12


# --- jsonb merge (F16) ------------------------------------------------------

def test_jsonb_object_merge_right_bias_null_strip(spark):
    df = spark.createDataFrame(
        [({"a": "1", "d": None}, {"a": "2", "b": None, "c": "3"})],
        "o map<string,string>, n map<string,string>",
    )
    out = df.select(
        jsonb_object_merge(F.col("o"), F.col("n")).alias("m")
    ).collect()[0]["m"]
    assert out == {"a": "2", "c": "3"}


# --- text layer -------------------------------------------------------------

def test_token_count_and_lang_id(spark):
    assert _one(spark, token_count(F.col("v")), "  a  b\tc \n") == 3
    assert _one(spark, lang_id(F.col("v")), "the cat and the dog is here") == "en"
    assert _one(spark, lang_id(F.col("v")), "el perro es la casa") == "es"
    assert _one(spark, lang_id(F.col("v")), "zzz qqq") == "und"


def test_quality_score_bounds(spark):
    q = _one(spark, quality_score(F.col("v")), "the quick brown fox is here")
    assert 0.0 <= q <= 1.0


# ---------------------------------------------------------------------------
# F6 — full URL validation (common/urls.py:16-95; golden cases from the
# reference's test_urls.py:41-95,150-184). The TLS probe is
# network-side; the engine policy is scheme-preserving / https default.
# ---------------------------------------------------------------------------

def _validate_one(spark, url):
    from cccatalog_spark.functions.urls import validate_urls

    df = spark.createDataFrame([(url,)], "u string")
    return validate_urls(df, "u").collect()[0]["valid_url"]


def test_validate_url_golden_cases(spark):
    cases = {
        # schemeless + registrable domain → https default
        "creativecomons.org": "https://creativecomons.org",
        # explicit scheme preserved (probe-free policy)
        "http://abcd.com": "http://abcd.com",
        "https://abcd.com": "https://abcd.com",
        # single-label host: no suffix → None (test_urls.py:50-55)
        "https:/abcd": None,
        # IPv4 literals are valid (test_urls.py:65-77)
        "http://8.8.8.8": "http://8.8.8.8",
        "8.8.8.8": "https://8.8.8.8",
        # protocol-relative wmc form (test_urls.py:79-86)
        "//commons.wikimedia.org/wiki/User:potato":
            "https://commons.wikimedia.org/wiki/User:potato",
        # 'h'-leading host is not a scheme (test_urls.py:171-176)
        "hreativecommons.org/h": "https://hreativecommons.org/h",
        # non-prefix scheme text stays (test_urls.py:178-184)
        "hreativecommons.org/?referer=https://abc.com":
            "https://hreativecommons.org/?referer=https://abc.com",
        # multi-label public suffix, longest match leaves a domain
        "www.example.co.uk/a/b": "https://www.example.co.uk/a/b",
        # the host IS a public suffix → empty domain → invalid
        "https://co.uk": None,
        # unknown TLD → invalid
        "https://foo.notareal/x": None,
        # bad IPv4 octet is not an address, 'x.999' not a suffix
        "https://1.2.3.999": None,
    }
    from cccatalog_spark.functions.urls import validate_urls

    df = spark.createDataFrame(
        [(u,) for u in cases], "u string"
    )
    got = {r["u"]: r["valid_url"] for r in validate_urls(df, "u").collect()}
    assert got == cases


def test_validate_urls_broadcasts_suffix_dim(spark):
    """Plan shape: the suffix table joins as a broadcast — no shuffle
    of the fact side for the dimension."""
    from cccatalog_spark.functions.urls import validate_urls

    df = spark.range(100).withColumn(
        "u", F.concat(F.lit("https://d"), F.col("id"), F.lit(".example.com"))
    )
    plan = validate_urls(df, "u")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# KMV distinct-count sketch (functions/sketches.py)
# ---------------------------------------------------------------------------

def test_kmv_exact_below_k(spark):
    from cccatalog_spark.functions.sketches import kmv_distinct

    df = spark.range(100).select(
        (F.col("id") % 2).alias("g"), (F.col("id") % 40).alias("v")
    )
    out = {r["g"]: r for r in kmv_distinct(df, ["g"], "v", k=256).collect()}
    # 20 distinct v per group < k → exact
    assert out[0]["approx_distinct"] == 20.0
    assert out[1]["approx_distinct"] == 20.0
    assert out[0]["n_hashes"] == 20


def test_kmv_estimate_within_error_bound(spark):
    from cccatalog_spark.functions.sketches import kmv_distinct

    n = 20000
    df = spark.range(n).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    row = kmv_distinct(df, ["g"], "v", k=256).collect()[0]
    rel_err = abs(row["approx_distinct"] - n) / n
    # KMV std error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert rel_err < 0.25, rel_err
    assert row["n_hashes"] == 256


def test_kmv_no_full_collect_set_in_plan(spark):
    from cccatalog_spark.functions.sketches import kmv_distinct

    df = spark.range(1000).select(
        (F.col("id") % 4).alias("g"), F.col("id").alias("v")
    )
    plan = (
        kmv_distinct(df, ["g"], "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the k-smallest selection is a window sort, never a collect_set
    # of the whole distinct set into one aggregation buffer
    assert "collect_set" not in plan
    assert "Window" in plan


def test_apply_tls_policy_table_driven(spark):
    from cccatalog_spark.functions.urls import apply_tls_policy

    df = spark.createDataFrame(
        [("http://yes.example.com/a",),  # probed true → upgrade
         ("https://no.example.com/b",),  # probed false → downgrade
         ("unknown.example.com/c",)],    # unprobed → https default
        "u string",
    )
    probes = spark.createDataFrame(
        [("yes.example.com", True), ("no.example.com", False)],
        "domain string, tls_supported boolean",
    )
    got = {r["u"]: r["best_url"]
           for r in apply_tls_policy(df, "u", probes).collect()}
    assert got == {
        "http://yes.example.com/a": "https://yes.example.com/a",
        "https://no.example.com/b": "http://no.example.com/b",
        "unknown.example.com/c": "https://unknown.example.com/c",
    }


def test_rewrite_redirects_passthrough_and_hit(spark):
    from cccatalog_spark.functions.urls import rewrite_redirects

    df = spark.createDataFrame(
        [("https://a/1",), ("https://a/2",)], "u string"
    )
    redirects = spark.createDataFrame(
        [("https://a/1", "https://final/1")], "url string, final_url string"
    )
    got = {r["u"]: r["final_url"]
           for r in rewrite_redirects(df, "u", redirects).collect()}
    assert got == {"https://a/1": "https://final/1",
                   "https://a/2": "https://a/2"}


def test_gopher_rules_fire_per_defect(spark):
    from cccatalog_spark.functions.text import gopher_keep, gopher_signals

    rows = [
        ("clean", "the quick brown fox jumps over the lazy dog and runs"),
        ("dup_lines", "same line here\nsame line here\nsame line here"),
        ("symbols", "the ##### text ##### is ##### spam ##### now #####"),
        ("bullets", "- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j"),
        ("too_short", "tiny one"),
        ("no_alpha", "1 2 3 4 5 the 7 8 9 10 11 12"),
    ]
    df = spark.createDataFrame(rows, "name string, body string")
    sig = gopher_signals(F.col("body"))
    out = {
        r["name"]: r
        for r in df.select("name", sig.alias("s"))
        .withColumn("keep", gopher_keep(F.col("s")))
        .collect()
    }
    assert out["clean"]["keep"] is True
    assert out["dup_lines"]["keep"] is False      # dup_line_frac 2/3
    assert out["symbols"]["keep"] is False        # symbol_ratio >= .1
    assert out["bullets"]["keep"] is False        # bullet wall, no stopword
    assert out["too_short"]["keep"] is False      # n_words < 5
    assert out["no_alpha"]["keep"] is False       # alpha_word_frac ≤ .8
    assert out["clean"]["s"]["stopword_hits"] >= 2


def test_pii_redact_and_counts(spark):
    from cccatalog_spark.functions.text import pii_counts, pii_redact

    df = spark.createDataFrame(
        [("mail a.b+c@x.co.uk, ip 192.168.1.300 bad, ip 8.8.8.8 good, "
          "call +44 (020) 555-1234 now",)],
        "t string",
    )
    row = df.select(
        pii_redact(F.col("t")).alias("r"),
        pii_counts(F.col("t")).alias("c"),
    ).collect()[0]
    assert "<EMAIL>" in row["r"] and "a.b+c@x.co.uk" not in row["r"]
    assert "<IP>" in row["r"] and "8.8.8.8" not in row["r"]
    # 300 is not a valid octet — .300 must NOT redact as an IP
    assert "1.300" in row["r"].replace("192.168.", "")
    assert "<PHONE>" in row["r"] and "555-1234" not in row["r"]
    assert (row["c"]["n_email"], row["c"]["n_ip"], row["c"]["n_phone"]) == (
        1, 1, 1,
    )


def test_repetition_profile_hand_computed(spark):
    from cccatalog_spark.operators.quality import repetition_profile

    # "a b a b a b": 6 tokens, total_chars = 6 + 5 = 11
    # 2-grams: "a b" x3, "b a" x2 -> top2 = 3*3 = 9 -> 9/11
    # 3-grams: "a b a" x2, "b a b" x2 -> top by (c, clen) ties at
    #   clen = 2*5 = 10 -> 10/11
    # 5-grams: "a b a b a" x1, "b a b a b" x1 -> no dup -> 0
    # words: 6 total, 2 distinct -> dup_word_frac = 1 - 2/6
    df = spark.createDataFrame([(1, "a b a b a b")], "doc_id long, text string")
    r = repetition_profile(df).collect()[0]
    assert r["top2_frac"] == round(9 / 11, 6)
    assert r["top3_frac"] == round(10 / 11, 6)
    assert r["dup5_frac"] == 0.0
    assert r["dup_word_frac"] == round(1 - 2 / 6, 6)
    assert not r["rep_keep"]  # dominated by repetition


def test_repetition_profile_ngram_tags_not_indices(spark):
    """Regression: the per-n tag must not be captured via a
    two-parameter lambda — F.transform binds those as (element, index)
    and silently replaces the tag with the array position."""
    from cccatalog_spark.operators.quality import repetition_profile

    # distinct words: every n-gram unique; top fractions must reflect
    # true 2-/3-grams ("cc dd" = 5, "bb cc dd" = 8, of 10 chars), not
    # mislabeled sizes
    df = spark.createDataFrame([(1, "a bb cc dd")], "doc_id long, text string")
    r = repetition_profile(df).collect()[0]
    assert r["top2_frac"] == round(5 / 10, 6)
    assert r["top3_frac"] == round(8 / 10, 6)
    # a 4-token doc is all top-gram by construction — thresholds reject
    assert not r["rep_keep"]


def test_repetition_profile_short_doc_no_ngrams(spark):
    from cccatalog_spark.operators.quality import repetition_profile

    df = spark.createDataFrame([(1, "one")], "doc_id long, text string")
    r = repetition_profile(df).collect()[0]
    assert (r["top2_frac"], r["top3_frac"], r["dup5_frac"]) == (0.0, 0.0, 0.0)
    assert r["rep_keep"]


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch (functions/sketches.py)
# ---------------------------------------------------------------------------

def _hll_model(values):
    """Python replica of hll_distinct for one group."""
    import hashlib
    import math

    regs = {}
    for v in set(values):
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        j, w = h % 256, h // 256
        if w == 0:
            rho = 53
        else:
            rho = (w & -w).bit_length()  # trailing zeros + 1
        regs[j] = max(regs.get(j, 0), rho)
    n_used = len(regs)
    z = (256 - n_used) + sum(2.0 ** -m for m in regs.values())
    alpha_m2 = 0.7213 / (1.0 + 1.079 / 256) * 65536.0
    e = alpha_m2 / z
    if e <= 640.0 and n_used < 256:
        e = 256.0 * math.log(256.0 / (256 - n_used))
    return n_used, round(e, 4)


def test_hll_linear_counting_branch_matches_model(spark):
    from cccatalog_spark.functions.sketches import hll_distinct

    # 30 distinct values -> sparse registers -> linear counting
    df = spark.range(90).select(
        F.lit("g").alias("g"), (F.col("id") % 30).alias("v")
    )
    row = hll_distinct(df, ["g"], "v").collect()[0]
    n_used, est = _hll_model(range(30))
    assert row["n_used"] == n_used
    assert row["hll_distinct"] == est
    assert abs(est - 30) / 30 < 0.25


def test_hll_raw_branch_matches_model_and_bound(spark):
    from cccatalog_spark.functions.sketches import hll_distinct

    n = 20000
    df = spark.range(n).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    row = hll_distinct(df, ["g"], "v").collect()[0]
    n_used, est = _hll_model(range(n))
    assert (row["n_used"], row["hll_distinct"]) == (n_used, est)
    # HLL std error ~ 1.04/sqrt(256) ≈ 6.5%; allow 4 sigma
    assert abs(est - n) / n < 0.26


def test_hll_register_state_is_mergeable(spark):
    from cccatalog_spark.functions.sketches import hll_distinct

    a = list(range(0, 3000))
    b = list(range(1500, 5000))
    df = spark.createDataFrame(
        [("u", v) for v in a + b], "g string, v long"
    )
    row = hll_distinct(df, ["g"], "v").collect()[0]
    # union through one sketch == model over the distinct union
    n_used, est = _hll_model(set(a) | set(b))
    assert (row["n_used"], row["hll_distinct"]) == (n_used, est)


# ---------------------------------------------------------------------------
# KMV set algebra (kmv_set_overlap)
# ---------------------------------------------------------------------------

def test_kmv_overlap_exact_below_k(spark):
    from cccatalog_spark.functions.sketches import (
        kmv_set_overlap,
        kmv_sketch,
        kmv_topk,
    )

    a = spark.createDataFrame([(i,) for i in range(60)], "v long")
    b = spark.createDataFrame([(i,) for i in range(40, 100)], "v long")
    sa = kmv_topk(kmv_sketch(a, "v"), 256)
    sb = kmv_topk(kmv_sketch(b, "v"), 256)
    row = kmv_set_overlap(sa, sb, k=256).collect()[0]
    # < k distinct in union -> everything exact
    assert row["n_union_sketch"] == 100
    assert row["union_distinct"] == 100.0
    assert row["jaccard"] == 0.2  # 20 shared / 100 union
    assert row["intersection"] == 20.0


def test_kmv_overlap_estimates_within_bound(spark):
    from cccatalog_spark.functions.sketches import (
        kmv_set_overlap,
        kmv_sketch,
        kmv_topk,
    )

    n = 5000
    a = spark.range(n).select(F.col("id").alias("v"))
    b = spark.range(n // 2, n + n // 2).select(F.col("id").alias("v"))
    sa = kmv_topk(kmv_sketch(a, "v"), 256)
    sb = kmv_topk(kmv_sketch(b, "v"), 256)
    row = kmv_set_overlap(sa, sb, k=256).collect()[0]
    true_union, true_j = 1.5 * n, (n / 2) / (1.5 * n)
    assert abs(row["union_distinct"] - true_union) / true_union < 0.3
    assert abs(row["jaccard"] - true_j) < 0.15


def test_kmv_overlap_disjoint_sets(spark):
    from cccatalog_spark.functions.sketches import (
        kmv_set_overlap,
        kmv_sketch,
        kmv_topk,
    )

    a = spark.range(100).select(F.col("id").alias("v"))
    b = spark.range(1_000_000, 1_000_100).select(F.col("id").alias("v"))
    sa = kmv_topk(kmv_sketch(a, "v"), 256)
    sb = kmv_topk(kmv_sketch(b, "v"), 256)
    row = kmv_set_overlap(sa, sb, k=256).collect()[0]
    assert row["jaccard"] == 0.0
    assert row["intersection"] == 0.0


def test_host_suffixes_and_blocklist_mark(spark):
    import pyspark.sql.functions as F

    from cccatalog_spark.functions.urls import blocklist_mark, host_suffixes

    sfx = (
        spark.range(1)
        .select(host_suffixes(F.lit("a.b.co.uk")).alias("s"))
        .collect()[0]["s"]
    )
    assert sfx == ["a.b.co.uk", "b.co.uk", "co.uk", "uk"]

    rows = [
        (0, "https://ads.example.com/x"),        # exact block
        (1, "http://deep.sub.ads.example.com/y"),  # inherited block
        (2, "https://example.com/ok"),           # parent NOT blocked
        (3, "https://nottracker.net/z"),         # dot boundary holds
        (4, "https://tracker.net:8080/q"),       # port stripped
        (5, "https://TRACKER.net/q"),            # case-folded
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = {
        r["id"]: r["is_blocked"]
        for r in blocklist_mark(
            df, "url", ["ads.example.com", "tracker.net"]
        ).collect()
    }
    assert out == {0: True, 1: True, 2: False, 3: False, 4: True, 5: True}


def test_cms_never_undercounts_and_merges(spark):
    import pyspark.sql.functions as F

    from cccatalog_spark.functions.sketches import cms_counters, cms_estimate

    rows = [(f"k{i % 37}",) for i in range(2000)] + [("hot",)] * 500
    df = spark.createDataFrame(rows, "v string")
    exact = {
        r["v"]: r["n"]
        for r in df.groupBy("v").agg(F.count("*").alias("n")).collect()
    }
    probes = df.select("v").distinct()
    est = {
        r["v"]: r["cms_est"]
        for r in cms_estimate(cms_counters(df, "v"), probes, "v").collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n, k                     # CMS upper bound
    assert est["hot"] == exact["hot"] or est["hot"] < exact["hot"] * 1.5

    # mergeability: counters of two halves, summed, == whole-corpus
    h1 = cms_counters(df.where(F.length("v") <= 2), "v")
    h2 = cms_counters(df.where(F.length("v") > 2), "v")
    merged = (
        h1.unionByName(h2).groupBy("_r", "_c").agg(F.sum("_n").alias("_n"))
    )
    est_m = {
        r["v"]: r["cms_est"]
        for r in cms_estimate(merged, probes, "v").collect()
    }
    assert est_m == est


def test_cms_absent_key_zero_floor(spark):
    from cccatalog_spark.functions.sketches import cms_counters, cms_estimate

    df = spark.createDataFrame([("a",), ("b",)], "v string")
    probes = spark.createDataFrame([("zzz-absent",)], "v string")
    est = cms_estimate(cms_counters(df, "v"), probes, "v").collect()
    # absent key may collide into occupied buckets but never below 0
    assert est[0]["cms_est"] >= 0


def test_canonicalize_url_cases(spark):
    import pyspark.sql.functions as F

    from cccatalog_spark.functions.urls import canonicalize_url

    cases = [
        ("HTTP://WWW.Ex.COM:80/A/?b=2&utm_x=1&a=1#f", "http://www.ex.com/A?a=1&b=2"),
        ("https://h.io:443/p/", "https://h.io/p"),
        ("https://h.io:8443/p", "https://h.io:8443/p"),  # non-default port kept
        ("http://h.io", "http://h.io/"),
        ("https://h.io/?fbclid=x&utm_source=y", "https://h.io/"),
        ("https://h.io/a?z=1&y=2", "https://h.io/a?y=2&z=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r["c"]
        for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [w for _, w in cases]


def test_robots_longest_match_and_tiebreak(spark):
    from cccatalog_spark.functions.urls import robots_decisions

    rules = spark.createDataFrame(
        [
            ("h.io", "/", True),
            ("h.io", "/a", False),
            ("h.io", "/a/b", True),
            ("h.io", "/ti", False),
            ("h.io", "/ti", True),     # length tie -> allow wins
        ],
        "host string, rule_path string, allow boolean",
    )
    urls = [
        (0, "https://h.io/a/b/c"),   # /a/b allow beats /a disallow
        (1, "https://h.io/a/x"),     # /a disallow
        (2, "https://h.io/zzz"),     # only "/" allow
        (3, "https://h.io/ti/x"),    # tie at length 3 -> allow
        (4, "https://other.io/q"),   # no rules -> allowed
    ]
    df = spark.createDataFrame(urls, "id long, url string")
    got = {
        r["id"]: r["allowed"]
        for r in robots_decisions(df, "url", rules).collect()
    }
    assert got == {0: True, 1: False, 2: True, 3: True, 4: True}


def test_cms_join_size_upper_bounds_exact(spark):
    import pyspark.sql.functions as F

    from cccatalog_spark.functions.sketches import cms_counters, cms_join_size

    a = spark.createDataFrame([(i % 50,) for i in range(1000)], "k long")
    b = spark.createDataFrame([(i % 80,) for i in range(800)], "k long")
    est = cms_join_size(
        cms_counters(a, "k"), cms_counters(b, "k")
    ).collect()[0]["est"]
    exact = a.join(b, "k").count()
    assert est >= exact                     # inner product never undershoots
    assert est <= exact * 2                 # and stays in the right ballpark


def test_query_params_expression_and_udtf_agree(spark):
    """The UDTF (API surface) and the column-expression hot path emit
    identical (url, pos, key, value) rows — duplicates and empty
    values preserved, fragments stripped, no-query URLs emit nothing."""
    from pyspark.sql import functions as F
    from cccatalog_spark.functions.urls import (
        make_query_params_udtf,
        query_params,
    )

    urls = [
        "http://x.org/a?k=1&k=2&m=&z=9#frag",
        "http://x.org/plain",
        "http://x.org/q?&a=b",
        None,
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    expr_rows = {
        (r.url, r.p.pos, r.p.key, r.p.value)
        for r in df.select(
            "url", F.explode(query_params(F.col("url"))).alias("p")
        ).collect()
    }
    spark.udtf.register("qparams", make_query_params_udtf())
    df.createOrReplaceTempView("urls_v")
    udtf_rows = {
        (r.url, r.pos, r.key, r.value)
        for r in spark.sql(
            "SELECT u.url, t.pos, t.key, t.value "
            "FROM urls_v u, LATERAL qparams(u.url) t"
        ).collect()
    }
    assert expr_rows == udtf_rows
    assert ("http://x.org/a?k=1&k=2&m=&z=9#frag", 1, "k", "2") in expr_rows
    assert ("http://x.org/a?k=1&k=2&m=&z=9#frag", 2, "m", "") in expr_rows


def test_script_profile_known_strings(spark):
    from pyspark.sql import functions as F

    from cccatalog_spark.functions.text import script_profile

    rows = [
        (1, "hello world"),
        (2, "Привет hello"),
        (3, "你好"),
        (4, "12345 !!!"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    out = {
        r["id"]: r["p"]
        for r in df.select(
            "id", script_profile(F.col("t")).alias("p")
        ).collect()
    }
    assert out[1]["dominant"] == "latin" and out[1]["mix_ratio"] == 0.0
    assert out[2]["n_cyrillic"] == 6 and out[2]["n_latin"] == 5
    assert out[2]["dominant"] == "cyrillic" and out[2]["mix_ratio"] > 0
    assert out[3]["dominant"] == "han" and out[3]["n_han"] == 2
    assert out[4]["dominant"] == "none" and out[4]["n_letters"] == 0
