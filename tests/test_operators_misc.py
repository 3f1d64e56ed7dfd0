"""CC-links extraction and provider-maintenance operators on crafted
micro-frames."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cccatalog_spark.operators.cc_links import extract_cc_links
from cccatalog_spark.operators.providers import (
    apply_sub_providers,
    mark_expired,
    sub_provider_from_code,
    unit_code_diff,
)


def _pages(spark):
    rows = [
        (
            "https://site-a.org/page1",
            [
                ("https://creativecommons.org/licenses/by/4.0/", "A@/href"),
                ("https://offsite.com/x", "A@/href"),
                ("https://offsite.com/y", "A@/href"),
                ("https://site-a.org/self", "A@/href"),
                ("https://img.site-a.org/1.jpg", "IMG@/src"),
                ("https://img.site-a.org/1.jpg", "IMG@/src"),
                ("https://img.site-a.org/2.jpg", "IMG@/src"),
            ],
        ),
        ("https://site-b.org/page2", [("https://nothing.example/z", "A@/href")]),
    ]
    return spark.createDataFrame(
        rows, "url string, links array<struct<url string, path string>>"
    )


def test_extract_cc_links(spark):
    out = extract_cc_links(_pages(spark)).collect()
    assert len(out) == 1  # page2 has no CC link
    r = out[0]
    assert r["provider_domain"] == "site-a.org"
    assert r["cc_url"].startswith("https://creativecommons.org/")
    meta = json.loads(r["html_metadata"])
    assert meta["Images"] == 2  # distinct img srcs
    # offsite counter: all A@/href links whose URL doesn't contain the
    # page netloc — CC links included, same-domain links excluded
    # (ExtractCCLinks.py:183 semantics)
    assert meta["Links"] == {"offsite.com": 2, "creativecommons.org": 1}


def test_apply_sub_providers_broadcast_update(spark):
    image = spark.createDataFrame(
        [
            ("flickr", "https://museum.example", "flickr"),
            ("flickr", "https://nobody.example", "flickr"),
            ("other", "https://museum.example", "other"),
        ],
        "provider string, creator_url string, source string",
    )
    dim = spark.createDataFrame(
        [("https://museum.example", "museum")], "creator_url string, sub_provider string"
    )
    out = apply_sub_providers(image, dim, "creator_url", "flickr").collect()
    got = {(r["provider"], r["creator_url"]): r["source"] for r in out}
    assert got[("flickr", "https://museum.example")] == "museum"
    assert got[("flickr", "https://nobody.example")] == "flickr"
    assert got[("other", "https://museum.example")] == "other"  # wrong provider


def test_apply_sub_providers_array_containment(spark):
    """J4: membership of the dim key in an array column; ambiguity
    surfaced via _sub_matches."""
    from cccatalog_spark.operators.providers import apply_sub_providers_array

    image = spark.createDataFrame(
        [
            ("i1", "europeana", ["museum_a", "lib_x"], "europeana"),
            ("i2", "europeana", ["nothing"], "europeana"),
            ("i3", "other", ["museum_a"], "other"),
            ("i4", "europeana", ["museum_a", "museum_b"], "europeana"),
        ],
        "identifier string, provider string, data_providers array<string>, "
        "source string",
    )
    dim = spark.createDataFrame(
        [("museum_a", "sub_a"), ("museum_b", "sub_b")],
        "data_provider string, sub_provider string",
    )
    out = {
        r["identifier"]: r
        for r in apply_sub_providers_array(
            image, dim, "data_providers", "europeana"
        ).collect()
    }
    assert out["i1"]["source"] == "sub_a"
    assert out["i1"]["_sub_matches"] == 1
    assert out["i2"]["source"] == "europeana"  # no match → unchanged
    assert out["i3"]["source"] == "other"      # wrong provider
    # ambiguous row: both sub-providers matched — reference errors here;
    # we surface the count for the caller's assertion
    assert out["i4"]["_sub_matches"] == 2


def test_apply_sub_providers_array_exploded_matches_bnlj_form(spark):
    """The explode-to-equi-join scale variant agrees with the
    containment-predicate form on every row (ambiguous rows pin the
    deterministic min sub-provider) and plans without a
    BroadcastNestedLoopJoin."""
    from cccatalog_spark.operators.providers import (
        apply_sub_providers_array,
        apply_sub_providers_array_exploded,
    )

    image = spark.createDataFrame(
        [
            ("i1", "europeana", ["museum_a", "lib_x"], "europeana"),
            ("i2", "europeana", ["nothing"], "europeana"),
            ("i3", "other", ["museum_a"], "other"),
            ("i4", "europeana", ["museum_a", "museum_b"], "europeana"),
            ("i5", "europeana", ["museum_a", "museum_a"], "europeana"),
        ],
        "identifier string, provider string, data_providers array<string>, "
        "source string",
    )
    dim = spark.createDataFrame(
        [("museum_a", "sub_a"), ("museum_b", "sub_b")],
        "data_provider string, sub_provider string",
    )
    exploded = apply_sub_providers_array_exploded(
        image, dim, "data_providers", "europeana"
    )
    assert "BroadcastNestedLoopJoin" not in exploded._jdf.queryExecution().executedPlan().toString()
    got = {r["identifier"]: r for r in exploded.collect()}
    ref = {
        r["identifier"]: r
        for r in apply_sub_providers_array(
            image, dim, "data_providers", "europeana"
        ).collect()
    }
    assert set(got) == set(ref)
    for ident in ref:
        assert got[ident]["_sub_matches"] == ref[ident]["_sub_matches"], ident
        if ref[ident]["_sub_matches"] != 2:  # unambiguous rows agree exactly
            assert got[ident]["source"] == ref[ident]["source"], ident
    # duplicated element counts once (array_distinct = jsonb ? semantics)
    assert got["i5"]["_sub_matches"] == 1 and got["i5"]["source"] == "sub_a"


def test_sub_provider_from_code(spark):
    image = spark.createDataFrame(
        [("smithsonian", "NMNH", "s"), ("smithsonian", "???", "s"), ("x", "NMNH", "x")],
        "provider string, unit_code string, source string",
    )
    out = sub_provider_from_code(
        image, {"NMNH": "natural_history"}, "unit_code", "smithsonian"
    ).collect()
    by_code = {(r["provider"], r["unit_code"]): r for r in out}
    assert by_code[("smithsonian", "NMNH")]["source"] == "natural_history"
    assert by_code[("smithsonian", "???")]["_unknown_code"] is True
    assert by_code[("x", "NMNH")]["source"] == "x"


def test_mark_expired_per_provider_ttl(spark):
    rows = [
        ("flickr", "2024-01-01 00:00:00", False),
        ("flickr", "2024-06-01 00:00:00", False),
        ("met", "2024-01-01 00:00:00", False),
    ]
    image = spark.createDataFrame(
        rows, "provider string, updated_on string, removed_from_source boolean"
    ).withColumn("updated_on", F.col("updated_on").cast("timestamp"))
    out = mark_expired(
        image,
        {"flickr": "90 DAYS"},
        now=F.lit("2024-07-01 00:00:00").cast("timestamp"),
    ).collect()
    got = {(r["provider"], str(r["updated_on"])): r["removed_from_source"] for r in out}
    assert got[("flickr", "2024-01-01 00:00:00")] is True
    assert got[("flickr", "2024-06-01 00:00:00")] is False
    assert got[("met", "2024-01-01 00:00:00")] is False  # no TTL configured


def test_unit_code_diff(spark):
    cur = spark.createDataFrame([("A",), ("B",)], "unit_code string")
    sav = spark.createDataFrame([("B",), ("C",)], "unit_code string")
    new, outdated = unit_code_diff(cur, sav)
    assert {r["unit_code"] for r in new.collect()} == {"A"}
    assert {r["unit_code"] for r in outdated.collect()} == {"C"}


# ---------------------------------------------------------------------------
# Wikimedia continue-token accumulation (wikimedia_commons.py:110-222)
# ---------------------------------------------------------------------------

def test_merge_continue_batches_right_biased_and_ordered(spark):
    from cccatalog_spark.operators.providers import merge_continue_batches

    rows = [
        # slices arrive SHUFFLED — seq order must still govern
        (1, 2, None, ["u3"]),
        (1, 0, "t0", ["u1"]),
        (1, 1, "t1", ["u2a", "u2b"]),
        (2, 1, None, []),
        (2, 0, "only", ["x"]),
    ]
    df = spark.createDataFrame(
        rows, "pageid long, seq int, title string, globalusage array<string>"
    ).repartition(8)
    out = {
        r["pageid"]: r
        for r in merge_continue_batches(df, "pageid").collect()
    }
    # last PRESENT title wins (seq2's None does not clobber seq1's)
    assert out[1]["title"] == "t1"
    # usage concatenates in seq order regardless of arrival order
    assert out[1]["globalusage"] == ["u1", "u2a", "u2b", "u3"]
    assert out[2]["title"] == "only"
    assert out[2]["globalusage"] == ["x"]


def test_merge_continue_batches_single_shuffle(spark):
    from cccatalog_spark.operators.providers import merge_continue_batches

    df = spark.createDataFrame(
        [(1, 0, "a", ["u"])],
        "pageid long, seq int, title string, globalusage array<string>",
    )
    plan = (
        merge_continue_batches(df, "pageid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 1


def test_merge_continue_batches_matches_python_fold(spark):
    """Seeded random slice streams vs the reference's dict.update +
    list-concat fold, computed independently in Python."""
    import random

    rng = random.Random(42)
    rows = []
    expected = {}
    for page in range(30):
        n_slices = rng.randint(1, 5)
        acc = {"title": None, "byte_size": None, "usage": []}
        for seq in range(n_slices):
            title = f"t{page}_{seq}" if rng.random() < 0.6 else None
            size = rng.randint(1, 9) * 100 if rng.random() < 0.5 else None
            usage = [f"u{page}_{seq}_{i}" for i in range(rng.randint(0, 3))]
            rows.append((page, seq, title, size, usage))
            # reference fold: update only present fields, concat lists
            if title is not None:
                acc["title"] = title
            if size is not None:
                acc["byte_size"] = size
            acc["usage"] = acc["usage"] + usage
        expected[page] = (acc["title"], acc["byte_size"], acc["usage"])

    from cccatalog_spark.operators.providers import merge_continue_batches

    df = spark.createDataFrame(
        rows,
        "pageid long, seq int, title string, byte_size long, "
        "globalusage array<string>",
    ).repartition(16)  # scramble arrival order
    got = {
        r["pageid"]: (r["title"], r["byte_size"], r["globalusage"])
        for r in merge_continue_batches(df, "pageid").collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# percentile_normalize (operators/quality.py)
# ---------------------------------------------------------------------------

def test_percentile_normalize_calibrates_across_scales(spark):
    from cccatalog_spark.operators.quality import percentile_normalize

    # source a scores in [1,4], source b in [1000, 4000]: raw
    # thresholds can't compare them; percentile ranks can
    rows = [("a", i, float(i)) for i in range(1, 5)] + [
        ("b", i, float(i * 1000)) for i in range(1, 5)
    ]
    df = spark.createDataFrame(rows, "src string, id long, score double")
    got = {
        (r["src"], r["id"]): r["pct_rank"]
        for r in percentile_normalize(df, "src", "score", ["id"]).collect()
    }
    for src in ("a", "b"):
        assert [got[(src, i)] for i in range(1, 5)] == [0.0, 1 / 3, 2 / 3, 1.0]


def test_percentile_normalize_ties_broken_deterministically(spark):
    from cccatalog_spark.operators.quality import percentile_normalize

    df = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 5.0), ("a", 3, 5.0)],
        "src string, id long, score double",
    )
    got = {
        r["id"]: r["pct_rank"]
        for r in percentile_normalize(df, "src", "score", ["id"]).collect()
    }
    assert got == {1: 0.0, 2: 0.5, 3: 1.0}


def test_robust_outliers_median_mad_model(spark):
    import statistics

    import pyspark.sql.functions as F

    from cccatalog_spark.operators.quality import robust_outliers

    # group a: tight cluster + one wild point; group b: even count
    rows = (
        [(i, "a", 100 + (i % 5)) for i in range(20)]
        + [(99, "a", 10_000)]
        + [(200 + i, "b", v) for i, v in enumerate([1, 2, 3, 4])]
    )
    df = spark.createDataFrame(rows, "id long, g string, v long")
    out = {
        r["id"]: r
        for r in robust_outliers(df, "g", "v", "id", z=3.0).collect()
    }

    def disc_median(vals):
        s = sorted(vals)
        import math
        return s[math.ceil(len(s) / 2) - 1]

    for g in ("a", "b"):
        vals = [v for _, gg, v in rows if gg == g]
        med = disc_median(vals)
        mad = disc_median([abs(v - med) for v in vals])
        for i, gg, v in rows:
            if gg != g:
                continue
            assert out[i]["median"] == med
            assert out[i]["mad"] == mad
            assert out[i]["is_outlier"] == (abs(v - med) > 3.0 * mad)
    assert out[99]["is_outlier"] is True
    assert sum(1 for r in out.values() if r["is_outlier"]) >= 1


def test_rendezvous_minimal_movement_and_balance(spark):
    from cccatalog_spark.operators.skew import rendezvous_assign

    df = spark.range(3000).select(F.col("id").alias("k"))
    w4 = ["w1", "w2", "w3", "w4"]
    a4 = {
        r["k"]: r["owner"]
        for r in rendezvous_assign(df, "k", w4).collect()
    }
    a5 = {
        r["k"]: r["owner"]
        for r in rendezvous_assign(df, "k", w4 + ["w5"]).collect()
    }
    moved = sum(1 for k in a4 if a4[k] != a5[k])
    # adding a 5th worker moves ~1/5 of keys, never keys between old
    # workers
    assert abs(moved / 3000 - 0.2) < 0.04
    for k in a4:
        if a4[k] != a5[k]:
            assert a5[k] == "w5"
    # balance: each worker owns roughly 1/4 before, 1/5 after
    from collections import Counter

    c4, c5 = Counter(a4.values()), Counter(a5.values())
    assert all(abs(v / 3000 - 0.25) < 0.05 for v in c4.values())
    assert all(abs(v / 3000 - 0.2) < 0.05 for v in c5.values())
    # deterministic under repartition
    again = {
        r["k"]: r["owner"]
        for r in rendezvous_assign(df.repartition(11), "k", w4).collect()
    }
    assert again == a4


def test_sync_plan_actions_and_idempotence(spark):
    from cccatalog_spark.operators.sync import sync_plan

    src = spark.createDataFrame(
        [("a", "e1", 10), ("b", "e2", 20), ("c", "e3", 30)],
        "key string, etag string, size long",
    )
    dst = spark.createDataFrame(
        [("b", "e2", 20), ("c", "eX", 30), ("d", "e4", 40)],
        "key string, etag string, size long",
    )
    plan = {r["key"]: r["action"] for r in sync_plan(src, dst).collect()}
    assert plan == {"a": "copy", "b": "keep", "c": "replace", "d": "delete"}
    # idempotence: applying the plan makes dst == src; re-plan = all keep
    replanned = {
        r["key"]: r["action"] for r in sync_plan(src, src).collect()
    }
    assert set(replanned.values()) == {"keep"}


def test_wat_manifest_slices_stable(spark, tmp_path):
    from cccatalog_spark.sources.cc_manifest import load_wat_manifest

    p = tmp_path / "wat.paths"
    paths = [f"crawl/seg{i}/f{i}.wat.gz" for i in range(100)]
    p.write_text("\n".join(paths) + "\n\n")   # trailing blank dropped
    m = load_wat_manifest(spark, str(p), n_slices=8)
    rows = m.collect()
    assert len(rows) == 100
    assert all(0 <= r["slice_id"] < 8 for r in rows)
    # stable across re-reads and manifest shuffling
    p2 = tmp_path / "wat2.paths"
    p2.write_text("\n".join(reversed(paths)))
    m2 = {r["wat_path"]: r["slice_id"]
          for r in load_wat_manifest(spark, str(p2), n_slices=8).collect()}
    m1 = {r["wat_path"]: r["slice_id"] for r in rows}
    assert m1 == m2


def test_label_model_vote_semantics(spark):
    """Weighted vote: sign decision, NULL on tie/all-abstain, abstain
    rules excluded from n_rules."""
    from pyspark.sql import functions as F
    from cccatalog_spark.operators.quality import label_model_vote

    df = spark.createDataFrame(
        [(1, 1, 1, -1), (2, None, None, None), (3, 1, -1, None),
         (4, None, -1, None)],
        ["id", "a", "b", "c"],
    )
    out = {
        r.id: (r.n_rules, r.vote_sum, r.label)
        for r in label_model_vote(
            df, "id",
            [("a", F.col("a"), 1.0), ("b", F.col("b"), 1.0),
             ("c", F.col("c"), 2.0)],
        ).collect()
    }
    assert out[1] == (3, 0.0, None)        # 1 + 1 - 2 = tie -> NULL
    assert out[2] == (0, 0.0, None)        # all abstain
    assert out[3] == (2, 0.0, None)        # 1 - 1 tie
    assert out[4] == (1, -1.0, -1)         # single voter decides


def test_label_model_requires_rules():
    import pytest
    from cccatalog_spark.operators.quality import label_model_vote

    with pytest.raises(ValueError):
        label_model_vote(None, "id", [])


def test_wilson_gate_small_sample_not_quarantined(spark):
    from cccatalog_spark.operators.quality import wilson_gate

    rows = (
        # tiny source: 2/3 defective -> high point rate, wide interval
        [("tiny", True), ("tiny", True), ("tiny", False)]
        # big source: 200/1000 defective -> lb clears 0.1
        + [("big", i < 200) for i in range(1000)]
        # clean source
        + [("clean", False) for _ in range(50)]
    )
    df = spark.createDataFrame(rows, "source string, bad boolean")
    got = {
        r["source"]: r
        for r in wilson_gate(df, "source", "bad", z=1.96, max_rate=0.1)
        .collect()
    }
    import math

    def lb(d, n, z=1.96):
        p = d / n
        z2 = z * z
        return (p + z2 / (2 * n)
                - z * math.sqrt((p * (1 - p) + z2 / (4 * n)) / n)) / (
            1 + z2 / n)

    assert got["tiny"]["n_docs"] == 3 and got["tiny"]["n_defects"] == 2
    assert got["tiny"]["wilson_lb"] == round(lb(2, 3), 6)
    # 2/3 point rate but the 95% lower bound sits near 0.21 — still
    # above 0.1 here; the SMALL-sample protection shows at 1/3:
    assert got["big"]["quarantine"] is True
    assert got["clean"]["quarantine"] is False
    assert got["clean"]["wilson_lb"] == 0.0


def test_wilson_gate_one_defect_small_n_protected(spark):
    from cccatalog_spark.operators.quality import wilson_gate

    # 1/4 defective: point rate 0.25 > 0.1, but lb ~= 0.046 -> kept
    df = spark.createDataFrame(
        [("s", True)] + [("s", False)] * 3, "source string, bad boolean"
    )
    got = wilson_gate(df, "source", "bad").collect()[0]
    assert got["defect_rate"] == 0.25
    assert got["quarantine"] is False


def test_touch_attribution_first_and_last(spark):
    from cccatalog_spark.operators.temporal import touch_attribution

    rows = [
        # user 1: view(10) -> click(20) -> purchase(30)
        (1, 1, 10, "view"), (2, 1, 20, "click"), (3, 1, 30, "purchase"),
        # user 2: click outside window, view inside -> both credit view
        (4, 2, 5, "click"), (5, 2, 950, "view"), (6, 2, 1000, "purchase"),
        # user 3: purchase with no prior event -> no credit row
        (7, 3, 100, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, sec long, event_type string"
    )
    got = {
        r["event_type"]: r
        for r in touch_attribution(
            df, "user_id", "sec", "event_type", "event_id",
            conversion_type="purchase", window_seconds=100,
        ).collect()
    }
    assert got["view"]["first_touch"] == 2   # user1 first, user2 only
    assert got["view"]["last_touch"] == 1    # user2
    assert got["click"]["last_touch"] == 1   # user1
    assert got["click"]["first_touch"] == 0
    assert set(got) == {"view", "click"}


def test_touch_attribution_tie_breaks_on_event_id(spark):
    from cccatalog_spark.operators.temporal import touch_attribution

    # two prior events at the SAME second: id order decides first/last
    rows = [
        (10, 1, 50, "view"), (11, 1, 50, "click"), (12, 1, 60, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, sec long, event_type string"
    )
    got = {
        r["event_type"]: r
        for r in touch_attribution(
            df, "user_id", "sec", "event_type", "event_id",
            conversion_type="purchase", window_seconds=100,
        ).collect()
    }
    assert got["view"]["first_touch"] == 1
    assert got["click"]["last_touch"] == 1


def test_eb_shrunk_rate_pulls_small_samples_to_prior(spark):
    from cccatalog_spark.operators.quality import eb_shrunk_rate

    rows = (
        [("tiny", True), ("tiny", True)]            # raw 1.0, n=2
        + [("big", i < 100) for i in range(1000)]   # raw 0.1
    )
    df = spark.createDataFrame(rows, "source string, bad boolean")
    got = {
        r["source"]: r
        for r in eb_shrunk_rate(
            df, "source", "bad", prior_strength=20.0
        ).collect()
    }
    pg = 102 / 1002
    assert got["tiny"]["raw_rate"] == 1.0
    assert got["tiny"]["shrunk_rate"] == round((2 + 20 * pg) / 22, 6)
    assert got["big"]["shrunk_rate"] == round((100 + 20 * pg) / 1020, 6)
    # the 2-sample 100% domain must NOT outrank... but also must sit
    # far below its raw rate, while the big domain barely moves
    assert got["tiny"]["shrunk_rate"] < 0.3
    assert abs(got["big"]["shrunk_rate"] - 0.1) < 0.005


def test_cusum_matches_sequential_recurrence(spark):
    from cccatalog_spark.operators.temporal import cusum_changepoints

    vals = [10.0, 10.2, 9.9, 10.1, 10.0, 14.0, 14.2, 14.1]
    df = spark.createDataFrame(
        [(t, v) for t, v in enumerate(vals)], "t long, value double"
    )
    got = {
        r["t"]: r
        for r in cusum_changepoints(
            df, "t", "value", slack_sigmas=0.5, threshold_sigmas=2.0
        ).collect()
    }
    # replay the textbook recurrence in python
    mu = sum(vals) / len(vals)
    var = sum((v - mu) ** 2 for v in vals) / len(vals)
    sigma = var ** 0.5
    k, h = 0.5 * sigma, 2.0 * sigma
    sp = sn = 0.0
    for t, v in enumerate(vals):
        sp = max(0.0, sp + v - mu - k)
        sn = max(0.0, sn + mu - v - k)
        assert got[t]["s_pos"] == round(sp, 6), t
        assert got[t]["s_neg"] == round(sn, 6), t
        assert got[t]["is_change"] == (sp > h or sn > h), t
    # the level shift is detected somewhere in the shifted tail
    assert any(got[t]["is_change"] for t in (5, 6, 7))


def test_theil_sen_ignores_outlier(spark):
    from cccatalog_spark.operators.temporal import theil_sen_trend

    # y = 2t + 1 with one wild outlier at t=3
    rows = [(0, 1.0), (1, 3.0), (2, 5.0), (3, 500.0), (4, 9.0), (5, 11.0)]
    df = spark.createDataFrame(rows, "t long, y double")
    got = theil_sen_trend(df, "t", "y").collect()[0]
    assert got["n_points"] == 6 and got["n_pairs"] == 15
    assert got["slope"] == 2.0
    assert got["intercept"] == 1.0
