"""CCNet-style boilerplate segment removal (operators/lines.py)
against a brute-force Python model: non-overlapping k-token segments,
corpus distinct-doc frequency, ordered reassembly of retained
segments."""

from __future__ import annotations

from collections import defaultdict

from cccatalog_spark.operators.lines import (
    segment_doc_freq,
    strip_boilerplate,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute(texts, k, max_df):
    segs = {}
    for i, t in enumerate(texts):
        w = [x for x in t.split() if x]
        segs[i] = [
            " ".join(w[p : p + k]) for p in range(0, len(w), k)
        ]
    df = defaultdict(set)
    for i, ss in segs.items():
        for s in ss:
            df[s].add(i)
    out = {}
    for i, ss in segs.items():
        if not ss:
            continue
        kept = [s for s in ss if len(df[s]) <= max_df]
        out[i] = {
            "n_segments": len(ss),
            "kept_segments": len(kept),
            "cleaned_text": " ".join(kept),
        }
    return out


TEXTS = [
    "nav home about contact us " + "alpha beta gamma delta eps",
    "nav home about contact us " + "zeta eta theta iota kappa",
    "nav home about contact us " + "lam mu nu xi omicron",
    "nav home about contact us " + "pi rho sigma tau upsilon",
    "unique words only here none shared with anything else at all",
    "short tail doc",  # remainder-only segment (< k tokens)
]


def test_strip_matches_brute_force(spark):
    for key in ("text", "hash"):
        got = {
            r["doc_id"]: r.asDict()
            for r in strip_boilerplate(
                _docs(spark, TEXTS), "text", "doc_id", k=5, max_df=3, key=key
            ).collect()
        }
        want = _brute(TEXTS, 5, 3)
        assert set(got) == set(want)
        for i, w in want.items():
            g = got[i]
            assert g["n_segments"] == w["n_segments"], (key, i)
            assert g["kept_segments"] == w["kept_segments"], (key, i)
            assert g["cleaned_text"] == w["cleaned_text"], (key, i)
            assert abs(
                g["boilerplate_fraction"]
                - (1 - w["kept_segments"] / w["n_segments"])
            ) < 1e-9


def test_shared_header_stripped_unique_body_kept(spark):
    got = {
        r["doc_id"]: r
        for r in strip_boilerplate(
            _docs(spark, TEXTS), "text", "doc_id", k=5, max_df=3
        ).collect()
    }
    # the 5-token nav header appears in 4 docs > max_df=3 -> stripped
    assert got[0]["cleaned_text"] == "alpha beta gamma delta eps"
    assert got[0]["boilerplate_fraction"] == 0.5
    # fully unique doc untouched
    assert got[4]["cleaned_text"] == TEXTS[4]
    assert got[4]["boilerplate_fraction"] == 0.0
    # remainder-only doc: one short segment, kept
    assert got[5]["n_segments"] == 1
    assert got[5]["cleaned_text"] == "short tail doc"


def test_doc_freq_counts_distinct_docs(spark):
    # a segment repeated twice inside one doc counts df=1
    texts = ["a b c d e a b c d e", "a b c d e x y z w v"]
    freq = {
        r["seg"]: r["df"]
        for r in segment_doc_freq(
            _docs(spark, texts), "text", "doc_id", k=5
        ).collect()
    }
    assert freq["a b c d e"] == 2
    assert freq["x y z w v"] == 1


def test_all_boilerplate_doc_survives_empty(spark):
    texts = ["x y z"] * 5
    got = strip_boilerplate(
        _docs(spark, texts), "text", "doc_id", k=5, max_df=3
    ).collect()
    assert len(got) == 5
    for r in got:
        assert r["kept_segments"] == 0
        assert r["cleaned_text"] == ""
        assert r["boilerplate_fraction"] == 1.0


def _brute_first_occurrence(texts, k):
    segs = {}
    for i, t in enumerate(texts):
        w = [x for x in t.split() if x]
        segs[i] = [" ".join(w[p : p + k]) for p in range(0, len(w), k)]
    seen = set()
    out = {}
    for i in sorted(segs):
        ss = segs[i]
        if not ss:
            continue
        kept = []
        for s in ss:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        out[i] = {
            "n_segments": len(ss),
            "kept_segments": len(kept),
            "cleaned_text": " ".join(kept),
        }
    return out


def test_dedup_segments_matches_first_occurrence_model(spark):
    from cccatalog_spark.operators.lines import dedup_segments

    texts = [
        "a b c d e a b c d e x y",   # self-repeat: 2nd "a b c d e" dies
        "a b c d e q r s t u",       # cross-doc repeat of doc0's segment
        "q r s t u v w",             # repeats doc1's 2nd segment
        "unique only tokens here now",
        "",
    ]
    got = {
        r["doc_id"]: r
        for r in dedup_segments(_docs(spark, texts), "text", "doc_id", k=5)
        .collect()
    }
    want = _brute_first_occurrence(texts, 5)
    assert set(got) == set(want)
    for i, w in want.items():
        assert got[i]["n_segments"] == w["n_segments"], i
        assert got[i]["kept_segments"] == w["kept_segments"], i
        assert got[i]["cleaned_text"] == w["cleaned_text"], i


def test_dedup_segments_repartition_stable(spark):
    from cccatalog_spark.operators.lines import dedup_segments

    texts = ["a b c a b c", "a b c d", "d e f a b c"]
    base = _docs(spark, texts)
    r1 = sorted(
        dedup_segments(base, "text", "doc_id", k=3).collect(),
        key=lambda r: r["doc_id"],
    )
    r2 = sorted(
        dedup_segments(base.repartition(7), "text", "doc_id", k=3).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]


def test_extract_content_lines_classes_and_promotion(spark):
    from cccatalog_spark.operators.lines import extract_content_lines

    # line 1: high stopword ratio -> GOOD
    # line 2: nt>=4, ratio between 0.09 and 0.18 -> NEAR, adjacent to
    #   GOOD -> promoted
    # line 3: zero stopwords -> BAD
    # line 4: NEAR but surrounded only by BAD -> dropped
    doc = (
        "the fox is one of the old tales. "
        "click more news about the crawl data today. "
        "Cookie policy terms conditions apply click here. "
        "read more news about that crawl data story now"
    )
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    r = extract_content_lines(df, "text", "doc_id").collect()[0]
    assert r["n_lines"] == 4
    assert r["n_content"] == 2
    assert r["content_text"] == (
        "the fox is one of the old tales | "
        "click more news about the crawl data today"
    )


def test_extract_content_lines_empty_doc_drops(spark):
    from cccatalog_spark.operators.lines import extract_content_lines

    df = spark.createDataFrame(
        [(1, "   "), (2, "the story of a fox and a dog is old")],
        "doc_id long, text string",
    )
    out = extract_content_lines(df, "text", "doc_id").collect()
    assert [r["doc_id"] for r in out] == [2]
