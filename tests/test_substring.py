"""Duplicated-substring span profiling (operators/substring.py) against
an independent brute-force Python model: rolling k-grams, corpus-wide
occurrence counts, exact interval-union coverage."""

from __future__ import annotations

from collections import Counter

from cccatalog_spark.operators.substring import (
    duplicated_span_profile,
    gram_positions,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute_force(texts: list[str], k: int) -> dict[int, dict]:
    grams: dict[int, list[str]] = {}
    toks: dict[int, list[str]] = {}
    for i, t in enumerate(texts):
        w = [x for x in t.split() if x]
        toks[i] = w
        grams[i] = [" ".join(w[p : p + k]) for p in range(len(w) - k + 1)]
    cnt = Counter(g for gs in grams.values() for g in gs)
    out = {}
    for i, gs in grams.items():
        dup_pos = [p for p, g in enumerate(gs) if cnt[g] > 1]
        if not dup_pos:
            continue
        covered = set()
        for p in dup_pos:
            covered.update(range(p, p + k))
        out[i] = {
            "n_tok": len(toks[i]),
            "n_grams": len(gs),
            "n_dup_grams": len(dup_pos),
            "covered_tokens": len(covered),
            "dup_frac": round(len(covered) / len(toks[i]), 6),
        }
    return out


def _check(spark, texts, k):
    df = _docs(spark, texts)
    got = {
        r["doc_id"]: r.asDict()
        for r in duplicated_span_profile(df, "text", "doc_id", k=k).collect()
    }
    want = _brute_force(texts, k)
    assert set(got) == set(want)
    for i, w in want.items():
        g = got[i]
        for col, v in w.items():
            assert g[col] == v, (i, col, g[col], v)


def test_exact_duplicate_docs_fully_covered(spark):
    t = "alpha beta gamma delta epsilon zeta eta theta"
    other = "one two three four five six seven eight nine"
    _check(spark, [t, t, other], k=3)


def test_partial_overlap_interval_union(spark):
    # shared run of 6 tokens inside otherwise distinct docs: with k=3
    # the run contributes 4 dup grams per doc covering exactly 6 tokens
    shared = "red orange yellow green blue indigo"
    a = f"aa bb cc {shared} dd ee"
    b = f"xx yy {shared} zz ww vv"
    _check(spark, [a, b], k=3)


def test_intra_document_repeat_counts(spark):
    # the repeat is within ONE document — still duplicated (cnt > 1)
    a = "p q r s p q r s t u"
    _check(spark, [a, "unrelated words entirely here now"], k=3)


def test_disjoint_and_adjacent_intervals(spark):
    # two dup regions separated by a unique gap: coverage is the union,
    # not pos-range; and docs shorter than k produce no grams at all
    s1 = "m1 m2 m3"
    s2 = "n1 n2 n3"
    a = f"{s1} u1 u2 u3 u4 {s2}"
    b = f"{s1} v1 v2 v3 v4 {s2}"
    _check(spark, [a, b, "x y"], k=3)


def test_gram_positions_zero_based_and_short_docs(spark):
    df = _docs(spark, ["a b c d", "a b"])
    rows = gram_positions(df, "text", "doc_id", k=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["pos"])
    assert by_doc == {0: [0, 1]}  # doc 1 shorter than k -> no grams
