"""BM25 ranked retrieval + inverted index (operators/retrieval.py)
against hand-computed scores and a brute-force Python model."""

from __future__ import annotations

import math
from collections import Counter

from cccatalog_spark.operators.retrieval import bm25_topk, inverted_index

K1, B = 1.2, 0.75


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _bm25_model(texts, terms, k):
    toks = [[w.lower() for w in t.split() if w] for t in texts]
    n = float(len(toks))
    avgdl = sum(len(x) for x in toks) / n
    dfc = {
        q: float(sum(1 for d in toks if q in d)) for q in terms
    }
    scored = []
    for i, d in enumerate(toks):
        cnt = Counter(d)
        hit = [q for q in terms if cnt[q] > 0]
        if not hit:
            continue
        s = 0.0
        for q in hit:
            idf = math.log(1.0 + (n - dfc[q] + 0.5) / (dfc[q] + 0.5))
            tf = cnt[q]
            s += idf * (tf * (K1 + 1.0)) / (
                tf + K1 * ((1.0 - B) + B * len(d) / avgdl)
            )
        scored.append((i, len(hit), round(s, 6)))
    scored.sort(key=lambda r: (-r[2], r[0]))
    return scored[:k]


def test_bm25_matches_model(spark):
    texts = [
        "spark merge window scan merge merge",
        "window window window scan",
        "nothing relevant here at all",
        "merge scan",
        "a much longer document with merge somewhere in the middle of it",
    ]
    got = [
        (r["doc_id"], r["n_terms"], r["score"])
        for r in bm25_topk(
            _docs(spark, texts), "text", "doc_id", ["merge", "window"], k=3
        ).collect()
    ]
    assert got == _bm25_model(texts, ["merge", "window"], 3)


def test_bm25_rarer_term_scores_higher(spark):
    # same tf/dl; 'rare' appears in 1 doc, 'common' in 4 -> idf ranks
    texts = ["rare pad", "common pad", "common pad", "common pad", "common x"]
    got = bm25_topk(
        _docs(spark, texts), "text", "doc_id", ["rare", "common"], k=5
    ).collect()
    assert got[0]["doc_id"] == 0


def test_inverted_index_postings(spark):
    texts = ["a b a", "b c", "c c c"]
    idx = {
        r["term"]: r
        for r in inverted_index(_docs(spark, texts), "text", "doc_id").collect()
    }
    assert idx["a"]["df"] == 1
    assert [(p["id"], p["tf"]) for p in idx["a"]["postings"]] == [(0, 2)]
    assert idx["b"]["df"] == 2
    assert [(p["id"], p["tf"]) for p in idx["b"]["postings"]] == [(0, 1), (1, 1)]
    assert idx["c"]["df"] == 2
    assert [(p["id"], p["tf"]) for p in idx["c"]["postings"]] == [(1, 1), (2, 3)]


def test_inverted_index_postings_cap_keeps_exact_df(spark):
    texts = ["z"] * 7
    idx = inverted_index(
        _docs(spark, texts), "text", "doc_id", max_postings=3
    ).collect()
    assert len(idx) == 1
    assert idx[0]["df"] == 7  # df exact even when postings truncated
    assert [p["id"] for p in idx[0]["postings"]] == [0, 1, 2]


def test_rrf_fuse_hand_computed(spark):
    from cccatalog_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "id long, rnk int")
    b = spark.createDataFrame([(2, 1), (4, 2)], "id long, rnk int")
    got = {r["id"]: r for r in rrf_fuse([a, b], "id", k_const=60, k=10).collect()}
    assert got[2]["n_lists"] == 2
    assert got[2]["rrf_score"] == round(1 / 62 + 1 / 61, 6)
    assert got[1]["n_lists"] == 1
    assert got[1]["rrf_score"] == round(1 / 61, 6)
    assert got[4]["rrf_score"] == round(1 / 62, 6)
    # fused order: doc 2 (both lists) first, then 1, then 4, then 3
    order = [r["id"] for r in rrf_fuse([a, b], "id", 60, 10).collect()]
    assert order == [2, 1, 4, 3]


def test_with_rank_total_order(spark):
    from cccatalog_spark.operators.retrieval import with_rank

    scored = spark.createDataFrame(
        [(5, 0.9), (1, 0.9), (7, 0.5)], "id long, s double"
    )
    got = [(r["id"], r["rnk"]) for r in with_rank(scored, "s", "id").collect()]
    assert sorted(got) == [(1, 1), (5, 2), (7, 3)]


def test_ranking_metrics_hand_computed(spark):
    import math

    from cccatalog_spark.operators.retrieval import ranking_metrics

    # q1: rel docs {a, b, c}; run top-3 = [x, a, c] -> hits at ranks 2, 3
    # q2: rel docs {d};      run top-3 = [e, f, g] -> zero hits
    # q3: no rel docs        -> dropped
    run = spark.createDataFrame(
        [
            ("q1", "x", 1), ("q1", "a", 2), ("q1", "c", 3),
            ("q2", "e", 1), ("q2", "f", 2), ("q2", "g", 3),
            ("q3", "a", 1),
        ],
        "query_id string, doc_id string, rank long",
    )
    qrels = spark.createDataFrame(
        [("q1", "a"), ("q1", "b"), ("q1", "c"), ("q2", "d")],
        "query_id string, doc_id string",
    )
    out = {r["query_id"]: r for r in ranking_metrics(run, qrels, 3).collect()}
    assert set(out) == {"q1", "q2"}

    dcg = 1 / math.log2(3) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    r1 = out["q1"]
    assert (r1["n_rel"], r1["hits_at_k"]) == (3, 2)
    assert abs(r1["recall_at_k"] - round(2 / 3, 6)) < 1e-9
    assert abs(r1["mrr_at_k"] - 0.5) < 1e-9
    assert abs(r1["ndcg_at_k"] - round(dcg / idcg, 6)) < 1e-9

    r2 = out["q2"]
    assert (r2["hits_at_k"], r2["recall_at_k"], r2["mrr_at_k"],
            r2["ndcg_at_k"]) == (0, 0.0, 0.0, 0.0)


def test_ranking_metrics_perfect_run(spark):
    from cccatalog_spark.operators.retrieval import ranking_metrics

    run = spark.createDataFrame(
        [("q", "a", 1), ("q", "b", 2)], "query_id string, doc_id string, rank long"
    )
    qrels = spark.createDataFrame(
        [("q", "a"), ("q", "b")], "query_id string, doc_id string"
    )
    r = ranking_metrics(run, qrels, 10).collect()[0]
    assert r["recall_at_k"] == 1.0
    assert r["mrr_at_k"] == 1.0
    assert r["ndcg_at_k"] == 1.0


def test_phrase_occurrences_counts_and_overlap(spark):
    from cccatalog_spark.operators.retrieval import phrase_occurrences

    rows = [
        (1, "spark spark spark runs fast"),       # "spark spark" x2 (overlap)
        (2, "spark runs and spark runs again"),   # "spark runs" x2
        (3, "no match here"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r.n_occurrences
        for r in phrase_occurrences(df, "text", "doc_id", "spark spark").collect()
    }
    assert out == {1: 2}
    out2 = {
        r.doc_id: r.n_occurrences
        for r in phrase_occurrences(df, "text", "doc_id", "spark runs").collect()
    }
    assert out2 == {1: 1, 2: 2}


def test_phrase_three_terms_chain(spark):
    from cccatalog_spark.operators.retrieval import phrase_occurrences

    rows = [
        (1, "one two three four"),
        (2, "one two four three"),
        (3, "zero one two three two three"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r.n_occurrences
        for r in phrase_occurrences(df, "text", "doc_id", "one two three").collect()
    }
    assert out == {1: 1, 3: 1}


def test_tfidf_cosine_rare_overlap_beats_common_overlap(spark):
    """Two docs sharing a RARE shingle score higher than two docs
    sharing an equally-sized COMMON shingle overlap."""
    from cccatalog_spark.operators.retrieval import tfidf_cosine_pairs

    # "c1 c2 c3" shingle appears in docs 1-4 (common); "r1 r2 r3" only
    # in docs 5-6 (rare). Each doc has exactly 2 shingles (4 tokens).
    rows = [
        (1, "c1 c2 c3 x1"), (2, "c1 c2 c3 x2"),
        (3, "c1 c2 c3 x3"), (4, "c1 c2 c3 x4"),
        (5, "r1 r2 r3 y1"), (6, "r1 r2 r3 y2"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r.id_a, r.id_b): r.cosine
        for r in tfidf_cosine_pairs(
            df, "text", "doc_id", k=3, threshold=0.0
        ).collect()
    }
    assert out[(5, 6)] > out[(1, 2)]


def test_tfidf_cosine_identical_docs_score_one(spark):
    from cccatalog_spark.operators.retrieval import tfidf_cosine_pairs

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),
        (3, "zeta eta theta iota kappa"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r.id_a, r.id_b): r.cosine
        for r in tfidf_cosine_pairs(
            df, "text", "doc_id", k=3, threshold=0.9
        ).collect()
    }
    assert out == {(1, 2): 1.0}


def test_hard_negatives_excludes_positives_and_ranks(spark):
    from cccatalog_spark.operators.retrieval import hard_negatives

    docs = spark.createDataFrame(
        [
            (1, "spark stream spark"),
            (2, "spark spark spark stream"),
            (3, "spark"),
            (4, "nothing relevant here"),
            (5, "merge batch merge"),
            (6, "batch"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(1, "spark"), (1, "stream"), (2, "merge"), (2, "batch")],
        "qid int, term string",
    )
    pos = spark.createDataFrame([(1, 2), (2, 5)], "qid int, doc_id long")
    out = hard_negatives(docs, "text", "doc_id", q, pos, k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r)
    # labeled positives never appear
    assert all(r["doc_id"] != 2 for r in by_q[1])
    assert all(r["doc_id"] != 5 for r in by_q[2])
    # q1: doc 1 matches both terms, doc 3 one term -> doc 1 ranks first
    q1 = sorted(by_q[1], key=lambda r: r["rank"])
    assert [r["doc_id"] for r in q1] == [1, 3]
    assert q1[0]["n_terms"] == 2 and q1[1]["n_terms"] == 1
    assert q1[0]["score"] > q1[1]["score"]
    # q2: only doc 6 remains
    assert [r["doc_id"] for r in by_q[2]] == [6]
    # doc 4 matches nothing anywhere
    assert all(r["doc_id"] != 4 for rs in by_q.values() for r in rs)


def test_hard_negatives_repeated_query_term_counted_once(spark):
    from cccatalog_spark.operators.retrieval import hard_negatives

    docs = spark.createDataFrame(
        [(1, "spark stream"), (2, "spark")], "doc_id long, text string"
    )
    pos = spark.createDataFrame([], "qid int, doc_id long")
    once = spark.createDataFrame(
        [(1, "spark"), (1, "stream")], "qid int, term string"
    )
    dup = spark.createDataFrame(
        [(1, "spark"), (1, "spark"), (1, "stream")],
        "qid int, term string",
    )
    a = {r["doc_id"]: r for r in
         hard_negatives(docs, "text", "doc_id", once, pos, k=5).collect()}
    b = {r["doc_id"]: r for r in
         hard_negatives(docs, "text", "doc_id", dup, pos, k=5).collect()}
    assert a.keys() == b.keys()
    for d in a:
        assert a[d]["score"] == b[d]["score"]
        assert a[d]["n_terms"] == b[d]["n_terms"]
        assert a[d]["rank"] == b[d]["rank"]


def test_rbo_identical_and_disjoint(spark):
    from cccatalog_spark.operators.retrieval import rbo_overlap

    a = spark.createDataFrame(
        [(i, i) for i in range(1, 6)], "item long, rank int"
    )
    same = rbo_overlap(a, a, "item", "rank", p=0.9).collect()[0]
    # identical lists: X_d = d so rbo = sum (1-p) p^(d-1)
    expect = round(sum(0.1 * 0.9 ** (d - 1) for d in range(1, 6)), 6)
    assert same["k"] == 5
    assert same["overlap_at_k"] == 1.0
    assert same["rbo"] == expect
    b = spark.createDataFrame(
        [(100 + i, i) for i in range(1, 6)], "item long, rank int"
    )
    disj = rbo_overlap(a, b, "item", "rank", p=0.9).collect()[0]
    assert disj["rbo"] == 0.0 and disj["overlap_at_k"] == 0.0


def test_rbo_top_weighted(spark):
    from cccatalog_spark.operators.retrieval import rbo_overlap

    a = spark.createDataFrame(
        [(i, i) for i in range(1, 4)], "item long, rank int"
    )
    # same items, ranks 1 and 2 swapped: X_1 = 0, X_2 = 2, X_3 = 3
    b = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 3)], "item long, rank int"
    )
    swap_top = rbo_overlap(a, b, "item", "rank", p=0.9).collect()[0]
    # ranks 2 and 3 swapped: X_1 = 1, X_2 = 1, X_3 = 3
    c = spark.createDataFrame(
        [(1, 1), (3, 2), (2, 3)], "item long, rank int"
    )
    swap_tail = rbo_overlap(a, c, "item", "rank", p=0.9).collect()[0]
    e_top = round(0.1 * (0 / 1 + 0.9 * 2 / 2 + 0.81 * 3 / 3), 6)
    e_tail = round(0.1 * (1 / 1 + 0.9 * 1 / 2 + 0.81 * 3 / 3), 6)
    assert swap_top["rbo"] == e_top
    assert swap_tail["rbo"] == e_tail
    # a swap deeper in the list hurts less
    assert swap_tail["rbo"] > swap_top["rbo"]
