"""Skip-gram pair generation (operators/skipgram.py)."""

from __future__ import annotations

from cccatalog_spark.operators.skipgram import skipgram_pairs


def test_skipgram_window_pairs_no_subsampling(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "b a")], "doc_id long, text string"
    )
    # t huge -> keep probability 1 everywhere: pure windowing
    out = {
        (r["w_center"], r["w_context"]): r["n_pairs"]
        for r in skipgram_pairs(
            docs, "text", "doc_id", window=1, subsample_t=10.0
        ).collect()
    }
    assert out == {
        ("a", "b"): 2, ("b", "a"): 2, ("b", "c"): 1,
        ("c", "b"): 1, ("c", "d"): 1, ("d", "c"): 1,
    }


def test_skipgram_symmetry_and_total(spark):
    docs = spark.createDataFrame(
        [(1, "w x y z w x")], "doc_id long, text string"
    )
    rows = skipgram_pairs(
        docs, "text", "doc_id", window=2, subsample_t=10.0
    ).collect()
    out = {(r["w_center"], r["w_context"]): r["n_pairs"] for r in rows}
    # every (a,b) pair has a mirror (b,a) with equal count
    for (a, b), n in out.items():
        assert out[(b, a)] == n
    # 6 tokens, window 2: total directed pairs = 2*(5+4+3+3+3)... just
    # check against the closed form sum over positions
    n_tok, w = 6, 2
    expected = sum(
        min(i + w, n_tok - 1) - max(i - w, 0) for i in range(n_tok)
    )
    assert sum(out.values()) == expected


def test_skipgram_subsampling_drops_dominant_word(spark):
    # 'the' is ~96% of the corpus; with t=1e-3 its keep probability is
    # sqrt(0.001/0.96) ~ 3%, so pairs should be dominated by content
    # words, and the process must be deterministic
    text = ("the " * 120 + "cat sat mat").strip()
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r1 = sorted(map(tuple, skipgram_pairs(
        docs, "text", "doc_id", window=2, subsample_t=1e-3
    ).collect()))
    r2 = sorted(map(tuple, skipgram_pairs(
        docs.repartition(5), "text", "doc_id", window=2,
        subsample_t=1e-3
    ).collect()))
    assert r1 == r2
    the_pairs = sum(n for (a, b, n) in r1 if a == "the" and b == "the")
    full = sorted(map(tuple, skipgram_pairs(
        docs, "text", "doc_id", window=2, subsample_t=10.0
    ).collect()))
    the_pairs_full = sum(
        n for (a, b, n) in full if a == "the" and b == "the"
    )
    # without subsampling 120 consecutive 'the' produce hundreds of
    # the-the pairs; with t=1e-3 (keep ~3%) the count collapses
    assert the_pairs_full > 400
    assert 0 < sum(n for (_, _, n) in r1)
    assert the_pairs < the_pairs_full / 10


def test_cooccurrence_distance_weights(spark):
    from cccatalog_spark.operators.skipgram import cooccurrence_counts

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = {
        (r["w_center"], r["w_context"]): r["x"]
        for r in cooccurrence_counts(
            docs, "text", "doc_id", window=2
        ).collect()
    }
    assert out == {
        ("a", "b"): 1.0, ("b", "a"): 1.0, ("b", "c"): 1.0,
        ("c", "b"): 1.0, ("a", "c"): 0.5, ("c", "a"): 0.5,
    }
    flat = {
        (r["w_center"], r["w_context"]): r["x"]
        for r in cooccurrence_counts(
            docs, "text", "doc_id", window=2, distance_weighted=False
        ).collect()
    }
    assert flat[("a", "c")] == 1.0
