"""Winnowing fingerprints (operators/winnow.py)."""

from __future__ import annotations

import hashlib

from cccatalog_spark.operators.winnow import (
    shared_fingerprint_pairs,
    winnow_fingerprints,
)


def _winnow_py(text, k=4, w=5):
    toks = text.split()
    grams = [
        hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
        for i in range(len(toks) - k + 1)
    ]
    if not grams:
        return set()
    wl = min(w, len(grams))
    sel = set()
    for q in range(0, max(len(grams) - w + 1, 1)):
        win = grams[q : q + wl]
        m = min(win)
        # rightmost minimal
        pos = max(i for i, h in enumerate(win) if h == m)
        sel.add((q + pos + 1, m))
    return sel


def test_fingerprints_match_python_model(spark):
    texts = [
        (1, "a b c d e f g h i j k l m n"),
        (2, "z y x w v u t s r q p o"),
        (3, "short text"),          # fewer tokens than k -> empty
        (4, "a b c d e"),           # fewer grams than w -> one window
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = winnow_fingerprints(df, "text", "doc_id", k=4, w=5).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for did, text in texts:
        assert got.get(did, set()) == _winnow_py(text), did


def test_every_window_guarantee(spark):
    # any w consecutive grams must contain >= 1 selected position
    text = " ".join(f"t{i % 7}" for i in range(60))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = winnow_fingerprints(df, "text", "doc_id", k=3, w=4).collect()
    sel = sorted(r["pos"] for r in rows)
    n_grams = 60 - 3 + 1
    for q in range(1, n_grams - 4 + 2):
        assert any(q <= p <= q + 3 for p in sel), q
    # density ~ 2/(w+1), never the whole gram set
    assert len(set(sel)) < n_grams


def test_shared_substring_produces_shared_fingerprint(spark):
    shared = "the quick brown fox jumps over the lazy dog again and again"
    texts = [
        (1, "alpha beta " + shared + " gamma delta"),
        (2, "one two three " + shared + " four"),
        (3, "completely unrelated words only here nothing matches at all"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    fps = winnow_fingerprints(df, "text", "doc_id", k=4, w=5)
    pairs = {
        (r["id_a"], r["id_b"]): r["shared"]
        for r in shared_fingerprint_pairs(fps, "doc_id", min_shared=1).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_max_doc_freq_drops_ubiquitous_fingerprints(spark):
    boiler = "all rights reserved contact us subscribe now"
    texts = [(i, f"doc {i} words w{i} x{i} " + boiler) for i in range(10)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    fps = winnow_fingerprints(df, "text", "doc_id", k=4, w=3)
    allp = shared_fingerprint_pairs(fps, "doc_id", min_shared=1, max_doc_freq=50)
    capped = shared_fingerprint_pairs(fps, "doc_id", min_shared=1, max_doc_freq=5)
    assert allp.count() > 0 and capped.count() == 0
