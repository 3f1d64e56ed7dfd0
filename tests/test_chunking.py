"""Context-window chunking (operators/chunking.py): window algebra
against hand-computed slices, edge cases, and plan shape (narrow — no
shuffle, no UDF)."""

from __future__ import annotations

import pytest

from cccatalog_spark.operators.chunking import chunk_documents


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunking_hand_computed(spark):
    words = [f"w{i}" for i in range(10)]
    df = _docs(spark, [" ".join(words)])
    got = sorted(
        (r["chunk_id"], r["start"], r["chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(df, "text", "doc_id", 4, 3).collect()
    )
    # n=10, stride=3 -> starts 0,3,6,9; size 4, tail truncated
    assert got == [
        (0, 0, 4, "w0 w1 w2 w3"),
        (1, 3, 4, "w3 w4 w5 w6"),
        (2, 6, 4, "w6 w7 w8 w9"),
        (3, 9, 1, "w9"),
    ]


def test_chunking_overlap_covers_every_token(spark):
    # every token index appears in >= 1 chunk; consecutive chunks
    # share exactly (chunk_size - stride) tokens mid-stream
    words = [f"t{i}" for i in range(100)]
    df = _docs(spark, [" ".join(words)])
    rows = chunk_documents(df, "text", "doc_id", 64, 48).collect()
    covered = set()
    for r in rows:
        covered.update(range(r["start"], r["start"] + r["chunk_tokens"]))
    assert covered == set(range(100))


def test_chunking_empty_and_short_docs(spark):
    df = _docs(spark, ["", "   ", "solo"])
    rows = chunk_documents(df, "text", "doc_id", 64, 48).collect()
    # empty/whitespace docs emit nothing; 1-token doc emits 1 chunk
    assert len(rows) == 1
    assert rows[0]["doc_id"] == 2
    assert rows[0]["chunk_text"] == "solo"
    assert rows[0]["chunk_tokens"] == 1


def test_chunking_rejects_bad_params(spark):
    df = _docs(spark, ["a b"])
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", 0, 3)
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", 4, 0)


def test_chunking_plan_is_narrow(spark):
    df = _docs(spark, ["a b c d e f g h"])
    plan = chunk_documents(df, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# pack_windows (GPT-style concatenate-then-slice sample packing)
# ---------------------------------------------------------------------------

def _pack_model(lens, W):
    """Python model: concatenate docs in id order, slice into windows."""
    out = []
    pos = 0
    for i, n in lens:
        start, end = pos, pos + n
        w = start // W
        while w * W < end:
            ts, te = max(start, w * W), min(end, (w + 1) * W)
            out.append((i, w, ts - w * W, ts - start, te - start))
            w += 1
        pos = end
    return sorted(out)


def test_pack_windows_matches_model(spark):
    from cccatalog_spark.operators.chunking import pack_windows

    lens = [(0, 3), (1, 10), (2, 1), (3, 7), (4, 2), (5, 16), (6, 1)]
    df = spark.createDataFrame(lens, "doc_id long, n long")
    got = sorted(
        tuple(r) for r in pack_windows(df, "doc_id", "n", 8).collect()
    )
    assert got == _pack_model(lens, 8)


def test_pack_windows_tiling_invariants(spark):
    from collections import defaultdict

    from cccatalog_spark.operators.chunking import pack_windows

    lens = [(i, (i * 13) % 30 + 1) for i in range(200)]
    W = 64
    rows = pack_windows(
        spark.createDataFrame(lens, "doc_id long, n long"), "doc_id", "n", W
    ).collect()
    total = sum(n for _, n in lens)
    # per-doc spans tile [0, len)
    per_doc = defaultdict(list)
    for r in rows:
        per_doc[r["doc_id"]].append((r["off_start"], r["off_end"]))
    for i, n in lens:
        spans = sorted(per_doc[i])
        assert spans[0][0] == 0 and spans[-1][1] == n
        for (a, b), (c, d) in zip(spans, spans[1:]):
            assert b == c
    # per-window occupancy tiles [0, W) except the last window
    per_win = defaultdict(int)
    for r in rows:
        per_win[r["window_id"]] += r["off_end"] - r["off_start"]
    last = max(per_win)
    for w, occ in per_win.items():
        assert occ == (W if w < last else total - last * W)


def test_pack_windows_zero_len_dropped_and_repartition_stable(spark):
    from cccatalog_spark.operators.chunking import pack_windows

    lens = [(0, 5), (1, 0), (2, 5)]
    df = spark.createDataFrame(lens, "doc_id long, n long")
    a = sorted(tuple(r) for r in pack_windows(df, "doc_id", "n", 4).collect())
    assert not any(r[0] == 1 for r in a)
    b = sorted(
        tuple(r)
        for r in pack_windows(df.repartition(5), "doc_id", "n", 4).collect()
    )
    assert a == b


def test_span_corruption_non_overlap_and_rate(spark):
    from collections import defaultdict

    from cccatalog_spark.operators.chunking import span_corruption_plan

    lens = [(i, 100 + i % 37) for i in range(200)]
    df = spark.createDataFrame(lens, "doc_id long, n long")
    rows = span_corruption_plan(df, "doc_id", "n", span_len=3, stride=20).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append((r["start"], r["length"]))
    n_map = dict(lens)
    masked_total = 0
    for i, spans in by_doc.items():
        spans.sort()
        for (s1, l1), (s2, _) in zip(spans, spans[1:]):
            assert s1 + l1 <= s2          # non-overlapping
        for s, ln in spans:
            assert 1 <= ln <= 3
            assert s + ln <= n_map[i]     # in bounds
            masked_total += ln
    total = sum(n for _, n in lens)
    assert 0.10 < masked_total / total < 0.20   # ~15% corruption
