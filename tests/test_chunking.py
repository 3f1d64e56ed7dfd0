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
