"""Exact duplicated-substring (k-token-gram span) profiling — the
training-data dedup step popularized by Lee et al., *"Deduplicating
Training Data Makes Language Models Better"* (ACL 2022), re-expressed
as DataFrame algebra instead of a single-node suffix array.

A token position is *duplicated* when it is covered by a k-token gram
that occurs more than once in the corpus (in any document, including
the same document). This marks exactly the positions a suffix-array
maximal-repeat pass (repeat length >= k tokens) marks: every position
of a maximal repeat of length L >= k is covered by one of its L-k+1
constituent k-grams, and no position outside a repeat is covered.
Removal of the covered spans is then the per-document edit the paper
applies; here the engine-side deliverable is the exact covered-span
accounting per document (positions, distinct grams, coverage
fraction).

Scale shape (the reason this is NOT a suffix array):

- one wide stage: gram-frequency via a window over ``xxhash64(gram)``
  — |tokens| rows with 64-bit keys, map-side partial aggregation, AQE
  skew-split for degenerate grams;
- one narrow per-document window for interval coverage: sorted dup
  positions, ``sum(min(k, pos - lag(pos)))`` — no k-fold positional
  explode, no pairwise join, no driver-side state;
- a suffix array over 100 TB of text is a single 8x-text-size sorted
  structure that cannot be built per-executor; the k-gram formulation
  shards by hash and never materializes anything larger than the
  token stream itself.

Reference anchor: the reference has no corpus-level dedup at all
(SURVEY §2 extension layer); its nearest concern is the per-image
``identifier`` dedup in util/loader/sql.py:303-352 (exact key upsert).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cccatalog_spark.functions import text as TX


def _grams(toks: Column, k: int) -> Column:
    """All rolling k-token grams of ``toks`` (space-joined), in
    position order; empty array when the document is shorter than k."""
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k) + 1),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def gram_positions(
    df: DataFrame, text_col: str, id_col: str, k: int = 5
) -> DataFrame:
    """(id, n_tok, n_grams, pos, gram_hash) — one row per rolling
    k-gram position. ``pos`` is 0-based; ``gram_hash`` is the 64-bit
    xxhash of the space-joined gram (the shuffle key at scale)."""
    toks = TX.tokens(F.col(text_col))
    d = df.select(
        F.col(id_col),
        F.size(toks).alias("n_tok"),
        _grams(toks, k).alias("grams"),
    )
    return d.select(
        id_col,
        "n_tok",
        F.size("grams").alias("n_grams"),
        F.posexplode("grams").alias("pos", "gram"),
    ).select(
        id_col, "n_tok", "n_grams", "pos", F.xxhash64("gram").alias("gram_hash")
    )


def duplicated_span_profile(
    df: DataFrame, text_col: str, id_col: str, k: int = 5
) -> DataFrame:
    """Per-document duplicated-span accounting.

    Returns one row per document that contains at least one duplicated
    k-gram: ``(id, n_tok, n_grams, n_dup_grams, covered_tokens,
    dup_frac)`` where ``covered_tokens`` is the exact size of the
    union of the [pos, pos+k-1] intervals of its duplicated grams and
    ``dup_frac`` is that coverage as a fraction of the document's
    tokens (rounded to 6 places — the removal budget per doc).
    """
    g = gram_positions(df, text_col, id_col, k)
    # corpus-wide occurrence count per gram: the single wide stage
    cnt_w = Window.partitionBy("gram_hash")
    dup = g.withColumn("cnt", F.count("*").over(cnt_w)).where(F.col("cnt") > 1)
    # interval-union coverage via sorted-gap algebra: first interval
    # contributes k, each next contributes min(k, pos - prev_pos)
    pos_w = Window.partitionBy(id_col).orderBy("pos")
    covered = F.when(
        F.lag("pos").over(pos_w).isNull(), F.lit(k)
    ).otherwise(F.least(F.lit(k), F.col("pos") - F.lag("pos").over(pos_w)))
    return (
        dup.withColumn("covered", covered)
        .groupBy(id_col)
        .agg(
            F.first("n_tok").alias("n_tok"),
            F.first("n_grams").alias("n_grams"),
            F.count("*").alias("n_dup_grams"),
            F.sum("covered").alias("covered_tokens"),
        )
        .withColumn(
            "dup_frac",
            F.round(F.col("covered_tokens") / F.col("n_tok"), 6),
        )
    )
