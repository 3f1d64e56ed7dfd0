"""Corpus-to-corpus distribution comparison: unigram distributions,
vocabulary overlap, and Jensen–Shannon divergence — the drift /
composition report a training-data pipeline runs when deciding whether
a new crawl slice, source, or dedup setting shifted the token
distribution (and by how much) before mixing it in.

JSD(P,Q) = ½·KL(P‖M) + ½·KL(Q‖M), M = ½(P+Q): symmetric, bounded by
ln 2, defined even where supports differ (a term absent from one side
contributes p·ln 2 — handled exactly by treating the missing
probability as 0, never by smoothing, so the number is a property of
the corpora alone).

Scale shape: two token-count aggregations (map-side combined), a
full-outer equi-join on the term, and one global sum — the join is
|vocab|-sized, not corpus-sized, and every per-term expression is
codegen. The final scalar is a 1-row aggregate, not a collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cccatalog_spark.functions import text as TX


def unigram_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(term, cnt) over lowercased whitespace tokens."""
    toks = F.transform(TX.tokens(F.col(text_col)), lambda t: F.lower(t))
    return (
        docs.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )


def js_divergence(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    text_col: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """One row: (vocab_a, vocab_b, vocab_shared, jsd). ``jsd`` in
    [0, ln 2], rounded (re-ordered float sum)."""
    ca = unigram_counts(corpus_a, text_col)
    cb = unigram_counts(corpus_b, text_col)
    j = (
        ca.select("term", F.col("cnt").alias("ca"))
        .join(
            cb.select("term", F.col("cnt").alias("cb")), "term", "full_outer"
        )
        .select(
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
        )
    )
    tot = j.agg(
        F.sum("ca").cast("double").alias("na"),
        F.sum("cb").cast("double").alias("nb"),
    )
    t = j.crossJoin(F.broadcast(tot))
    p = F.col("ca") / F.col("na")
    q = F.col("cb") / F.col("nb")
    m = (p + q) / F.lit(2.0)
    term = F.when(p > 0, F.lit(0.5) * p * F.log(p / m)).otherwise(
        F.lit(0.0)
    ) + F.when(q > 0, F.lit(0.5) * q * F.log(q / m)).otherwise(F.lit(0.0))
    return t.agg(
        F.sum(F.when(F.col("ca") > 0, 1).otherwise(0)).alias("vocab_a"),
        F.sum(F.when(F.col("cb") > 0, 1).otherwise(0)).alias("vocab_b"),
        F.sum(
            F.when((F.col("ca") > 0) & (F.col("cb") > 0), 1).otherwise(0)
        ).alias("vocab_shared"),
        F.round(F.sum(term), round_to).alias("jsd"),
    )
