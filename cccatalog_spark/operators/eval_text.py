"""Reference-based text evaluation — ROUGE-N over candidate/reference
pairs (Lin 2004), the metric every summarization / paraphrase /
distillation pipeline reports next to its outputs.

ROUGE-N with clipping: per n-gram g,

    overlap = Σ_g min(count_cand(g), count_ref(g))
    recall  = overlap / Σ_g count_ref(g)
    precision = overlap / Σ_g count_cand(g)
    f1 = 2PR / (P + R)

Counts are MULTISET counts (not distinct) — "the the the" matching a
single reference "the" contributes 1, not 3 — which is what the
min-clip implements.

Scale shape: both sides explode to (pair, gram, count) frames (one
aggregate each off the token arrays), then ONE equi-join on
(pair, gram) — full outer so one-sided grams still count toward the
denominators — and one per-pair rollup. No windows over the corpus,
no UDFs; ROUGE-L is deliberately NOT here (LCS is quadratic per pair
and not expressible as relational algebra — use a Pandas UDF stage if
a pipeline truly needs it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cccatalog_spark.functions.text import tokens


def _ngram_counts(
    df: DataFrame, id_col: str, text_col: str, n: int, side: str
) -> DataFrame:
    toks = F.transform(tokens(F.col(text_col)), lambda t: F.lower(t))
    grams: Column = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))
        ),
        lambda i: F.concat_ws(" ", *[
            F.element_at(toks, (i + j).cast("int")) for j in range(n)
        ]),
    )
    return (
        df.select(F.col(id_col).alias("_pid"), F.explode(grams).alias("g"))
        .groupBy("_pid", "g")
        .agg(F.count("*").cast("double").alias(f"c_{side}"))
    )


def rouge_n(
    pairs: DataFrame,
    id_col: str,
    cand_col: str,
    ref_col: str,
    n: int = 2,
) -> DataFrame:
    """Per-pair ROUGE-N report ``(id, n_overlap, n_cand, n_ref,
    precision, recall, f1)`` (floats rounded 6; empty-side pairs get
    null for the undefined ratios). ``pairs`` carries one candidate
    and one reference text per row.
    """
    c = _ngram_counts(pairs, id_col, cand_col, n, "cand")
    r = _ngram_counts(pairs, id_col, ref_col, n, "ref")
    j = c.join(r, ["_pid", "g"], "full_outer").select(
        "_pid",
        F.coalesce("c_cand", F.lit(0.0)).alias("cc"),
        F.coalesce("c_ref", F.lit(0.0)).alias("cr"),
    )
    agg = j.groupBy(F.col("_pid").alias(id_col)).agg(
        F.sum(F.least("cc", "cr")).alias("_ov"),
        F.sum("cc").alias("_nc"),
        F.sum("cr").alias("_nr"),
    )
    p = F.when(F.col("_nc") > 0, F.col("_ov") / F.col("_nc"))
    rr = F.when(F.col("_nr") > 0, F.col("_ov") / F.col("_nr"))
    return agg.select(
        id_col,
        F.col("_ov").cast("long").alias("n_overlap"),
        F.col("_nc").cast("long").alias("n_cand"),
        F.col("_nr").cast("long").alias("n_ref"),
        F.round(p, 6).alias("precision"),
        F.round(rr, 6).alias("recall"),
        F.round(
            F.when(p + rr > 0, 2 * p * rr / (p + rr)).otherwise(
                F.when(p.isNotNull() & rr.isNotNull(), F.lit(0.0))
            ),
            6,
        ).alias("f1"),
    )
