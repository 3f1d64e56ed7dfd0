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
no UDFs in ROUGE-N. ROUGE-L (below) is the documented non-relational
case: LCS is quadratic per pair with a sequential DP row, so it runs
as ONE Arrow-batched ``mapInPandas`` stage over token prefixes with a
hard ``max_tokens`` bound — a flat per-row cost by contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cccatalog_spark.functions.text import tokens


def _ngram_counts(
    df: DataFrame, id_col: str, text_col: str, n: int, side: str
) -> DataFrame:
    from cccatalog_spark.functions.text import bind_once

    toks = F.transform(tokens(F.col(text_col)), lambda t: F.lower(t))
    # bind_once: lambdas get no CSE — inline ``toks`` would re-run the
    # tokenize n times per gram position (the q264/shingles lesson)
    grams: Column = bind_once(
        toks,
        lambda tb: F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(tb) - (n - 1), F.lit(0))
            ),
            lambda i: F.concat_ws(" ", *[
                F.element_at(tb, (i + j).cast("int")) for j in range(n)
            ]),
        ),
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


def rouge_l(
    pairs: DataFrame,
    id_col: str,
    cand_col: str,
    ref_col: str,
    max_tokens: int = 16,
) -> DataFrame:
    """Per-pair ROUGE-L (Lin 2004 §3): LCS-based P/R/F1 over the first
    ``max_tokens`` lowercased tokens of each side — the in-order
    (non-contiguous) overlap ROUGE-N's fixed grams can't see.

    LCS is inherently quadratic per pair with a sequential DP row —
    the module docstring's documented non-relational case — so this is
    the sanctioned Arrow-batched escape hatch: ONE ``mapInPandas``
    stage runs the O(n·m) DP per pair in a numpy loop (n, m ≤
    ``max_tokens``, so the per-row cost is a small constant), and
    everything around it (tokenize, slice, ratios) stays codegen-side.
    Truncation is a deliberate contract, not a shortcut: it bounds the
    worst-case DP cell count per row, which is what lets the operator
    promise a flat per-row cost at 100 TB.

    Returns ``(id, lcs_len, n_cand, n_ref, precision, recall, f1)``
    with floats rounded 6; empty sides yield null ratios.
    """
    sliced = pairs.select(
        F.col(id_col).alias("_pid"),
        F.slice(
            F.transform(tokens(F.col(cand_col)), lambda t: F.lower(t)),
            1,
            max_tokens,
        ).alias("_tc"),
        F.slice(
            F.transform(tokens(F.col(ref_col)), lambda t: F.lower(t)),
            1,
            max_tokens,
        ).alias("_tr"),
    )

    def dp(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for pid, tc, tr in zip(pdf["_pid"], pdf["_tc"], pdf["_tr"]):
                a, b = list(tc), list(tr)
                n, m = len(a), len(b)
                prev = [0] * (m + 1)
                for i in range(1, n + 1):
                    cur = [0] * (m + 1)
                    for j in range(1, m + 1):
                        if a[i - 1] == b[j - 1]:
                            cur[j] = prev[j - 1] + 1
                        else:
                            cur[j] = max(prev[j], cur[j - 1])
                    prev = cur
                out.append((pid, prev[m], n, m))
            yield pd.DataFrame(
                out, columns=["_pid", "lcs_len", "n_cand", "n_ref"]
            )

    scored = sliced.mapInPandas(
        dp, "_pid long, lcs_len long, n_cand long, n_ref long"
    )
    p = F.when(F.col("n_cand") > 0, F.col("lcs_len") / F.col("n_cand"))
    r = F.when(F.col("n_ref") > 0, F.col("lcs_len") / F.col("n_ref"))
    return scored.select(
        F.col("_pid").alias(id_col),
        "lcs_len",
        "n_cand",
        "n_ref",
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(
            F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(
                F.when(p.isNotNull() & r.isNotNull(), F.lit(0.0))
            ),
            6,
        ).alias("f1"),
    )
