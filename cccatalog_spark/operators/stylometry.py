"""Burrows' Delta authorship/stylometry distance (Burrows 2002) —
the classic "do these two corpus slices read like the same author /
generator?" measure: z-score the per-slice relative frequencies of the
top-k corpus-wide function words, then average the absolute z
differences per slice pair. In a training-data pipeline this is the
template/model-generated-content detector across sources and the
register-drift screen between snapshots — complements the token-level
KL drift (q115) with a scale-free, style-sensitive statistic.

Scale shape: tokenization + one (group, word) count shuffle; the
vocabulary is a TakeOrdered top-k (bounded catalog, broadcast); the
(groups × vocab) grid, z-scores, and the pair join all run over
catalog-sized frames (|groups|·k rows). Nothing downstream of the one
count touches the corpus again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cccatalog_spark.functions import text as TX


def burrows_delta(
    docs: DataFrame,
    group_col: str,
    text_col: str,
    top_k: int = 40,
) -> DataFrame:
    """Pairwise Delta between groups: ``(g_a, g_b, delta)`` with
    ``g_a < g_b``, over the ``top_k`` most frequent words (corpus
    count desc, word asc — a total order)."""
    toks = docs.select(
        F.col(group_col).alias("g"),
        F.explode(TX.tokens(F.lower(F.col(text_col)))).alias("w"),
    )
    # the (group, word) count frame feeds THREE consumers (group
    # totals, vocabulary, grid join) — persist so the corpus
    # tokenization+count runs once
    gw = toks.groupBy("g", "w").agg(
        F.count("*").cast("double").alias("c")
    ).persist()
    gt = gw.groupBy("g").agg(F.sum("c").alias("tot"))
    vocab = (
        gw.groupBy("w")
        .agg(F.sum("c").alias("cc"))
        .orderBy(F.desc("cc"), F.asc("w"))
        .limit(int(top_k))
        .select("w")
    )
    groups = gw.select("g").distinct()
    # groups × vocab grid: both are bounded catalogs (k words, a
    # handful of slices) — the crossJoin is catalog-sized by design
    grid = groups.crossJoin(F.broadcast(vocab))
    rel = (
        grid.join(gw, ["g", "w"], "left")
        .join(gt, "g")
        .select(
            "g",
            "w",
            (
                F.coalesce(F.col("c"), F.lit(0.0)) / F.col("tot")
            ).alias("f"),
        )
    )
    st = rel.groupBy("w").agg(
        F.avg("f").alias("mu"), F.stddev_pop("f").alias("sd")
    )
    z = rel.join(F.broadcast(st), "w").select(
        "g",
        "w",
        F.when(
            F.col("sd") > 0,
            (F.col("f") - F.col("mu")) / F.col("sd"),
        )
        .otherwise(F.lit(0.0))
        .alias("z"),
    )
    a = z.alias("a")
    b = z.alias("b")
    return (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.g") < F.col("b.g")),
        )
        .groupBy(
            F.col("a.g").alias("g_a"), F.col("b.g").alias("g_b")
        )
        .agg(
            F.round(
                F.avg(F.abs(F.col("a.z") - F.col("b.z"))), 6
            ).alias("delta")
        )
    )
