"""Cavnar-Trenkle n-gram rank-profile language identification
(Cavnar & Trenkle 1994) — the classical trainable lang-ID beside the
fixed-heuristic detector in ``functions/text.py``: build each
language's top-k character-trigram RANK profile from a training
split, classify held-out documents by the out-of-place distance
(Σ |doc_rank − lang_rank|, missing trigram → max penalty), and report
per-language accuracy — the end-to-end eval a corpus pipeline runs
before trusting a lang column it inferred itself.

Scale shape: profiles are per-group windows over (group, trigram)
COUNT catalogs (never the corpus); scoring joins each test doc's
≤k-row profile against the broadcast (langs × k) profile catalog —
k·|langs| rows per doc, bounded; argmin + accuracy are two
aggregates.  No UDFs, no collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _trigrams(text_col: str) -> Column:
    return F.expr(
        f"transform(sequence(1, greatest(length(lower({text_col})) - 2, 0)),"
        f" i -> substring(lower({text_col}), i, 3))"
    )


def rank_profile_langid_eval(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    lang_col: str,
    k: int = 20,
) -> DataFrame:
    """Train on even ids / test on odd ids; returns one row per true
    language: ``(lang, n_docs, n_correct, accuracy)``.
    """
    base = docs.select(
        F.col(id_col).alias("doc"),
        F.col(lang_col).alias("lang"),
        F.explode(_trigrams(text_col)).alias("tg"),
        (F.col(id_col) % 2 == 0).alias("_train"),
    )
    wl = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tg"))
    lp = (
        base.where(F.col("_train"))
        .groupBy("lang", "tg")
        .agg(F.count("*").alias("c"))
        .withColumn("lrank", F.row_number().over(wl))
        .where(F.col("lrank") <= k)
        .select(F.col("lang").alias("plang"), "tg", "lrank")
        .persist()
    )
    wd = Window.partitionBy("doc").orderBy(F.desc("c"), F.asc("tg"))
    dp = (
        base.where(~F.col("_train"))
        .groupBy("doc", "lang", "tg")
        .agg(F.count("*").alias("c"))
        .withColumn("drank", F.row_number().over(wd))
        .where(F.col("drank") <= k)
        .select("doc", F.col("lang").alias("true_lang"), "tg", "drank")
    )
    langs = lp.select("plang").distinct()
    dist = (
        dp.crossJoin(F.broadcast(langs))
        .join(F.broadcast(lp), ["plang", "tg"], "left")
        .groupBy("doc", "true_lang", "plang")
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("drank") - F.col("lrank")), F.lit(k)
                ).cast("long")
            ).alias("dist")
        )
    )
    pred = (
        dist.groupBy("doc", "true_lang")
        .agg(F.min(F.struct("dist", "plang")).alias("_best"))
        .select("doc", "true_lang", F.col("_best.plang").alias("pred"))
    )
    return pred.groupBy(F.col("true_lang").alias("lang")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("pred") == F.col("true_lang")).cast("long"))
        .cast("long")
        .alias("n_correct"),
        F.round(
            F.avg((F.col("pred") == F.col("true_lang")).cast("double")), 6
        ).alias("accuracy"),
    )
