"""RAKE keyword extraction (Rose et al. 2010) as pure relational
algebra — corpus-level keyword/phrase profiling for dataset cards and
topic drift monitors.

RAKE's phrase segmentation ("candidate phrases are maximal runs of
non-stopwords") is usually a per-document loop; here it is the
classic gaps-and-islands window trick: a running sum of the stopword
indicator is constant exactly inside each non-stopword run, so
(doc, segment_id) identifies a phrase.  Word scores deg(w)/freq(w)
(deg = summed length of the phrases each occurrence sits in) and the
phrase score Σ word-scores are then plain aggregates.

Scale shape: one per-document window (shuffle keyed by doc), one
(doc, segment) phrase rollup, one vocabulary-keyed word-stat
aggregate, one broadcast-size join back (the word-score frame is
vocabulary-sized).  No Python, no per-document loop; top-k is a
TakeOrdered with a (score, phrase) total order.

The reference's nearest surface is per-record tag extraction in its
CC scrapers (src/providers/commoncrawl/*.py); corpus-level keyword
scoring is extension-layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cccatalog_spark.functions.text import STOPWORDS


def rake_keywords(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    top_k: int = 25,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Top-k RAKE phrases over the corpus:
    ``(phrase, n_occurrences, n_words, score)``, score rounded to 6,
    ordered (score DESC, phrase ASC).  Tokenization is
    lower + split on ``[^a-z]+`` — identical under Java regex and
    RE2, so the oracle replay is exact."""
    stops = stopwords if stopwords is not None else STOPWORDS
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda t: t != "",
    )
    e = df.select(
        F.col(id_col).alias("_doc"), F.posexplode(toks).alias("_pos", "_w")
    ).withColumn("_st", F.col("_w").isin(*stops).cast("int"))
    wseg = Window.partitionBy("_doc").orderBy("_pos")
    seg = e.withColumn("_sg", F.sum("_st").over(wseg))
    mem = seg.where(F.col("_st") == 0).select("_doc", "_sg", "_pos", "_w")
    wph = Window.partitionBy("_doc", "_sg")
    wm = mem.withColumn("_plen", F.count("*").over(wph))
    ws = wm.groupBy("_w").agg(
        F.count("*").alias("_freq"), F.sum("_plen").alias("_deg")
    )
    scored = wm.join(F.broadcast(ws), "_w").groupBy("_doc", "_sg").agg(
        F.sum(F.col("_deg") / F.col("_freq").cast("double")).alias(
            "_score"
        )
    )
    ptext = mem.groupBy("_doc", "_sg").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_pos", "_w"))
                ),
                lambda s: s["_w"],
            ),
            " ",
        ).alias("phrase"),
        F.count("*").alias("_nw"),
    )
    return (
        ptext.join(scored, ["_doc", "_sg"])
        .groupBy("phrase")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.max("_nw").cast("bigint").alias("n_words"),
            F.round(F.max("_score"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("phrase"))
        .limit(top_k)
    )
