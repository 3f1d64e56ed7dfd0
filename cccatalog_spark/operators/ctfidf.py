"""Class-based TF-IDF cluster/group labeling (the BERTopic c-TF-IDF,
Grootendorst 2022): treat each GROUP (topic cluster, source, domain)
as one concatenated pseudo-document and rank terms by

    ctfidf(t, c) = tf(t, c) * ln(1 + A / df_classes(t))

where ``tf`` is the term's count inside the class, ``df_classes`` is
the number of classes containing the term, and ``A`` is the average
class token mass. The top-k terms per class are the human-readable
label a clustering pipeline prints next to every k-means/LSH/SemDeDup
cluster id.

Shape: one (class, term) count aggregate (map-side combinable), a
|terms|-keyed groupBy for df_classes joined back on the term key, a
1-row average-mass broadcast, and a per-class top-k window over
(class, term) COUNTS — never over the corpus; the window's partition
is the class's vocabulary. No collect, no python surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def class_tfidf_top_terms(
    df: DataFrame,
    class_col: str,
    text_col: str,
    k: int = 5,
) -> DataFrame:
    """Top-k ``(class, term, tf, df_classes, score, rank)`` rows per
    class by c-TF-IDF, deterministic tiebreak (score desc, term asc),
    score rounded to 6."""
    from cccatalog_spark.functions.text import tokens

    tf = (
        df.select(
            F.col(class_col).alias("cls"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("cls", "term")
        .agg(F.count("*").alias("tf"))
        .persist()
    )
    df_classes = tf.groupBy("term").agg(
        F.count("*").alias("df_classes")
    )
    avg_mass = tf.groupBy("cls").agg(F.sum("tf").alias("_m")).agg(
        F.avg("_m").alias("_a")
    )
    scored = (
        tf.join(df_classes, "term")
        .crossJoin(F.broadcast(avg_mass))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log(1.0 + F.col("_a") / F.col("df_classes")),
                6,
            ),
        )
    )
    w = Window.partitionBy("cls").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("cls").alias(class_col),
            "term",
            "tf",
            "df_classes",
            "score",
            "rank",
        )
    )
