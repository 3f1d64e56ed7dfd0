"""Training-data valuation: exact closed-form KNN-Shapley.

Jia et al., "Efficient Task-Specific Data Valuation for Nearest
Neighbor Algorithms" (VLDB 2019) give an O(N log N) exact Shapley
value for the utility "accuracy of a K-NN classifier on a held-out
probe set": sort the training points by distance to a probe
ascending (alpha_1 closest .. alpha_N), then

    s(alpha_N) = 1[y_N == y] / N
    s(alpha_i) = s(alpha_{i+1})
                 + (1[y_i == y] - 1[y_{i+1} == y]) / K * min(K, i) / i

and the per-training-point value is the mean of s over probes.  The
recursion is a suffix sum over the per-probe ranking, so the whole
computation is window algebra — no iteration, no UDF:

  rank       row_number() per probe over (similarity DESC, id ASC)
  recursion  sum(term) OVER (PARTITION BY probe ORDER BY rank DESC)
  value      groupBy(train id).avg

Scale: the probe set is a bounded catalog (held-out eval sets are
small by construction) and is broadcast, so the scoring stage is a
single linear scan of the training corpus with NO shuffle; the
per-probe ranking shuffles once keyed by probe_id (|probes| x |train|
rows, each probe's partition processed independently); the final
average shuffles once keyed by train id.  Similarities are rounded to
6 dp BEFORE ranking with an id tiebreak so the ordering — and hence
the exact Shapley output — is reproducible bit-for-bit across engines.

The reference has no data-valuation surface (this is extension-layer,
like operators/sampling.py's DSIR); the nearest analogue is its
popularity-percentile scoring (reference
src/popularity/sql/standardized_popularity.sql) which also ranks a
corpus against a small calibration set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cccatalog_spark.operators.similarity import cosine


def knn_shapley(
    train: DataFrame,
    probes: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 5,
    out_col: str = "shapley",
) -> DataFrame:
    """Exact KNN-Shapley value of every training row against a broadcast
    probe set.  Returns one row per training id:
    ``(id_col, n_probes, out_col)`` with the value rounded to 6 dp.
    """
    p = probes.select(
        F.col(id_col).alias("_probe_id"),
        F.col(vec_col).alias("_pv"),
        F.col(label_col).alias("_py"),
    )
    scored = (
        train.select(id_col, vec_col, label_col)
        .crossJoin(F.broadcast(p))
        .select(
            "_probe_id",
            "_py",
            F.col(id_col),
            F.col(label_col),
            F.round(cosine(F.col(vec_col), F.col("_pv")), 6).alias("_sim"),
        )
    )
    w_rank = Window.partitionBy("_probe_id").orderBy(
        F.desc("_sim"), F.asc(id_col)
    )
    w_probe = Window.partitionBy("_probe_id")
    w_next = Window.partitionBy("_probe_id").orderBy("_rnk")
    ind = F.when(F.col(label_col) == F.col("_py"), 1.0).otherwise(0.0)
    ranked = (
        scored.withColumn("_rnk", F.row_number().over(w_rank))
        .withColumn("_n", F.count("*").over(w_probe))
        .withColumn("_ind", ind)
    )
    ranked = ranked.withColumn("_ind_next", F.lead("_ind").over(w_next))
    term = F.when(
        F.col("_rnk") == F.col("_n"),
        F.col("_ind") / F.col("_n").cast("double"),
    ).otherwise(
        (F.col("_ind") - F.col("_ind_next"))
        / F.lit(float(k))
        * F.least(F.lit(k), F.col("_rnk")).cast("double")
        / F.col("_rnk").cast("double")
    )
    w_suffix = (
        Window.partitionBy("_probe_id")
        .orderBy(F.desc("_rnk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    shap = ranked.withColumn("_s", F.sum(term).over(w_suffix))
    return shap.groupBy(F.col(id_col)).agg(
        F.count("*").alias("n_probes"),
        F.round(F.avg("_s"), 6).alias(out_col),
    )
