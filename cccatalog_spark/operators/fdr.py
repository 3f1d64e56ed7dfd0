"""Multiple-testing control for corpus screens — Benjamini-Hochberg
FDR over a family of per-feature hypothesis tests, plus the
closed-form chi-square tail needed to produce the p-values without
scipy.

The pipeline job: a quality screen tests hundreds of cheap signals
("does token w associate with language? with source? with the spam
label?"); reporting every p < 0.05 at m tests drowns the real
signals in ~0.05·m false alarms. BH (Benjamini & Hochberg 1995) is
the standard step-up fix: sort the m p-values, find the largest i
with p_(i) <= (i/m)·alpha, call ranks 1..i discoveries — expected
false-discovery proportion <= alpha.

Scale shape: the expensive part (per-feature test statistics) is
corpus-proportional aggregation upstream; THIS module only ever
touches the m-row hypothesis catalog (m = number of features — a
bounded catalog, same class as the IPF/k-means cell frames), so the
global sort window and the 1-row max-k broadcast are trivially safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def chi2_sf_even_df(x: Column, df: int) -> Column:
    """Chi-square survival function P(X >= x) for EVEN degrees of
    freedom — exact closed form ``exp(-x/2) * Σ_{j<df/2} (x/2)^j/j!``
    (the Erlang/Poisson tail identity), so no incomplete-gamma
    numerics and the same expression replays in any SQL engine.
    Odd df needs erf — use the next even df or a dedicated approx."""
    if df % 2 != 0 or df <= 0:
        raise ValueError("closed form requires positive even df")
    h = x / 2.0
    term: Column = F.lit(1.0)
    acc: Column = F.lit(1.0)
    fact = 1.0
    for j in range(1, df // 2):
        fact *= j
        term = F.pow(h, float(j)) / F.lit(fact)
        acc = acc + term
    return F.exp(-h) * acc


def bh_fdr(
    hypotheses: DataFrame,
    key_col: str,
    p_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini-Hochberg step-up over an m-row hypothesis catalog.
    Returns ``(key, p, rank, m, bh_crit, significant)``: p ascending
    rank (ties broken by key for determinism), the BH critical value
    ``rank/m*alpha``, and the step-up verdict (rank <= largest i
    with p_(i) <= crit_i — note a rank can be significant even if its
    own p exceeds its crit, per the step-up rule). Floats rounded 6.

    Hypotheses with a null p carry no evidence and are EXCLUDED (they
    would otherwise sort NULLS FIRST into rank 1 and inflate m). m is
    carried as a window count over the catalog itself — no separate
    count() action re-running the upstream pipeline — and the catalog
    is persisted so the step-up scalar doesn't recompute it either.
    """
    p = F.col(p_col).cast("double")
    w = Window.orderBy(p, F.col(key_col))
    ranked = (
        hypotheses.where(p.isNotNull())
        .select(
            F.col(key_col).alias("key"),
            p.alias("p"),
            F.row_number().over(w).alias("rank"),
            F.count("*").over(
                Window.partitionBy(F.lit(1))
            ).alias("m"),
        )
        .persist()
    )
    ok = ranked.where(
        F.col("p") * F.col("m") <= F.col("rank") * F.lit(alpha)
    ).agg(F.max("rank").alias("_k"))
    return (
        ranked.crossJoin(F.broadcast(ok))
        .select(
            "key",
            F.round("p", 6).alias("p"),
            "rank",
            "m",
            F.round(F.col("rank") / F.col("m") * alpha, 6).alias(
                "bh_crit"
            ),
            F.coalesce(F.col("rank") <= F.col("_k"), F.lit(False)).alias(
                "significant"
            ),
        )
    )
