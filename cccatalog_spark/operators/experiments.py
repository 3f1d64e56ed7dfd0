"""Experiment (A/B) analysis with CUPED variance reduction (Deng,
Xu, Kohavi & Walker, WSDM'13) — the readout layer for online
experiments over event logs: per-unit pre-period covariates soak up
between-user variance so treatment effects resolve with far less
data.

CUPED: with Y the experiment-period metric and X the SAME unit's
pre-period metric (independent of assignment),

    theta   = cov(X, Y) / var(X)          (pooled, both variants)
    Y_cuped = Y - theta * (X - mean(X))

``E[Y_cuped]`` per variant is unbiased for ``E[Y]`` (the correction
term has zero mean by construction) while its variance shrinks by the
squared X-Y correlation.

Scale shape: one groupBy(unit) builds the per-unit (X, Y) frame from
the raw events; theta/mean(X)/var ratios are ONE global aggregate
producing a 1-row catalog (covar_pop/var_pop are map-side-combinable)
cross-broadcast back; the per-variant readout is one more aggregate.
No window over the corpus, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cuped_readout(
    units: DataFrame,
    variant_col: str,
    pre_col: str,
    metric_col: str,
) -> DataFrame:
    """Per-variant CUPED readout over a per-unit frame: returns one
    row per variant with ``(variant, n_units, mean_raw, mean_cuped,
    var_raw, var_cuped, var_reduction)``, all floats rounded to 6.

    ``var_reduction`` is ``1 - var_cuped/var_raw`` pooled per variant
    — the fraction of metric variance the pre-period covariate
    removed (0 when X carries no signal; theta is 0-guarded when
    var(X) = 0)."""
    x = F.col(pre_col).cast("double")
    y = F.col(metric_col).cast("double")
    # scanned twice (theta estimation, then adjustment): persist so
    # whatever aggregation built the per-unit frame runs once
    units = units.persist()
    stats = units.agg(
        F.covar_pop(x, y).alias("_cov"),
        F.var_pop(x).alias("_varx"),
        F.avg(x).alias("_meanx"),
    ).select(
        F.when(
            F.col("_varx") > 0, F.col("_cov") / F.col("_varx")
        )
        .otherwise(F.lit(0.0))
        .alias("_theta"),
        "_meanx",
    )
    adj = units.crossJoin(F.broadcast(stats)).withColumn(
        "_ycuped", y - F.col("_theta") * (x - F.col("_meanx"))
    )
    return (
        adj.groupBy(F.col(variant_col).alias("variant"))
        .agg(
            F.count("*").alias("n_units"),
            F.round(F.avg(y), 6).alias("mean_raw"),
            F.round(F.avg("_ycuped"), 6).alias("mean_cuped"),
            F.round(F.var_pop(y), 6).alias("var_raw"),
            F.round(F.var_pop("_ycuped"), 6).alias("var_cuped"),
            F.round(
                F.when(
                    F.var_pop(y) > 0,
                    1.0 - F.var_pop("_ycuped") / F.var_pop(y),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("var_reduction"),
        )
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Mann-Whitney U / Wilcoxon rank-sum: the nonparametric "did
    provider A's quality distribution shift vs provider B's?" test —
    the right tool when doc-length/quality metrics are heavy-tailed
    and a t-test's mean is meaningless. Mid-ranks for ties, the
    standard tie-corrected normal approximation:

        U_a  = R_a - n_a(n_a+1)/2
        z    = (U_a - n_a n_b/2) / sigma,
        sigma = sqrt(n_a n_b/12 * ((n+1) - sum(t^3-t)/(n(n-1))))

    Returns one row ``(n_a, n_b, u_a, z)`` (U with .5 precision from
    mid-ranks; z rounded 6; z NULL when every value ties).

    Scale shape: ranks are NOT computed per row — values collapse to
    a per-distinct-value count frame first (one corpus aggregate),
    and the rank cumsum window runs over the DISTINCT-value catalog
    (bounded by value cardinality, like the quantile grid). The
    corpus is touched once.
    """
    x = F.col(value_col).cast("double")
    g = F.col(group_col)
    # null values carry no rank and engines disagree on null ordering
    pool = df.where(g.isin([group_a, group_b]) & x.isNotNull()).select(
        x.alias("x"),
        F.when(g == group_a, 1).otherwise(0).alias("is_a"),
    )
    v = pool.groupBy("x").agg(
        F.sum("is_a").cast("double").alias("ca"),
        F.sum(1 - F.col("is_a")).cast("double").alias("cb"),
    )
    w = Window.orderBy("x")
    t = F.col("ca") + F.col("cb")
    ranked = v.select(
        "ca",
        t.alias("t"),
        # mid-rank of this value's block: rows before it + (t+1)/2
        (
            F.coalesce(F.sum(t).over(w), F.lit(0.0))
            - t
            + (t + 1) / 2
        ).alias("mid_rank"),
    )
    agg = ranked.agg(
        F.sum("ca").alias("na"),
        F.sum(F.col("t") - F.col("ca")).alias("nb"),
        F.sum(F.col("ca") * F.col("mid_rank")).alias("ra"),
        F.sum(F.pow(F.col("t"), 3) - F.col("t")).alias("ties"),
    )
    n = F.col("na") + F.col("nb")
    u_a = F.col("ra") - F.col("na") * (F.col("na") + 1) / 2
    sigma = F.sqrt(
        F.col("na") * F.col("nb") / 12.0
        * ((n + 1) - F.col("ties") / (n * (n - 1)))
    )
    return agg.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(u_a, 2).alias("u_a"),
        F.round(
            F.when(
                sigma > 0,
                (u_a - F.col("na") * F.col("nb") / 2) / sigma,
            ),
            6,
        ).alias("z"),
    )
