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
