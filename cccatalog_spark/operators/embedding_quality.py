"""Embedding-column quality audits — the checks an embedding pipeline
runs before anything downstream (ANN indexing, SemDeDup, clustering)
is allowed to trust the vectors:

- :func:`embedding_health`: structural audit (nulls, dimension
  mismatches, non-finite elements, zero vectors, norm spread) — the
  constraint-suite (q346) analogue for ``array<float>`` columns.
- :func:`class_separability`: per-dimension Fisher discriminant ratio
  between/within labeled groups — "does this embedding space actually
  separate my labels?", the one-pass screen before training a probe.

Scale shape: ``embedding_health`` is ONE aggregate pass (all metrics
fold per-row expressions — array folds run element-order-fixed, so
results are engine-deterministic). ``class_separability`` melts
(n × d) once via posexplode into a (label, dim)-keyed aggregate
(map-side combinable), then folds over the |labels|·d catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_health(
    df: DataFrame, vec_col: str, expect_dim: int
) -> DataFrame:
    """ONE row: ``(n, n_null, n_wrong_dim, n_nonfinite, n_zero,
    mean_norm, min_norm, max_norm)``."""
    v = F.col(vec_col)
    sumsq = F.aggregate(
        F.transform(v, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nonfinite = F.exists(
        v,
        lambda x: F.isnan(x.cast("double"))
        | (F.abs(x.cast("double")) > F.lit(1e308)),
    )
    ok = v.isNotNull() & (F.size(v) == int(expect_dim)) & ~nonfinite
    norm = F.sqrt(sumsq)
    return df.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(v.isNull().cast("long")).cast("long").alias("n_null"),
        F.sum(
            (v.isNotNull() & (F.size(v) != int(expect_dim))).cast(
                "long"
            )
        )
        .cast("long")
        .alias("n_wrong_dim"),
        F.sum((v.isNotNull() & nonfinite).cast("long"))
        .cast("long")
        .alias("n_nonfinite"),
        F.sum((ok & (sumsq == 0.0)).cast("long"))
        .cast("long")
        .alias("n_zero"),
        F.round(F.avg(F.when(ok, norm)), 6).alias("mean_norm"),
        F.round(F.min(F.when(ok, norm)), 6).alias("min_norm"),
        F.round(F.max(F.when(ok, norm)), 6).alias("max_norm"),
    )


def class_separability(
    df: DataFrame, vec_col: str, label_col: str
) -> DataFrame:
    """Per-dimension Fisher discriminant ratio over labeled vectors:

        S_b(d) = Σ_c (n_c/n)·(μ_cd − μ_d)²     (between-class)
        S_w(d) = Σ_c (n_c/n)·σ²_cd              (pooled within-class)
        fisher = S_b / S_w

    Returns one row per dimension ``(dim, s_between, s_within,
    fisher)`` — dimensions with fisher ≈ 0 carry no label signal
    (candidates for Matryoshka truncation, cf. q261)."""
    melted = df.select(
        F.col(label_col).alias("_c"),
        F.posexplode(F.col(vec_col)).alias("dim", "_x"),
    ).select("_c", "dim", F.col("_x").cast("double").alias("x"))
    per = melted.groupBy("_c", "dim").agg(
        F.count("*").alias("nc"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
    )
    mean_c = F.col("s") / F.col("nc")
    agg = per.groupBy("dim").agg(
        F.sum("nc").alias("n"),
        F.sum("s").alias("gs"),
        F.sum(F.col("ss") - F.col("s") * mean_c).alias("_wss"),
        F.sum(F.col("nc") * mean_c * mean_c).alias("_bss"),
    )
    n = F.col("n").cast("double")
    grand = F.col("gs") / n
    sb = (F.col("_bss") - F.col("n") * grand * grand) / n
    sw = F.col("_wss") / n
    return agg.select(
        "dim",
        F.round(sb, 6).alias("s_between"),
        F.round(sw, 6).alias("s_within"),
        F.round(F.when(sw > 0, sb / sw), 6).alias("fisher"),
    ).orderBy("dim")


def alignment_uniformity(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Alignment & uniformity of an embedding space (Wang & Isola,
    ICML 2020): the two-number health check for contrastive
    representations — positives should be close (alignment =
    E‖za−zb‖² over positive pairs, lower better) while the whole
    space should spread over the sphere (uniformity =
    log E exp(−2‖za−zb‖²) over random pairs, lower better).  A space
    collapsing to a point scores perfect alignment and catastrophic
    uniformity; this pairing is the standard way to see it before
    retrieval quality craters.

    Derandomized pair construction (no RNG, engine-reproducible):
    positive pairs are CONSECUTIVE same-label vectors (rank r joined
    to r+1 within each label — |n|−|labels| pairs, one shuffle keyed
    by label); "random" pairs for uniformity are consecutive ids
    (vec_id joined to vec_id+1 — an equi-join, NO global window, id
    order is independent of the space geometry so it is an unbiased
    pair sample).  Distances are sequential-order list folds, the
    q78 list_sum contract, so both engines agree bitwise.

    Returns ONE row: ``(n_pos_pairs, alignment, n_unif_pairs,
    uniformity)``, rounded to 6.
    """
    from pyspark.sql.window import Window

    def d2(a, b):
        return F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.col(label_col).alias("_l"),
    )
    w = Window.partitionBy("_l").orderBy("_id")
    ranked = base.withColumn("_r", F.row_number().over(w))
    a = ranked.select("_l", "_r", F.col("_v").alias("_va"))
    b = ranked.select(
        "_l", (F.col("_r") - 1).alias("_r"), F.col("_v").alias("_vb")
    )
    pos = a.join(b, ["_l", "_r"]).select(
        d2(F.col("_va"), F.col("_vb")).alias("_d2")
    )
    align = pos.agg(
        F.count("*").alias("n_pos_pairs"),
        F.avg("_d2").alias("_align"),
    )
    ua = base.select(F.col("_id"), F.col("_v").alias("_va"))
    ub = base.select((F.col("_id") - 1).alias("_id"), F.col("_v").alias("_vb"))
    unif = (
        ua.join(ub, "_id")
        .select(d2(F.col("_va"), F.col("_vb")).alias("_d2"))
        .agg(
            F.count("*").alias("n_unif_pairs"),
            F.log(F.avg(F.exp(F.lit(-2.0) * F.col("_d2")))).alias(
                "_unif"
            ),
        )
    )
    return align.crossJoin(F.broadcast(unif)).select(
        F.col("n_pos_pairs").cast("bigint"),
        F.round("_align", 6).alias("alignment"),
        F.col("n_unif_pairs").cast("bigint"),
        F.round("_unif", 6).alias("uniformity"),
    )


def mmd_linear(
    df: DataFrame,
    vec_col: str,
    group_col: str,
    group_a,
    group_b,
    dim: int,
) -> DataFrame:
    """Linear-kernel Maximum Mean Discrepancy between two embedding
    groups (Gretton et al. JMLR'12, the linear special case): with the
    identity feature map, MMD² = ‖μ_a − μ_b‖² — the two-sample shift
    test for representation space ("did the new crawl move the
    embedding distribution"), the multivariate sibling of q235's PSI.

    Returns one row: ``(n_a, n_b, mmd2, mmd)``.

    Scale shape: ONE aggregate — per-dimension conditional sums via
    ``F.aggregate`` would be per-row loops, so the vector is unnested
    by posexplode into (dim, value) keys: one shuffle of 2·d keys,
    map-side combined. No pairwise kernel matrix exists at any point.
    """
    tagged = df.where(F.col(group_col).isin(group_a, group_b)).select(
        (F.col(group_col) == group_a).alias("_is_a"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "_i", "_v"
        ),
    )
    per_dim = tagged.groupBy("_i").agg(
        F.sum(F.when(F.col("_is_a"), F.col("_v"))).alias("sa"),
        F.sum(F.when(~F.col("_is_a"), F.col("_v"))).alias("sb"),
        F.sum(F.col("_is_a").cast("long")).alias("na"),
        F.sum((~F.col("_is_a")).cast("long")).alias("nb"),
    )
    return per_dim.agg(
        (F.sum("na") / F.lit(dim)).cast("long").alias("n_a"),
        (F.sum("nb") / F.lit(dim)).cast("long").alias("n_b"),
        F.round(
            F.sum(
                F.pow(
                    F.col("sa") / F.col("na") - F.col("sb") / F.col("nb"),
                    2,
                )
            ),
            6,
        ).alias("mmd2"),
        F.round(
            F.sqrt(
                F.sum(
                    F.pow(
                        F.col("sa") / F.col("na")
                        - F.col("sb") / F.col("nb"),
                        2,
                    )
                )
            ),
            6,
        ).alias("mmd"),
    )
