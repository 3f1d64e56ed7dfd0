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

import math

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


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan–Meier product-limit survival estimator (KM 1958) with
    right censoring — retention/churn curves, crawl-liveness decay,
    label-shelf-life studies: one row per subject with ``duration``
    (time observed) and ``event`` (1 = event occurred, 0 = censored).

        S(t) = Π_{t_i ≤ t} (1 − d_i / n_i)

    with d_i events at time t_i and n_i subjects still at risk
    (duration ≥ t_i).  Returns one row per distinct EVENT time:
    ``(t, n_risk, n_events, survival)``.

    The product is exp(Σ ln(1 − d/n)) so both engines fold identical
    doubles in identical t-order; the d = n endpoint (everyone at risk
    dies) short-circuits to exactly 0 via a cumulative flag instead of
    ln(0).

    Scale shape: subjects collapse to per-duration (events, total)
    counts in ONE aggregate; at-risk counts are a reverse cumulative
    sum and the survival fold a forward one, both windows over the
    DISTINCT-DURATION catalog (value-domain-bounded — the q256/q266
    rank-statistics sanction), never the subject table.
    """
    per_t = df.groupBy(
        F.col(duration_col).cast("long").alias("t")
    ).agg(
        F.count("*").alias("_total"),
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
    )
    w_all = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    at_risk = per_t.withColumn("n_risk", F.sum("_total").over(w_all))
    w_fwd = Window.orderBy(F.asc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dn = F.col("n_events") / F.col("n_risk").cast("double")
    ln_term = F.when(
        F.col("n_events") > 0,
        F.when(dn < 1.0, F.log(F.lit(1.0) - dn)).otherwise(F.lit(0.0)),
    ).otherwise(F.lit(0.0))
    dead_end = F.max((dn >= 1.0).cast("int")).over(w_fwd)
    surv = F.when(
        dead_end == 1, F.lit(0.0)
    ).otherwise(F.exp(F.sum(ln_term).over(w_fwd)))
    return (
        at_risk.withColumn("survival", F.round(surv, 6))
        .where(F.col("n_events") > 0)
        .select("t", "n_risk", "n_events", "survival")
    )


def poisson1_cdf_literals() -> list[float]:
    """Poisson(1) CDF thresholds, folded Python-side so the Spark
    expression and the SQL oracle compare against identical double
    literals. Truncated at 6 (P(X>6) ~ 8e-5; bias immaterial for a
    bootstrap weight)."""
    e = math.exp(-1.0)
    out, acc, fact = [], 0.0, 1.0
    for k in range(6):
        fact *= max(k, 1)
        acc += e / fact
        out.append(acc)
    return out


def _poisson1_weight(u):  # u: Column in (0,1)
    """Poisson(1) draw by inverse CDF over the SAME literals the
    oracle embeds (single source: poisson1_cdf_literals)."""
    w = F.lit(0)
    for c in poisson1_cdf_literals():
        w = w + F.when(u >= F.lit(c), 1).otherwise(0)
    return w


def poisson_bootstrap_ci(
    df: DataFrame,
    id_col: str,
    value_col: str,
    b: int = 50,
    alpha: float = 0.05,
    salt: str = "boot:",
) -> DataFrame:
    """Percentile bootstrap CI for the mean in ONE corpus pass — the
    Poisson bootstrap (Chamandy et al., Google 2012 "Estimating
    uncertainty for massive data streams"): instead of resampling n
    rows with replacement (impossible distributed — you'd need n
    global draws per replica), each row independently receives a
    Poisson(1) weight per replica, which converges to multinomial
    resampling as n grows. ``b`` replicas ride along as an exploded
    replica axis; weights are md5-derandomized (deterministic,
    repartition-stable, SQL-replayable).

    Returns one row ``(point, ci_lo, ci_hi, b, n)``: the full-sample
    mean and the percentile interval over replica means (lower =
    ceil(alpha/2·b)-th smallest, upper = ceil((1-alpha/2)·b)-th).
    Floats rounded 6.

    Precondition: ``id_col`` values should be unique — duplicate ids
    draw IDENTICAL weights in every replica (correlated resampling,
    which silently narrows the interval). Null ids and null values
    are excluded from both the point estimate and the replicas.

    Scale shape: corpus touched once, fanned out x b (constant);
    replica means are ONE map-side-combinable aggregate to a b-row
    catalog; the rank selection windows over those b rows only.
    """
    if not 0 < alpha < 1:
        raise ValueError("alpha must be in (0, 1)")
    from cccatalog_spark.operators.sampling import md5_u01

    x = F.col(value_col).cast("double")
    # a null id would null its md5 draw, giving the row permanent
    # weight 0 in every replica while still counting in the point
    # estimate — exclude it from both
    base = df.where(
        x.isNotNull() & F.col(id_col).isNotNull()
    ).select(F.col(id_col).alias("_id"), x.alias("_x"))
    reps = base.select(
        "_id", "_x",
        F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("rep"),
    )
    u = md5_u01(
        F.concat(
            F.col("rep").cast("string"),
            F.lit(":"),
            F.col("_id").cast("string"),
        ),
        salt,
    )
    w = _poisson1_weight(u).cast("double")
    rm = (
        reps.select("rep", "_x", w.alias("w"))
        .groupBy("rep")
        .agg((F.sum(F.col("w") * F.col("_x")) / F.sum("w")).alias("m"))
        # a replica whose every weight drew 0 (possible only at tiny n)
        # has no mean; drop it rather than rank a null
        .where(F.col("m").isNotNull())
    )
    lo_rank = math.ceil(alpha / 2 * b)
    hi_rank = math.ceil((1 - alpha / 2) * b)
    ranked = rm.select(
        "m", F.row_number().over(Window.orderBy("m")).alias("r")
    )
    bounds = ranked.agg(
        F.min(F.when(F.col("r") == lo_rank, F.col("m"))).alias("_lo"),
        F.min(F.when(F.col("r") == hi_rank, F.col("m"))).alias("_hi"),
    )
    point = base.agg(
        F.avg("_x").alias("_pt"), F.count("*").alias("_n")
    )
    return point.crossJoin(F.broadcast(bounds)).select(
        F.round("_pt", 6).alias("point"),
        F.round("_lo", 6).alias("ci_lo"),
        F.round("_hi", 6).alias("ci_hi"),
        F.lit(b).alias("b"),
        F.col("_n").cast("long").alias("n"),
    )


def ks_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test — the distribution-shift
    detector that reads the WHOLE CDF (PSI reads bins, EMD integrates,
    KS takes the sup): D = max |F_a − F_b| with the standard
    asymptotic p-value

        p = 2 Σ_{j≥1} (−1)^{j−1} exp(−2 j² λ²),   truncated at j = 5,
        λ = (√n_e + 0.12 + 0.11/√n_e) · D,  n_e = n_a n_b/(n_a+n_b)

    (Numerical-Recipes form; the 5-term truncation is exact to far
    beyond 6 decimals for any λ worth reporting).

    Returns one row ``(n_a, n_b, d_stat, p_value)``.

    Scale shape: the ``mann_whitney_u`` discipline — values collapse
    to per-distinct-value counts in ONE corpus aggregate; the CDFs
    and their sup-gap run over the distinct-value catalog.
    """
    x = F.col(value_col).cast("double")
    g = F.col(group_col)
    pool = df.where(g.isin([group_a, group_b]) & x.isNotNull()).select(
        x.alias("x"),
        F.when(g == group_a, 1).otherwise(0).alias("is_a"),
    )
    v = pool.groupBy("x").agg(
        F.sum("is_a").cast("double").alias("ca"),
        F.sum(1 - F.col("is_a")).cast("double").alias("cb"),
    )
    w = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = v.select(
        F.sum("ca").over(w).alias("_cca"),
        F.sum("cb").over(w).alias("_ccb"),
    )
    totals = pool.agg(
        F.sum("is_a").cast("double").alias("na"),
        F.sum(1 - F.col("is_a")).cast("double").alias("nb"),
    )
    agg = (
        c.crossJoin(F.broadcast(totals))
        .agg(
            F.max("na").alias("na"),
            F.max("nb").alias("nb"),
            F.max(
                F.abs(
                    F.col("_cca") / F.col("na")
                    - F.col("_ccb") / F.col("nb")
                )
            ).alias("d"),
        )
    )
    ne = F.col("na") * F.col("nb") / (F.col("na") + F.col("nb"))
    lam = (
        F.sqrt(ne) + F.lit(0.12) + F.lit(0.11) / F.sqrt(ne)
    ) * F.col("d")
    p = sum(
        (
            F.lit(2.0 * (1 if j % 2 == 1 else -1))
            * F.exp(F.lit(-2.0 * j * j) * lam * lam)
            for j in range(1, 6)
        ),
        F.lit(0.0),
    )
    return agg.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round("d", 6).alias("d_stat"),
        F.round(F.least(F.greatest(p, F.lit(0.0)), F.lit(1.0)), 6)
        .alias("p_value"),
    )


def effect_sizes(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Standardized effect sizes between two groups — the "is the
    shift big enough to CARE about" companion to the p-value family
    (q256/q296): Cohen's d (pooled-variance mean gap), Hedges' g
    (small-sample-corrected d), and Cliff's delta
    (P(a > b) − P(a < b) — the ordinal, outlier-immune one).

    Returns one row ``(n_a, n_b, cohens_d, hedges_g, cliffs_delta)``;
    d/g null when the pooled variance is 0.

    Scale shape: moments come from ONE corpus aggregate (explicit
    Σx/Σx² algebra, engine-replayable); Cliff's delta from the
    distinct-value count catalog with one cumsum window — the
    pairwise definition without the pairwise join.
    """
    x = F.col(value_col).cast("double")
    g = F.col(group_col)
    pool = df.where(g.isin([group_a, group_b]) & x.isNotNull()).select(
        x.alias("x"),
        F.when(g == group_a, 1).otherwise(0).alias("is_a"),
    )
    v = pool.groupBy("x").agg(
        F.sum("is_a").cast("double").alias("ca"),
        F.sum(1 - F.col("is_a")).cast("double").alias("cb"),
    )
    w = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = v.select(
        "x",
        "ca",
        "cb",
        (F.sum("cb").over(w) - F.col("cb")).alias("_b_less"),
        (F.sum("cb").over(tot) - F.sum("cb").over(w)).alias("_b_greater"),
    )
    stats = pool.agg(
        F.sum("is_a").cast("double").alias("na"),
        F.sum(1 - F.col("is_a")).cast("double").alias("nb"),
        F.sum(F.col("x") * F.col("is_a")).alias("sa"),
        F.sum(F.col("x") * (1 - F.col("is_a"))).alias("sb"),
        F.sum(F.col("x") * F.col("x") * F.col("is_a")).alias("qa"),
        F.sum(F.col("x") * F.col("x") * (1 - F.col("is_a"))).alias("qb"),
    )
    delta = c.agg(
        F.sum(
            F.col("ca") * (F.col("_b_less") - F.col("_b_greater"))
        ).alias("_dnum")
    )
    t = stats.crossJoin(F.broadcast(delta))
    ma = F.col("sa") / F.col("na")
    mb = F.col("sb") / F.col("nb")
    va = (F.col("qa") - F.col("sa") * F.col("sa") / F.col("na")) / (
        F.col("na") - 1
    )
    vb = (F.col("qb") - F.col("sb") * F.col("sb") / F.col("nb")) / (
        F.col("nb") - 1
    )
    sp = F.sqrt(
        ((F.col("na") - 1) * va + (F.col("nb") - 1) * vb)
        / (F.col("na") + F.col("nb") - 2)
    )
    d = F.when(sp > 0, (ma - mb) / sp)
    corr = F.lit(1.0) - F.lit(3.0) / (
        F.lit(4.0) * (F.col("na") + F.col("nb")) - F.lit(9.0)
    )
    return t.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(d, 6).alias("cohens_d"),
        F.round(d * corr, 6).alias("hedges_g"),
        F.round(
            F.col("_dnum") / (F.col("na") * F.col("nb")), 6
        ).alias("cliffs_delta"),
    )


def srm_check(
    assigned: DataFrame,
    split_col: str,
    expected: dict[str, float],
    *,
    alpha: float = 0.001,
) -> DataFrame:
    """Sample-ratio mismatch guardrail (the first thing any experiment
    readout must check): chi-square goodness-of-fit of observed split
    counts against the design weights.  A significant SRM means the
    assignment or logging pipeline is broken and every downstream
    metric is garbage — the test that invalidates experiments before
    anyone reads them.

    df = |splits| − 1 must be EVEN for the closed-form p
    (operators/fdr.chi2_sf_even_df — no incomplete-gamma numerics);
    the train/val/test 3-way split gives df = 2.

    Returns one row ``(n, chi2, p_value, srm)``.

    Scale: one count aggregate over the split catalog + a 1-row fold.
    """
    from cccatalog_spark.operators.fdr import chi2_sf_even_df

    if (len(expected) - 1) % 2 != 0:
        raise ValueError("need an odd split count (even df) for the "
                         "closed-form p-value")
    obs = assigned.groupBy(split_col).agg(F.count("*").alias("_o"))
    tot = obs.agg(F.sum("_o").cast("double").alias("_n"))
    wmap = None
    for name, wgt in sorted(expected.items()):
        cond = F.col(split_col) == name
        wmap = (
            F.when(cond, F.lit(float(wgt)))
            if wmap is None
            else wmap.when(cond, F.lit(float(wgt)))
        )
    t = obs.crossJoin(F.broadcast(tot)).withColumn(
        "_e", wmap * F.col("_n")
    )
    chi2 = F.sum(
        (F.col("_o") - F.col("_e"))
        * (F.col("_o") - F.col("_e"))
        / F.col("_e")
    )
    agg = t.agg(
        F.max("_n").cast("long").alias("n"), chi2.alias("_chi2")
    )
    p = chi2_sf_even_df(F.col("_chi2"), len(expected) - 1)
    return agg.select(
        "n",
        F.round("_chi2", 6).alias("chi2"),
        F.round(p, 6).alias("p_value"),
        (p < F.lit(alpha)).alias("srm"),
    )

def jackknife_ratio(
    df: DataFrame,
    group_col: str,
    num_col: str,
    den_col: str,
) -> DataFrame:
    """Leave-one-out jackknife standard error of a RATIO-OF-SUMS
    metric per group (Tukey 1958; the delete-1 jackknife every
    experimentation platform uses for ratio metrics, where the naive
    i.i.d. variance formula is biased because numerator and
    denominator share units):

        R       = Σy / Σx
        R_(i)   = (Σy - y_i) / (Σx - x_i)      (closed form — no
                                                 n recomputations)
        se²_jk  = (n-1)/n · Σ_i (R_(i) - mean(R_(i)))²

    Returns one row per group: ``(group, n, ratio, se_jack,
    ci_lo, ci_hi)`` with the normal-approximation 95% interval,
    floats rounded 6. Rows with null num/den are excluded; a group
    where some Σx - x_i = 0 yields null se (the estimator is
    undefined there).

    Scale shape: one groupBy for the per-group sums (k-row catalog,
    broadcast back), then the LOO replicas are PURE COLUMN ALGEBRA on
    the original rows — the closed form is what makes delete-1
    feasible at 100 TB — and one final per-group moment aggregate.
    Two shuffles total, both keyed by the group.
    """
    y = F.col(num_col).cast("double")
    x = F.col(den_col).cast("double")
    base = df.where(y.isNotNull() & x.isNotNull()).select(
        F.col(group_col).alias("group"), y.alias("_y"), x.alias("_x")
    )
    sums = base.groupBy("group").agg(
        F.sum("_y").alias("_sy"),
        F.sum("_x").alias("_sx"),
        F.count("*").alias("n"),
    )
    loo = base.join(F.broadcast(sums), "group").select(
        "group",
        "n",
        "_sy",
        "_sx",
        F.when(
            F.col("_sx") - F.col("_x") != 0,
            (F.col("_sy") - F.col("_y")) / (F.col("_sx") - F.col("_x")),
        ).alias("_r"),
    )
    agg = loo.groupBy("group", "n", "_sy", "_sx").agg(
        F.var_pop("_r").alias("_vr"),
        F.count("_r").alias("_nr"),
    )
    ratio = F.when(F.col("_sx") != 0, F.col("_sy") / F.col("_sx"))
    se = F.when(
        (F.col("_nr") == F.col("n")) & (F.col("n") > 1),
        F.sqrt((F.col("n") - 1) * F.col("_vr")),
    )
    return agg.select(
        "group",
        "n",
        F.round(ratio, 6).alias("ratio"),
        F.round(se, 6).alias("se_jack"),
        F.round(ratio - 1.959963984540054 * se, 6).alias("ci_lo"),
        F.round(ratio + 1.959963984540054 * se, 6).alias("ci_hi"),
    )


def permutation_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    k: int = 200,
    salt: str = "perm:",
    id_col: str | None = None,
) -> DataFrame:
    """Randomization test for the difference in means between two
    groups (Fisher 1935, in the approximate Monte-Carlo form of
    Dwass 1957): under H₀ labels are exchangeable, so re-draw the
    label assignment ``k`` times and count how often the permuted
    |mean_A − mean_B| reaches the observed one.

    Labels are re-drawn i.i.d. with P(A) = n_a/n per replica —
    md5-derandomized from (replica ‖ unit id), so deterministic,
    repartition-stable and SQL-replayable (the same binomial
    relaxation of exact permutation as the Poisson bootstrap above is
    of multinomial resampling). p uses the standard add-one form
    (1 + #{≥}) / (k + 1), which keeps p > 0 and is exact-valid.

    Returns one row: ``(n_a, n_b, observed_diff, k, p_value)``,
    floats rounded 6.

    Scale shape: one 1-row aggregate for the observed stat and group
    sizes; replicas ride an exploded constant-``k`` axis into ONE
    map-side-combinable (replica, label) aggregate → a 2k-row
    catalog; the comparison is a k-row aggregate. The corpus is
    scanned twice (observed + replicas), never joined to itself.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from cccatalog_spark.operators.sampling import md5_u01

    x = F.col(value_col).cast("double")
    uid = F.col(id_col) if id_col else x
    base = df.where(
        x.isNotNull() & F.col(group_col).isin([group_a, group_b])
    ).select(
        (F.col(group_col) == group_a).alias("_ia"),
        x.alias("_x"),
        uid.cast("string").alias("_id"),
    )
    base = base.persist()
    obs = base.agg(
        F.sum(F.col("_ia").cast("long")).alias("n_a"),
        F.sum((~F.col("_ia")).cast("long")).alias("n_b"),
        F.abs(
            F.avg(F.when(F.col("_ia"), F.col("_x")))
            - F.avg(F.when(~F.col("_ia"), F.col("_x")))
        ).alias("_d_obs"),
    )
    reps = base.crossJoin(F.broadcast(obs)).select(
        "_x",
        "n_a",
        "n_b",
        "_d_obs",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_rep"),
        F.col("_id"),
    )
    u = md5_u01(
        F.concat(F.col("_rep").cast("string"), F.lit(":"), F.col("_id")),
        salt,
    )
    pa = F.col("n_a") / (F.col("n_a") + F.col("n_b"))
    perm = (
        reps.select(
            "_rep", "_x", "_d_obs", (u < pa).alias("_pa")
        )
        .groupBy("_rep", "_d_obs")
        .agg(
            F.abs(
                F.avg(F.when(F.col("_pa"), F.col("_x")))
                - F.avg(F.when(~F.col("_pa"), F.col("_x")))
            ).alias("_d")
        )
    )
    hits = perm.agg(
        F.max("_d_obs").alias("_d_obs"),
        F.sum(
            # a degenerate replica (all rows one side) has null _d:
            # count it as extreme, the conservative direction
            F.when(
                F.col("_d").isNull() | (F.col("_d") >= F.col("_d_obs")),
                1,
            ).otherwise(0)
        ).alias("_ge"),
    )
    return obs.crossJoin(F.broadcast(hits.select("_ge"))).select(
        "n_a",
        "n_b",
        F.round("_d_obs", 6).alias("observed_diff"),
        F.lit(k).alias("k"),
        F.round((1 + F.col("_ge")) / F.lit(float(k + 1)), 6).alias(
            "p_value"
        ),
    )

def capture_recapture(
    df: DataFrame,
    id_col: str,
    p1: float = 0.3,
    p2: float = 0.3,
    salt1: str = "cap1:",
    salt2: str = "cap2:",
) -> DataFrame:
    """Chapman capture-recapture population estimate (Chapman 1951;
    Lincoln-Petersen's bias-corrected form): draw two INDEPENDENT
    md5-derandomized samples and infer the total from their overlap,

        N̂  = (n1+1)(n2+1)/(m+1) − 1
        se = sqrt((n1+1)(n2+1)(n1−m)(n2−m) / ((m+1)²(m+2)))

    — the estimator for "how big is the population we can only
    sample" (dedup-cluster count from two crawl slices, total-domain
    estimates from two index probes). Here the frame IS enumerable,
    which is exactly what makes the estimator oracle-checkable: the
    estimate can be compared to the known truth.

    Returns one row ``(n1, n2, overlap, n_hat, se)``, rounded 6.

    Scale shape: one pass computes both membership flags as column
    algebra (two md5 draws per row) and ONE aggregate counts
    n1/n2/m. Nothing else.
    """
    if not (0 < p1 <= 1 and 0 < p2 <= 1):
        raise ValueError("sampling rates must be in (0, 1]")
    from cccatalog_spark.operators.sampling import md5_u01

    key = F.col(id_col).cast("string")
    in1 = md5_u01(key, salt1) < p1
    in2 = md5_u01(key, salt2) < p2
    agg = df.where(F.col(id_col).isNotNull()).agg(
        F.sum(in1.cast("long")).alias("n1"),
        F.sum(in2.cast("long")).alias("n2"),
        F.sum((in1 & in2).cast("long")).alias("m"),
    )
    n1, n2, m = F.col("n1"), F.col("n2"), F.col("m")
    n_hat = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    var = (
        (n1 + 1).cast("double")
        * (n2 + 1)
        * (n1 - m)
        * (n2 - m)
        / ((m + 1) * (m + 1) * (m + 2))
    )
    return agg.select(
        n1.cast("long").alias("n1"),
        n2.cast("long").alias("n2"),
        m.cast("long").alias("overlap"),
        F.round(n_hat, 6).alias("n_hat"),
        F.round(F.sqrt(var), 6).alias("se"),
    )


def shift_share_decomposition(
    df: DataFrame,
    group_col: str,
    period_col: str,
    value_col: str,
) -> DataFrame:
    """Mix-vs-rate decomposition of a metric change between two
    periods (the shift-share / Oaxaca-style identity every metrics
    review reaches for when "the average moved" needs a WHY):

        Δ = Σ_g (s_B − s_A)·r_A     (mix: composition shifted)
          + Σ_g s_A·(r_B − r_A)     (rate: within-group change)
          + Σ_g Δs·Δr               (interaction)

    with s = group's row share of its period, r = group mean of the
    value. ``period_col`` must be boolean (false = period A / true =
    period B). Returns one row per group with its contributions plus
    the shares/rates: ``(group, share_a, share_b, rate_a, rate_b,
    mix_effect, rate_effect, interaction)``, rounded 6; groups
    missing from a period carry share 0 and rate 0 in it (their
    whole contribution is then genuinely mix).

    Scale shape: ONE (group, period) aggregate collapses the corpus;
    period totals broadcast back; the identity is catalog algebra.
    """
    v = F.col(value_col).cast("double")
    per = df.where(v.isNotNull()).groupBy(
        F.col(group_col).alias("group"),
        F.col(period_col).cast("boolean").alias("_b"),
    ).agg(F.count("*").alias("_n"), F.sum(v).alias("_s"))
    tot = per.groupBy("_b").agg(F.sum("_n").alias("_t"))
    j = per.join(F.broadcast(tot), "_b")
    wide = j.groupBy("group").agg(
        F.coalesce(
            F.max(F.when(~F.col("_b"), F.col("_n") / F.col("_t"))),
            F.lit(0.0),
        ).alias("share_a"),
        F.coalesce(
            F.max(F.when(F.col("_b"), F.col("_n") / F.col("_t"))),
            F.lit(0.0),
        ).alias("share_b"),
        F.coalesce(
            F.max(F.when(~F.col("_b"), F.col("_s") / F.col("_n"))),
            F.lit(0.0),
        ).alias("rate_a"),
        F.coalesce(
            F.max(F.when(F.col("_b"), F.col("_s") / F.col("_n"))),
            F.lit(0.0),
        ).alias("rate_b"),
    )
    ds = F.col("share_b") - F.col("share_a")
    dr = F.col("rate_b") - F.col("rate_a")
    return wide.select(
        "group",
        F.round("share_a", 6).alias("share_a"),
        F.round("share_b", 6).alias("share_b"),
        F.round("rate_a", 6).alias("rate_a"),
        F.round("rate_b", 6).alias("rate_b"),
        F.round(ds * F.col("rate_a"), 6).alias("mix_effect"),
        F.round(F.col("share_a") * dr, 6).alias("rate_effect"),
        F.round(ds * dr, 6).alias("interaction"),
    )

def always_valid_pvalue(
    df: DataFrame,
    group_col: str,
    time_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    tau: float = 1.0,
) -> DataFrame:
    """Always-valid (anytime) p-value sequence by mixture SPRT
    (Johari, Koomen, Pekelis & Walsh, KDD'17 — the "peeking-safe"
    experiment monitor): per period, the running two-sample mean gap
    is scored by the Gaussian-mixture likelihood ratio

        Λ = sqrt(se²/(se²+τ²)) · exp(δ² τ² / (2 se² (se²+τ²)))
        p_t = min_{s ≤ t} min(1, 1/Λ_s)

    which keeps P(∃t: p_t ≤ α | H₀) ≤ α under ANY stopping rule —
    fixed-horizon p-values (q304) are invalid the moment a dashboard
    is watched daily; this is the one that isn't.

    Returns one row per period with cumulative
    ``(t, n_a, n_b, delta, lam, p_always)`` (needs ≥ 2 obs per side
    and se > 0 — earlier periods carry lam null / p 1.0). Floats
    rounded 6.

    Scale shape: ONE (period, group) aggregate collapses the corpus;
    cumulative sums, the Λ algebra, and the running min are windows
    over the period CATALOG. Nothing corpus-wide after the first
    groupBy.
    """
    from pyspark.sql.window import Window

    x = F.col(value_col).cast("double")
    base = df.where(
        x.isNotNull() & F.col(group_col).isin([group_a, group_b])
    ).select(
        F.col(time_col).cast("long").alias("_t"),
        (F.col(group_col) == group_a).alias("_ia"),
        x.alias("_x"),
    )
    per = base.groupBy("_t").agg(
        F.sum(F.col("_ia").cast("long")).alias("_na"),
        F.sum((~F.col("_ia")).cast("long")).alias("_nb"),
        F.sum(F.when(F.col("_ia"), F.col("_x")).otherwise(0.0)).alias("_sa"),
        F.sum(F.when(~F.col("_ia"), F.col("_x")).otherwise(0.0)).alias("_sb"),
        F.sum(
            F.when(F.col("_ia"), F.col("_x") * F.col("_x")).otherwise(0.0)
        ).alias("_qa"),
        F.sum(
            F.when(~F.col("_ia"), F.col("_x") * F.col("_x")).otherwise(0.0)
        ).alias("_qb"),
    )
    w = Window.orderBy("_t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        "_t",
        F.sum("_na").over(w).alias("na"),
        F.sum("_nb").over(w).alias("nb"),
        F.sum("_sa").over(w).alias("sa"),
        F.sum("_sb").over(w).alias("sb"),
        F.sum("_qa").over(w).alias("qa"),
        F.sum("_qb").over(w).alias("qb"),
    )
    na, nb = F.col("na"), F.col("nb")
    delta = F.col("sa") / na - F.col("sb") / nb
    sig2 = (
        (F.col("qa") - F.col("sa") * F.col("sa") / na)
        + (F.col("qb") - F.col("sb") * F.col("sb") / nb)
    ) / (na + nb - 2)
    se2 = sig2 * (1.0 / na + 1.0 / nb)
    t2 = float(tau) * float(tau)
    lam = F.when(
        (na >= 2) & (nb >= 2) & (se2 > 0),
        F.sqrt(se2 / (se2 + t2))
        * F.exp(delta * delta * t2 / (2.0 * se2 * (se2 + t2))),
    )
    scored = cum.select(
        F.col("_t").alias("t"),
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        delta.alias("_d"),
        lam.alias("_lam"),
        F.least(
            F.coalesce(1.0 / lam, F.lit(1.0)), F.lit(1.0)
        ).alias("_p"),
    )
    wp = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return scored.select(
        "t",
        "n_a",
        "n_b",
        F.round("_d", 6).alias("delta"),
        F.round("_lam", 6).alias("lam"),
        F.round(F.min("_p").over(wp), 6).alias("p_always"),
    )


def quantile_treatment_effect(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    n_deciles: int = 9,
) -> DataFrame:
    """Quantile treatment effects (Lehmann/Doksum's quantile-shift
    view): ``QTE(p) = Q_B(p) − Q_A(p)`` at each decile — WHERE in the
    distribution a shift lives, which the mean gap (q297) averages
    away (tail-only effects, compressions, crossings). Exact disc
    quantiles (functions/popularity convention) from the
    distinct-value catalogs.

    Returns ``n_deciles`` rows ``(p, q_a, q_b, qte)``, rounded 6.

    Scale shape: one (group, value) catalog aggregate, ONE window
    over each group's catalog, and the decile picks are a
    grid×catalog aggregate (deciles × values — catalog-sized). No
    raw-row sort.
    """
    from pyspark.sql.window import Window

    x = F.col(value_col).cast("double")
    base = df.where(
        x.isNotNull() & F.col(group_col).isin([group_a, group_b])
    ).select((F.col(group_col) == group_a).alias("_ia"), x.alias("_v"))
    cat = base.groupBy("_ia", "_v").agg(F.count("*").alias("_c"))
    wc = (
        Window.partitionBy("_ia")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy("_ia")
    cum = cat.select(
        "_ia",
        "_v",
        F.sum("_c").over(wc).alias("_cum"),
        F.sum("_c").over(wg).alias("_n"),
    )
    spark = df.sparkSession
    probs = spark.createDataFrame(
        [(round((i + 1) / (n_deciles + 1), 6),) for i in range(n_deciles)],
        "p double",
    )
    g = cum.crossJoin(F.broadcast(probs))
    k = F.greatest(F.ceil(F.col("p") * F.col("_n")), F.lit(1))
    q = g.groupBy("p", "_ia").agg(
        F.min(F.when(F.col("_cum") >= k, F.col("_v"))).alias("_q")
    )
    wide = q.groupBy("p").agg(
        F.max(F.when(F.col("_ia"), F.col("_q"))).alias("q_a"),
        F.max(F.when(~F.col("_ia"), F.col("_q"))).alias("q_b"),
    )
    return wide.select(
        "p",
        F.round("q_a", 6).alias("q_a"),
        F.round("q_b", 6).alias("q_b"),
        F.round(F.col("q_b") - F.col("q_a"), 6).alias("qte"),
    )

def covariate_balance(
    df: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    covariates: list[str],
) -> DataFrame:
    """Covariate balance table via standardized mean differences
    (the |SMD| < 0.1 convention of Austin 2009) — the FIRST table of
    any observational comparison: are the two groups even comparable
    on their covariates, before reading a treatment effect into the
    gap?

        smd = (mean_a − mean_b) / sqrt((var_a + var_b)/2)

    (pooled-without-weighting form; var = sample variance). Returns
    one row per covariate: ``(covariate, n_a, n_b, mean_a, mean_b,
    smd, balanced)`` with ``balanced = |smd| < 0.1``, rounded 6.
    Boolean/integer covariates enter as 0/1 (the binary SMD).

    Scale shape: the covariates melt via ``stack`` into (covariate,
    group) rows — one corpus scan, one map-side-combinable moment
    aggregate per (covariate, group), a |covariates|×2 catalog out.
    """
    if not covariates:
        raise ValueError("covariates must be non-empty")
    pairs = ", ".join(
        f"'{c}', CAST({c} AS DOUBLE)" for c in covariates
    )
    melted = df.where(
        F.col(group_col).isin([group_a, group_b])
    ).selectExpr(
        f"{group_col} AS _g",
        f"stack({len(covariates)}, {pairs}) AS (_cov, _x)",
    ).where(F.col("_x").isNotNull())
    agg = melted.groupBy("_cov").agg(
        F.sum((F.col("_g") == group_a).cast("long")).alias("n_a"),
        F.sum((F.col("_g") == group_b).cast("long")).alias("n_b"),
        F.avg(F.when(F.col("_g") == group_a, F.col("_x"))).alias("_ma"),
        F.avg(F.when(F.col("_g") == group_b, F.col("_x"))).alias("_mb"),
        F.var_samp(
            F.when(F.col("_g") == group_a, F.col("_x"))
        ).alias("_va"),
        F.var_samp(
            F.when(F.col("_g") == group_b, F.col("_x"))
        ).alias("_vb"),
    )
    denom = F.sqrt((F.col("_va") + F.col("_vb")) / 2.0)
    smd = F.when(denom > 0, (F.col("_ma") - F.col("_mb")) / denom)
    return agg.select(
        F.col("_cov").alias("covariate"),
        "n_a",
        "n_b",
        F.round("_ma", 6).alias("mean_a"),
        F.round("_mb", 6).alias("mean_b"),
        F.round(smd, 6).alias("smd"),
        (F.abs(F.round(smd, 6)) < 0.1).alias("balanced"),
    )


def diff_in_diff(
    df: DataFrame,
    treated_col: str,
    post_col: str,
    value_col: str,
) -> DataFrame:
    """2×2 difference-in-differences (the canonical Card-Krueger
    design): the treated group's post-vs-pre change minus the
    control group's —

        DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre)

    with the independent-cell normal se ``sqrt(Σ var_cell/n_cell)``
    and its 95% interval. Identification rests on parallel trends —
    this computes the estimator, q289/q310 interrogate the trends.

    ``treated_col``/``post_col`` must be boolean. Returns one row
    ``(n, mean_c_pre, mean_c_post, mean_t_pre, mean_t_post, did, se,
    ci_lo, ci_hi)``, rounded 6 (se null if any cell has < 2 rows).

    Scale shape: ONE aggregate computes all four cell moments via
    conditional aggregation — no joins, no windows, one corpus scan.
    """
    v = F.col(value_col).cast("double")
    t = F.col(treated_col).cast("boolean")
    p = F.col(post_col).cast("boolean")
    base = df.where(
        v.isNotNull() & t.isNotNull() & p.isNotNull()
    ).select(t.alias("_t"), p.alias("_p"), v.alias("_x"))

    def cell(tt: bool, pp: bool, what: str):
        cond = (F.col("_t") == tt) & (F.col("_p") == pp)
        x = F.when(cond, F.col("_x"))
        if what == "m":
            return F.avg(x)
        if what == "v":
            return F.var_samp(x)
        return F.sum(cond.cast("long"))

    agg = base.agg(
        F.count("*").alias("n"),
        *[
            cell(tt, pp, w).alias(f"_{w}{int(tt)}{int(pp)}")
            for tt in (False, True)
            for pp in (False, True)
            for w in ("m", "v", "c")
        ],
    )
    did = (F.col("_m11") - F.col("_m10")) - (
        F.col("_m01") - F.col("_m00")
    )
    ok = (
        (F.col("_c00") >= 2)
        & (F.col("_c01") >= 2)
        & (F.col("_c10") >= 2)
        & (F.col("_c11") >= 2)
    )
    se = F.when(
        ok,
        F.sqrt(
            F.col("_v00") / F.col("_c00")
            + F.col("_v01") / F.col("_c01")
            + F.col("_v10") / F.col("_c10")
            + F.col("_v11") / F.col("_c11")
        ),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.round("_m00", 6).alias("mean_c_pre"),
        F.round("_m01", 6).alias("mean_c_post"),
        F.round("_m10", 6).alias("mean_t_pre"),
        F.round("_m11", 6).alias("mean_t_post"),
        F.round(did, 6).alias("did"),
        F.round(se, 6).alias("se"),
        F.round(did - 1.959963984540054 * se, 6).alias("ci_lo"),
        F.round(did + 1.959963984540054 * se, 6).alias("ci_hi"),
    )


def mde_curve(
    df: DataFrame,
    group_col: str,
    time_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    alpha_z: float = 1.959963984540054,
    power_z: float = 0.8416212335729143,
) -> DataFrame:
    """Minimum-detectable-effect curve — "how much longer must this
    experiment run": per period, the smallest true mean gap the
    accumulated sample could detect at 5%/80% (z_{α/2}+z_{β})·se —
    the planning companion to q324's anytime p (that one reads the
    data, this one reads only the sample sizes/variance).

    Returns per period: ``(t, n_a, n_b, se, mde, mde_rel)`` with
    ``mde_rel`` relative to the pooled running mean (null at mean 0);
    rounded 6; needs ≥ 2 obs per side.

    Scale shape: identical to always_valid_pvalue — one (period,
    group) aggregate, cumulative windows over the period catalog.
    """
    from pyspark.sql.window import Window

    x = F.col(value_col).cast("double")
    base = df.where(
        x.isNotNull() & F.col(group_col).isin([group_a, group_b])
    ).select(
        F.col(time_col).cast("long").alias("_t"),
        (F.col(group_col) == group_a).alias("_ia"),
        x.alias("_x"),
    )
    per = base.groupBy("_t").agg(
        F.sum(F.col("_ia").cast("long")).alias("_na"),
        F.sum((~F.col("_ia")).cast("long")).alias("_nb"),
        F.sum(F.col("_x")).alias("_s"),
        F.sum(F.col("_x") * F.col("_x")).alias("_q"),
        F.sum(F.when(F.col("_ia"), F.col("_x")).otherwise(0.0)).alias("_sa"),
        F.sum(
            F.when(F.col("_ia"), F.col("_x") * F.col("_x")).otherwise(0.0)
        ).alias("_qa"),
    )
    w = Window.orderBy("_t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        "_t",
        F.sum("_na").over(w).alias("na"),
        F.sum("_nb").over(w).alias("nb"),
        F.sum("_s").over(w).alias("s"),
        F.sum("_q").over(w).alias("q"),
        F.sum("_sa").over(w).alias("sa"),
        F.sum("_qa").over(w).alias("qa"),
    )
    na, nb = F.col("na"), F.col("nb")
    n = na + nb
    # pooled variance of the mixed sample (planning convention: the
    # outcome's overall spread, not the within-group pooled)
    sig2 = (F.col("q") - F.col("s") * F.col("s") / n) / (n - 1)
    se = F.when(
        (na >= 2) & (nb >= 2) & (sig2 > 0),
        F.sqrt(sig2 * (1.0 / na + 1.0 / nb)),
    )
    mde = (alpha_z + power_z) * se
    mean = F.col("s") / n
    return cum.select(
        F.col("_t").alias("t"),
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(se, 6).alias("se"),
        F.round(mde, 6).alias("mde"),
        F.round(F.when(mean != 0, mde / mean), 6).alias("mde_rel"),
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator — the additive
    companion to :func:`kaplan_meier` (same subject-level input, same
    right-censoring semantics):

        H(t) = Σ_{t_i ≤ t} d_i / n_i

    plus its variance estimate Σ d_i / n_i² (Klein 1991 form) and the
    Fleming–Harrington survival transform exp(−H). Preferred over KM
    when hazards are the modelling target (crawl-failure intensity,
    label-decay rates).

    Returns one row per distinct event time: ``(t, n_risk, n_events,
    cum_hazard, var_hazard, fh_survival)``.

    Scale shape: identical to :func:`kaplan_meier` — subjects collapse
    to per-duration counts in ONE aggregate; at-risk is the reverse
    cumulative sum and the hazard the forward one, both over the
    distinct-duration catalog (value-domain bounded).
    """
    per_t = df.groupBy(
        F.col(duration_col).cast("long").alias("t")
    ).agg(
        F.count("*").alias("_total"),
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
    )
    w_rev = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    at_risk = per_t.withColumn("n_risk", F.sum("_total").over(w_rev))
    w_fwd = Window.orderBy(F.asc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    nr = F.col("n_risk").cast("double")
    h = F.sum(F.col("n_events") / nr).over(w_fwd)
    vh = F.sum(F.col("n_events") / (nr * nr)).over(w_fwd)
    return (
        at_risk.withColumn("cum_hazard", F.round(h, 6))
        .withColumn("var_hazard", F.round(vh, 8))
        .withColumn("fh_survival", F.round(F.exp(-h), 6))
        .where(F.col("n_events") > 0)
        .select(
            "t",
            "n_risk",
            "n_events",
            "cum_hazard",
            "var_hazard",
            "fh_survival",
        )
    )


def cmh_odds(
    df: DataFrame,
    treat_col: str,
    outcome_col: str,
    stratum_col: str,
) -> DataFrame:
    """Cochran–Mantel–Haenszel pooled odds ratio and test statistic
    (Mantel & Haenszel 1959) — "is treatment associated with outcome
    AFTER controlling for the stratifying confounder?", the
    Simpson's-paradox-proof 2×2×K analysis every A/B readout with a
    known segmenting variable should run instead of the pooled table.

    ``treat_col`` and ``outcome_col`` are boolean columns. Per stratum
    i with cells (a=T∧O, b=T∧¬O, c=¬T∧O, d=¬T∧¬O) and n_i total:

        OR_MH = Σ a_i·d_i/n_i  /  Σ b_i·c_i/n_i
        χ²_MH = (Σ a_i − Σ E[a_i])² / Σ Var(a_i),
        E[a_i] = r1_i·c1_i/n_i,
        Var    = r1_i·r2_i·c1_i·c2_i / (n_i²·(n_i−1))

    (no continuity correction). Returns ONE row ``(strata, n,
    or_mh, chi2_mh)``.

    Scale shape: ONE groupBy collapses the table to K stratum rows of
    four integer cells (map-side combinable); everything else folds
    over that K-row catalog. Same plan at any scale.
    """
    t = F.col(treat_col).cast("boolean")
    o = F.col(outcome_col).cast("boolean")
    per = df.groupBy(F.col(stratum_col).alias("_s")).agg(
        F.sum((t & o).cast("long")).alias("a"),
        F.sum((t & ~o).cast("long")).alias("b"),
        F.sum((~t & o).cast("long")).alias("c"),
        F.sum((~t & ~o).cast("long")).alias("d"),
    )
    n_i = (F.col("a") + F.col("b") + F.col("c") + F.col("d")).cast(
        "double"
    )
    r1 = (F.col("a") + F.col("b")).cast("double")
    r2 = (F.col("c") + F.col("d")).cast("double")
    c1 = (F.col("a") + F.col("c")).cast("double")
    c2 = (F.col("b") + F.col("d")).cast("double")
    agg = per.agg(
        F.count("*").cast("long").alias("strata"),
        F.sum(n_i).cast("long").alias("n"),
        F.sum(F.col("a") * F.col("d") / n_i).alias("_num"),
        F.sum(F.col("b") * F.col("c") / n_i).alias("_den"),
        F.sum(F.col("a").cast("double")).alias("_sa"),
        F.sum(r1 * c1 / n_i).alias("_se"),
        F.sum(
            F.when(
                n_i > 1,
                r1 * r2 * c1 * c2 / (n_i * n_i * (n_i - 1.0)),
            ).otherwise(F.lit(0.0))
        ).alias("_sv"),
    )
    dev = F.col("_sa") - F.col("_se")
    return agg.select(
        "strata",
        "n",
        F.round(
            F.when(F.col("_den") > 0, F.col("_num") / F.col("_den")),
            6,
        ).alias("or_mh"),
        F.round(
            F.when(F.col("_sv") > 0, dev * dev / F.col("_sv")), 6
        ).alias("chi2_mh"),
    )


def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966) — "do these two cohorts
    have the same survival curve?", the hypothesis-test companion to
    :func:`kaplan_meier` / :func:`nelson_aalen`. At each distinct
    event time t with d_t total events, n_t total at risk and n_at at
    risk in group A:

        O_A  = Σ d_At                (observed A events)
        E_A  = Σ d_t · n_At / n_t    (expected under H0)
        V    = Σ d_t·(n_At/n_t)·(1−n_At/n_t)·(n_t−d_t)/(n_t−1)
        χ²   = (O_A − E_A)² / V

    Returns ONE row ``(n_a, n_b, o_a, e_a, chi2)``.

    Scale shape: subjects collapse to per-(duration, group) counts in
    ONE aggregate; at-risk counts are reverse cumulative sums over the
    distinct-duration catalog (the q287/q351 contract); the statistic
    is one fold over that catalog.
    """
    g = F.col(group_col)
    sub = df.where(g.isin([group_a, group_b])).select(
        F.col(duration_col).cast("long").alias("t"),
        F.col(event_col).cast("long").alias("ev"),
        (g == F.lit(group_a)).cast("long").alias("is_a"),
    )
    per_t = sub.groupBy("t").agg(
        F.count("*").alias("_tot"),
        F.sum("is_a").alias("_tot_a"),
        F.sum("ev").alias("d"),
        F.sum(F.col("ev") * F.col("is_a")).alias("d_a"),
    )
    w = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ar = per_t.select(
        "t",
        "d",
        "d_a",
        F.sum("_tot").over(w).alias("n_t"),
        F.sum("_tot_a").over(w).alias("n_at"),
    ).where(F.col("d") > 0)
    p = F.col("n_at").cast("double") / F.col("n_t").cast("double")
    var_t = F.when(
        F.col("n_t") > 1,
        F.col("d")
        * p
        * (1.0 - p)
        * (F.col("n_t") - F.col("d")).cast("double")
        / (F.col("n_t") - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    totals = sub.agg(
        F.sum("is_a").cast("long").alias("n_a"),
        (F.count("*") - F.sum("is_a")).cast("long").alias("n_b"),
    )
    agg = ar.agg(
        F.sum("d_a").cast("long").alias("o_a"),
        F.sum(F.col("d") * p).alias("_e_a"),
        F.sum(var_t).alias("_v"),
    )
    return totals.crossJoin(F.broadcast(agg)).select(
        "n_a",
        "n_b",
        "o_a",
        F.round(F.col("_e_a"), 6).alias("e_a"),
        F.round(
            F.when(
                F.col("_v") > 0,
                (F.col("o_a") - F.col("_e_a"))
                * (F.col("o_a") - F.col("_e_a"))
                / F.col("_v"),
            ),
            6,
        ).alias("chi2"),
    )


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Kruskal-Wallis H test (KW 1952) — the k-group extension of
    :func:`mann_whitney_u` and the nonparametric twin of q345's
    ANOVA: "did ANY group's distribution shift?" when the metric is
    heavy-tailed and means lie. Mid-ranks for ties with the standard
    tie correction:

        H  = 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1)
        H' = H / (1 − Σ(t³−t)/(N³−N))

    Returns ONE row ``(k, n, h, h_corrected)`` (NULL when every value
    ties — zero variance in ranks).

    Scale shape (the q256 rank-statistics contract): values collapse
    to a per-(value, group) count frame in ONE aggregate; the
    mid-rank cumsum runs over the DISTINCT-value catalog; per-group
    rank sums and the statistic fold over catalogs. The corpus is
    touched once.
    """
    x = F.col(value_col).cast("double")
    pool = df.where(x.isNotNull()).select(
        x.alias("x"), F.col(group_col).alias("g")
    )
    vg = pool.groupBy("x", "g").agg(
        F.count("*").cast("double").alias("c")
    )
    v = vg.groupBy("x").agg(F.sum("c").alias("t"))
    w = Window.orderBy("x")
    ranked = v.select(
        "x",
        "t",
        (
            F.coalesce(F.sum("t").over(w), F.lit(0.0))
            - F.col("t")
            + (F.col("t") + 1) / 2
        ).alias("mid_rank"),
    )
    per_g = (
        vg.join(ranked, "x")
        .groupBy("g")
        .agg(
            F.sum("c").alias("ng"),
            F.sum(F.col("c") * F.col("mid_rank")).alias("rg"),
        )
    )
    ties = ranked.agg(
        F.sum(F.pow(F.col("t"), 3) - F.col("t")).alias("_ties"),
        F.sum("t").alias("_n"),
    )
    agg = per_g.crossJoin(F.broadcast(ties)).agg(
        F.count("*").cast("long").alias("k"),
        F.max("_n").alias("_n"),
        F.max("_ties").alias("_t3"),
        F.sum(F.col("rg") * F.col("rg") / F.col("ng")).alias("_rr"),
    )
    n = F.col("_n")
    h = 12.0 / (n * (n + 1)) * F.col("_rr") - 3.0 * (n + 1)
    corr = 1.0 - F.col("_t3") / (n * n * n - n)
    return agg.select(
        "k",
        n.cast("long").alias("n"),
        F.round(F.when(corr > 0, h), 6).alias("h"),
        F.round(F.when(corr > 0, h / corr), 6).alias("h_corrected"),
    )


def brown_forsythe(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test (1974; Levene's test
    with the MEDIAN center — robust to heavy tails): the assumption
    check in front of q345's ANOVA. Computes the one-way ANOVA F on
    the absolute deviations z = |x − median_g| from each group's
    exact-disc median.

    Returns ONE row ``(k, n, df_between, df_within, f_stat)``.

    Scale shape: per-group medians come from the per-(group, value)
    count catalog (exact disc selection via a per-group cumsum window
    over the DISTINCT-value catalog — the q256 contract, partitioned
    by group so no single-partition anything); the deviations then
    ride ONE broadcast join back and the ANOVA collapses them in one
    aggregate.
    """
    from cccatalog_spark.operators.stats import anova_oneway

    x = F.col(value_col).cast("double")
    pool = df.where(x.isNotNull()).select(
        x.alias("x"), F.col(group_col).alias("g")
    )
    vg = pool.groupBy("g", "x").agg(F.count("*").alias("c"))
    wg = Window.partitionBy("g").orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = vg.select(
        "g",
        "x",
        F.sum("c").over(wg).alias("_cum"),
        F.sum("c").over(Window.partitionBy("g")).alias("_ng"),
    )
    med = cum.where(
        F.col("_cum") >= F.ceil(F.col("_ng") / 2.0)
    ).groupBy("g").agg(F.min("x").alias("_med"))
    z = pool.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("x") - F.col("_med")).alias("z")
    )
    return anova_oneway(z, "g", "z").select(
        "k", "n", "df_between", "df_within", "f_stat"
    )


def simpson_paradox_audit(
    df: DataFrame,
    treat_col: str,
    outcome_col: str,
    stratum_col: str,
) -> DataFrame:
    """Simpson's-paradox detector (Simpson 1951; Bickel et al.'s
    Berkeley admissions is the canonical case): per stratum, the
    treated-vs-control outcome-rate difference, next to the POOLED
    difference — flagged when the stratum's sign contradicts the
    pooled sign (the aggregation-reversal that makes a naive A/B
    readout lie; q356's CMH pooled odds is the fix, this is the
    detector that says the fix is needed).

    ``treat_col`` / ``outcome_col`` are boolean columns. Returns per
    stratum: ``(stratum, n, n_treat, n_ctrl, p_treat, p_ctrl, diff,
    pooled_diff, sign_flip)``; rates/diffs rounded to 6. Strata where
    either arm is empty have NULL diff and never flag.

    Scale: ONE map-side-combinable groupBy keyed by stratum; the
    pooled row is the same aggregate without the key, broadcast back
    (1-row crossJoin). sign_flip uses exact integer cross products
    (a·d vs b·c style), so the flag is float-free.
    """
    t = F.col(treat_col).cast("boolean")
    y = F.col(outcome_col).cast("boolean")
    aggs = [
        F.count("*").alias("n"),
        F.sum(t.cast("long")).alias("nt"),
        F.sum((~t).cast("long")).alias("nc"),
        F.sum((t & y).cast("long")).alias("yt"),
        F.sum((~t & y).cast("long")).alias("yc"),
    ]
    per = df.groupBy(F.col(stratum_col).alias("stratum")).agg(*aggs)
    pooled = df.agg(*aggs).select(
        F.col("nt").alias("_pnt"),
        F.col("nc").alias("_pnc"),
        F.col("yt").alias("_pyt"),
        F.col("yc").alias("_pyc"),
    )
    x = per.crossJoin(F.broadcast(pooled))
    both = (F.col("nt") > 0) & (F.col("nc") > 0)
    p_t = F.col("yt") / F.col("nt").cast("double")
    p_c = F.col("yc") / F.col("nc").cast("double")
    # integer cross products: stratum sign = yt*nc - yc*nt
    s_num = F.col("yt") * F.col("nc") - F.col("yc") * F.col("nt")
    p_num = (
        F.col("_pyt") * F.col("_pnc") - F.col("_pyc") * F.col("_pnt")
    )
    pooled_diff = F.col("_pyt") / F.col("_pnt").cast("double") - F.col(
        "_pyc"
    ) / F.col("_pnc").cast("double")
    return x.select(
        "stratum",
        F.col("n").cast("bigint"),
        F.col("nt").cast("bigint").alias("n_treat"),
        F.col("nc").cast("bigint").alias("n_ctrl"),
        F.round(F.when(F.col("nt") > 0, p_t), 6).alias("p_treat"),
        F.round(F.when(F.col("nc") > 0, p_c), 6).alias("p_ctrl"),
        F.round(F.when(both, p_t - p_c), 6).alias("diff"),
        F.round(pooled_diff, 6).alias("pooled_diff"),
        F.when(both, (s_num * p_num) < 0).alias("sign_flip"),
    )


def cronbach_alpha(df: DataFrame, item_cols: list[str]) -> DataFrame:
    """Cronbach's alpha — internal consistency of k score items
    (Cronbach 1951): one row ``(n, k, alpha)`` with

        α = k/(k−1) · (1 − Σ_i var(item_i) / var(Σ_i item_i)).

    Variances are the SAMPLE variance computed from explicit
    (Σx, Σx²) sums — not the engine's builtin variance aggregate —
    so the Spark result and its SQL-oracle twin evaluate the
    identical formula.  Rows with any null item are dropped (the
    complete-case convention).

    Scale shape: ONE aggregate over the scan (2k+3 sums).
    """
    k = len(item_cols)
    if k < 2:
        raise ValueError("need at least 2 items")
    d = df.dropna(subset=item_cols).select(
        *[F.col(c).cast("double").alias(c) for c in item_cols]
    )
    tot = sum((F.col(c) for c in item_cols[1:]), F.col(item_cols[0]))
    aggs = [F.count("*").cast("double").alias("n")]
    for c in item_cols:
        aggs.append(F.sum(F.col(c)).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"q_{c}"))
    aggs.append(F.sum(tot).alias("s_t"))
    aggs.append(F.sum(tot * tot).alias("q_t"))
    a = d.agg(*aggs)

    def var(s, q):
        return (F.col(q) - F.col(s) * F.col(s) / F.col("n")) / (
            F.col("n") - 1
        )

    item_var = None
    for c in item_cols:
        v = var(f"s_{c}", f"q_{c}")
        item_var = v if item_var is None else item_var + v
    tot_var = var("s_t", "q_t")
    alpha = F.when(
        (F.col("n") > 1) & (tot_var > 0),
        F.lit(k / (k - 1.0)) * (F.lit(1.0) - item_var / tot_var),
    )
    return a.select(
        F.col("n").cast("long").alias("n"),
        F.lit(k).cast("long").alias("k"),
        F.round(alpha, 6).alias("alpha"),
    )


def caliper_matching(
    df: DataFrame,
    id_col: str,
    treat_col: str,
    x_col: str,
    y_col: str,
    caliper: float,
) -> DataFrame:
    """Radius (caliper) matching ATT estimate (Cochran & Rubin 1973):
    each treated unit is matched to ALL control units whose covariate
    lies within ``caliper``; its effect is y_t − mean(y_controls in
    radius); the ATT averages over matched treated units.  One row:
    ``(n_treated, n_matched, match_rate, att)``.

    Radius matching (vs greedy 1:1) is the variant that exists
    distributed: no sequential match-and-remove state.

    Scale shape: the range join is BANDED — both sides bucket the
    covariate by caliper width and join only (bucket−1, bucket,
    bucket+1), the geo-radius-join pattern, so candidate volume is
    density-bounded, never treated×controls. One groupBy(treated id)
    + a 1-row reduce.
    """
    t = df.where(F.col(treat_col).cast("boolean")).select(
        F.col(id_col).alias("_tid"),
        F.col(x_col).cast("double").alias("_xt"),
        F.col(y_col).cast("double").alias("_yt"),
    )
    c = df.where(~F.col(treat_col).cast("boolean")).select(
        F.col(x_col).cast("double").alias("_xc"),
        F.col(y_col).cast("double").alias("_yc"),
    )
    bt = t.withColumn(
        "_b",
        F.explode(
            F.array(
                *[
                    (F.floor(F.col("_xt") / F.lit(caliper)) + i).cast("long")
                    for i in (-1, 0, 1)
                ]
            )
        ),
    )
    bc = c.withColumn(
        "_b", F.floor(F.col("_xc") / F.lit(caliper)).cast("long")
    )
    cand = bt.join(bc, "_b").where(
        F.abs(F.col("_xt") - F.col("_xc")) <= F.lit(caliper)
    )
    per_t = cand.groupBy("_tid", "_yt").agg(
        F.avg("_yc").alias("_ybar"), F.count("*").alias("_nc")
    )
    n_treated = t.agg(F.count("*").cast("long").alias("n_treated"))
    return (
        per_t.agg(
            F.count("*").cast("long").alias("n_matched"),
            F.avg(F.col("_yt") - F.col("_ybar")).alias("_att"),
        )
        .crossJoin(F.broadcast(n_treated))
        .select(
            "n_treated",
            "n_matched",
            F.round(
                F.col("n_matched").cast("double") / F.col("n_treated"), 6
            ).alias("match_rate"),
            F.round("_att", 6).alias("att"),
        )
    )


def wilcoxon_signed_rank(df: DataFrame, diff_col: str) -> DataFrame:
    """Wilcoxon signed-rank test for PAIRED differences (Wilcoxon
    1945; normal approximation with tie + zero handling per Conover):
    one row ``(n_nonzero, w_plus, z)``.

    Zero differences are dropped (the classical convention); |d| gets
    average ranks; W⁺ sums ranks of positive differences;

        z = (W⁺ − n(n+1)/4) / sqrt(n(n+1)(2n+1)/24 − ΣT/48),

    ΣT = Σ_ties (t³ − t).  The paired complement of
    :func:`mann_whitney_u` (which assumes independent samples).

    Scale shape: ranks come from the |d| VALUE CATALOG (one groupBy
    to distinct |d| + counts, cumulative window over the catalog —
    avg rank of a tie class is cum_before + (t+1)/2), never a
    data-wide sort; then a 1-row reduce.
    """
    d = df.select(F.col(diff_col).cast("double").alias("_d")).where(
        F.col("_d") != 0.0
    )
    cat = d.groupBy(F.abs(F.col("_d")).alias("_a")).agg(
        F.count("*").cast("double").alias("t"),
        F.sum((F.col("_d") > 0).cast("long")).cast("double").alias("tp"),
    )
    wc = Window.orderBy("_a").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = cat.select(
        "t",
        "tp",
        (
            F.sum("t").over(wc)
            - F.col("t")
            + (F.col("t") + 1) / F.lit(2.0)
        ).alias("_r"),
    )
    agg = ranked.agg(
        F.sum("t").alias("n"),
        F.sum(F.col("tp") * F.col("_r")).alias("wp"),
        F.sum(F.pow(F.col("t"), 3) - F.col("t")).alias("tsum"),
    )
    mu = F.col("n") * (F.col("n") + 1) / F.lit(4.0)
    var = F.col("n") * (F.col("n") + 1) * (2 * F.col("n") + 1) / F.lit(
        24.0
    ) - F.col("tsum") / F.lit(48.0)
    return agg.select(
        F.col("n").cast("long").alias("n_nonzero"),
        F.round("wp", 6).alias("w_plus"),
        F.round(
            F.when(var > 0, (F.col("wp") - mu) / F.sqrt(var)), 6
        ).alias("z"),
    )


def mood_median_test(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Mood's median test across k groups (Mood 1950): the robust
    location test — classify every value against the GRAND median,
    then chi-square the k×2 above/≤ contingency.  One row
    ``(n, k, grand_median, chi2, dof)``.

    The grand median is the exact lower discrete median computed on
    the VALUE CATALOG (distinct values + counts, the mad_outliers
    pattern — cumulative window over the catalog, never a data-wide
    sort), so the SQL twin replays it byte-identically.

    Scale shape: one value-catalog aggregate + a catalog cumsum for
    the median (broadcast scalar back), then one groupBy(group)
    contingency + a 1-row reduce.
    """
    v = F.col(value_col).cast("double")
    cat = df.select(v.alias("_v")).groupBy("_v").agg(
        F.count("*").alias("_c")
    )
    wc = Window.orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cat.select(
        "_v",
        F.sum("_c").over(wc).alias("_cum"),
        F.sum("_c").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_n"),
    )
    k = F.greatest(F.ceil(F.lit(0.5) * F.col("_n")), F.lit(1))
    med = cum.groupBy().agg(
        F.min(F.when(F.col("_cum") >= k, F.col("_v"))).alias("gm")
    )
    g = (
        df.select(F.col(group_col).alias("grp"), v.alias("_v"))
        .crossJoin(F.broadcast(med))
        .groupBy("grp", "gm")
        .agg(
            F.sum((F.col("_v") > F.col("gm")).cast("long")).alias("a"),
            F.sum((F.col("_v") <= F.col("gm")).cast("long")).alias("b"),
        )
    )
    tot = g.agg(
        F.sum(F.col("a") + F.col("b")).cast("double").alias("n"),
        F.sum("a").cast("double").alias("ta"),
        F.sum("b").cast("double").alias("tb"),
        F.count("*").cast("long").alias("k"),
    )
    ea = (F.col("a") + F.col("b")) * F.col("ta") / F.col("n")
    eb = (F.col("a") + F.col("b")) * F.col("tb") / F.col("n")
    x = g.crossJoin(F.broadcast(tot)).select(
        "gm",
        "n",
        "k",
        (
            F.pow(F.col("a") - ea, 2) / ea
            + F.pow(F.col("b") - eb, 2) / eb
        ).alias("_c"),
    )
    return (
        x.groupBy("gm", "n", "k")
        .agg(F.round(F.sum("_c"), 6).alias("chi2"))
        .select(
            F.col("n").cast("long").alias("n"),
            "k",
            F.round("gm", 6).alias("grand_median"),
            "chi2",
            (F.col("k") - 1).cast("long").alias("dof"),
        )
    )
