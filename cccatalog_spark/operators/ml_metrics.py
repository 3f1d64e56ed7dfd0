"""Model-evaluation metrics over scored frames — the gates a
quality-classifier / filter-model pipeline runs before trusting a
model's scores at corpus scale (the retrieval siblings live in
operators/retrieval.ranking_metrics).

All three are exact relational algebra — rank windows and grouped
sums, no sampling, no collect — so billion-row eval sets hold and
every metric sits under an exact SQL oracle:

- :func:`auc`: ROC AUC via the Mann-Whitney rank-sum identity with
  average ranks for ties (exactly what sklearn computes), one global
  rank window + one aggregate.
- :func:`ece`: expected calibration error over equal-width
  probability bins — one groupBy.
- :func:`classification_report`: per-class precision/recall/F1 from
  one (label, prediction) contingency aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Binary ROC AUC: ``(U - n_pos(n_pos+1)/2) / (n_pos · n_neg)``
    where U is the positive class's average-rank sum (ties share the
    mean of their rank range). Returns 1 row (n_pos, n_neg, auc).

    No global rank window anywhere: ranks only matter per DISTINCT
    score (ties share one average rank), so the shape is one groupBy
    on the score, the two-phase prefix-sum (operators/cumsum) over the
    grouped frame for each tie-group's starting rank, and one final
    aggregate. The widest exchange is keyed by score value; the
    single-partition window a naive rank() plans is gone entirely.
    Arithmetic keeps 2·rank_sum as an exact integer (avg ranks are
    k/2 multiples), so the result is bit-identical to the windowed
    definition."""
    from cccatalog_spark.operators.cumsum import global_running_sum

    g = df.groupBy(F.col(score_col).alias("_p")).agg(
        F.count("*").cast("long").alias("_c"),
        F.sum(F.col(label_col).cast("long")).alias("_pos"),
    )
    r = global_running_sum(g, [F.asc("_p")], "_c", out_col="_run")
    # tie group spanning ranks [run-c+1, run]: 2·avg_rank = 2·run − c + 1
    # every product that can reach n_pos·n_rows runs in decimal(38,0):
    # int64 wraps silently near 4.6e18 under non-ANSI mode, so BOTH
    # the rank-sum accumulation AND the final n_pos(n_pos+1)/2 and
    # n_pos·n_neg terms must leave long arithmetic before multiplying
    # (2·run−c+1 itself stays within long: ≤ 2·n_rows+1).
    dec = "decimal(38,0)"
    agg = r.agg(
        F.sum("_pos").cast("long").alias("n_pos"),
        (F.sum("_c") - F.sum("_pos")).cast("long").alias("n_neg"),
        F.sum(
            F.col("_pos").cast(dec)
            * (2 * F.col("_run") - F.col("_c") + 1).cast(dec)
        ).cast(dec).alias("_u2"),
    )
    np_d = F.col("n_pos").cast(dec)
    nn_d = F.col("n_neg").cast(dec)
    return agg.select(
        "n_pos",
        "n_neg",
        (
            (F.col("_u2") - np_d * (np_d + 1)).cast("double")
            / (F.lit(2.0) * (np_d * nn_d).cast("double"))
        ).alias("auc"),
    )


def ece(
    df: DataFrame, prob_col: str, label_col: str, n_bins: int = 10
) -> DataFrame:
    """Expected calibration error over equal-width bins of the
    predicted probability. Returns 1 row (n, ece); per-bin detail is
    the intermediate frame for reliability plots."""
    b = F.least(
        F.floor(F.col(prob_col) * n_bins), F.lit(n_bins - 1)
    ).cast("int")
    bins = (
        df.select(
            b.alias("bin"),
            F.col(prob_col).alias("p"),
            F.col(label_col).cast("double").alias("y"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.avg("p").alias("conf"),
            F.avg("y").alias("acc"),
        )
    )
    total = bins.agg(F.sum("n").alias("total"))
    return (
        bins.crossJoin(F.broadcast(total))
        .agg(
            F.max("total").cast("long").alias("n"),
            F.sum(
                F.col("n") / F.col("total")
                * F.abs(F.col("acc") - F.col("conf"))
            ).alias("ece"),
        )
    )


def classification_report(
    df: DataFrame, pred_col: str, label_col: str
) -> DataFrame:
    """Per-class (class, tp, fp, fn, precision, recall, f1) from one
    contingency aggregation — multi-class, zero-division guarded to
    0.0 (sklearn's default)."""
    base = df.select(
        F.col(label_col).alias("y"), F.col(pred_col).alias("yhat")
    )
    per_label = base.groupBy("y").agg(
        F.count("*").alias("support"),
        F.sum((F.col("yhat") == F.col("y")).cast("long")).alias("tp"),
    )
    per_pred = base.groupBy("yhat").agg(F.count("*").alias("n_pred"))
    joined = (
        per_label.join(
            per_pred, per_label["y"] == per_pred["yhat"], "full_outer"
        )
        .select(
            F.coalesce("y", "yhat").alias("class"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
            (
                F.coalesce("n_pred", F.lit(0)) - F.coalesce("tp", F.lit(0))
            ).alias("fp"),
            (
                F.coalesce("support", F.lit(0)) - F.coalesce("tp", F.lit(0))
            ).alias("fn"),
        )
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp") / (F.col("tp") + F.col("fp")),
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp") / (F.col("tp") + F.col("fn")),
    ).otherwise(F.lit(0.0))
    return joined.select(
        "class",
        "tp",
        "fp",
        "fn",
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(
            prec + rec > 0, 2 * prec * rec / (prec + rec)
        ).otherwise(F.lit(0.0)).alias("f1"),
    )


def pr_curve(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    thresholds: list[float],
) -> DataFrame:
    """Precision/recall/F1 at each decision threshold — the sweep
    that picks a filter model's operating point. ONE aggregate job:
    every threshold contributes three conditional sums to the same
    pass (no per-threshold scan, no row×threshold explode); the
    result row then unpivots to (threshold, tp, fp, fn, precision,
    recall, f1) rows via a 1-row generator."""
    p, y = F.col(prob_col), F.col(label_col).cast("int")
    aggs = []
    for i, t in enumerate(thresholds):
        pred = (p >= F.lit(t)).cast("int")
        aggs += [
            F.sum(pred * y).cast("long").alias(f"tp_{i}"),
            F.sum(pred * (1 - y)).cast("long").alias(f"fp_{i}"),
            F.sum((1 - pred) * y).cast("long").alias(f"fn_{i}"),
        ]
    row = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(t).alias("threshold"),
                F.col(f"tp_{i}").alias("tp"),
                F.col(f"fp_{i}").alias("fp"),
                F.col(f"fn_{i}").alias("fn"),
            )
            for i, t in enumerate(thresholds)
        ]
    )
    base = row.select(F.explode(structs).alias("s")).select("s.*")
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp") / (F.col("tp") + F.col("fp")),
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp") / (F.col("tp") + F.col("fn")),
    ).otherwise(F.lit(0.0))
    return base.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(prec + rec > 0, 2 * prec * rec / (prec + rec))
        .otherwise(F.lit(0.0))
        .alias("f1"),
    )


def cohens_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cohen's kappa between two label columns — the annotator/model
    agreement gate a labeling pipeline runs before trusting its quality
    labels (raw agreement is inflated by class imbalance; kappa
    subtracts chance agreement from the marginals).

    Returns 1 row ``(n, po, pe, kappa)``: observed agreement, chance
    agreement (sum over classes of the two marginal shares' product),
    and ``(po-pe)/(1-pe)`` (1.0 when pe==1, the degenerate
    single-class-perfect-agreement case).

    Shape: one contingency aggregate plus two class-marginal groupBys
    whose outputs are |classes|-row catalogs (broadcast inner join —
    classes absent from either marginal contribute 0 to pe). Marginal
    products run in double before multiplying: na*nb overflows int64
    past ~3e9 rows per class.
    """
    base = df.select(F.col(a_col).alias("_a"), F.col(b_col).alias("_b"))
    totals = base.agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("_a") == F.col("_b")).cast("long")).alias("_agree"),
    )
    ma = base.groupBy("_a").agg(F.count("*").alias("_na"))
    mb = base.groupBy("_b").agg(F.count("*").alias("_nb"))
    pe_num = (
        ma.join(F.broadcast(mb), ma["_a"] == mb["_b"])
        .agg(
            F.coalesce(
                F.sum(
                    F.col("_na").cast("double")
                    * F.col("_nb").cast("double")
                ),
                F.lit(0.0),
            ).alias("_pe_num")
        )
    )
    po = F.col("_agree") / F.col("n")
    pe = F.col("_pe_num") / (
        F.col("n").cast("double") * F.col("n").cast("double")
    )
    return (
        totals.crossJoin(F.broadcast(pe_num))
        .select(
            "n",
            F.round(po, 6).alias("po"),
            F.round(pe, 6).alias("pe"),
            F.round(
                F.when(pe < 1.0, (po - pe) / (1.0 - pe)).otherwise(1.0), 6
            ).alias("kappa"),
        )
    )


def bleu_scores(
    df: DataFrame,
    id_col: str,
    cand_col: str,
    ref_col: str,
    max_n: int = 4,
) -> DataFrame:
    """Per-pair smoothed sentence BLEU (Lin–Och add-one smoothing on
    every order) between a candidate and a reference text column — the
    n-gram-overlap eval a distillation / translation / summarization
    data pipeline scores at corpus scale, and a contamination signal
    (near-verbatim candidates score ~1).

    For each order n<=max_n: modified precision
    ``p_n = (Σ min(count_cand, count_ref) + 1) / (Σ count_cand + 1)``
    (orders the candidate is too short to produce get p_n = 1, the
    smoothing fixed point); brevity penalty
    ``exp(min(0, 1 - ref_len/cand_len))``; BLEU = BP · exp(mean ln p_n).
    Empty candidates score 0. Returns ``(id, cand_len, ref_len,
    bleu)``.

    Shape: both sides explode to (id, n, gram) counts in one pass each
    (slice-over-sequence gram construction, no UDF); the clip join and
    the two groupBys share the (id, n, gram) key so AQE coalesces them
    into one exchange family; the per-id reduce is one aggregate. No
    driver state, no catalogs.
    """
    from cccatalog_spark.functions.text import tokens

    # three consumers (cand grams, ref grams, the (id, n) grid):
    # persist so tokenization runs once
    base = df.select(
        F.col(id_col).alias("_id"),
        tokens(F.col(cand_col)).alias("_ct"),
        tokens(F.col(ref_col)).alias("_rt"),
    ).persist()

    def _gram_counts(tok_col: str, out: str) -> DataFrame:
        g = base.select(
            "_id",
            F.col(tok_col).alias("_t"),
            F.explode(F.sequence(F.lit(1), F.lit(max_n))).alias("n"),
        )
        grams = g.select(
            "_id",
            "n",
            F.explode(
                F.when(
                    F.size("_t") >= F.col("n"),
                    F.transform(
                        F.sequence(
                            F.lit(1), F.size("_t") - F.col("n") + 1
                        ),
                        lambda i: F.array_join(
                            F.slice("_t", i, F.col("n")), " "
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("gram"),
        )
        return grams.groupBy("_id", "n", "gram").agg(
            F.count("*").alias(out)
        )

    cand = _gram_counts("_ct", "_c")
    ref = _gram_counts("_rt", "_r")
    clipped = (
        cand.join(ref, ["_id", "n", "gram"], "left")
        .groupBy("_id", "n")
        .agg(
            F.sum(F.least("_c", F.coalesce("_r", F.lit(0)))).alias("_clip"),
            F.sum("_c").alias("_tot"),
        )
    )
    grid = base.select(
        "_id",
        F.size("_ct").alias("cand_len"),
        F.size("_rt").alias("ref_len"),
        F.explode(F.sequence(F.lit(1), F.lit(max_n))).alias("n"),
    )
    pn = grid.join(clipped, ["_id", "n"], "left").select(
        "_id",
        "cand_len",
        "ref_len",
        (
            (F.coalesce("_clip", F.lit(0)) + 1.0)
            / (F.coalesce("_tot", F.lit(0)) + 1.0)
        ).alias("_p"),
    )
    bp = F.exp(
        F.least(
            F.lit(0.0),
            1.0 - F.col("ref_len") / F.col("cand_len"),
        )
    )
    return (
        pn.groupBy("_id", "cand_len", "ref_len")
        .agg(F.avg(F.log("_p")).alias("_lg"))
        .select(
            F.col("_id").alias(id_col),
            "cand_len",
            "ref_len",
            F.round(
                F.when(
                    F.col("cand_len") > 0, bp * F.exp(F.col("_lg"))
                ).otherwise(0.0),
                6,
            ).alias("bleu"),
        )
    )


def fit_temperature(
    df: DataFrame,
    logit_col: str,
    label_col: str,
    temps: list[float] | None = None,
) -> DataFrame:
    """Temperature-scaling calibration fit (Guo et al. ICML'17): the
    single post-hoc scalar T minimizing binary NLL of
    ``sigmoid(logit/T)`` over a fixed candidate grid — the standard
    repair when a quality classifier's scores are overconfident (ECE
    high, q164's diagnosis; this is the corresponding treatment).
    Returns one row ``(temperature, nll)`` (nll rounded to 6).

    Grid search is deliberate: the 1-D NLL is evaluated for every
    candidate in ONE corpus pass (constant |grid| fan-out per row,
    map-side-combinable per-T aggregate, |grid|-row argmin via
    TakeOrdered(1)) — no gradient loop, no driver iteration, exactly
    SQL-replayable."""
    if temps is None:
        temps = [round(0.25 * i, 2) for i in range(1, 17)]  # 0.25..4.0
    x = F.col(logit_col).cast("double")
    y = F.col(label_col).cast("double")
    grid = F.array(*[F.lit(float(t)) for t in temps])
    e = df.select(x.alias("_x"), y.alias("_y")).select(
        "_x", "_y", F.explode(grid).alias("t")
    )
    p = 1.0 / (1.0 + F.exp(-F.col("_x") / F.col("t")))
    nll = e.groupBy("t").agg(
        (-F.avg(F.col("_y") * F.log(p) + (1.0 - F.col("_y")) * F.log(1.0 - p))
         ).alias("nll")
    )
    return (
        nll.orderBy(F.asc("nll"), F.asc("t"))
        .limit(1)
        .select(
            F.col("t").alias("temperature"), F.round("nll", 6).alias("nll")
        )
    )


def conformal_threshold(
    df: DataFrame, score_col: str, alpha: float
) -> DataFrame:
    """Split-conformal quantile (Vovk et al.; Angelopoulos & Bates
    2021 tutorial): the calibration threshold q̂ = the
    ``ceil((n+1)(1−α))``-th smallest nonconformity score, giving
    marginal coverage ≥ 1−α on exchangeable future points — how a
    filter's score cut gets a distribution-free guarantee instead of
    an eyeballed threshold. Returns one row ``(alpha, n, k, qhat)``.

    Scale shape: one count, then the exact k-th smallest via the
    iterative-refinement machinery of operators/quantiles.py (bounded
    driver state at any n) — n and k are the only driver scalars."""
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    from cccatalog_spark.operators.quantiles import exact_quantiles

    import math

    vals = df.select(F.col(score_col).cast("double").alias("v")).where(
        F.col("v").isNotNull()
    )
    n = vals.count()
    k = min(int(math.ceil((n + 1) * (1.0 - alpha))), n)
    [(_, qhat)] = exact_quantiles(vals, "v", [k / n])
    spark = df.sparkSession
    return spark.createDataFrame(
        [(float(alpha), n, k, round(float(qhat), 6))],
        "alpha double, n long, k long, qhat double",
    )


def group_fairness_report(
    df: DataFrame,
    group_col: str,
    label_col: str,
    pred_col: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """Per-group confusion rates with the corpus-wide disparity gaps
    attached to every row — the release audit for a trained filter
    (does the quality classifier suppress one language/source
    disproportionately?): ``(group, n, pos_rate, tpr, fpr,
    pos_rate_gap, tpr_gap, fpr_gap)``; rates null when undefined
    (no positives / no negatives in the group), gaps = max−min over
    groups with defined rates.

    Scale shape: ONE group aggregate over the corpus; the gap frame
    is a 1-row cross-broadcast over the |groups|-row result. No
    windows, no collect."""
    y = F.col(label_col).cast("boolean")
    yhat = F.col(pred_col).cast("boolean")
    g = (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count("*").alias("n"),
            F.sum(yhat.cast("long")).alias("_np"),
            F.sum((y & yhat).cast("long")).alias("_tp"),
            F.sum(y.cast("long")).alias("_p"),
            F.sum(((~y) & yhat).cast("long")).alias("_fp"),
            F.sum((~y).cast("long")).alias("_neg"),
        )
        .select(
            "grp",
            "n",
            (F.col("_np") / F.col("n")).alias("pos_rate"),
            F.when(F.col("_p") > 0, F.col("_tp") / F.col("_p")).alias(
                "tpr"
            ),
            F.when(
                F.col("_neg") > 0, F.col("_fp") / F.col("_neg")
            ).alias("fpr"),
        )
        .persist()
    )
    gaps = g.agg(
        (F.max("pos_rate") - F.min("pos_rate")).alias("pos_rate_gap"),
        (F.max("tpr") - F.min("tpr")).alias("tpr_gap"),
        (F.max("fpr") - F.min("fpr")).alias("fpr_gap"),
    )
    r = lambda c: F.round(F.col(c), round_to).alias(c)  # noqa: E731
    return g.crossJoin(F.broadcast(gaps)).select(
        F.col("grp").alias(group_col),
        "n",
        r("pos_rate"),
        r("tpr"),
        r("fpr"),
        r("pos_rate_gap"),
        r("tpr_gap"),
        r("fpr_gap"),
    )


def isotonic_calibration(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """Isotonic (PAV) calibration curve over score bins — the
    non-parametric recalibrator beside ``fit_temperature``'s single
    scalar.  Pool-adjacent-violators is a sequential pooling
    algorithm, but its fit has the exact MINIMAX closed form
    (Robertson et al. 1988):

        iso(i) = max_{j ≤ i} min_{k ≥ i} weighted-mean(y over bins j..k)

    so the whole fit is relational algebra over the BIN catalog: one
    binning aggregate, one (j, k) interval-mean frame (catalog²), one
    (i, j, k) min/max fold (catalog³ rows — 8000 at 20 bins, a
    catalog).  Interval means are ratios of integer sums, so both
    engines compare bit-identical doubles.

    Returns per non-empty bin: ``(bin, n, mean_score, raw_acc,
    iso_acc)`` with iso_acc monotone non-decreasing in bin.
    """
    b = (
        df.select(
            F.least(
                F.floor(F.col(score_col) * n_bins).cast("int"),
                F.lit(n_bins - 1),
            ).alias("bin"),
            F.col(label_col).cast("long").alias("_y"),
            F.col(score_col).alias("_p"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("_y").alias("_sy"),
            F.sum("_p").alias("_sp"),
        )
        .persist()
    )
    idx = b.select("bin")
    j = idx.select(F.col("bin").alias("_j"))
    k = idx.select(F.col("bin").alias("_k"))
    pairs = j.join(k, F.col("_j") <= F.col("_k"))
    spans = (
        pairs.join(
            b, (F.col("bin") >= F.col("_j")) & (F.col("bin") <= F.col("_k"))
        )
        .groupBy("_j", "_k")
        .agg(
            (
                F.sum("_sy").cast("double") / F.sum("n").cast("double")
            ).alias("_mean")
        )
    )
    i = idx.select(F.col("bin").alias("_i"))
    tri = spans.join(
        i, (F.col("_j") <= F.col("_i")) & (F.col("_k") >= F.col("_i"))
    )
    inner = tri.groupBy("_i", "_j").agg(F.min("_mean").alias("_mn"))
    iso = inner.groupBy("_i").agg(F.max("_mn").alias("_iso"))
    return (
        b.join(iso, b["bin"] == iso["_i"])
        .select(
            "bin",
            "n",
            F.round(F.col("_sp") / F.col("n"), 6).alias("mean_score"),
            F.round(
                F.col("_sy").cast("double") / F.col("n"), 6
            ).alias("raw_acc"),
            F.round("_iso", 6).alias("iso_acc"),
        )
    )


def brier_decomposition(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Murphy (1973) decomposition of the Brier score over forecast
    bins: ``brier = reliability − resolution + uncertainty`` up to the
    within-bin variance term the binning absorbs —

        REL = Σ n_k/N (p̄_k − ȳ_k)²   (calibration error, want 0)
        RES = Σ n_k/N (ȳ_k − ȳ)²      (discrimination, want large)
        UNC = ȳ (1 − ȳ)               (task difficulty, fixed)

    The full-granularity raw ``brier`` is reported beside the three
    terms so the binning residual is visible.  ONE corpus aggregate +
    one bin rollup; everything after is a 1-row fold.
    """
    base = df.select(
        F.least(
            F.floor(F.col(score_col) * n_bins).cast("int"),
            F.lit(n_bins - 1),
        ).alias("_b"),
        F.col(label_col).cast("double").alias("_y"),
        F.col(score_col).alias("_p"),
    )
    binned = base.groupBy("_b").agg(
        F.count("*").cast("double").alias("_n"),
        F.avg("_p").alias("_conf"),
        F.avg("_y").alias("_acc"),
    )
    glob = base.agg(
        F.count("*").cast("double").alias("_nn"),
        F.avg("_y").alias("_ybar"),
        F.avg((F.col("_p") - F.col("_y")) * (F.col("_p") - F.col("_y")))
        .alias("_brier"),
    )
    t = binned.crossJoin(F.broadcast(glob))
    return t.agg(
        F.max("_nn").cast("long").alias("n"),
        F.round(F.max("_brier"), 6).alias("brier"),
        F.round(
            F.sum(
                F.col("_n")
                / F.col("_nn")
                * (F.col("_conf") - F.col("_acc"))
                * (F.col("_conf") - F.col("_acc"))
            ),
            6,
        ).alias("reliability"),
        F.round(
            F.sum(
                F.col("_n")
                / F.col("_nn")
                * (F.col("_acc") - F.col("_ybar"))
                * (F.col("_acc") - F.col("_ybar"))
            ),
            6,
        ).alias("resolution"),
        F.round(
            F.max(F.col("_ybar") * (F.lit(1.0) - F.col("_ybar"))), 6
        ).alias("uncertainty"),
    )


def cumulative_gains(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Cumulative gains / lift chart by DESCENDING score bin — "how
    many of the positives live in the top-scoring X% of the corpus",
    the filter-threshold picker beside AUC's single number.  Bins are
    score-value bins (not global-row deciles): the per-row work is a
    scan-stage expression and every window runs over the n_bins
    catalog — a global ntile would be the documented scale cliff.

    Returns per bin, highest scores first: ``(bin, n, n_pos,
    cum_frac_rows, gain, lift)`` where gain = cumulative share of all
    positives captured and lift = gain / cum_frac_rows.
    """
    base = df.select(
        F.least(
            F.floor(F.col(score_col) * n_bins).cast("int"),
            F.lit(n_bins - 1),
        ).alias("bin"),
        F.col(label_col).cast("long").alias("_y"),
    )
    binned = base.groupBy("bin").agg(
        F.count("*").alias("n"), F.sum("_y").alias("n_pos")
    )
    glob = binned.agg(
        F.sum("n").cast("double").alias("_nn"),
        F.sum("n_pos").cast("double").alias("_np"),
    )
    w = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = binned.crossJoin(F.broadcast(glob)).withColumn(
        "_cn", F.sum("n").over(w)
    ).withColumn("_cp", F.sum("n_pos").over(w))
    return t.select(
        "bin",
        "n",
        "n_pos",
        F.round(F.col("_cn") / F.col("_nn"), 6).alias("cum_frac_rows"),
        F.round(
            F.when(F.col("_np") > 0, F.col("_cp") / F.col("_np")), 6
        ).alias("gain"),
        F.round(
            F.when(
                F.col("_np") > 0,
                (F.col("_cp") / F.col("_np"))
                / (F.col("_cn") / F.col("_nn")),
            ),
            6,
        ).alias("lift"),
    )


def bcubed(
    df: DataFrame, cluster_col: str, gold_col: str
) -> DataFrame:
    """B-cubed extrinsic clustering evaluation (Bagga & Baldwin 1998;
    the per-item precision/recall Amigó et al. 2009 showed uniquely
    satisfies all four clustering-metric constraints) — the standard
    scorecard for a dedup/entity-resolution run against gold labels.

    Per item i: P_i = |cluster(i) ∩ gold(i)| / |cluster(i)| and
    R_i = |∩| / |gold(i)|; summing over items inside a
    (cluster, gold) cell of size m gives m·(m/C) and m·(m/G), so the
    whole metric is ONE (cluster, gold) group-count plus two window
    sums — no per-item pass, no pair join.

    Returns one row: ``(n, n_clusters, n_classes, bcubed_precision,
    bcubed_recall, bcubed_f1)``.
    """
    cell = df.groupBy(
        F.col(cluster_col).alias("_cl"), F.col(gold_col).alias("_g")
    ).agg(F.count("*").alias("_m"))
    wc = Window.partitionBy("_cl")
    wg = Window.partitionBy("_g")
    # NB: window-sum columns must NOT be case-twins of _cl/_g —
    # Spark resolves column names case-insensitively, so "_G" would
    # silently REPLACE "_g" in withColumn
    x = cell.withColumn(
        "_cl_sz", F.sum("_m").over(wc)
    ).withColumn("_g_sz", F.sum("_m").over(wg))
    m = F.col("_m").cast("double")
    agg = x.agg(
        F.sum("_m").alias("_n"),
        F.count_distinct("_cl").alias("n_clusters"),
        F.count_distinct("_g").alias("n_classes"),
        F.sum(m * m / F.col("_cl_sz")).alias("_sp"),
        F.sum(m * m / F.col("_g_sz")).alias("_sr"),
    )
    p = F.col("_sp") / F.col("_n")
    r = F.col("_sr") / F.col("_n")
    return agg.select(
        F.col("_n").cast("bigint").alias("n"),
        F.col("n_clusters").cast("bigint"),
        F.col("n_classes").cast("bigint"),
        F.round(p, 6).alias("bcubed_precision"),
        F.round(r, 6).alias("bcubed_recall"),
        F.round(2 * p * r / (p + r), 6).alias("bcubed_f1"),
    )


def risk_coverage(
    df: DataFrame,
    conf_col: str,
    correct_col: str,
    id_col: str,
    coverages: list[float] = (0.5, 0.8, 1.0),
) -> DataFrame:
    """Selective-prediction scorecard: the risk-coverage curve and its
    area (AURC, Geifman & El-Yaniv 2017) plus the excess AURC
    (E-AURC, Geifman et al. 2019 — AURC minus the oracle that orders
    by correctness, so 0 means confidence ranks errors perfectly).
    This is the acceptance gate for "auto-accept the model's top X%,
    route the rest to review" quality-filter deployments.

    Sort by confidence DESC (id tiebreak for determinism); at cutoff
    i the selective risk is (errors among top i)/i; AURC is the mean
    of that running risk. The optimal curve concentrates all e errors
    at the tail: optimal AURC = (1/n)·Σ_{i=n-e+1..n} (i-(n-e))/i.

    Returns ONE row: ``(n, n_errors, aurc, e_aurc,
    risk_at_<c> ...)``, floats rounded to 6.

    Scale: the input is a SCORED EVAL catalog (bounded by
    construction — the q163 AUC sanction class); the running sums are
    one ordered window over it, and the closed-form optimal AURC
    folds over the same frame with integer ranks.
    """
    err = (~F.col(correct_col).cast("boolean")).cast("long")
    w = Window.orderBy(F.desc(conf_col), F.asc(id_col))
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = df.select(
        err.alias("_e"),
        F.row_number().over(w).alias("_i"),
        F.sum(err).over(wc).alias("_ce"),
    ).withColumn("_nn", F.count("*").over(wall))
    risk = F.col("_ce") / F.col("_i").cast("double")
    aggs = [
        F.count("*").alias("_n"),
        F.sum("_e").alias("_ne"),
        F.avg(risk).alias("_aurc"),
    ]
    for c in coverages:
        # risk at the smallest i with i >= ceil(c*n): a conditional
        # struct-min isolates that rank's running risk
        aggs.append(
            F.min(
                F.when(
                    F.col("_i")
                    >= F.ceil(F.lit(float(c)) * F.col("_nn")),
                    F.struct(F.col("_i"), risk.alias("_r")),
                )
            ).alias(f"_rc_{int(c * 100)}")
        )
    a = ranked.agg(*aggs)
    # optimal AURC: errors all ranked last
    # sum_{i=n-e+1..n} (i-(n-e))/i = e - (n-e)*(H(n) - H(n-e));
    # with e and n as scalars fold the harmonic tail exactly via a
    # sequence expression over the 1-row frame
    n = F.col("_n").cast("int")
    e = F.col("_ne").cast("int")
    opt = F.when(
        e > 0,
        F.aggregate(
            F.sequence(n - e + 1, n),
            F.lit(0.0),
            lambda acc, i: acc
            + (i - (n - e)).cast("double") / i.cast("double"),
        )
        / F.col("_n").cast("double"),
    ).otherwise(F.lit(0.0))
    out = [
        F.col("_n").cast("bigint").alias("n"),
        F.col("_ne").cast("bigint").alias("n_errors"),
        F.round(F.col("_aurc"), 6).alias("aurc"),
        F.round(F.col("_aurc") - opt, 6).alias("e_aurc"),
    ]
    for c in coverages:
        out.append(
            F.round(F.col(f"_rc_{int(c * 100)}._r"), 6).alias(
                f"risk_at_{int(c * 100)}"
            )
        )
    return a.select(*out)
