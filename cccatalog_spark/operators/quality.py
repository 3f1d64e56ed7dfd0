"""Repetition-based document quality profiling (Gopher A1.1 family).

The Gopher repetition filters (Rae et al. 2021, appendix A1.1) reject
documents dominated by repeated fragments: the fraction of characters
covered by the single most frequent n-gram (n small), and the fraction
of characters covered by *all* duplicated n-grams (n larger). The
reference corpus here has no line structure (synthetic single-line
documents), so the line-level rules are expressed at the word level;
the n-gram rules are the published ones.

Char accounting is occurrence-based (count x gram length, overlaps not
deduplicated) — a documented simplification that keeps the measure a
pure relational aggregate: explode n-grams -> count per (doc, gram) ->
one per-doc aggregate. That plan is one shuffle on (doc_id, n, gram)
with map-side partial aggregation, then one on doc_id — no UDFs, no
per-doc quadratic scans, and the same shape at 100 TB where the
(doc_id, gram) key space is huge but perfectly partitionable.

Scale note: the explode fans each document out to ~3x its token count;
at cluster scale the groupBy benefits from AQE coalescing and never
collects. Skewed grams (stopword pairs) stay bounded because the key
includes doc_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cccatalog_spark.functions.text import tokens

# published Gopher thresholds: top 2-gram < 0.20, top 3-gram < 0.18,
# duplicated 5-gram char fraction < 0.15
TOP2_MAX = 0.20
TOP3_MAX = 0.18
DUP5_MAX = 0.15


def _ngrams(toks: Column, n: int) -> Column:
    """All (overlapping, non-distinct) word n-grams, space-joined.
    Repetitions are the signal here, so no array_distinct — unlike
    functions.text.shingles. Guarded for len < n: F.sequence(1, 0)
    counts DOWN in Spark, which would feed slice a start of 0."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def repetition_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition signals and the keep/reject verdict.

    Output: id, top2_frac, top3_frac, dup5_frac, dup_word_frac, rep_keep.
    Fractions are rounded to 6 decimals (oracle-stable float compare).
    """
    t = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col),
        t.alias("toks"),
        # total chars of the whitespace-normalized text: sum of token
        # lengths + single joining spaces (identical in both engines)
        (
            F.aggregate(
                t, F.lit(0), lambda acc, x: acc + F.length(x)
            )
            + F.greatest(F.size(t) - 1, F.lit(0))
        ).alias("total_chars"),
        F.size(t).alias("n_words"),
        F.size(F.array_distinct(t)).alias("n_distinct_words"),
    )

    # single explode carrying every n we need, tagged by n: one shuffle.
    # NB the tag must come from a closure factory — a `lambda g, n=n:`
    # two-parameter lambda would be bound by F.transform as its
    # (element, index) form, silently shadowing n with the array index.
    def _tagged(n: int) -> Column:
        return F.transform(
            _ngrams(F.col("toks"), n),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram")),
        )

    grams = base.select(
        id_col,
        "total_chars",
        F.explode(
            F.flatten(F.array(*[_tagged(n) for n in (2, 3, 5)]))
        ).alias("g"),
    ).select(id_col, "total_chars", "g.n", "g.gram")

    counts = grams.groupBy(id_col, "total_chars", "n", "gram").agg(
        F.count("*").alias("c")
    )
    per_n = counts.groupBy(id_col, "total_chars", "n").agg(
        # most-frequent gram's char coverage; ties broken toward the
        # larger coverage so the fraction is deterministic
        F.expr(
            "max_by(c * length(gram), struct(c, c * length(gram)))"
        ).alias("top_chars"),
        F.sum(
            F.when(F.col("c") > 1, F.col("c") * F.length("gram")).otherwise(0)
        ).alias("dup_chars"),
    )
    wide = per_n.groupBy(id_col, "total_chars").agg(
        F.max(F.when(F.col("n") == 2, F.col("top_chars"))).alias("t2"),
        F.max(F.when(F.col("n") == 3, F.col("top_chars"))).alias("t3"),
        F.max(F.when(F.col("n") == 5, F.col("dup_chars"))).alias("d5"),
    )
    # total_chars rides with base (not wide) so a document too short to
    # produce any n-gram still gets zero fractions, not nulls
    out = base.select(
        id_col, "total_chars", "n_words", "n_distinct_words"
    ).join(wide.select(id_col, "t2", "t3", "d5"), id_col, "left")
    frac = lambda c: F.round(  # noqa: E731
        F.coalesce(c, F.lit(0)) / F.col("total_chars"), 6
    )
    return out.select(
        id_col,
        frac(F.col("t2")).alias("top2_frac"),
        frac(F.col("t3")).alias("top3_frac"),
        frac(F.col("d5")).alias("dup5_frac"),
        F.round(
            1.0 - F.col("n_distinct_words") / F.col("n_words"), 6
        ).alias("dup_word_frac"),
        (
            (frac(F.col("t2")) < TOP2_MAX)
            & (frac(F.col("t3")) < TOP3_MAX)
            & (frac(F.col("d5")) < DUP5_MAX)
        ).alias("rep_keep"),
    )


def percentile_normalize(
    df: DataFrame,
    group_col: str,
    score_col: str,
    tiebreak_cols: list[str],
    *,
    out_col: str = "pct_rank",
) -> DataFrame:
    """Percentile-rank calibration of a raw score within each group:
    adds ``out_col`` = percent_rank over (score, tiebreaks) inside the
    group — the cross-source score-calibration step before a GLOBAL
    quality threshold (raw heuristic scores are not comparable across
    sources; their per-source ranks are).

    The tiebreak columns must make the ordering total, so the rank —
    and therefore the output — is deterministic and oracle-checkable.

    Scale: one exchange keyed by group + an in-partition sort
    (spillable); percent_rank needs only the group's row count, not a
    second pass.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col), *[F.col(c) for c in tiebreak_cols]
    )
    return df.withColumn(out_col, F.percent_rank().over(w))


def wilson_gate(
    df: DataFrame,
    group_col: str,
    defect_col: str,
    *,
    z: float = 1.96,
    max_rate: float = 0.1,
) -> DataFrame:
    """Per-group defect-rate gate on the Wilson score interval's LOWER
    bound (Wilson 1927) — the source-quarantine rule that doesn't get
    fooled by small samples: a source with 2/3 defective docs has a
    high point rate but a wide interval, so it is NOT quarantined
    until the evidence clears ``max_rate`` at confidence ``z``.

        lb = (p + z²/2n − z·√((p(1−p) + z²/4n)/n)) / (1 + z²/n)

    Returns ``(group, n_docs, n_defects, defect_rate, wilson_lb,
    quarantine)``.  ``defect_col`` is any boolean defect predicate
    (too-short, mojibake, blocklisted…).

    Scale: ONE map-side-combinable aggregate keyed by group; the bound
    is closed-form column algebra on (n, d) — no second pass, no UDF.
    """
    g = df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(defect_col).cast("long")).alias("n_defects"),
    )
    n = F.col("n_docs").cast("double")
    p = F.col("n_defects") / n
    z2 = F.lit(z * z)
    lb = (
        p
        + z2 / (F.lit(2.0) * n)
        - F.lit(z)
        * F.sqrt((p * (F.lit(1.0) - p) + z2 / (F.lit(4.0) * n)) / n)
    ) / (F.lit(1.0) + z2 / n)
    return g.select(
        group_col,
        "n_docs",
        "n_defects",
        F.round(p, 6).alias("defect_rate"),
        F.round(lb, 6).alias("wilson_lb"),
        (lb > F.lit(max_rate)).alias("quarantine"),
    )


def eb_shrunk_rate(
    df: DataFrame,
    group_col: str,
    flag_col: str,
    *,
    prior_strength: float = 20.0,
) -> DataFrame:
    """Empirical-Bayes shrunk per-group rate (beta-binomial posterior
    mean with a corpus-wide prior): the domain-reputation smoother —
    a 2-doc domain with 2 flagged docs should NOT outrank a 1000-doc
    domain at 40%; its estimate shrinks toward the corpus mean until
    its sample earns the distance.

        shrunk = (flags_g + k·p_corpus) / (n_g + k)

    ``k = prior_strength`` is the prior's pseudo-count weight.
    Returns ``(group, n_docs, n_flagged, raw_rate, shrunk_rate)``.
    Complements ``wilson_gate`` (hard quarantine bound) with a ranking
    score.

    Scale: one map-side-combinable group aggregate + a 1-row corpus
    prior broadcast; closed-form algebra after."""
    g = df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(flag_col).cast("long")).alias("n_flagged"),
    )
    prior = g.agg(
        (
            F.sum("n_flagged").cast("double")
            / F.sum("n_docs").cast("double")
        ).alias("_pg")
    )
    k = F.lit(float(prior_strength))
    t = g.crossJoin(F.broadcast(prior))
    n = F.col("n_docs").cast("double")
    return t.select(
        group_col,
        "n_docs",
        "n_flagged",
        F.round(F.col("n_flagged") / n, 6).alias("raw_rate"),
        F.round(
            (F.col("n_flagged") + k * F.col("_pg")) / (n + k), 6
        ).alias("shrunk_rate"),
    )


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    *,
    z: float = 3.0,
    out_col: str = "is_outlier",
) -> DataFrame:
    """Robust per-group outlier flagging by median/MAD (the
    quality-score gate that survives heavy-tailed score distributions
    where mean/stddev gates drown): flag rows with
    ``|v − median| > z · MAD``, both statistics the *discrete* median
    (percentile_disc(0.5) semantics — an actual datum).

    Scale shape: medians come from rank arithmetic inside a window
    (row_number + count over the group, pick rank ceil(n/2)) — one
    exchange per pass, sorts spillable, NO collect_list, so
    billion-row groups hold (contrast functions/popularity.
    percentile_disc, which documents its bounded-group limit). Two
    passes: one for the median, one for the MAD over deviations.
    Adds ``median``, ``mad``, ``deviation``, ``out_col``.
    """
    def disc_median(frame: DataFrame, col: str, out: str) -> DataFrame:
        wo = Window.partitionBy(group_col).orderBy(F.col(col), F.col(id_col))
        wg = Window.partitionBy(group_col)
        ranked = frame.withColumn("__rn", F.row_number().over(wo)).withColumn(
            "__n", F.count("*").over(wg)
        )
        pick = F.when(
            F.col("__rn") == F.ceil(F.col("__n") / 2), F.col(col)
        )
        return ranked.withColumn(out, F.max(pick).over(wg)).drop(
            "__rn", "__n"
        )

    med = disc_median(df, value_col, "median").withColumn(
        "deviation", F.abs(F.col(value_col) - F.col("median"))
    )
    mad = disc_median(med, "deviation", "mad")
    return mad.withColumn(
        out_col, F.col("deviation") > F.lit(z) * F.col("mad")
    )


def label_model_vote(
    df: DataFrame,
    id_col: str,
    votes: list[tuple[str, Column, float]],
) -> DataFrame:
    """Weak-supervision label aggregation (Snorkel-style majority
    vote): each labeling function is a (name, vote_column, weight)
    triple whose column evaluates to +1 (keep), −1 (drop), or NULL
    (abstain). The model emits the accuracy-weighted vote sum, the
    participating-rule count, and the decision (sign of the sum;
    NULL on an exact tie or all-abstain) — the cheap consensus layer
    that turns a pile of noisy quality heuristics into one training
    label without hand-labeling.

    Shape: pure column algebra in the scan stage — no shuffle, no UDF,
    no state; every labeling function is evaluated once per row in
    whole-stage codegen. (Learning the weights is the offline,
    bounded-size problem — here they arrive as constants, the same
    split as IVF centroids.)
    """
    if not votes:
        raise ValueError("need at least one labeling function")
    terms = [
        F.when(v.isNotNull(), v.cast("double") * F.lit(float(w)))
        for _, v, w in votes
    ]
    participating = sum(
        (F.when(v.isNotNull(), 1).otherwise(0) for _, v, _ in votes),
        F.lit(0),
    )
    total = sum(
        (F.coalesce(t, F.lit(0.0)) for t in terms), F.lit(0.0)
    )
    decision = (
        F.when(total > 0, F.lit(1))
        .when(total < 0, F.lit(-1))
        .otherwise(F.lit(None).cast("int"))
    )
    out = df.select(
        F.col(id_col),
        *[
            v.cast("int").alias(f"lf_{name}")
            for name, v, _ in votes
        ],
        participating.alias("n_rules"),
        F.round(total, 6).alias("vote_sum"),
        decision.alias("label"),
    )
    return out


def filter_funnel(
    df: DataFrame,
    gates: list[tuple[str, Column]],
    token_col: Column | None = None,
) -> DataFrame:
    """Quality-filter funnel attrition report: apply the gates
    CUMULATIVELY (a doc must pass every earlier gate to reach the
    next) and emit one row per stage — ``(stage_idx, stage, docs_in,
    docs_out, survival_frac, cumulative_frac, tokens_out)`` — the
    observability artifact every corpus-cleaning pipeline publishes
    before committing to a filter chain.

    ``token_col`` (default: whitespace token count of nothing — pass
    an expression to track token retention) is summed over survivors
    at each stage.

    Scale shape: ONE scan — the k gate booleans and their cumulative
    ANDs are plain columns, the per-stage sums one aggregate; the
    k-row unpivot happens on the 1-row result via stack. No shuffle
    except the final reduce.
    """
    if not gates:
        raise ValueError("at least one gate required")
    tok = token_col if token_col is not None else F.lit(0)
    cur = df.select(
        *[g.alias(f"_g{i}") for i, (_, g) in enumerate(gates)],
        tok.cast("double").alias("_tok"),
    )
    cum = F.lit(True)
    aggs = [
        F.count("*").cast("long").alias("n0"),
        F.sum("_tok").alias("t0"),
    ]
    for i in range(len(gates)):
        cum = cum & F.col(f"_g{i}")
        aggs.append(
            F.sum(cum.cast("long")).cast("long").alias(f"n{i + 1}")
        )
        aggs.append(
            F.sum(F.when(cum, F.col("_tok")).otherwise(0.0)).alias(
                f"t{i + 1}"
            )
        )
    one = cur.agg(*aggs)
    # Build stack() from Column literals, never interpolated SQL: a
    # caller-supplied stage name with quotes OR backslashes reaches
    # the plan as an opaque literal, so no escaping discipline exists
    # to get wrong (the string-building form silently ate backslashes
    # and let a trailing backslash escape the closing quote).
    stack_cols: list[Column] = [F.lit(len(gates))]
    for i, (name, _) in enumerate(gates):
        stack_cols.extend(
            [
                F.lit(i + 1),
                F.lit(name),
                F.col(f"n{i}"),
                F.col(f"n{i + 1}"),
                F.col(f"t{i + 1}"),
            ]
        )
    stacked = F.stack(*stack_cols).alias(
        "stage_idx", "stage", "docs_in", "docs_out", "tokens_out"
    )
    return one.select(stacked, F.col("n0")).select(
        F.col("stage_idx").cast("long").alias("stage_idx"),
        "stage",
        "docs_in",
        "docs_out",
        F.round(
            F.when(
                F.col("docs_in") > 0,
                F.col("docs_out").cast("double") / F.col("docs_in"),
            ),
            6,
        ).alias("survival_frac"),
        F.round(
            F.when(
                F.col("n0") > 0,
                F.col("docs_out").cast("double") / F.col("n0"),
            ),
            6,
        ).alias("cumulative_frac"),
        F.col("tokens_out").cast("long").alias("tokens_out"),
    )
