"""Statistical-dependence and digit-law screens over categorical /
numeric columns — the corpus-health questions "are these two metadata
fields entangled?" (stratification, leakage, scraper bugs) and "do
these numbers look organic?" (Benford's law, the classic synthetic-
data / fraud tell). Complements the chi-square test (q175) and WOE/IV
(operators/woe): MI is symmetric and multi-class, Benford needs no
labels at all.

Both are single-aggregation shapes: a contingency groupBy whose
output is |X|·|Y| (resp. 9) rows, with marginals broadcast back —
map-side combinable, no windows, no collect.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mutual_information(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """1 row ``(n, mi, hx, hy, nmi)``: mutual information in nats
    between two categorical columns, the marginal entropies, and the
    sqrt-normalized NMI ``mi / sqrt(hx*hy)`` (0 when either marginal
    entropy is 0). All probabilities are maximum-likelihood cell
    shares; rounds to 6.

    Shape: one (x, y) contingency aggregate; marginals derive from it
    by a second tiny groupBy (|cells| rows in, never the corpus), so
    the corpus is scanned exactly once."""
    cells = (
        df.select(F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))
        .groupBy("_x", "_y")
        .agg(F.count("*").alias("_c"))
        .persist()
    )
    tot = cells.agg(F.sum("_c").alias("_n"))
    mx = cells.groupBy("_x").agg(F.sum("_c").alias("_cx"))
    my = cells.groupBy("_y").agg(F.sum("_c").alias("_cy"))
    joined = (
        cells.join(F.broadcast(mx), "_x")
        .join(F.broadcast(my), "_y")
        .crossJoin(F.broadcast(tot))
    )
    n = F.col("_n").cast("double")
    pxy = F.col("_c") / n
    px = F.col("_cx") / n
    py = F.col("_cy") / n
    parts = joined.agg(
        F.max("_n").cast("long").alias("n"),
        F.sum(pxy * F.log(pxy / (px * py))).alias("_mi"),
    )
    hx = mx.crossJoin(F.broadcast(tot)).agg(
        (-F.sum((F.col("_cx") / n) * F.log(F.col("_cx") / n))).alias("_hx")
    )
    hy = my.crossJoin(F.broadcast(tot)).agg(
        (-F.sum((F.col("_cy") / n) * F.log(F.col("_cy") / n))).alias("_hy")
    )
    denom = F.sqrt(F.col("_hx") * F.col("_hy"))
    return (
        parts.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            "n",
            F.round("_mi", 6).alias("mi"),
            F.round("_hx", 6).alias("hx"),
            F.round("_hy", 6).alias("hy"),
            F.round(
                F.when(denom > 0, F.col("_mi") / denom).otherwise(0.0), 6
            ).alias("nmi"),
        )
    )


def benford_audit(
    df: DataFrame, value_col: str, scale: int = 100
) -> DataFrame:
    """Per-digit Benford's-law audit of a positive numeric column: one
    row per leading digit 1-9 with ``(digit, n, share, expected,
    chisq)``, where ``chisq`` is the total Pearson statistic repeated
    on every row (8 degrees of freedom against the Benford
    expectation).

    The leading digit is taken from the decimal string of the value
    scaled to an integer (``round(value*scale)``) — pure integer/string
    algebra, immune to the ``floor(log10(x))`` float-boundary bug AND
    to cross-engine float formatting (both engines print integers
    identically). Zero/negative rows are excluded."""
    v = F.round(F.col(value_col).cast("double") * scale).cast("long")
    d = (
        df.select(v.alias("_v"))
        .where(F.col("_v") > 0)
        .select(
            F.substring(F.col("_v").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
        .persist()
    )
    tot = d.agg(F.sum("n").alias("_t"))
    exp = F.log10(1.0 + 1.0 / F.col("digit"))
    scored = d.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        (F.col("n") / F.col("_t")).alias("_share"),
        exp.alias("_exp"),
        "_t",
    )
    chi = scored.agg(
        F.sum(
            (F.col("n") - F.col("_exp") * F.col("_t"))
            * (F.col("n") - F.col("_exp") * F.col("_t"))
            / (F.col("_exp") * F.col("_t"))
        ).alias("_chi")
    )
    return scored.crossJoin(F.broadcast(chi)).select(
        "digit",
        "n",
        F.round("_share", 6).alias("share"),
        F.round("_exp", 6).alias("expected"),
        F.round("_chi", 6).alias("chisq"),
    )


def mi_py(cells: dict[tuple, int]) -> float:
    """Pure-Python MI twin for tests (nats)."""
    n = sum(cells.values())
    mx: dict = {}
    my: dict = {}
    for (a, b), c in cells.items():
        mx[a] = mx.get(a, 0) + c
        my[b] = my.get(b, 0) + c
    mi = 0.0
    for (a, b), c in cells.items():
        pxy = c / n
        mi += pxy * math.log(pxy / ((mx[a] / n) * (my[b] / n)))
    return mi

def spearman_corr(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Spearman rank correlation with the standard average-rank tie
    treatment (Spearman 1904): Pearson's r computed on mid-ranks —
    the monotone-association measure that survives any monotone
    rescaling of either column (chars-vs-tokens, score-vs-score
    drift), where raw Pearson only sees lines.

    Mid-ranks come from the distinct-value catalog, never a global
    sort of raw rows: for a value with ``c`` occurrences below which
    ``cum_before`` rows sort, every occurrence gets rank
    ``cum_before + (c+1)/2``.

    Returns one row ``(n, rho)``, rho rounded 6.

    Scale shape: two (value, count) catalog aggregates + one window
    over each catalog (catalog-sized), two keyed joins to re-attach
    ranks, and ONE corr aggregate. The corpus is never sorted and
    never self-joined.
    """
    from pyspark.sql.window import Window

    def ranks(col: str, alias: str) -> DataFrame:
        cat = (
            df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
            .groupBy(F.col(col).alias("_v"))
            .agg(F.count("*").alias("_c"))
        )
        w = Window.orderBy("_v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return cat.select(
            F.col("_v").alias(col),
            (
                F.sum("_c").over(w)
                - F.col("_c")
                + (F.col("_c") + 1) / 2.0
            ).alias(alias),
        )

    base = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(x_col, y_col)
    ranked = base.join(ranks(x_col, "_rx"), x_col).join(
        ranks(y_col, "_ry"), y_col
    )
    return ranked.agg(
        F.count("*").alias("n"),
        F.round(F.corr("_rx", "_ry"), 6).alias("rho"),
    )


def kendall_tau_b(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Kendall's tau-b (Kendall 1945, the tie-corrected form) from
    the joint distinct-value CELL catalog: concordant/discordant
    pair mass is a cell-catalog self-join (catalog², never rows²),
    so the caller buckets near-continuous columns first — the same
    pre-binning contract as mutual_information above.

        tau_b = (C − D) / sqrt((n0 − n1)(n0 − n2))
        n0 = n(n−1)/2,  n1 = Σ_x t_x(t_x−1)/2,  n2 = Σ_y t_y(t_y−1)/2

    Every count stays integer until the final division, so engines
    agree bit-for-bit. Returns one row ``(n, concordant, discordant,
    tau_b)``, tau rounded 6.

    Scale shape: one (x, y, cnt) aggregate; the self-join runs on
    that catalog with an x-ordering predicate (each unordered pair
    counted once); marginal tie terms are two more catalog
    aggregates; final algebra on a 1-row frame.
    """
    base = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))
    cells = base.groupBy("_x", "_y").agg(F.count("*").alias("_c"))
    cells = cells.persist()
    a = cells.alias("a")
    b = cells.alias("b")
    cd = (
        a.join(b, F.col("a._x") < F.col("b._x"))
        .agg(
            F.sum(
                F.when(
                    F.col("b._y") > F.col("a._y"),
                    F.col("a._c") * F.col("b._c"),
                ).otherwise(F.lit(0))
            ).alias("c"),
            F.sum(
                F.when(
                    F.col("b._y") < F.col("a._y"),
                    F.col("a._c") * F.col("b._c"),
                ).otherwise(F.lit(0))
            ).alias("d"),
        )
    )
    tx = (
        cells.groupBy("_x")
        .agg(F.sum("_c").alias("_t"))
        .agg(
            F.sum("_t").alias("n"),
            F.sum(F.col("_t") * (F.col("_t") - 1) / 2).alias("n1"),
        )
    )
    ty = (
        cells.groupBy("_y")
        .agg(F.sum("_c").alias("_t"))
        .agg(F.sum(F.col("_t") * (F.col("_t") - 1) / 2).alias("n2"))
    )
    joined = cd.crossJoin(F.broadcast(tx)).crossJoin(F.broadcast(ty))
    n0 = F.col("n") * (F.col("n") - 1) / 2
    denom = F.sqrt((n0 - F.col("n1")) * (n0 - F.col("n2")))
    # an all-tied-x input empties the self-join: its lone aggregate
    # row carries null sums, which are genuinely zero pair mass
    c0 = F.coalesce(F.col("c"), F.lit(0))
    d0 = F.coalesce(F.col("d"), F.lit(0))
    return joined.select(
        F.col("n").cast("long").alias("n"),
        c0.cast("long").alias("concordant"),
        d0.cast("long").alias("discordant"),
        F.round(F.when(denom > 0, (c0 - d0) / denom), 6).alias("tau_b"),
    )

def chi2_cell_residuals(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Adjusted standardized residuals for every contingency cell
    (Haberman 1973) — the DIAGNOSTIC behind a significant chi-square
    (q175): which (x, y) cells actually drive the dependence, and in
    which direction:

        adj = (O − E) / sqrt(E · (1 − r/N) · (1 − c/N))

    asymptotically N(0,1) under independence, so |adj| > 2 names the
    culprit cells.

    Returns one row per observed cell: ``(x, y, observed, expected,
    adj_residual)``, floats rounded 6.

    Scale shape: the contingency groupBy collapses the corpus to the
    |X|·|Y| cell catalog; marginals are two more catalog aggregates
    broadcast back; the residual algebra is codegen on catalog rows.
    """
    base = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
    cells = base.groupBy("x", "y").agg(
        F.count("*").cast("double").alias("o")
    )
    rx = cells.groupBy("x").agg(F.sum("o").alias("_r"))
    cy = cells.groupBy("y").agg(F.sum("o").alias("_c"))
    nn = cells.agg(F.sum("o").alias("_n"))
    j = (
        cells.join(F.broadcast(rx), "x")
        .join(F.broadcast(cy), "y")
        .crossJoin(F.broadcast(nn))
    )
    e = F.col("_r") * F.col("_c") / F.col("_n")
    denom = F.sqrt(
        e
        * (1.0 - F.col("_r") / F.col("_n"))
        * (1.0 - F.col("_c") / F.col("_n"))
    )
    return j.select(
        "x",
        "y",
        F.col("o").cast("long").alias("observed"),
        F.round(e, 6).alias("expected"),
        F.round(
            F.when(denom > 0, (F.col("o") - e) / denom), 6
        ).alias("adj_residual"),
    )


def cramers_v(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Cramér's V (1946) association strength between two categorical
    columns — the [0, 1]-scaled companion to the chi-square test
    (q175): V = sqrt(χ² / (n · (min(r, c) − 1))). The pairwise screen
    a feature-audit runs across every categorical column pair to find
    redundant or leaking metadata fields.

    Returns ONE row ``(x, y, n, r, c, chi2, v)``.

    Scale shape: identical to :func:`mutual_information` — one
    contingency groupBy collapsing the table to r·c rows, marginals
    derived from that catalog and broadcast back; χ² folds over
    observed cells only, with the missing-cell mass Σ E_ij over
    absent (i, j) added in closed form (n − ΣE_present), so sparse
    contingency tables need no dense expansion.
    """
    cells = (
        df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(
            F.col(x_col).cast("string").alias("_x"),
            F.col(y_col).cast("string").alias("_y"),
        )
        .agg(F.count("*").alias("_o"))
        # three consumers (row marginals, column marginals, the cell
        # join) — persist so the table is contingency-scanned once
        .persist()
    )
    rx = cells.groupBy("_x").agg(F.sum("_o").alias("_rx"))
    cy = cells.groupBy("_y").agg(F.sum("_o").alias("_cy"))
    joined = cells.join(F.broadcast(rx), "_x").join(
        F.broadcast(cy), "_y"
    )
    tot = joined.agg(
        F.sum("_o").alias("n_pairs"),
        F.count("*").alias("_cells"),
    )
    # χ² = Σ_present (O−E)²/E + (n − Σ_present E); absent cells have
    # O = 0 so each contributes exactly E_ij.
    e = F.col("_rx") * F.col("_cy")  # scaled by n below
    stats = joined.crossJoin(F.broadcast(tot)).select(
        F.col("n_pairs"),
        (
            (F.col("_o") - e / F.col("n_pairs"))
            * (F.col("_o") - e / F.col("n_pairs"))
            / (e / F.col("n_pairs"))
        ).alias("_term"),
        (e / F.col("n_pairs")).alias("_e"),
        "_x",
        "_y",
    )
    agg = stats.groupBy("n_pairs").agg(
        F.sum("_term").alias("_chi_present"),
        F.sum("_e").alias("_e_present"),
        F.count_distinct("_x").alias("_r"),
        F.count_distinct("_y").alias("_c"),
    )
    chi2 = F.col("_chi_present") + (
        F.col("n_pairs").cast("double") - F.col("_e_present")
    )
    denom = F.col("n_pairs").cast("double") * (
        F.least(F.col("_r"), F.col("_c")).cast("double") - 1.0
    )
    v = F.when(denom > 0, F.sqrt(chi2 / denom)).otherwise(F.lit(0.0))
    return agg.select(
        F.lit(x_col).alias("x"),
        F.lit(y_col).alias("y"),
        F.col("n_pairs").cast("long").alias("n"),
        F.col("_r").cast("long").alias("r"),
        F.col("_c").cast("long").alias("c"),
        F.round(chi2, 6).alias("chi2"),
        F.round(v, 6).alias("v"),
    )
