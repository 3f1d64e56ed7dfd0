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
