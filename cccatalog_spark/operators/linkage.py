"""Probabilistic record linkage (Fellegi–Sunter, JASA 1969) — the
entity-resolution scorer a catalog-merging pipeline runs when two
sources describe the same real-world things with no shared key (the
reference's provider catalogs meet exactly this when an image arrives
from two APIs; reference analog: the upsert MERGE key family,
`src/loader/sql.py`, which assumes the key exists — this operator is
the step that MAKES the key).

Model: each candidate pair carries k boolean field-agreement columns.
From a labeled training frame (``is_match`` + the same agreement
columns) estimate per-field conditional agreement rates

    m_k = P(agree_k | match),   u_k = P(agree_k | unmatch)

with add-one (Laplace) smoothing so log-weights never divide by zero.
A pair's score is the log-likelihood ratio

    score = sum_k [ agree_k ? ln(m_k/u_k) : ln((1-m_k)/(1-u_k)) ]

Scale shape: the m/u estimation is ONE aggregate over the labeled
frame producing a 1-row weights catalog; scoring cross-broadcasts that
single row into the candidate frame (sanctioned scalar broadcast) and
evaluates pure column algebra — no shuffle is added beyond whatever
blocking join produced the candidates. Blocking is the caller's job
(nation/zip/prefix keys), as in every production linker: this operator
never generates pairs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def field_weights(labeled: DataFrame, agree_cols: list[str]) -> DataFrame:
    """1-row frame of per-field log-weights: for each agreement column
    ``c`` the output has ``c__wa`` (agreement weight ln(m/u)) and
    ``c__wd`` (disagreement weight ln((1-m)/(1-u))), estimated from the
    boolean ``is_match`` column with add-one smoothing."""
    aggs = [
        F.sum(F.col("is_match").cast("long")).alias("_nm"),
        F.sum((~F.col("is_match")).cast("long")).alias("_nu"),
    ]
    for c in agree_cols:
        aggs.append(
            F.sum((F.col("is_match") & F.col(c)).cast("long")).alias(
                f"_{c}_am"
            )
        )
        aggs.append(
            F.sum((~F.col("is_match") & F.col(c)).cast("long")).alias(
                f"_{c}_au"
            )
        )
    g = labeled.agg(*aggs)
    outs = []
    for c in agree_cols:
        m = (F.col(f"_{c}_am") + 1.0) / (F.col("_nm") + 2.0)
        u = (F.col(f"_{c}_au") + 1.0) / (F.col("_nu") + 2.0)
        outs.append(F.log(m / u).alias(f"{c}__wa"))
        outs.append(F.log((1.0 - m) / (1.0 - u)).alias(f"{c}__wd"))
    return g.select(*outs)


def fellegi_sunter_score(
    candidates: DataFrame,
    labeled: DataFrame,
    agree_cols: list[str],
    threshold: float = 0.0,
) -> DataFrame:
    """Score blocked candidate pairs by the Fellegi–Sunter
    log-likelihood ratio and keep pairs with ``score >= threshold``.
    Returns the candidate frame plus a ``score`` column (rounded to 6
    for cross-engine float parity).

    ``candidates`` and ``labeled`` both need the boolean agreement
    columns; ``labeled`` additionally needs ``is_match``.
    """
    w = field_weights(labeled, agree_cols)
    score = None
    for c in agree_cols:
        term = F.when(F.col(c), F.col(f"{c}__wa")).otherwise(
            F.col(f"{c}__wd")
        )
        score = term if score is None else score + term
    scored = candidates.crossJoin(F.broadcast(w)).withColumn(
        "score", F.round(score, 6)
    )
    keep = [f for f in candidates.columns] + ["score"]
    return scored.where(F.col("score") >= threshold).select(*keep)


def score_py(
    agree: list[bool], m: list[float], u: list[float]
) -> float:
    """Pure-Python twin for tests: the same log-likelihood ratio."""
    s = 0.0
    for a, mi, ui in zip(agree, m, u):
        s += math.log(mi / ui) if a else math.log((1 - mi) / (1 - ui))
    return s
