"""Closed-form multi-feature linear regression (3 features +
intercept, optional ridge) — the distributed "fit a small model on a
huge table" primitive: one moment aggregate collapses the corpus to a
dozen scalars, then Cramer's rule solves the 3×3 centered normal
equations in pure column algebra. No iteration, no driver-side linear
algebra library, no collect beyond the 1-row result.

    (X'X + λI)β = X'y   on centered features;
    intercept = ȳ − Σ βᵢ x̄ᵢ ;  R² = Σ βᵢ bᵢ / S_yy  (λ=0 identity)

The ENTIRE post-aggregate algebra lives in the SQL fragments below and
is evaluated via ``F.expr`` on the Spark side and inlined verbatim
into the DuckDB oracle — one source of truth, so engine parity holds
by construction, not by careful transcription.

Scale shape: ONE map-side-combinable aggregate (12 sums), then a 1-row
projection. The same plan at any corpus size; for p features the
moment count grows as p², fine through p ≈ 30 before a Pandas-UDF
normal-equation solve becomes the better tool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# centered Gram entries (lam on the diagonal), shared Spark/SQL
_ALG = {
    "a11": "(sx1x1 - sx1 * sx1 / n + lam)",
    "a22": "(sx2x2 - sx2 * sx2 / n + lam)",
    "a33": "(sx3x3 - sx3 * sx3 / n + lam)",
    "a12": "(sx1x2 - sx1 * sx2 / n)",
    "a13": "(sx1x3 - sx1 * sx3 / n)",
    "a23": "(sx2x3 - sx2 * sx3 / n)",
    "b1": "(sx1y - sx1 * sy / n)",
    "b2": "(sx2y - sx2 * sy / n)",
    "b3": "(sx3y - sx3 * sy / n)",
    "syy": "(syy - sy * sy / n)",
}


def _expand(expr: str) -> str:
    out = expr
    for k, v in _ALG.items():
        out = out.replace(k, v)
    return out


DET_SQL = _expand(
    "(a11 * (a22 * a33 - a23 * a23)"
    " - a12 * (a12 * a33 - a23 * a13)"
    " + a13 * (a12 * a23 - a22 * a13))"
)
B1_SQL = _expand(
    "(b1 * (a22 * a33 - a23 * a23)"
    " - a12 * (b2 * a33 - a23 * b3)"
    " + a13 * (b2 * a23 - a22 * b3))"
)
B2_SQL = _expand(
    "(a11 * (b2 * a33 - a23 * b3)"
    " - b1 * (a12 * a33 - a23 * a13)"
    " + a13 * (a12 * b3 - b2 * a13))"
)
B3_SQL = _expand(
    "(a11 * (a22 * b3 - a23 * b2)"
    " - a12 * (a12 * b3 - b2 * a13)"
    " + b1 * (a12 * a23 - a22 * a13))"
)
SYY_SQL = _expand("syy")

# the final projection, phrased over the aggregate's column names —
# inlined into both engines
BETA1_SQL = f"({B1_SQL} / {DET_SQL})"
BETA2_SQL = f"({B2_SQL} / {DET_SQL})"
BETA3_SQL = f"({B3_SQL} / {DET_SQL})"
INTERCEPT_SQL = (
    f"((sy - {BETA1_SQL} * sx1 - {BETA2_SQL} * sx2"
    f" - {BETA3_SQL} * sx3) / n)"
)
# compose from ALREADY-expanded fragments — a second _expand pass
# would re-replace the literal "syy"/"b1" substrings inside them
# (double-centering the denominator; caught by the planted-model test)
R2_SQL = (
    f"(({BETA1_SQL} * {_ALG['b1']} + {BETA2_SQL} * {_ALG['b2']}"
    f" + {BETA3_SQL} * {_ALG['b3']}) / {SYY_SQL})"
)

MOMENT_ITEMS = [
    "CAST(count(*) AS DOUBLE) AS n",
    "CAST({lam} AS DOUBLE) AS lam",
    "sum({x1}) AS sx1",
    "sum({x2}) AS sx2",
    "sum({x3}) AS sx3",
    "sum({y}) AS sy",
    "sum({x1} * {x1}) AS sx1x1",
    "sum({x2} * {x2}) AS sx2x2",
    "sum({x3} * {x3}) AS sx3x3",
    "sum({x1} * {x2}) AS sx1x2",
    "sum({x1} * {x3}) AS sx1x3",
    "sum({x2} * {x3}) AS sx2x3",
    "sum({x1} * {y}) AS sx1y",
    "sum({x2} * {y}) AS sx2y",
    "sum({x3} * {y}) AS sx3y",
    "sum({y} * {y}) AS syy",
]


def ridge_regression_3(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    lam: float = 0.0,
) -> DataFrame:
    """Fit y ~ intercept + β₁x₁ + β₂x₂ + β₃x₃ (ridge λ on the centered
    Gram diagonal; λ=0 is plain OLS). Returns ONE row
    ``(n, beta_1, beta_2, beta_3, intercept, r2)`` rounded to 6.
    ``r2`` uses the OLS identity (exact at λ=0, reported as the
    in-sample fit diagnostic otherwise)."""
    assert len(x_cols) == 3
    x1, x2, x3 = x_cols
    moments = df.selectExpr(
        f"CAST({y_col} AS DOUBLE) AS _y",
        f"CAST({x1} AS DOUBLE) AS _x1",
        f"CAST({x2} AS DOUBLE) AS _x2",
        f"CAST({x3} AS DOUBLE) AS _x3",
    ).selectExpr(
        *[
            e.format(
                y="_y", x1="_x1", x2="_x2", x3="_x3", lam=float(lam)
            )
            for e in MOMENT_ITEMS
        ]
    )
    return moments.selectExpr(
        "CAST(n AS BIGINT) AS n",
        f"round({BETA1_SQL}, 6) AS beta_1",
        f"round({BETA2_SQL}, 6) AS beta_2",
        f"round({BETA3_SQL}, 6) AS beta_3",
        f"round({INTERCEPT_SQL}, 6) AS intercept",
        f"round({R2_SQL}, 6) AS r2",
    )


def oracle_sql(table_expr: str, y: str, x_cols: list[str], lam: float) -> str:
    """The DuckDB oracle for :func:`ridge_regression_3` — same
    fragments, same fold shapes."""
    x1, x2, x3 = x_cols
    moments = ",\n           ".join(
        e.format(y=y, x1=x1, x2=x2, x3=x3, lam=lam)
        for e in MOMENT_ITEMS
    )
    return f"""
    WITH m AS (SELECT {moments} FROM {table_expr})
    SELECT CAST(n AS BIGINT) AS n,
           round({BETA1_SQL}, 6) AS beta_1,
           round({BETA2_SQL}, 6) AS beta_2,
           round({BETA3_SQL}, 6) AS beta_3,
           round({INTERCEPT_SQL}, 6) AS intercept,
           round({R2_SQL}, 6) AS r2
    FROM m
    """
