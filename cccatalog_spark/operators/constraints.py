"""Declarative data-quality constraint suite — the Deequ-style
"unit tests for data" gate a production ingestion pipeline runs before
publishing a batch (the engine-side analogue of the reference's
per-field cleanup assertions, reference
`src/cc_catalog_airflow/dags/util/loader/sql.py`'s NOT NULL / dedup
guarantees, re-expressed as a measurable audit instead of silent
DELETEs).

Each constraint maps to ONE aggregate expression, so the whole suite
(minus referential integrity) is a single map-side-combinable pass
over the table — the same scan at 100 TB. Referential integrity adds
one left-semi-style join against the (usually broadcastable)
reference keys. Output is one row per constraint:
``(constraint, column, metric, passed)``.

Semantics:
- ``completeness``: fraction of non-null values; passes at 1.0.
- ``uniqueness``: distinct / total among non-nulls; passes at 1.0
  (swap in HLL for billion-NDV columns; documented trade).
- ``non_negative``: fraction of non-null values ≥ 0; passes at 1.0.
- ``contained_in``: fraction of non-null values inside the allowed
  set; passes at 1.0.
- ``ref_integrity``: fraction of non-null FK values present in the
  reference column; passes at 1.0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def constraint_audit(
    df: DataFrame,
    *,
    completeness: list[str] | None = None,
    uniqueness: list[str] | None = None,
    non_negative: list[str] | None = None,
    contained_in: dict[str, list[str]] | None = None,
    ref_integrity: tuple[str, DataFrame, str] | None = None,
) -> DataFrame:
    """Run the declared constraints; see module docstring."""
    aggs: list = []
    rows: list = []  # (constraint, column) in output order
    n = F.count("*").cast("double")

    for c in completeness or []:
        aggs.append(
            (F.count(F.col(c)).cast("double") / n).alias(
                f"_comp_{c}"
            )
        )
        rows.append(("completeness", c, f"_comp_{c}"))
    for c in uniqueness or []:
        aggs.append(
            (
                F.count_distinct(F.col(c)).cast("double")
                / F.count(F.col(c)).cast("double")
            ).alias(f"_uniq_{c}")
        )
        rows.append(("uniqueness", c, f"_uniq_{c}"))
    for c in non_negative or []:
        aggs.append(
            (
                F.sum((F.col(c) >= 0).cast("long")).cast("double")
                / F.count(F.col(c)).cast("double")
            ).alias(f"_nneg_{c}")
        )
        rows.append(("non_negative", c, f"_nneg_{c}"))
    for c, allowed in (contained_in or {}).items():
        aggs.append(
            (
                F.sum(F.col(c).isin(list(allowed)).cast("long"))
                .cast("double")
                / F.count(F.col(c)).cast("double")
            ).alias(f"_in_{c}")
        )
        rows.append(("contained_in", c, f"_in_{c}"))

    scalars = df.agg(*aggs)

    if ref_integrity is not None:
        fk, ref_df, ref_col = ref_integrity
        keys = ref_df.select(
            F.col(ref_col).alias("_rk")
        ).distinct()
        matched = (
            df.where(F.col(fk).isNotNull())
            .join(
                F.broadcast(keys),
                F.col(fk) == F.col("_rk"),
                "left",
            )
            .agg(
                (
                    F.count("_rk").cast("double")
                    / F.count("*").cast("double")
                ).alias(f"_ref_{fk}")
            )
        )
        scalars = scalars.crossJoin(F.broadcast(matched))
        rows.append(("ref_integrity", fk, f"_ref_{fk}"))

    structs = F.array(
        *[
            F.struct(
                F.lit(kind).alias("constraint"),
                F.lit(col).alias("column"),
                F.round(F.col(slot), 6).alias("metric"),
                (F.col(slot) >= 1.0).alias("passed"),
            )
            for kind, col, slot in rows
        ]
    )
    return (
        scalars.select(F.explode(structs).alias("r"))
        .select("r.constraint", "r.column", "r.metric", "r.passed")
    )


def fd_audit(
    df: DataFrame,
    *,
    dependencies: list[tuple[str, str]] | None = None,
    keys: list[list[str]] | None = None,
) -> DataFrame:
    """Approximate functional-dependency and candidate-key discovery
    (the profiling pass schema-inference tools like Deequ/Metanome run
    before a migration; the reference hard-codes its FDs as UNIQUE
    indexes in `src/cc_catalog_airflow/dags/util/loader/sql.py` — this
    measures them instead).

    For each declared dependency ``lhs -> rhs``:
    - ``violations`` is the g3 measure (Kivinen & Mannila 1995): the
      minimum number of rows to delete so the FD holds exactly,
      i.e. sum over lhs-groups of (group size - mode frequency).
    - ``confidence`` = 1 - violations / n.

    For each candidate key (a column list): ``violations`` =
    n - distinct(combo); a key iff 0.

    Scale: each dependency is two shuffles keyed on (lhs, rhs) then
    lhs — partial aggregation map-side combines both; each key check
    is one count_distinct pass. One row out per declared check; the
    per-check frames are unioned (k single-row frames, k = number of
    declared checks, a bounded catalog).
    """
    outs: list[DataFrame] = []
    for lhs, rhs in dependencies or []:
        pair = (
            df.where(F.col(lhs).isNotNull())
            .groupBy(lhs, rhs)
            .agg(F.count("*").alias("_c"))
        )
        grp = pair.groupBy(lhs).agg(
            F.sum("_c").alias("_ng"), F.max("_c").alias("_mx")
        )
        viol = F.sum(F.col("_ng") - F.col("_mx"))
        outs.append(
            grp.agg(
                F.sum("_ng").alias("_n"),
                F.count("*").alias("distinct_lhs"),
                viol.alias("violations"),
            ).select(
                F.lit("fd").alias("dep_type"),
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                F.col("_n").cast("bigint").alias("n"),
                F.col("distinct_lhs").cast("bigint"),
                F.col("violations").cast("bigint"),
                F.round(
                    1.0
                    - F.col("violations").cast("double")
                    / F.col("_n").cast("double"),
                    6,
                ).alias("confidence"),
                (F.col("violations") == 0).alias("holds"),
            )
        )
    for cols in keys or []:
        outs.append(
            df.agg(
                F.count("*").alias("_n"),
                F.count_distinct(F.struct(*cols)).alias("_d"),
            ).select(
                F.lit("key").alias("dep_type"),
                F.lit(",".join(cols)).alias("lhs"),
                F.lit(None).cast("string").alias("rhs"),
                F.col("_n").cast("bigint").alias("n"),
                F.col("_d").cast("bigint").alias("distinct_lhs"),
                (F.col("_n") - F.col("_d")).cast("bigint").alias(
                    "violations"
                ),
                F.round(
                    F.col("_d").cast("double")
                    / F.col("_n").cast("double"),
                    6,
                ).alias("confidence"),
                (F.col("_n") == F.col("_d")).alias("holds"),
            )
        )
    if not outs:
        raise ValueError("declare at least one dependency or key")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
