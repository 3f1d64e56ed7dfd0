"""Inclusion-dependency (IND) discovery — foreign-key candidate
profiling across tables (Bauckmann et al. SPIDER / De Marchi 2002):
for each candidate (child.col ⊆ parent.col) pair, the fraction of
DISTINCT child values that exist in the parent.  Containment 1.0
flags a referential-integrity candidate; high-but-sub-1.0 flags
orphaned rows — both are table-stakes data-quality audits before a
join-heavy pipeline trusts its keys (complements q373's intra-table
functional dependencies with the INTER-table axis).

Scale shape: per candidate, two distinct-projections (map-side
combinable, one shuffle each on the key) and one key-to-key left
semi count — never a row-level join; the per-pair 1-row results
union into the report.  No collects, no UDFs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Candidate = tuple[str, DataFrame, str, str, DataFrame, str]


def inclusion_dependencies(
    candidates: list[Candidate],
) -> DataFrame:
    """``candidates``: (child_name, child_df, child_col, parent_name,
    parent_df, parent_col) tuples.  Returns one row per candidate:
    ``(child, parent, n_child_distinct, n_contained, containment_frac,
    is_ind)`` — ``is_ind`` true iff every non-null distinct child
    value appears in the parent.
    """
    if not candidates:
        raise ValueError("at least one candidate pair required")
    outs = []
    for cn, cdf, cc, pn, pdf, pc in candidates:
        child = (
            cdf.select(F.col(cc).alias("v"))
            .where(F.col("v").isNotNull())
            .distinct()
        )
        parent = (
            pdf.select(F.col(pc).alias("v"))
            .where(F.col("v").isNotNull())
            .distinct()
        )
        hit = child.join(parent, "v", "left_semi")
        outs.append(
            child.agg(F.count("*").cast("long").alias("n_child_distinct"))
            .crossJoin(
                hit.agg(F.count("*").cast("long").alias("n_contained"))
            )
            .select(
                F.lit(f"{cn}.{cc}").alias("child"),
                F.lit(f"{pn}.{pc}").alias("parent"),
                "n_child_distinct",
                "n_contained",
                F.round(
                    F.when(
                        F.col("n_child_distinct") > 0,
                        F.col("n_contained").cast("double")
                        / F.col("n_child_distinct"),
                    ),
                    6,
                ).alias("containment_frac"),
                (F.col("n_contained") == F.col("n_child_distinct")).alias(
                    "is_ind"
                ),
            )
        )
    return reduce(DataFrame.unionAll, outs)
