"""2-D Pareto frontier (skyline) — multi-objective data selection:
"the documents no other document beats on BOTH quality and length",
the non-dominated set a curation pipeline keeps when two signals trade
off and no single score combines them honestly.

Dominance (maximize both axes): point p is dominated iff some q has
``q.x >= p.x AND q.y >= p.y`` and is strictly better on at least one
axis. Duplicated (x, y) points do not dominate each other — they
collapse into one frontier row with a count.

Algorithm (exact, two phases — the distributed-skyline standard):

1. **Local frontier per hash bucket.** Distinct (x, y) points are
   hashed into ``n_buckets`` deterministic buckets; within each
   bucket, sort by (x DESC, y DESC) and keep a point iff its y
   strictly exceeds the running max-y of everything sorted before it
   (equal-x groups: only the top-y survives, which is exactly
   dominance). One bounded window per bucket.
2. **Global frontier over the survivors.** The global skyline is a
   subset of every bucket's local skyline (dominance is transitive and
   bucket-independent), so re-running the same sweep globally over the
   union of local frontiers is exact. The global window's input is
   Σ local-frontier sizes — in practice tiny; in the adversarial
   anticorrelated case the skyline itself is O(n) and ANY exact
   algorithm returns that many rows.

Shape: one distinct-aggregate shuffle, one bucket window, one final
window over the reduced set. No joins, no pair enumeration (the
quadratic NOT EXISTS form survives only as the test/SQL oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sweep(df: DataFrame, *partition_cols: str) -> DataFrame:
    w = (
        Window.partitionBy(*partition_cols)
        if partition_cols
        else Window.partitionBy()
    )
    w = w.orderBy(F.desc("x"), F.desc("y")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        df.withColumn("_my", F.max("y").over(w))
        .where(F.col("_my").isNull() | (F.col("y") > F.col("_my")))
        .drop("_my")
    )


def pareto_frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Exact 2-D skyline, maximizing both columns. Returns one row per
    frontier POINT: ``(x, y, n_rows, rep_id)`` where ``n_rows`` counts
    source rows collapsed onto the point and ``rep_id`` is the minimum
    id (deterministic representative)."""
    pts = (
        df.select(
            F.col(x_col).alias("x"),
            F.col(y_col).alias("y"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("x", "y")
        .agg(
            F.count("*").alias("n_rows"), F.min("_id").alias("rep_id")
        )
        .withColumn("_b", F.pmod(F.hash("x", "y"), F.lit(n_buckets)))
    )
    local = _sweep(pts, "_b").drop("_b")
    return _sweep(local).select("x", "y", "n_rows", "rep_id")
