"""Sketch-driven physical join planning: pick the join strategy from
CMS sketch state instead of scanning the data twice.

Spark's own CBO needs ANALYZE-collected table stats, and AQE can only
re-plan at shuffle boundaries it already decided to create. This
module closes the remaining gap the way a warehouse planner does —
from SKETCHES (functions/sketches.cms_counters): the strategy
decision (broadcast vs sort-merge vs salted) reads two 1024-row
counter tables, never the joined data, so planning cost is O(sketch)
regardless of table size. At 100 TB the sketches are maintained
incrementally (counters merge by sum — the rollup_state contract),
so every query plans against fresh statistics for free.

Decision rules (classic):
- dim total weight ≤ broadcast_threshold  → broadcast hash join;
- else if the dim's heaviest key exceeds skew_ratio × the average
  fact-side key frequency → salted repartition join (operators/skew);
- else sort-merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cccatalog_spark.functions.sketches import (
    _CMS_W,
    cms_counters,
    cms_join_size,
)


def sketch_stats(df: DataFrame, key_col: str) -> tuple[DataFrame, int, int]:
    """(counters, total_rows, hot_bucket_bound) for a key column.
    total is EXACT (each CMS row sums all weight). The skew signal is
    ``min over hash rows of (max bucket counter)``: every key's true
    frequency is ≤ its bucket's counter in EVERY row, so this value
    upper-bounds the hottest key while discounting single-row
    collision flukes. Compare it against the expected uniform bucket
    load (total / W) — a ratio near 1 means no bucket, hence no key,
    dominates. Three scalars from a 1024-row frame: bounded-catalog
    collects by design."""
    c = cms_counters(df, key_col).persist()
    total = int(
        c.where(F.col("_r") == 0).agg(F.sum("_n")).first()[0] or 0
    )
    hot = (
        c.groupBy("_r").agg(F.max("_n").alias("_m")).agg(F.min("_m")).first()[0]
    )
    return c, total, int(hot or 0)


def adaptive_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    broadcast_threshold: int = 100_000,
    skew_ratio: float = 8.0,
    salt: int = 16,
) -> tuple[DataFrame, dict]:
    """Join ``fact ⋈ dim`` on ``key`` with the physical strategy chosen
    from sketches. Returns (joined frame, decision record) — the
    record carries the estimates so the choice is auditable (the
    EXPLAIN sibling of q158's join-size estimator).
    """
    from cccatalog_spark.operators.skew import salted_join

    cf, fact_total, fact_hot = sketch_stats(fact, key)
    cd, dim_total, _ = sketch_stats(dim, key)
    est = cms_join_size(cf, cd).first()["est"]
    decision = {
        "fact_rows": fact_total,
        "dim_rows": dim_total,
        "est_join_rows": int(est or 0),
        "fact_hot_bucket_bound": fact_hot,
    }
    avg_bucket = max(fact_total / _CMS_W, 1.0)
    if dim_total <= broadcast_threshold:
        decision["strategy"] = "broadcast"
        out = fact.join(F.broadcast(dim), key)
    elif fact_hot >= skew_ratio * avg_bucket:
        decision["strategy"] = "salted"
        out = salted_join(fact, dim, [key], salt_buckets=salt)
    else:
        decision["strategy"] = "merge"
        out = fact.join(dim.hint("merge"), key)
    return out, decision
