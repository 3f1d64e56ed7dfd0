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
    # ONE driver job for both scalars (was two): every hash row's
    # counters sum to the SAME exact total, so any row's sum works —
    # take max over the per-row sums; hot stays min-over-rows of the
    # per-row max bucket
    row = (
        c.groupBy("_r")
        .agg(F.max("_n").alias("_m"), F.sum("_n").alias("_t"))
        .agg(F.min("_m").alias("_hot"), F.max("_t").alias("_total"))
        .first()
    )
    return c, int(row["_total"] or 0), int(row["_hot"] or 0)


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
    # the sketches are only inputs to the decision — release them
    # before the joined frame (which never reads them) executes
    cf.unpersist()
    cd.unpersist()
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


def lsh_parameter_plan(
    spark,
    num_hashes: int = 16,
    threshold: float = 0.5,
    s_grid: int = 41,
    fp_weight: float = 1.0,
    fn_weight: float = 1.0,
) -> DataFrame:
    """Pick MinHash-LSH banding parameters BEFORE the 100 TB run: for
    every (bands b, rows-per-band r) factorization of the signature
    length, integrate the S-curve ``P(candidate | s) = 1-(1-s^r)^b``
    (Leskovec-Rajaraman-Ullman ch.3) against the target Jaccard
    threshold — false-positive area below the threshold (wasted
    verify joins), false-negative area above it (missed near-dups) —
    and rank by weighted cost. The planner-side complement of q245's
    after-the-fact recall audit.

    Pure catalog math: |divisors| x s_grid rows total; no corpus
    input. Returns ``(b, r, fp_area, fn_area, cost, rank)`` with
    rank 1 = recommended; areas are Riemann sums on the s-grid,
    rounded 6 (ranking uses the rounded cost so the argmin is
    cross-engine deterministic; ties break to fewer bands).
    """
    if num_hashes < 2:
        raise ValueError("num_hashes must be >= 2")
    if not 0 < threshold < 1:
        raise ValueError("threshold must be in (0, 1)")
    from pyspark.sql.window import Window

    combos = [
        (b, num_hashes // b)
        for b in range(1, num_hashes + 1)
        if num_hashes % b == 0
    ]
    cdf = spark.createDataFrame(combos, ["b", "r"])
    step = 1.0 / (s_grid - 1)
    grid = cdf.select(
        "b", "r",
        F.explode(
            F.sequence(F.lit(0), F.lit(s_grid - 1))
        ).alias("i"),
    ).select(
        "b", "r", (F.col("i") * F.lit(step)).alias("s")
    )
    p = 1.0 - F.pow(
        1.0 - F.pow(F.col("s"), F.col("r").cast("double")),
        F.col("b").cast("double"),
    )
    areas = grid.groupBy("b", "r").agg(
        F.round(
            F.sum(F.when(F.col("s") < threshold, p).otherwise(0.0))
            * step,
            6,
        ).alias("fp_area"),
        F.round(
            F.sum(F.when(F.col("s") >= threshold, 1.0 - p).otherwise(0.0))
            * step,
            6,
        ).alias("fn_area"),
    )
    cost = F.round(
        F.lit(fp_weight) * F.col("fp_area")
        + F.lit(fn_weight) * F.col("fn_area"),
        6,
    )
    w = Window.orderBy(cost.asc(), F.col("b").asc())
    return areas.select(
        "b", "r", "fp_area", "fn_area", cost.alias("cost"),
        F.row_number().over(w).alias("rank"),
    )
