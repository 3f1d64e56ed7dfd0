"""Pairwise-preference rating — the Bradley–Terry model fit by
Hunter's MM algorithm (Hunter 2004, "MM algorithms for generalized
Bradley-Terry models"): from "A beat B" comparison counts, recover a
strength π per item such that P(i beats j) = π_i/(π_i+π_j).

LLM-pipeline role: the aggregation step for preference data — ranking
candidate responses, annotators, or model checkpoints from pairwise
human/AI judgments before DPO/RLHF training or eval leaderboards
(the same model behind Elo-style arena scores, but order-independent
and exactly replayable).

MM update (monotone in likelihood, no learning rate):

    π_i ← W_i / Σ_{j≠i} n_ij / (π_i + π_j)

with W_i = total wins of i and n_ij = total comparisons between i and
j; each round renormalizes Σπ = 1 (the model is scale-invariant).
Deterministic: uniform init, fixed round count — an unrolled SQL
replay is exact.

Scale shape per round: the pair frame (i, j, n_ij) joins the π
catalog twice (keyed by each endpoint) and aggregates per i — all
exchanges data-proportional to the DISTINCT pair count, not the raw
comparison count (comparisons collapse to counts up front, the
map-side-combinable reduction). π is an |items|-row frame, lineage
truncated per round like pagerank; no driver state, no collect.

Reference anchor: no counterpart in the reference (SURVEY §2
extension layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cccatalog_spark.operators.dedup import _truncate_lineage


def bradley_terry(
    comparisons: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    iterations: int = 5,
) -> DataFrame:
    """Fit strengths from one row per comparison (ties not modeled).
    Returns ``(item, pi)`` with Σπ = 1, at full precision — callers
    round for output. Items with zero wins converge toward 0 (their
    true MLE under the model)."""
    wl = comparisons.select(
        F.col(winner_col).alias("w"), F.col(loser_col).alias("l")
    )
    wins = wl.groupBy(F.col("w").alias("item")).agg(
        F.count("*").cast("double").alias("wins")
    )
    # undirected comparison counts, materialized in both orientations
    # so each round's denominator is one equi-join per endpoint
    und = (
        wl.select(
            F.least("w", "l").alias("a"), F.greatest("w", "l").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count("*").cast("double").alias("n"))
    )
    pairs = und.select(
        F.col("a").alias("i"), F.col("b").alias("j"), "n"
    ).unionAll(
        und.select(F.col("b").alias("i"), F.col("a").alias("j"), "n")
    ).persist()
    items = pairs.select(F.col("i").alias("item")).distinct().persist()
    n_items = items.count()  # bounded catalog scalar
    pi = items.select("item", F.lit(1.0 / n_items).alias("pi"))
    for _ in range(iterations):
        den = (
            pairs.join(
                pi.select(F.col("item").alias("i"), F.col("pi").alias("pi_i")),
                "i",
            )
            .join(
                pi.select(F.col("item").alias("j"), F.col("pi").alias("pi_j")),
                "j",
            )
            .groupBy("i")
            .agg(
                F.sum(F.col("n") / (F.col("pi_i") + F.col("pi_j"))).alias(
                    "den"
                )
            )
        )
        raw = (
            items.join(den, items["item"] == den["i"])
            .join(wins, "item", "left")
            .select(
                "item",
                (F.coalesce("wins", F.lit(0.0)) / F.col("den")).alias(
                    "raw"
                ),
            )
        )
        tot = raw.agg(F.sum("raw").alias("_t"))
        pi = _truncate_lineage(
            raw.crossJoin(F.broadcast(tot)).select(
                "item", (F.col("raw") / F.col("_t")).alias("pi")
            )
        )
    pairs.unpersist()
    items.unpersist()
    return pi


def kendalls_w(
    df: DataFrame, item_col: str, ranker_col: str, value_col: str
) -> DataFrame:
    """Kendall's coefficient of concordance W across m rankers
    (Kendall & Babington Smith 1939, tie-corrected): one row
    ``(n_items, m_rankers, w)`` with

        W = (12·ΣR_i² − 3·m²·n·(n+1)²) / (m²·(n³−n) − m·ΣT_j),
        T_j = Σ_ties (t³ − t)  per ranker j,

    where R_i sums item i's average ranks over rankers (higher value
    = better rank... rank ascending by value; direction only flips W's
    interpretation, not its magnitude under reversal of all rankers).
    Expects one observation per (item, ranker) — complete design.

    Scale shape: ranks are per-ranker windows (partitioned by ranker,
    no global sort); ΣR_i² is one groupBy(item) + 1-row reduce; the
    tie terms one groupBy((ranker, value)).
    """
    w = Window.partitionBy("_rk").orderBy(F.col("_v"))
    ranked = (
        df.select(
            F.col(item_col).alias("_it"),
            F.col(ranker_col).alias("_rk"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .withColumn("_rmin", F.rank().over(w))
        .withColumn(
            "_nt", F.count("*").over(Window.partitionBy("_rk", "_v"))
        )
        .withColumn(
            "_r",
            F.col("_rmin").cast("double") + (F.col("_nt") - 1) / F.lit(2.0),
        )
    )
    per_item = ranked.groupBy("_it").agg(
        F.sum("_r").alias("ri"), F.count("*").alias("m")
    )
    ties = (
        ranked.groupBy("_rk", "_v")
        .agg(F.count("*").cast("double").alias("t"))
        .agg(
            F.sum(
                F.pow(F.col("t"), 3) - F.col("t")
            ).alias("tsum")
        )
    )
    agg = per_item.agg(
        F.count("*").cast("double").alias("n"),
        F.max("m").cast("double").alias("m"),
        F.sum(F.col("ri") * F.col("ri")).alias("r2"),
    ).crossJoin(F.broadcast(ties))
    num = (
        F.lit(12.0) * F.col("r2")
        - F.lit(3.0)
        * F.col("m")
        * F.col("m")
        * F.col("n")
        * F.pow(F.col("n") + 1, 2)
    )
    den = F.col("m") * F.col("m") * (
        F.pow(F.col("n"), 3) - F.col("n")
    ) - F.col("m") * F.col("tsum")
    return agg.select(
        F.col("n").cast("long").alias("n_items"),
        F.col("m").cast("long").alias("m_rankers"),
        F.round(F.when(den > 0, num / den), 6).alias("w"),
    )
