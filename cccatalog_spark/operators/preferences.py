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
