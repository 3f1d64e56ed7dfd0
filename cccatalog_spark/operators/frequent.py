"""Distributed heavy hitters (frequent items) over an item stream —
vocabulary heads, hot domains, template sentences: the corpus-profiling
primitive behind stopword lists, boilerplate detection, and skew
diagnosis.

Two-pass exact design (Misra-Gries candidates → exact recount), the
standard shape that is both scale-safe and oracle-checkable:

1. **Candidate pass** — each partition builds a Misra-Gries summary of
   at most ``capacity`` items via ``mapInPandas``. Batches are
   pre-aggregated vectorized (``value_counts``), then merged into the
   summary with the mergeable-summaries compression (Agarwal et al.,
   PODS'12): keep the ``capacity`` largest, subtract the
   (capacity+1)-th count from survivors. Guarantee: any item with
   partition count > n_p/(capacity+1) survives its partition summary,
   so by pigeonhole any item with GLOBAL count > N/(capacity+1)
   appears in at least one summary — the candidate union is a strict
   superset of the true heavy hitters whenever
   ``min_share >= 1/(capacity+1)`` (asserted).
2. **Exact pass** — the item stream is semi-joined (broadcast; the
   candidate set is <= #partitions x capacity rows) and recounted
   exactly; the threshold filter then makes the OUTPUT exact, not
   approximate — the sketch only bounds the rescan set.

State per task is O(capacity); nothing ever collects the raw stream.
The reference has no corpus profiler (extension layer, SURVEY §2).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_summaries(items: DataFrame, item_col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: (item, lb) with at most
    ``capacity`` rows per partition; lb underestimates the partition
    count by at most n_p/(capacity+1)."""

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: pd.Series = pd.Series(dtype="int64")
        for pdf in pdfs:
            batch = pdf[item_col].value_counts()
            summary = summary.add(batch, fill_value=0).astype("int64")
            if len(summary) > capacity:
                summary = summary.nlargest(capacity + 1)
                summary = (summary - summary.iloc[-1]).iloc[:-1]
                summary = summary[summary > 0]
        yield pd.DataFrame(
            {item_col: summary.index.astype(str), "lb": summary.values}
        )

    return items.mapInPandas(run, schema=f"{item_col} string, lb long")


def heavy_hitters(
    items: DataFrame,
    item_col: str,
    min_share: float,
    capacity: int = 256,
) -> DataFrame:
    """Exact items with frequency >= ceil(min_share * N): ``(item,
    cnt, share)``. ``min_share`` must be >= 1/(capacity+1) for the
    candidate superset guarantee to hold (raises otherwise)."""
    if min_share < 1.0 / (capacity + 1):
        raise ValueError(
            f"min_share={min_share} below the Misra-Gries guarantee "
            f"1/(capacity+1)={1.0 / (capacity + 1):.6f}; raise capacity"
        )
    cand = (
        _mg_summaries(items, item_col, capacity)
        .select(item_col)
        .distinct()
    )
    total = items.agg(F.count("*").alias("total"))
    return (
        items.join(F.broadcast(cand), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") >= F.ceil(F.lit(min_share) * F.col("total")))
        .select(
            item_col,
            "cnt",
            F.round(F.col("cnt") / F.col("total"), 6).alias("share"),
        )
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float = 0.01,
    min_confidence: float = 0.0,
) -> DataFrame:
    """A-Priori association rules over (basket, item) rows — the
    tag-co-occurrence curator: which tags/domains/labels imply which
    others, with enough support to act on (build tag vocabularies,
    collapse synonym tags, flag spam tag rings). Complements
    corpus_stats.pmi_pairs: PMI measures pointwise association
    strength; rules carry directional confidence and lift with an
    explicit support floor.

    Returns one row per ordered rule A=>B (both directions of each
    frequent pair): ``(antecedent, consequent, pair_n, support,
    confidence, lift)``, support floors applied to BOTH the pair and
    (via A-Priori monotonicity) each item.

    Scale shape: baskets are deduped (basket,item) first; item supports
    are one groupBy; the frequent-item catalog (<= 1/min_support rows
    by definition) broadcasts back as a semi-join BEFORE the pair
    self-join, so the per-basket explosion is quadratic only in each
    basket's FREQUENT items (the A-Priori prune). Pair counting is one
    shuffle keyed by the pair; the two item-support joins at the end
    are broadcasts of the same bounded catalog. No all-pairs join ever
    touches infrequent items.
    """
    # consumed by the basket count, the item supports, and the
    # candidate semi-join: persist or the distinct recomputes 3x
    pairs_base = df.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct().persist()
    n_baskets = pairs_base.agg(
        F.countDistinct("_b").alias("_n")
    )
    item_n = (
        pairs_base.groupBy("_i")
        .agg(F.count("*").alias("item_n"))
        .crossJoin(F.broadcast(n_baskets))
        .where(F.col("item_n") >= F.ceil(F.lit(min_support) * F.col("_n")))
        .select("_i", "item_n", "_n")
    )
    # A-Priori prune: only frequent items can appear in a frequent pair
    # both pair-join sides scan this: persist to evaluate the
    # semi-join once
    frequent = pairs_base.join(
        F.broadcast(item_n.select("_i")), "_i", "left_semi"
    ).persist()
    a = frequent.select("_b", F.col("_i").alias("_ia"))
    b = frequent.select("_b", F.col("_i").alias("_ib"))
    pair_n = (
        a.join(b, "_b")
        .where(F.col("_ia") < F.col("_ib"))
        .groupBy("_ia", "_ib")
        .agg(F.count("*").alias("pair_n"))
    )
    both = pair_n.unionByName(
        pair_n.select(
            F.col("_ib").alias("_ia"), F.col("_ia").alias("_ib"), "pair_n"
        )
    )
    ante = item_n.select(
        F.col("_i").alias("_ia"), F.col("item_n").alias("ante_n"), "_n"
    )
    cons = item_n.select(
        F.col("_i").alias("_ib"), F.col("item_n").alias("cons_n")
    )
    return (
        both.join(F.broadcast(ante), "_ia")
        .join(F.broadcast(cons), "_ib")
        .where(F.col("pair_n") >= F.ceil(F.lit(min_support) * F.col("_n")))
        .where(F.col("pair_n") / F.col("ante_n") >= min_confidence)
        .select(
            F.col("_ia").alias("antecedent"),
            F.col("_ib").alias("consequent"),
            "pair_n",
            F.round(F.col("pair_n") / F.col("_n"), 6).alias("support"),
            F.round(F.col("pair_n") / F.col("ante_n"), 6).alias(
                "confidence"
            ),
            F.round(
                (F.col("pair_n") * F.col("_n"))
                / (F.col("ante_n") * F.col("cons_n")),
                6,
            ).alias("lift"),
        )
    )
