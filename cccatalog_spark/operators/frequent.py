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
