"""Sequence packing for training pipelines: assign documents to
fixed-size token windows ("packs") with concat-then-chop semantics —
the standard pretraining layout where the corpus is concatenated in a
deterministic order and chopped into context-length windows, so a
document starts in pack ``floor(exclusive_prefix_tokens / ctx)``.

Spark shape: one shuffle (window partition by shard key), then pure
column algebra — an exclusive prefix sum over the ordered window and a
floor-divide. No UDF, no state, no driver loop; at 100 TB the shard
key (language, source, date bucket) bounds each window partition, and
the pack id composes with the shard key into a globally unique pack.

The exclusive prefix sum is exactly reproducible in ANSI SQL (ROWS
UNBOUNDED PRECEDING window), so pack assignment is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    tokens_col: str,
    ctx: int,
    *,
    out_col: str = "pack_id",
) -> DataFrame:
    """Add ``pack_id``: the context window (of ``ctx`` tokens) in which
    this row STARTS when the shard's rows are concatenated in
    ``order_col`` order. Deterministic given (shard, order); rows
    longer than ``ctx`` simply span multiple windows (their successors
    start later), matching chop semantics."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix_excl = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return df.withColumn(
        out_col, F.floor(prefix_excl / F.lit(float(ctx))).cast("long")
    )


def pack_stats(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    tokens_col: str,
    ctx: int,
) -> DataFrame:
    """Per-pack accounting (docs starting in the pack, their token
    mass, id range) — the packing-job audit output."""
    packed = pack_sequences(df, shard_col, order_col, tokens_col, ctx)
    return packed.groupBy(shard_col, "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(tokens_col).alias("sum_tokens"),
        F.min(order_col).alias("first_doc"),
        F.max(order_col).alias("last_doc"),
    )
