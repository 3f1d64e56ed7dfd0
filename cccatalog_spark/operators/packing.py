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


def padding_waste_sweep(
    df: DataFrame,
    text_col: str,
    lengths: list[int] = (128, 256, 512, 1024),
) -> DataFrame:
    """Padding-waste curve for the context-length decision: for each
    candidate max_len L, the cost of training on this corpus with
    naive one-doc-per-chunk padding — chunks = ceil(tokens/L) per doc,
    padded slots = chunks·L, waste = 1 − tokens/slots — plus the
    share of documents that overflow a single window. The knob this
    prices is real: halving waste at equal L is free compute.
    (``pack_sequences`` above is the greedy packer that then realizes
    the savings; this sweep says whether it is worth running.)

    The whole sweep is ONE aggregate: the L-grid is a plan literal, so
    every row of the corpus contributes its ceil-division to all grid
    points in a single pass — no per-L scan, no explode.

    Returns one row per L: ``(max_len, n_docs, total_tokens, chunks,
    padded_slots, waste_frac, overflow_doc_frac)``.
    """
    t = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    ).cast("long")
    base = df.select(t.alias("_t")).where(F.col("_t") > 0)
    aggs = [F.count("*").alias("_n"), F.sum("_t").alias("_tok")]
    for L in lengths:
        chunks = F.ceil(F.col("_t") / F.lit(L)).cast("long")
        aggs.append(F.sum(chunks).alias(f"_c{L}"))
        aggs.append(
            F.sum((F.col("_t") > L).cast("long")).alias(f"_o{L}")
        )
    a = base.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(L).cast("long").alias("max_len"),
                F.col("_n").cast("bigint").alias("n_docs"),
                F.col("_tok").cast("bigint").alias("total_tokens"),
                F.col(f"_c{L}").cast("bigint").alias("chunks"),
                (F.col(f"_c{L}") * L).cast("bigint").alias(
                    "padded_slots"
                ),
                F.round(
                    1.0
                    - F.col("_tok")
                    / (F.col(f"_c{L}") * L).cast("double"),
                    6,
                ).alias("waste_frac"),
                F.round(
                    F.col(f"_o{L}") / F.col("_n").cast("double"), 6
                ).alias("overflow_doc_frac"),
            )
            for L in lengths
        ]
    )
    return a.select(F.explode(rows).alias("r")).select("r.*")
