"""Context-window document chunking (LLM-pipeline op beyond the
reference): split each document's token stream into overlapping
fixed-size windows — the "doc → training/embedding context windows"
prep step that sits between cleaning and tokenized packing
(operators/packing.py consumes what this emits).

Semantics: windows start at 0, stride, 2·stride, … for every start
strictly below the token count; each window takes up to ``chunk_size``
tokens (the final windows are shorter). Zero-token documents emit no
chunks. Deterministic — chunk identity is (doc, start), no hashing.

Scale shape: pure column algebra — tokenize once, ``sequence`` the
start offsets, one ``explode`` whose blow-up is exactly the output
chunk count (ceil(n/stride) per doc), ``slice``/``concat_ws`` JVM-side
in whole-stage codegen. Narrow end to end: no shuffle, no UDF, no
state; at 100 TB this runs at scan speed and partition counts carry
over from the source. Skew-safe: a pathological giant document fans
out into rows, not into one executor's memory (the token array itself
is bounded by the upstream max-doc-length quality gate, q22/q75).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cccatalog_spark.functions import text as TX


def chunk_documents(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """``(id, chunk_id, start, chunk_tokens, chunk_text)`` — one row
    per overlapping token window. ``chunk_id = start / stride`` is the
    per-document ordinal; ``chunk_tokens`` is the actual window length
    (≤ chunk_size, shorter at the tail)."""
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = TX.tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        toks.alias("_t"),
        F.size(toks).alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    starts = F.sequence(F.lit(0), F.col("n_tokens") - 1, F.lit(stride))
    exploded = base.select(
        id_col, "_t", "n_tokens", F.explode(starts).alias("start")
    )
    window = F.slice(F.col("_t"), F.col("start") + 1, chunk_size)
    return exploded.select(
        F.col(id_col),
        (F.col("start") / stride).cast("int").alias("chunk_id"),
        "start",
        F.least(F.lit(chunk_size), F.col("n_tokens") - F.col("start")).alias(
            "chunk_tokens"
        ),
        F.concat_ws(" ", window).alias("chunk_text"),
    )


def pack_windows(
    df: DataFrame,
    id_col: str,
    len_col: str,
    window_size: int,
    *,
    order_cols: list | None = None,
) -> DataFrame:
    """GPT-style sample packing: lay the corpus out as one virtual
    token stream in a deterministic total order, then slice it into
    fixed ``window_size`` training windows. Documents straddling a
    boundary are split across the adjacent windows (the standard
    concatenate-then-slice packing with cross-document attention
    masking — no padding, no token ever dropped or duplicated).

    Output: one row per (document × window it touches) —

    (id, window_id, start_in_window, off_start, off_end)

    ``off_start``/``off_end`` are the doc-local token half-open range
    landing in that window; ``start_in_window`` is where it lands.
    Invariants (tested): per-doc spans tile [0, len) in order; per-
    window spans tile [0, window_size) exactly (except the final
    partial window); everything is a pure function of the order, so
    the layout is reproducible and repartition-stable.

    Scale shape at 100 TB: the only wide operation is the two-phase
    distributed prefix sum (operators/cumsum.global_running_sum — a
    range exchange + ≤P-row broadcast of partition offsets; never an
    Exchange SinglePartition); the window fan-out is a narrow
    generator bounded by ceil(len/window_size)+1 rows per doc. This is
    the layout step a training-data loader runs after mixing
    (epoch_repeat) and ordering (interleave_shuffle).
    """
    if window_size <= 0:
        raise ValueError(f"window_size must be positive: {window_size}")
    from cccatalog_spark.operators.cumsum import global_running_sum

    order = order_cols or [F.col(id_col)]
    base = df.where(F.col(len_col) > 0)
    cum = global_running_sum(base, order, len_col, out_col="__cum")
    W = F.lit(window_size).cast("long")
    start = (F.col("__cum") - F.col(len_col)).cast("long")
    end = F.col("__cum").cast("long")
    spans = (
        cum.withColumn("__start", start)
        .withColumn("__end", end)
        .withColumn(
            "window_id",
            F.explode(
                F.sequence(
                    F.floor(F.col("__start") / W),
                    F.floor((F.col("__end") - 1) / W),
                )
            ),
        )
    )
    w_lo = F.col("window_id") * W
    tok_start = F.greatest(F.col("__start"), w_lo)
    tok_end = F.least(F.col("__end"), w_lo + W)
    return spans.select(
        F.col(id_col),
        F.col("window_id"),
        (tok_start - w_lo).alias("start_in_window"),
        (tok_start - F.col("__start")).alias("off_start"),
        (tok_end - F.col("__start")).alias("off_end"),
    )


def span_corruption_plan(
    df: DataFrame,
    id_col: str,
    len_col: str,
    *,
    span_len: int = 3,
    stride: int = 20,
    salt: str = "span:",
) -> DataFrame:
    """T5-style span-corruption mask plan: for every document, a set
    of non-overlapping ``span_len``-token spans to mask, one per
    ``stride`` tokens, at a per-document deterministic phase offset
    (md5-derandomized, like every sampling decision in this codebase).
    Corruption rate ≈ span_len/stride (15% at 3/20).

    Spans start at ``offset + k·stride`` for k = 0,1,…; the stride
    guarantees non-overlap by construction — no greedy left-to-right
    state, so the plan stays pure column algebra (sequence + explode)
    with an exact SQL oracle, where greedy Poisson-start selection
    (the literal T5 sampler) would need a per-doc fold.

    Output: (id, span_id, start, length) with 0-based token starts;
    the final span truncates at the document end (length ≥ 1).
    """
    from cccatalog_spark.operators.sampling import hashed_bucket

    n = F.col(len_col).cast("long")
    offset = hashed_bucket(F.col(id_col), stride, salt=salt)
    n_spans = F.floor((n - offset - 1) / F.lit(stride)) + 1
    spans = df.where(n > offset).select(
        F.col(id_col),
        offset.alias("__off"),
        n.alias("__n"),
        F.posexplode(
            F.sequence(F.lit(0), (n_spans - 1).cast("int"))
        ).alias("span_id", "__k"),
    )
    start = F.col("__off") + F.col("__k") * F.lit(stride)
    return spans.select(
        id_col,
        "span_id",
        start.alias("start"),
        F.least(F.lit(span_len).cast("long"), F.col("__n") - start).alias(
            "length"
        ),
    )
