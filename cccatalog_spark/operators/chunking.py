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
