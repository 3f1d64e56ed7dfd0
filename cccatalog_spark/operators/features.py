"""Feature hashing (the "hashing trick", Weinberger et al. 2009):
map each document's token stream into a fixed-dimension sparse vector
with md5-deterministic buckets and signs — the vocabulary-free
text-featurization step that feeds linear models / k-means / dedup
heuristics downstream of the quality layer, with no vocabulary table
to build, broadcast, or keep consistent across runs.

bucket(t) = h(t) mod D; sign(t) = ±1 from the next hash bit; the
(doc, bucket) weight is Σ sign over token instances — the signed sum
makes collisions unbiased (E[collision noise] = 0), which is the
whole point of the signed variant.

Scale shape: tokenize → explode → ONE groupBy (doc, bucket) with
map-side partial sums; output cardinality is bounded by doc_count × D
regardless of vocabulary size. No UDF, no vocabulary state, no
driver. md5-based hashing keeps it engine-portable (the SQL oracle
recomputes identical vectors), unlike xxhash64-based hashing which
would be Spark-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cccatalog_spark.functions import text as TX
from cccatalog_spark.functions.sketches import _hash60


def hashed_bow(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 64,
    *,
    signed: bool = True,
) -> DataFrame:
    """``(id, bucket, weight)`` sparse hashed bag-of-words; exact-zero
    buckets (fully cancelled collisions) are dropped. Unsigned form
    (``signed=False``) is plain bucketed term counting."""
    if dim < 2:
        raise ValueError("dim must be >= 2")
    toks = F.transform(TX.tokens(F.col(text_col)), lambda t: F.lower(t))
    e = docs.select(F.col(id_col), F.explode(toks).alias("_t"))
    h = _hash60(F.col("_t"))
    sign = (
        F.when((F.expr(f"_h div {dim}") % 2) == 0, F.lit(1)).otherwise(
            F.lit(-1)
        )
        if signed
        else F.lit(1)
    )
    w = (
        e.withColumn("_h", h)
        .select(id_col, (F.col("_h") % dim).alias("bucket"), sign.alias("_s"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("_s").alias("weight"))
    )
    return w.where(F.col("weight") != 0)
