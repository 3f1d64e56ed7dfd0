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

from pyspark.sql import Column, DataFrame
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


def random_projection(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    out_dim: int = 8,
) -> DataFrame:
    """Johnson–Lindenstrauss random projection of a dense embedding to
    ``out_dim`` dimensions with a *derandomized* sparse sign matrix
    (Achlioptas 2003: entries in {-1, 0, +1}):

        r(i, j) = ((i*31 + j*17) mod 7) - 3  clamped to sign  →
                  {-1, 0, +1} via sign(((i*31 + j*17) mod 7) - 3)

    The matrix is a pure integer formula — generated inline per
    expression, never materialized, broadcast, or seeded from an RNG —
    so every executor (and the SQL oracle) reproduces it bit-exactly,
    the same derandomization contract as the LSH hyperplanes in
    operators/similarity.

    Returns long-form ``(id, dim, value)`` with values rounded to 6 dp
    (and −0.0 normalized) so cross-engine summation order cannot leak
    into the comparison.

    Scale shape: entirely map-side — one ``transform`` over the output
    dims with a sequential-order ``aggregate`` dot product inside;
    zero shuffles, zero UDFs, |out| = n·out_dim rows. This is the
    cheap 8–32× width reduction that fronts ANN index build / k-means
    when the raw embedding width dominates shuffle volume.
    """
    def r(i: Column, j: int) -> Column:
        # i: 0-based input dim (Column), j: 0-based output dim (int)
        raw = (i * 31 + F.lit(j) * 17) % 7 - 3
        return F.signum(raw.cast("double"))

    def out_j(j: int) -> Column:
        pairs = F.zip_with(
            F.col(vec_col),
            F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
            lambda x, i: x.cast("double") * r(i, j),
        )
        s = F.aggregate(pairs, F.lit(0.0), lambda acc, v: acc + v)
        return F.round(s, 6) + F.lit(0.0)

    projected = df.select(
        F.col(id_col),
        F.array(*[out_j(j) for j in range(out_dim)]).alias("__p"),
    )
    return projected.select(
        F.col(id_col),
        F.posexplode("__p").alias("dim", "value"),
    )
