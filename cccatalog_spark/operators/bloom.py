"""Distributed Bloom-filter membership pruning — the scale path for
semi-join filters whose build side is too large to broadcast as rows
but fits as bits (Spark's own runtime row-level-filter shape, exposed
as an explicit operator).

Build: every key emits ``num_hashes`` bit positions via the JVM-side
``xxhash64(key, seed)`` (no Python hashing anywhere), positions fold
into 64-bit words with a ``bit_or`` aggregate — the bitmap is built by
a single map-side-combinable shuffle keyed by word index, never by
driver-side iteration. The collected artifact is the sparse word map
(<= min(num_bits/64, n*num_hashes) rows); at 1e9 bits that is a
~125 MB broadcast, the same order as any bloom-join runtime filter.

Probe: rows compute the same JVM-side positions; an Arrow-batched
pandas UDF tests all bits against the broadcast word array fully
vectorized (one numpy gather per batch). Bloom semantics guarantee no
false negatives, so `bloom_filter_candidates` keeps a superset — pair
it with an exact verify join on the survivors to stay value-exact
(q91), exactly how Spark's InSubqueryExec bloom pruning composes with
the real join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _positions(key, num_bits: int, num_hashes: int):
    """Array column of the key's bloom bit positions (JVM xxhash64
    with the hash index as seed column; pmod keeps them in range)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(s)), F.lit(num_bits))
            for s in range(num_hashes)
        ]
    )


def bloom_build(
    keys: DataFrame, key_col: str, num_bits: int, num_hashes: int = 3
) -> np.ndarray:
    """Build the filter over ``keys[key_col]``; returns the dense
    uint64 word array (length num_bits/64) ready to broadcast."""
    assert num_bits % 64 == 0
    words = (
        keys.select(
            F.explode(_positions(F.col(key_col), num_bits, num_hashes)).alias(
                "p"
            )
        )
        .select(
            F.shiftright("p", 6).alias("w"),
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
        .collect()
    )
    dense = np.zeros(num_bits // 64, dtype=np.uint64)
    for r in words:
        dense[r["w"]] = np.uint64(np.int64(r["word"]).view(np.uint64))
    return dense


def bloom_filter_candidates(
    df: DataFrame,
    key_col: str,
    words: "np.ndarray | object",
    num_bits: int,
    num_hashes: int = 3,
) -> DataFrame:
    """Rows of ``df`` whose key is POSSIBLY in the built set (no false
    negatives; false-positive rate set by num_bits/num_hashes).
    ``words`` is the array from `bloom_build` or a SparkContext
    broadcast of it (preferred: ships once per executor)."""

    @pandas_udf("boolean")
    def hit(pos: pd.Series) -> pd.Series:
        w = words.value if hasattr(words, "value") else words
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        ps = np.vstack(pos.to_numpy()).astype(np.int64)
        bits = (w[ps >> 6] >> (ps & 63).astype(np.uint64)) & np.uint64(1)
        return pd.Series(bits.all(axis=1))

    return (
        df.withColumn(
            "_bloom_pos", _positions(F.col(key_col), num_bits, num_hashes)
        )
        .where(hit(F.col("_bloom_pos")))
        .drop("_bloom_pos")
    )
