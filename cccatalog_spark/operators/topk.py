"""Skew-safe grouped top-k.

A single `row_number() OVER (PARTITION BY key)` puts every row of a
hot key into ONE task — the classic skew cliff when a domain holds
10⁹ of 10¹⁰ rows. The two-phase form salts the key, takes a per-salt
top-k (bounds any task at |bucket| work), then reduces the ≤ k×s
survivors per key with the same ordering — algebraically identical
output because top-k of a union is the top-k of the union of per-part
top-ks.

Cost: 2 shuffles instead of 1, but the first is skew-free by
construction; survivors per key are ≤ k×s rows, so the second is
trivially small. Use the single-phase form until a key exceeds what
one task should hold (~10⁷ rows); both forms share the ordering
contract (include a unique tiebreak for determinism).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RN = "_topk_rn"
SALT = "_topk_salt"


def grouped_topk(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    *,
    salt_col: Column | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Top ``k`` rows per key group under ``order_cols`` (must encode a
    TOTAL order — include a unique tiebreak). With ``salt_col`` (any
    deterministic row expression, e.g. the row id), runs the two-phase
    skew-safe plan; without it, the plain one-shuffle window."""
    keys = list(key_cols)
    if salt_col is not None:
        salted = df.withColumn(
            SALT, F.pmod(F.xxhash64(salt_col), F.lit(salt_buckets))
        )
        w1 = Window.partitionBy(*keys, SALT).orderBy(*order_cols)
        survivors = (
            salted.withColumn(RN, F.row_number().over(w1))
            .where(F.col(RN) <= k)
            .drop(RN, SALT)
        )
    else:
        survivors = df
    w2 = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        survivors.withColumn(RN, F.row_number().over(w2))
        .where(F.col(RN) <= k)
        .drop(RN)
    )
