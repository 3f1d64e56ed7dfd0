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


def misra_gries_heavy_hitters(
    tokens_df: DataFrame,
    token_col: str,
    k: int = 50,
) -> DataFrame:
    """Exact phi-heavy hitters (count > n/k) with Misra-Gries candidate
    generation — the deterministic alternative to a full-vocabulary
    groupBy when the distinct-token universe is enormous but only the
    > n/k head matters.

    Pass 1 runs an MG summary of capacity k-1 per PARTITION via
    mapInPandas (per Arrow batch: a vectorized value_counts, merged
    into the running summary, pruned by the standard subtract-the-
    (k)th-largest rule) — no shuffle, and the per-partition output is
    <= k-1 rows. If count(x) > n/k globally, then in at least one
    partition count_p(x) > n_p/k, so the union of per-partition
    candidates is a SUPERSET of every true heavy hitter (the merge
    lemma of Agarwal et al., TODS 2013).

    Pass 2 semi-joins the stream against the (bounded, broadcast)
    candidate set and counts exactly, filtering on count > n/k with n
    as a 1-row broadcast scalar. Because pass 2 is exact, the final
    output is partitioning-INDEPENDENT: exactly the tokens with
    count > n/k, their exact counts, and their frequency — which is
    what makes the operator oracle-checkable.

    Scale: the vocabulary-sized shuffle of a naive groupBy is replaced
    by a scan (pass 1) + a shuffle keyed on <= (k-1) x P candidate
    tokens (pass 2) — the win when distinct tokens >> k x partitions.
    """
    import pandas as pd

    tok = tokens_df.select(F.col(token_col).alias("tok"))

    def mg_partition(batches):
        summary: dict[str, int] = {}
        cap = k - 1
        for pdf in batches:
            vc = pdf["tok"].value_counts()
            for t, c in vc.items():
                summary[t] = summary.get(t, 0) + int(c)
            if len(summary) > cap:
                # subtract the (cap+1)-th largest count from all,
                # drop the non-positive — one decrement covering
                # every unit the classic per-item loop would do
                cut = sorted(summary.values(), reverse=True)[cap]
                summary = {
                    t: c - cut for t, c in summary.items() if c > cut
                }
        yield pd.DataFrame({"tok": list(summary.keys())})

    candidates = (
        tok.mapInPandas(mg_partition, schema="tok string")
        .distinct()
    )
    total = tok.agg(F.count("*").alias("_n"))
    counted = (
        tok.join(F.broadcast(candidates), "tok")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
    )
    return (
        counted.where(F.col("cnt") * k > F.col("_n"))
        .select(
            F.col("tok").alias("token"),
            F.col("cnt").cast("bigint").alias("cnt"),
            F.round(
                F.col("cnt") / F.col("_n").cast("double"), 6
            ).alias("freq"),
        )
    )
