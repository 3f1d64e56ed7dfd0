"""Skew mitigation for hot-key joins — the explicit fallback when AQE
skew-splitting isn't enough (e.g. one provider holding 60% of a 100 TB
image table, SURVEY §7.0; BASELINE.md records flickr alone at 314 M of
1.4 B rows).

``salted_join``: replicate the small side R times, salt the big side's
key with ``hash(row) % R`` — every hot key spreads over R reduce
partitions. Exact same join result, R× small-side duplication cost.
AQE's skew-join handles moderate skew automatically (enabled in
session.get_spark); use this for the pathological keys AQE can't split
(single-key hash partitions).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted into ``salt_buckets``
    sub-keys and the small side exploded across all of them.

    Result is identical to ``big.join(small, on, how)`` for inner /
    left joins (each big row pairs with exactly one replica of each
    matching small row)."""
    salt = F.abs(F.xxhash64(*[F.col(c) for c in big.columns])) % salt_buckets
    b = big.withColumn("_salt", salt.cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return b.join(s, [*on, "_salt"], how).drop("_salt")


def rendezvous_assign(
    df: DataFrame,
    key_col: str,
    workers: list[str],
    *,
    salt: str = "hrw:",
    out_col: str = "owner",
) -> DataFrame:
    """Rendezvous (highest-random-weight) hashing: assign every key
    to the worker with the largest ``md5(salt ‖ worker ‖ ':' ‖ key)``
    — the shard-ownership scheme whose defining property is minimal
    movement under churn: adding/removing one worker reassigns only
    ~1/n of the keys (pinned by test), unlike mod-N hashing which
    reshuffles almost everything.

    Pure column algebra: the per-worker digests form one ``greatest``
    chain over |workers| expressions — no dim join, no shuffle, no
    state; ownership is a pure function of (key, worker set), so any
    executor computes it identically (how a 1000-node ingest tier
    agrees on ownership without coordination)."""
    if not workers:
        raise ValueError("workers must be non-empty")
    k = F.col(key_col).cast("string")

    def digest(w: str) -> Column:
        return F.md5(F.concat(F.lit(salt + w + ":"), k))

    best = F.greatest(*[digest(w) for w in workers]) if len(workers) > 1 \
        else digest(workers[0])
    expr = None
    for w in workers:
        cond = digest(w) == best
        expr = F.when(cond, F.lit(w)) if expr is None else expr.when(
            cond, F.lit(w)
        )
    return df.withColumn(out_col, expr)


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
    target_partitions: int = 200,
) -> DataFrame:
    """Shuffle-skew report for a prospective join/aggregation key —
    the measurement half of :func:`salted_join`: BEFORE shuffling
    100 TB on a key, list the hot keys, their row share, and the salt
    factor that would level each one against the average partition
    (``salt = ceil(cnt / (n / target_partitions))``, the fan-out
    :func:`salted_join` should use).

    Returns the ``top_k`` hottest keys:
    ``(key, cnt, share, skew_vs_avg, salt_factor)`` ordered by count
    desc (key asc tiebreak).

    Scale shape: ONE count aggregate keyed by the candidate key
    (map-side combinable — the report costs a fraction of the shuffle
    it prices), a broadcast total, and a TakeOrdered top-k. No
    windows, no sort of the key catalog.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("cnt")
    )
    tot = counts.agg(
        F.sum("cnt").alias("_n"), F.count("*").alias("_keys")
    )
    avg_part = F.col("_n").cast("double") / float(target_partitions)
    avg_key = F.col("_n").cast("double") / F.col("_keys")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "key",
            F.col("cnt").cast("long").alias("cnt"),
            F.round(
                F.col("cnt") / F.col("_n").cast("double"), 6
            ).alias("share"),
            F.round(F.col("cnt") / avg_key, 6).alias("skew_vs_avg"),
            F.greatest(
                F.ceil(F.col("cnt") / avg_part), F.lit(1)
            )
            .cast("long")
            .alias("salt_factor"),
        )
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(int(top_k))
    )
