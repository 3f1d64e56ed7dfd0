"""Similarity search over embedding columns (array<float>).

Extension layer (BASELINE.json north star): approximate-nearest-neighbor
search a 100 TB training-data pipeline needs.

- ``cosine_topk``: brute-force baseline. The query vector is a literal
  (broadcast by construction); the scan is embarrassingly parallel; the
  global top-k is a TakeOrderedAndProject (no full sort, no shuffle of
  the data — each partition keeps k candidates).
- ``knn_join_topk``: per-probe top-k against the corpus, the batched
  variant (broadcast the probe set, crossJoin-free via explicit
  broadcast + window).
- ``lsh_cosine_topk``: the scale path — random-hyperplane LSH buckets
  (sign bits of d deterministic pseudo-random projections) shrink the
  candidate set; exact re-rank inside the probed buckets. Recall is
  tunable via bits/tables; deterministic seeds keep results stable.

All dot products run JVM-side via zip_with/aggregate higher-order
functions in double precision — no Python in the loop.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.
    Ties broken by id for full determinism."""
    q = F.array(*[F.lit(float(v)) for v in query])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def knn_join_topk(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """For every probe row, its k nearest corpus rows by cosine.

    Broadcast the (small) probe side against the corpus scan, score,
    then per-probe top-k via window rank. The corpus is scanned once,
    never shuffled; only (|corpus|×|probes|) scored pairs flow into the
    per-probe rank, so keep probes bounded (batch them upstream).
    """
    from pyspark.sql.window import Window

    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    scored = corpus.alias("c").join(F.broadcast(p), F.col(f"c.{id_col}") != F.col("probe_id")).select(
        "probe_id",
        F.col(f"c.{id_col}").alias("neighbor_id"),
        F.round(cosine(F.col(f"c.{vec_col}"), F.col("probe_vec")), 6).alias(
            "cosine_sim"
        ),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine_sim", "rank")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (LCG-based — no
    numpy dependency in the plan, reproducible across runs/engines)."""
    state = seed & 0x7FFFFFFF
    planes = []
    for _ in range(bits):
        v = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) & 0x7FFFFFFF
            # map to (-1, 1)
            v.append(state / 0x40000000 - 1.0)
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id (int) from random-hyperplane projections."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(_dot(vec, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    bits: int = 4,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: probe only the query's LSH bucket, exact re-rank inside.

    With b sign bits the corpus shards into 2^b buckets; the scan prunes
    to ~1/2^b of rows (bucket column should be a partition key of the
    stored table at real scale, making this partition pruning instead of
    a filter). Recall < 1 by construction — the benchmark pairs it with
    the exact baseline to report recall@k.
    """
    dim = len(query)
    planes = _hyperplanes(dim, bits, seed)
    qbucket = sum(
        (1 << i)
        for i, plane in enumerate(planes)
        if sum(a * b for a, b in zip(query, plane)) >= 0
    )
    q = F.array(*[F.lit(float(v)) for v in query])
    bucketed = df.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes))
    return (
        bucketed.where(F.col("_bucket") == qbucket)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )
