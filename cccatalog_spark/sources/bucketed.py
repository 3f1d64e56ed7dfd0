"""Bucketed managed tables — the co-located merge strategy from
SURVEY §4.3.1 / operators/merge.py: write the canonical table bucketed
by the merge key so every subsequent MERGE joins without re-shuffling
the big side (the micro-batch shuffles; 100 TB of target does not).

Spark bucketing (``bucketBy``) requires ``saveAsTable`` (a metastore
entry); reads of a bucketed table expose the bucketing to the planner,
which drops the Exchange on that side of an equi-join/aggregate over
the bucket key. tests/test_plans.py asserts the Exchange really
disappears.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: Sequence[str],
    *,
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table keyed
    for merge/agg co-location."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *key)
        .sortBy(*key)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
