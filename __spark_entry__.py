"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the SURVEY §2 operator inventory
implemented in ``cccatalog_spark.plans.queries`` (each Spark query
paired with a DuckDB-runnable ANSI-SQL oracle where expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary agg) on /root/testdata/sf0.001."""
    from cccatalog_spark.plans.queries import QUERIES

    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cccatalog_spark.plans.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from cccatalog_spark.plans.queries import all_oracles

    return all_oracles()
