from cccatalog_spark.plans.queries import ORACLE, QUERIES  # noqa: F401
