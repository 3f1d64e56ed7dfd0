"""SparkSession factory tuned for the test/bench environment.

Local mode is a single JVM with N threads (the driver IS the executor),
so ``spark.driver.memory`` is the only memory knob. The settings below
are chosen to also be the right defaults on a real cluster:

- AQE on (runtime coalescing, skew-join splitting) — at 100 TB, static
  shuffle-partition counts are always wrong somewhere; AQE re-plans from
  actual map-output sizes.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a cluster
  this is the *initial* number and AQE coalesces down.
- Session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle (naive-UTC) exactly.
- Arrow enabled for every pandas interchange (Pandas UDFs, toPandas).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "cccatalog_spark", cpus: int | None = None) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # right-side wins on duplicate map keys — matches PostgreSQL
        # jsonb `||` semantics the merge operator reproduces
        # (reference: util/loader/sql.py:194-204)
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.ui.enabled", "false")
        # reliable checkpoint() files (operators/dedup._truncate_lineage
        # when a checkpoint dir is configured) are never deleted by
        # default — opt into GC-driven cleanup so iterative operators
        # don't leak checkpoint files to storage across calls (static
        # conf: must be set at session build, not per-query)
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # see sources/tables.ensure_session_confs — stops the optimizer
        # duplicating expensive generator children into inferred filters
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
