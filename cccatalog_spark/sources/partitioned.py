"""Hive-layout date-partitioned parquet tables: the at-rest layout a
100 TB fact table actually uses, where the partition column (a derived
time bucket such as ``ship_month=1995-03``) is encoded in the
directory structure so that

- a time-ranged query prunes whole directories BEFORE listing files
  (``PartitionFilters`` in the scan node — zero I/O for excluded
  months, cheaper than any row-group statistic), and
- an incremental reload rewrites ONLY the partitions present in the
  incoming batch (``partitionOverwriteMode=dynamic``), the
  directory-level analog of the bucket-selective MERGE in
  streaming/loader.BucketedUpsertTable.

Partition-count discipline at scale: one partition per (month, write)
with ``repartition(n, partition_col)`` before the write keeps file
counts bounded (the small-files problem is the #1 operational failure
of partitioned lakes); operators/maintenance.compaction_plan is the
repair path once drift happens anyway.

Reference anchor: the reference stores everything in one unpartitioned
Postgres ``image`` table and re-scans it per query
(util/loader/sql.py); time-partitioned parquet is what replaces that
at lake scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class PartitionedTable:
    """Parquet table partitioned by a derived column.

    ``partition_expr`` maps the source rows to the partition value
    (e.g. ``F.date_format("l_shipdate", "yyyy-MM")``); it is
    materialized as ``partition_col`` in the layout and comes back as
    a (string) column on read — Spark restores it from the directory
    names, not from file bytes.
    """

    def __init__(
        self,
        path: str,
        partition_col: str,
        partition_expr: Column,
        files_per_partition: int = 1,
    ) -> None:
        self.path = path
        self.partition_col = partition_col
        self.partition_expr = partition_expr
        self.files_per_partition = files_per_partition

    def _with_part(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.partition_col, self.partition_expr)

    def _clustered(self, df: DataFrame) -> DataFrame:
        """Cluster rows by partition value (plus a salt when more than
        one file per directory is wanted) WITHOUT collapsing the task
        count: hash-repartitioning on the partition value at the
        session's shuffle-partition count routes each value wholly to
        one task — one file per (value, salt) — while write
        parallelism stays min(#values·salt, shuffle partitions).  The
        old ``repartition(files_per_partition, col)`` form pinned
        numPartitions to the FILE goal (1), funnelling the entire
        table through a single writer task at any scale."""
        cols = [F.col(self.partition_col)]
        if self.files_per_partition > 1:
            cols.append(
                F.pmod(
                    F.xxhash64(F.lit("fpp:"), *df.columns),
                    F.lit(self.files_per_partition),
                )
            )
        return df.repartition(*cols)

    def write(self, df: DataFrame) -> None:
        """Full (re)build of the table. Clustering on the partition
        value bounds the file count per directory."""
        (
            self._clustered(self._with_part(df))
            .write.mode("overwrite")
            .partitionBy(self.partition_col)
            .parquet(self.path)
        )

    def overwrite_partitions(self, batch: DataFrame) -> None:
        """Dynamic partition overwrite: replaces ONLY the partitions
        the batch touches; every other partition's files stay
        byte-identical on disk (tested). This is the idempotent
        day/month reload primitive — re-running a failed ingest for
        one month can never disturb its neighbors."""
        (
            self._clustered(self._with_part(batch))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(self.partition_col)
            .parquet(self.path)
        )

    def read(self, spark: SparkSession) -> DataFrame:
        """Scan. Filters on ``partition_col`` become directory pruning
        (``PartitionFilters``), not data filters — assert via
        ``.explain``; tests/test_partitioned.py pins it."""
        return spark.read.parquet(self.path)
