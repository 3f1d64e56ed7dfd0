"""S11 — JDBC upsert sink (SURVEY §2.1).

The reference's loader upserts TSV batches into Postgres via
``INSERT ... ON CONFLICT DO UPDATE`` (util/loader/sql.py:97-271). The
Spark-first shape: MERGE in the engine (operators/merge.py — the same
newest-non-null semantics the ON CONFLICT clause encodes), then push
the merged snapshot through the JDBC writer. The table object is
duck-type compatible with ``start_tsv_upsert_stream``
(streaming/loader.py), so the minutely loader can sink straight into a
database instead of parquet.

Scale notes: ``read()`` uses partitioned JDBC input
(partitionColumn/numPartitions) when given a numeric key so the
DB→executor scan parallelizes; the writer batches inserts
(``batchsize``). The swap is staging-table + RENAME — the same
atomic-commit idea as the parquet directory swap. Tested against the
Derby in-memory database bundled with Spark; any JDBC URL works the
same way.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class JdbcUpsertTable:
    """A keyed JDBC table with MERGE-on-write batches (S11)."""

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        table: str,
        key: Sequence[str],
        schema: T.StructType,
        *,
        driver: str | None = None,
        partition_column: str | None = None,
        num_partitions: int = 8,
        batchsize: int = 10_000,
    ) -> None:
        self.spark = spark
        self.url = url
        self.table = table
        self.key = list(key)
        self.schema = schema
        self.driver = driver
        self.partition_column = partition_column
        self.num_partitions = num_partitions
        self.batchsize = batchsize

    def _reader(self):
        r = self.spark.read.format("jdbc").option("url", self.url).option(
            "dbtable", self.table
        )
        if self.driver:
            r = r.option("driver", self.driver)
        return r

    def _exists(self) -> bool:
        try:
            self._reader().load().schema
            return True
        except Exception:
            return False

    def read(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], self.schema)
        r = self._reader()
        if self.partition_column:
            # partitioned scan: executors read key ranges in parallel
            bounds = (
                self._reader()
                .load()
                .selectExpr(
                    f"min({self.partition_column}) AS lo",
                    f"max({self.partition_column}) AS hi",
                )
                .collect()[0]
            )
            if bounds["lo"] is not None and bounds["lo"] != bounds["hi"]:
                r = (
                    r.option("partitionColumn", self.partition_column)
                    .option("lowerBound", str(bounds["lo"]))
                    .option("upperBound", str(bounds["hi"]))
                    .option("numPartitions", str(self.num_partitions))
                )
        out = r.load()
        # JDBC readback may widen/narrow types (e.g. Derby SMALLINT);
        # project back to the declared schema
        return out.selectExpr(
            *(
                f"CAST({f.name} AS {f.dataType.simpleString()}) AS {f.name}"
                for f in self.schema.fields
            )
        )

    def _exec_ddl(self, *statements: str) -> None:
        jvm = self.spark._sc._jvm
        conn = jvm.java.sql.DriverManager.getConnection(self.url)
        try:
            st = conn.createStatement()
            for sql in statements:
                st.execute(sql)
            st.close()
        finally:
            conn.close()

    def merge_batch(self, batch: DataFrame, epoch_id: int) -> None:
        from cccatalog_spark.operators.merge import merge_upsert

        target = self.read()
        merged = merge_upsert(target, batch, self.key)
        # merged LAZILY reads the current table — writing over the
        # target directly would drop it before the plan runs. Stage to
        # a side table, then swap with DDL: the JDBC analogue of the
        # parquet staging-directory rename (atomic commit).
        staging = f"{self.table}_stg_{epoch_id}"
        w = (
            merged.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", staging)
            .option("batchsize", str(self.batchsize))
            .mode("overwrite")
        )
        if self.driver:
            w = w.option("driver", self.driver)
        w.save()
        swap = [f"RENAME TABLE {staging} TO {self.table}"]
        if self._exists():
            swap.insert(0, f"DROP TABLE {self.table}")
        self._exec_ddl(*swap)
