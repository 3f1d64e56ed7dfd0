"""JSON-lines and ORC sources/sinks (format coverage next to
sources/tsv.py's TSV path — the reference's loaders speak TSV and
Postgres; an engine consumer also lands JSONL event dumps and ORC
exports, and both are first-class Spark formats).

JSONL reading mirrors tsv.load_tsv's contract: explicit schema (never
inferSchema on a 100 TB lake — schema inference is a full extra scan),
PERMISSIVE mode with a ``_corrupt_record`` capture column, and a
``quarantine`` split so malformed lines are preserved for audit
instead of silently dropped (DROPMALFORMED) or job-fatal (FAILFAST).

ORC round-trips through the native vectorized reader/writer — nothing
to configure; included so the engine's source matrix (parquet, TSV,
JSONL, ORC, JDBC, REST) is tested end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT = "_corrupt_record"


def load_jsonl(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): parse JSON-lines under an explicit schema.
    ``good`` rows parsed cleanly; ``quarantine`` holds the raw text of
    every malformed line. Spark requires caching the parsed frame
    before the corrupt-column filter (the column is only populated
    during the same scan that fails to parse)."""
    df = (
        spark.read.schema(f"{schema}, {CORRUPT} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT)
        .json(path)
    )
    df = df.cache()
    good = df.where(F.col(CORRUPT).isNull()).drop(CORRUPT)
    quarantine = df.where(F.col(CORRUPT).isNotNull()).select(
        F.col(CORRUPT).alias("raw")
    )
    return good, quarantine


def write_jsonl(df: DataFrame, path: str, *, partitions: int | None = None) -> None:
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def load_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
