"""JSON-Lines source with malformed-record quarantine — the JSON
sibling of the TSV loader's quarantine contract (sources/tsv.py:
S9 in SURVEY §2.1): ingest never silently drops OR silently accepts
a bad line; every input row lands in exactly one of (typed frame,
quarantine frame).

Spark reads PERMISSIVE with ``columnNameOfCorruptRecord``; the known
engine caveat is that a filter on the corrupt column alone is
disallowed against a lazy scan (Spark raises — the internal column
is populated only when other fields are also materialized), so the
raw frame is cached first: one extra materialization, which a real
ingest pays anyway to split two outputs from one scan.

Scale shape: one narrow scan, zero shuffles; both outputs prune
columns independently. At 100 TB the quarantine side is the tiny
tail and the cache is per-batch, not per-corpus.

Reference anchor: the reference quarantines malformed TSV rows in
its loader (SURVEY §4.3.3); JSONL is the same contract on the other
wire format it ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema_ddl: str
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL at ``path`` with the user schema; returns
    ``(good, quarantine)`` — good rows typed per ``schema_ddl`` with
    the corrupt column dropped, quarantine rows as
    ``(raw_line)``. A line is quarantined iff Spark could not parse
    it against the schema (malformed JSON or type mismatch in
    FAILFAST terms)."""
    raw = (
        spark.read.schema(f"{schema_ddl}, {CORRUPT_COL} STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    raw = raw.cache()
    good = raw.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = raw.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad
