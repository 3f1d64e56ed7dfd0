"""Common Crawl manifest handling — the engine halves of the
reference's crawl-index plumbing (network fetch stays ingestion-side,
SURVEY §4.3.4, exactly like the REST source S8):

- S1 (`ExtractCCLinks.py:64-95` loadWATFile): the reference GETs
  ``wat.paths.gz``, gunzips, and splits ~64k WAT paths across
  workers. Engine half: ``spark.read.text`` parses the (possibly
  .gz — Hadoop decompresses transparently) manifest in parallel and
  :func:`manifest_slices` assigns each path a deterministic slice by
  md5 — the fan-out key the fetch stage partitions on.
- S13 (`ExtractCCLinks.py:234-263` latest-index discovery): given a
  LISTING frame (the boto3 page walk's rows, injected), the latest
  crawl index is one max() — :func:`latest_index`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_wat_manifest(
    spark: SparkSession, path: str, n_slices: int = 64
) -> DataFrame:
    """(wat_path, slice_id) from a wat.paths manifest file: one text
    line per WAT archive path; blank lines dropped; slice assignment
    is the md5-derandomized ``hash(path) mod n_slices`` so a re-run
    (or a different manifest ordering) maps every path to the same
    fetch slice."""
    lines = spark.read.text(path).select(
        F.trim(F.col("value")).alias("wat_path")
    )
    return lines.where(F.col("wat_path") != "").select(
        "wat_path",
        (
            F.conv(F.substring(F.md5(F.col("wat_path")), 1, 4), 16, 10)
            .cast("long")
            % n_slices
        ).cast("int").alias("slice_id"),
    )


def latest_index(listing: DataFrame, name_col: str = "key") -> DataFrame:
    """1-row (latest) frame: the lexicographically greatest crawl
    index name in a listing — CC index names (CC-MAIN-YYYY-WW) sort
    chronologically, which is exactly what the reference's paginated
    walk relies on."""
    return listing.agg(F.max(name_col).alias("latest"))
