"""Sitemap XML ingestion — the crawl-frontier seed source (pairs with
functions/urls.canonicalize_url → blocklist_mark → robots_decisions →
operators/temporal.crawl_schedule).

Spark 4 ships the XML source natively (the spark-xml donation);
``rowTag`` streams one <url> element per row, so a multi-gigabyte
sitemap index parses in parallel without loading documents whole.
Malformed entries follow the same quarantine contract as the TSV
loader (S9): PERMISSIVE mode routes broken rows to a corrupt-record
column instead of failing the batch, and :func:`read_sitemap` splits
them into (clean, quarantined) frames.

Reference anchor: the reference's provider scripts walk JSON APIs;
sitemap/XML walking is the CC-side analog of its S1 manifest
ingestion, engine-half only (fetching is ingestion-side, SURVEY
§4.3.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CORRUPT = "_corrupt_record"


def read_sitemap(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) frames from a sitemap file/directory.

    Clean schema: (loc string, lastmod string, priority double).
    Quarantined rows carry the raw corrupt text for replay/audit —
    the reference's malformed-TSV quarantine contract (S9), applied
    to XML.
    """
    raw = (
        spark.read.format("xml")
        .option("rowTag", "url")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .schema(
            f"loc string, lastmod string, priority double, {_CORRUPT} string"
        )
        .load(path)
    )
    # Spark disallows referencing ONLY the corrupt-record column of a
    # raw file scan; caching materializes the full rows first (the
    # documented workaround, same as the TSV quarantine path)
    raw = raw.cache()
    clean = (
        raw.where(F.col(_CORRUPT).isNull() & F.col("loc").isNotNull())
        .select("loc", "lastmod", "priority")
    )
    quarantined = raw.where(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw")
    )
    return clean, quarantined
