"""Common Crawl link extraction — the reference's one true Spark job
(src/ExtractCCLinks.py), re-expressed as DataFrame transforms.

The reference streams WAT archives per partition with a Python
generator (ExtractCCLinks.py:98-195) and, per page, computes
- the set of links whose URL contains 'creativecommons.org' (P1/P2),
- an image count: distinct IMG@/src URLs (A1),
- an outbound-domain counter over A@/href links pointing offsite (A2),
then emits one row per CC link with the page's html_metadata JSON
attached (ExtractCCLinks.py:170-195).

Here the input is a pages DataFrame with an exploded-able ``links``
array<struct<url,path>> column (produced by the WAT scan stage — at
real scale a ``mapInPandas`` over the raw archive bytes; the parse
itself is ingestion-side). Every aggregation below is a higher-order
array function: per-page stats never shuffle — they're computed inside
the row, exactly like the reference's per-record loop, but codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cccatalog_spark.functions.urls import url_domain

CC_DOMAIN = "creativecommons.org"


def page_image_count(links: Column) -> Column:
    """A1: distinct image-src URLs on the page
    (ExtractCCLinks.py:182)."""
    imgs = F.filter(links, lambda x: x["path"].contains("IMG@/src"))
    return F.size(F.array_distinct(F.transform(imgs, lambda x: x["url"])))


def page_outbound_domains(links: Column, page_domain: Column) -> Column:
    """A2: map of offsite anchor-href domain → count
    (ExtractCCLinks.py:183). Faithful to the reference's filter:
    'offsite' means the page netloc does not appear ANYWHERE in the
    link URL (substring, not domain equality) and the link has a real
    netloc (relative links dropped). Returned as a native map (the
    reference JSON-serializes it into html_metadata)."""
    hrefs = F.filter(
        links,
        lambda x: x["path"].contains("A@/href")
        & x["url"].isNotNull()
        & ~x["url"].contains(page_domain)
        & x["url"].rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]"),
    )
    domains = F.transform(hrefs, lambda x: url_domain(x["url"]))
    distinct = F.array_distinct(domains)
    return F.map_from_arrays(
        distinct,
        F.transform(
            distinct,
            lambda d: F.size(F.filter(domains, lambda x: x == d)),
        ),
    )


def page_html_metadata(links: Column, page_domain: Column) -> Column:
    """The html_metadata JSON string of ExtractCCLinks.py:181-184:
    {"Images": n, "Links": {domain: count}}."""
    return F.to_json(
        F.struct(
            page_image_count(links).alias("Images"),
            page_outbound_domains(links, page_domain).alias("Links"),
        )
    )


def extract_cc_links(
    pages: DataFrame,
    url_col: str = "url",
    links_col: str = "links",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One output row per creativecommons.org link per page — the
    explode/filter core of the job (P1/P2 over the links array), with
    per-page html_metadata attached to every emitted row.

    Plan shape: a single narrow pass (generate + filter + project); the
    parquet sink afterwards is the only wide operation if the caller
    repartitions by provider_domain. At 200 TiB/crawl this is the
    <1h envelope job (BASELINE.md) — no shuffle until the write.
    """
    page_domain = url_domain(F.col(url_col))
    with_meta = pages.withColumn(
        "html_metadata", page_html_metadata(F.col(links_col), page_domain)
    ).withColumn("provider_domain", page_domain)
    exploded = with_meta.select(
        *keep_cols,
        "provider_domain",
        F.col(url_col).alias("page_url"),
        "html_metadata",
        F.explode(links_col).alias("link"),
    )
    return exploded.where(
        F.col("link.url").isNotNull()
        & F.col("link.url").contains(CC_DOMAIN)
    ).select(
        *keep_cols,
        "provider_domain",
        "page_url",
        F.col("link.url").alias("cc_url"),
        "html_metadata",
    )
