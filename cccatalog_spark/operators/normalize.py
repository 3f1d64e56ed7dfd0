"""Provider-row normalization — the ImageStore.add_item pipeline
(M5 in SURVEY §7.2) as one declarative DataFrame transform.

Reference behavior being reproduced (all in
provider_api_scripts/common/storage/):

- per-column prepare: sanitize strings (columns.py:30-42), enforce
  char limits with truncate-or-null (columns.py:44-57), best-effort
  int/bool coercion (columns.py:60-118)  → F1-F4;
- license canonicalization via the pair map (licenses.py:28-134) → F9;
- meta_data enrichment with the canonical license_url
  (image.py:371-384) → F16 family;
- tag blacklist + struct enrichment (image.py:76-96,356-402) →
  P10/F24;
- source defaulting (util.py:10-16) → F25;
- required-column row rejection (image.py:321-338; loader null filters
  util/loader/sql.py:155-170) → P6/P7.

Everything is a pure Column expression — whole-stage codegen, no
Python in the row path. The reference runs this once per row in a
single process; here it runs wherever the scan runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cccatalog_spark.functions.licenses import (
    canonical_license_url,
    resolve_license_pair,
)
from cccatalog_spark.functions.sanitize import (
    bool_coerce,
    enforce_char_limit,
    int_coerce,
    sanitize_string,
)
from cccatalog_spark.schemas import IMAGE_REQUIRED

# varchar widths from the canonical DDL
# (src/openledger_sql/00_new_image_table_schema.sql)
IMAGE_COL_LIMITS: dict[str, int] = {
    "foreign_identifier": 3000,
    "foreign_landing_url": 1000,
    "url": 3000,
    "thumbnail": 3000,
    "license": 50,
    "license_version": 25,
    "creator": 2000,
    "creator_url": 2000,
    "title": 5000,
    "provider": 80,
    "source": 80,
    "ingestion_type": 80,
}

# URL-bearing columns are never truncated — a clipped URL is garbage,
# so over-limit goes to null (URLColumn, columns.py:209-243)
NO_TRUNCATE = {
    "foreign_identifier",
    "foreign_landing_url",
    "url",
    "thumbnail",
    "creator_url",
}

# image.py:76-96
TAG_BLACKLIST = ["no person", "squareformat"]
TAG_CONTAINS_BLACKLIST = [
    "flickriosapp", "uploaded", ":", "=", "cc0",
    "by", "by-nc", "by-nd", "by-sa", "by-nc-nd", "by-nc-sa", "pdm",
]


def prepare_string_col(name: str, c: Column) -> Column:
    """F1+F2 for one column: sanitize, then limit-enforce."""
    s = sanitize_string(c)
    limit = IMAGE_COL_LIMITS.get(name)
    if limit is None:
        return s
    return enforce_char_limit(s, limit, truncate=name not in NO_TRUNCATE)


def filter_enrich_tags(tags: Column, provider: Column) -> Column:
    """P10 + F24: drop blacklisted tag names, wrap survivors as
    struct(name, provider). Input: array<string>."""
    kept = F.filter(
        tags,
        lambda t: ~F.lower(t).isin(*TAG_BLACKLIST)
        & ~F.exists(
            F.array(*[F.lit(b) for b in TAG_CONTAINS_BLACKLIST]),
            lambda b: F.lower(t).contains(b),
        ),
    )
    enriched = F.transform(
        kept, lambda t: F.struct(t.alias("name"), provider.alias("provider"))
    )
    return F.when(tags.isNull(), F.lit(None)).otherwise(enriched)


def normalize_image_batch(raw: DataFrame) -> DataFrame:
    """Typed, cleaned image rows from a raw all-string batch.

    Expects IMAGE_TSV_RAW-shaped columns (strings; meta_data/tags as
    JSON strings). Adds ``_rejected`` (required column nulled out after
    prepare) — callers split with :func:`split_rejected`.
    """
    p = raw

    # typed coercions first (they ignore sanitize)
    for c in ("width", "height", "filesize"):
        if c in p.columns:
            p = p.withColumn(c, int_coerce(F.col(c)))
    if "watermarked" in p.columns:
        p = p.withColumn("watermarked", bool_coerce(F.col("watermarked")))

    # string prepare (sanitize + limits)
    for name in IMAGE_COL_LIMITS:
        if name in p.columns and name not in ("license", "license_version"):
            p = p.withColumn(name, prepare_string_col(name, F.col(name)))

    # license canonicalization (F9): normalized pair or nulls
    if "license" in p.columns:
        pair = resolve_license_pair(
            F.col("license"), F.col("license_version")
        )
        p = p.withColumn("_lic", pair)
        p = p.withColumn("license", F.col("_lic.license")).withColumn(
            "license_version", F.col("_lic.license_version")
        ).drop("_lic")

    # complex columns arrive as JSON strings on the TSV wire.
    # F5: leaf-sanitize the WHOLE document first (recursive, depth-100 —
    # columns.py:131-173) so nested meta_data objects are sanitized even
    # though the engine's working type is a flat map; the map parse
    # below then sees clean leaves.
    if "meta_data" in p.columns and dict(p.dtypes)["meta_data"] == "string":
        from cccatalog_spark.functions.sanitize import sanitize_meta_map_col

        p = p.withColumn(
            "meta_data", sanitize_meta_map_col(F.col("meta_data"))
        )
    if "tags" in p.columns and dict(p.dtypes)["tags"] == "string":
        p = p.withColumn("tags", F.from_json("tags", "array<string>"))

    # meta_data license_url enrichment (image.py:371-384): only when
    # the license resolved and the key is absent
    if "meta_data" in p.columns and "license" in p.columns:
        lic_url = canonical_license_url(
            F.col("license"), F.col("license_version")
        )
        empty = F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<string>")
        )
        enriched = F.map_concat(
            F.map_from_arrays(F.array(F.lit("license_url")), F.array(lic_url)),
            F.coalesce(F.col("meta_data"), empty),
        )  # existing key wins under LAST_WIN (right side)
        p = p.withColumn(
            "meta_data",
            F.when(F.col("license").isNotNull(), enriched).otherwise(
                F.col("meta_data")
            ),
        )

    # tags blacklist + enrichment
    if "tags" in p.columns and "provider" in p.columns:
        p = p.withColumn(
            "tags", filter_enrich_tags(F.col("tags"), F.col("provider"))
        )

    # source defaulting (F25)
    if "source" in p.columns and "provider" in p.columns:
        p = p.withColumn("source", F.coalesce(F.col("source"), F.col("provider")))

    # required-column rejection (P6/P7)
    required = [c for c in IMAGE_REQUIRED if c in p.columns]
    rejected = F.lit(False)
    for c in required:
        rejected = rejected | F.col(c).isNull()
    return p.withColumn("_rejected", rejected)


def split_rejected(prepared: DataFrame) -> tuple[DataFrame, DataFrame]:
    good = prepared.where(~F.col("_rejected")).drop("_rejected")
    bad = prepared.where(F.col("_rejected")).drop("_rejected")
    return good, bad


def ensure_ingestion_type(df: DataFrame, default: str | None = None) -> DataFrame:
    """The one sanctioned schema-evolution hook (SURVEY §1.2): 17-column
    legacy batches gain ``ingestion_type`` (util/loader/
    ingestion_column.py:12-59). Reference backfill rule: 'commoncrawl'
    when ``source`` is 'commoncrawl', else 'provider_api' — unless an
    explicit default is given."""
    if "ingestion_type" in df.columns:
        return df
    if default is not None:
        return df.withColumn("ingestion_type", F.lit(default))
    return df.withColumn(
        "ingestion_type",
        F.when(
            F.col("source") == "commoncrawl", F.lit("commoncrawl")
        ).otherwise(F.lit("provider_api")),
    )


def serialize_image_tsv(df: DataFrame) -> DataFrame:
    """Inverse wire encoding for write_tsv: maps/arrays → JSON strings,
    booleans → 't'/'f' (image.py:340-354)."""
    out = df
    for name, dtype in df.dtypes:
        if dtype.startswith("map<") or dtype.startswith("array<"):
            out = out.withColumn(name, F.to_json(name))
        elif dtype == "boolean":
            out = out.withColumn(
                name,
                F.when(F.col(name), F.lit("t"))
                .when(~F.col(name), F.lit("f")),
            )
    return out
