"""Object-store sync planning — the relational core of the
reference's S3 syncer (S12, `SyncImageProviders.py:59-80`): the
reference lists a source prefix, downloads every non-``_SUCCESS``
object, verifies, and deletes. The I/O loop is a file-management
utility (ingestion-side); the DECISION — which objects to copy,
re-copy, or delete — is set algebra over two listings, and that is
the engine half implemented here.

One full-outer join on the object key (both listings bucket by the
same key at scale, collapsing the exchange — the CDC/MERGE
co-location story again); actions:

- ``copy``: in source only;
- ``replace``: in both but etag/size differ (a re-upload);
- ``delete``: in destination only (drained upstream);
- ``keep``: identical both sides.

The plan is idempotent — applying it and re-planning yields all-keep
— which is what makes a crashed sync resumable without bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sync_plan(
    src: DataFrame,
    dst: DataFrame,
    key_col: str = "key",
    compare_cols: tuple[str, ...] = ("etag", "size"),
) -> DataFrame:
    """(key, action, src_<c>..., dst_<c>...) — see module doc."""
    s = src.select(
        F.col(key_col),
        *[F.col(c).alias(f"src_{c}") for c in compare_cols],
    ).withColumn("_in_src", F.lit(1))
    d = dst.select(
        F.col(key_col),
        *[F.col(c).alias(f"dst_{c}") for c in compare_cols],
    ).withColumn("_in_dst", F.lit(1))
    j = s.join(d, key_col, "full_outer")
    differs = None
    for c in compare_cols:
        ne = ~F.col(f"src_{c}").eqNullSafe(F.col(f"dst_{c}"))
        differs = ne if differs is None else (differs | ne)
    action = (
        F.when(F.col("_in_dst").isNull(), F.lit("copy"))
        .when(F.col("_in_src").isNull(), F.lit("delete"))
        .when(differs, F.lit("replace"))
        .otherwise(F.lit("keep"))
    )
    return j.select(
        key_col,
        action.alias("action"),
        *[F.col(f"src_{c}") for c in compare_cols],
        *[F.col(f"dst_{c}") for c in compare_cols],
    )
