"""JSONB merge semantics — F16 / A10 in SURVEY §2.8, the column-level
half of the upsert operator (J1).

PostgreSQL reference (util/loader/sql.py:194-214):

- ``meta_data``: ``jsonb_strip_nulls(old) || jsonb_strip_nulls(new)`` —
  null-valued keys dropped on both sides, right (incoming) side wins on
  key conflicts, with COALESCE fallbacks when either side is NULL.
- ``tags``: ``jsonb_agg(DISTINCT x) FROM jsonb_array_elements(old||new)``
  — distinct union, preserving the old-then-new element order of first
  appearance (we use array_distinct(concat(...)) which keeps first
  occurrence).

Kept as native MapType/ArrayType expressions (no JSON re-parse) so the
merge is a pure Tungsten expression; requires
``spark.sql.mapKeyDedupPolicy=LAST_WIN`` (set by session.get_spark) so
``map_concat`` is right-biased like ``||``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_null_values(m: Column) -> Column:
    """``jsonb_strip_nulls``: drop map entries whose value is null."""
    return F.map_filter(m, lambda k, v: v.isNotNull())


def jsonb_object_merge(old: Column, new: Column) -> Column:
    """Right-biased key merge with null-stripping; NULL maps fall back
    to the other side (both NULL → NULL)."""
    empty = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>")
    )
    merged = F.map_concat(
        strip_null_values(F.coalesce(old, empty)),
        strip_null_values(F.coalesce(new, empty)),
    )
    return F.when(old.isNull() & new.isNull(), F.lit(None)).otherwise(merged)


def tags_distinct_union(old: Column, new: Column) -> Column:
    """Distinct union of tag arrays, first-occurrence order
    (old elements first)."""
    empty = F.array()
    merged = F.array_distinct(
        F.concat(F.coalesce(old, empty), F.coalesce(new, empty))
    )
    return F.when(old.isNull() & new.isNull(), F.lit(None)).otherwise(merged)
