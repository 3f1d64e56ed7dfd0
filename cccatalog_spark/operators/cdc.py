"""Snapshot change-data-capture and SCD2 history build (warehouse ops
beyond the reference's single-table upsert — the reference's loader
only ever merges "newest wins" (util/loader/sql.py upsert); a catalog
consumer also needs to KNOW what changed between two crawls and to
keep the history).

``snapshot_diff`` derives row-level CDC between two snapshots of the
same keyed table: insert / delete / update / unchanged, with the old
and new compare values side by side. ``scd2_from_snapshots`` turns the
same comparison into slowly-changing-dimension type-2 version rows
(valid_from / valid_to as batch ordinals — deterministic, no wall
clock).

Scale shape: ONE full-outer sort-merge join keyed on the business key
— both sides shuffle once on the key (co-partition or bucket the
snapshots by key and even that exchange disappears; see
sources/bucketed.py), comparisons are null-safe column expressions in
codegen, and SCD2 versioning is a union of narrow projections over the
joined frame (no second join, no window). Nothing driver-side.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _differs(cols: list[str]) -> Column:
    """Null-safe 'any compare column changed' predicate."""
    terms = [
        ~F.col(f"_old_{c}").eqNullSafe(F.col(f"_new_{c}")) for c in cols
    ]
    return reduce(Column.__or__, terms)


def _prefixed(df: DataFrame, keys: list[str], cols: list[str], tag: str) -> DataFrame:
    sel = [F.col(k) for k in keys]
    sel += [F.col(c).alias(f"_{tag}_{c}") for c in cols]
    sel.append(F.lit(True).alias(f"_in_{tag}"))
    return df.select(*sel)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """``(keys..., change_type, old_<c>..., new_<c>...)`` with
    change_type ∈ insert|delete|update|unchanged. One full-outer join
    on the key; null-safe value comparison."""
    o = _prefixed(old, keys, compare_cols, "old")
    n = _prefixed(new, keys, compare_cols, "new")
    j = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(_differs(compare_cols), F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = [F.col(k) for k in keys] + [change.alias("change_type")]
    out += [
        F.col(f"_old_{c}").alias(f"old_{c}") for c in compare_cols
    ] + [F.col(f"_new_{c}").alias(f"new_{c}") for c in compare_cols]
    return j.select(*out)


def scd2_from_snapshots(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    from_batch: int = 0,
    to_batch: int = 1,
) -> DataFrame:
    """SCD2 version rows across two snapshots:
    ``(keys..., <compare_cols>..., valid_from, valid_to)``.

    - unchanged → one open row (from_batch, NULL)
    - update    → closed old row (from_batch, to_batch) + open new row
    - delete    → closed old row only
    - insert    → open new row only

    Built as narrow projections over ``snapshot_diff``'s single join —
    the joined frame is reused for both the closed and the open half
    (persist it upstream if the optimizer doesn't collapse the reuse).
    """
    diff = snapshot_diff(old, new, keys, compare_cols)
    vfrom = F.lit(from_batch).cast("int")
    vto = F.lit(to_batch).cast("int")
    closed = diff.where(
        F.col("change_type").isin("update", "delete")
    ).select(
        *keys,
        *[F.col(f"old_{c}").alias(c) for c in compare_cols],
        vfrom.alias("valid_from"),
        vto.alias("valid_to"),
    )
    open_old = diff.where(F.col("change_type") == "unchanged").select(
        *keys,
        *[F.col(f"old_{c}").alias(c) for c in compare_cols],
        vfrom.alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
    )
    open_new = diff.where(
        F.col("change_type").isin("update", "insert")
    ).select(
        *keys,
        *[F.col(f"new_{c}").alias(c) for c in compare_cols],
        vto.alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
    )
    return closed.unionByName(open_old).unionByName(open_new)


def apply_changes(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Apply a change feed to a snapshot — the inverse of
    :func:`snapshot_diff`: ``changes`` rows carry (keys...,
    change_type ∈ insert|update|delete, new_<c>...) and fold into the
    target so that ``apply_changes(old, snapshot_diff(old, new)) ==
    new`` exactly (roundtrip property, tested). ``unchanged`` rows in
    the feed are ignored, so a raw snapshot_diff output applies
    as-is.

    Plan: one left anti/semi-style full pass — target LEFT JOIN feed
    on the key (deletes and updates resolve in the join projection),
    UNION the inserts. One shuffle on the key both sides; at 100 TB
    both frames bucket by the same key and the exchange disappears
    (the MERGE co-location story, applied to CDC replay)."""
    ch = changes.where(F.col("change_type") != "unchanged")
    upserts = ch.where(F.col("change_type").isin("insert", "update"))
    feed = ch.select(
        *[F.col(k) for k in keys],
        F.col("change_type").alias("__ct"),
    )
    joined = target.join(feed, keys, "left")
    kept = joined.where(
        F.col("__ct").isNull() | (F.col("__ct") == "unchanged")
    ).select(target.columns)
    new_rows = upserts.select(
        *[F.col(k) for k in keys],
        *[F.col(f"new_{c}").alias(c) for c in value_cols],
    )
    return kept.unionByName(new_rows)


def maintain_grouped_sums(
    agg: DataFrame,
    changes: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Incremental view maintenance for a ``GROUP BY g → (count, sum)``
    materialization: fold a :func:`snapshot_diff` change feed into the
    existing aggregate WITHOUT rescanning the base table.

    Delta algebra per change row (the textbook IVM counting method):
    insert → (+1, +new); delete → (−1, −old); update → (−1, −old) at
    the OLD group and (+1, +new) at the NEW group (group migrations
    handled, not just in-place value changes). Groups whose count
    reaches zero disappear, so ``maintain(agg(a), diff(a, b)) ==
    agg(b)`` exactly — the roundtrip is pinned in tests.

    Cost is O(|changes|): one explode to ±contributions, one groupBy
    merge against the (tiny relative to base) aggregate — the reason
    100 TB dashboards consume feeds, not snapshots. ``changes`` needs
    (change_type, old_<g>, new_<g>, old_<v>, new_<v>) — i.e.
    snapshot_diff called WITH the group column in compare_cols.
    """
    og, ng = f"old_{group_col}", f"new_{group_col}"
    ov, nv = f"old_{value_col}", f"new_{value_col}"
    ch = changes.where(F.col("change_type") != "unchanged")
    contrib = ch.select(
        F.explode(
            F.filter(
                F.array(
                    F.when(
                        F.col("change_type").isin("delete", "update"),
                        F.struct(
                            F.col(og).alias("g"),
                            F.lit(-1).cast("long").alias("dc"),
                            (-F.col(ov)).alias("dv"),
                        ),
                    ),
                    F.when(
                        F.col("change_type").isin("insert", "update"),
                        F.struct(
                            F.col(ng).alias("g"),
                            F.lit(1).cast("long").alias("dc"),
                            F.col(nv).alias("dv"),
                        ),
                    ),
                ),
                lambda s: s.isNotNull(),
            )
        ).alias("d")
    ).select("d.g", "d.dc", "d.dv")
    merged = (
        agg.select(
            F.col(group_col).alias("g"),
            F.col("cnt").cast("long").alias("dc"),
            F.col("total").alias("dv"),
        )
        .unionByName(contrib)
        .groupBy("g")
        .agg(F.sum("dc").alias("cnt"), F.sum("dv").alias("total"))
        .where(F.col("cnt") > 0)
    )
    return merged.select(
        F.col("g").alias(group_col), "cnt", "total"
    )
