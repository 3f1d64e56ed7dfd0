"""Keyed upsert/merge — J1/J2/J7 in SURVEY §2.3, the heart of the
reference system (util/loader/sql.py:185-316; replay loop
src/openledger_sql/02_migrate_to_new_image.sql).

Reference semantics (J1, sql.py:185-271):

- key: ``(provider, foreign_identifier)`` (md5 in Postgres is only a
  btree-shrinking trick — SURVEY §1.2).
- matched rows: every scalar column ``COALESCE(incoming.c, target.c)``
  (newest-non-null); ``meta_data`` jsonb right-biased null-stripped key
  merge; ``tags`` distinct array union; ``updated_on``/
  ``last_synced_with_source`` refreshed; ``removed_from_source`` reset.
- unmatched incoming rows: inserted; unmatched target rows: untouched.

Spark realization: one full-outer equi-join on the key + per-column
merge expressions. This is the idiomatic no-Delta MERGE; at scale the
target should be written bucketed by the key (``bucketBy(n, *key)``) so
the per-batch merge join co-locates without reshuffling the big side —
the incoming micro-batch is small and shuffles cheaply. AQE handles
skewed providers.

J7 (replay collapse): the reference replays history rn=1..12 with one
upsert per rank because Postgres MERGE can't see intra-batch ordering.
``replay_collapse`` folds a multi-version batch to one row per key in a
single aggregation (max_by per column + map/array unions), after which
ONE merge_upsert reproduces the entire replay — a genuine Spark-first
simplification (SURVEY §4.3.5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cccatalog_spark.functions.json_merge import (
    jsonb_object_merge,
    tags_distinct_union,
)


def _is_map(df: DataFrame, col: str) -> bool:
    return df.schema[col].dataType.typeName() == "map"


def _is_array(df: DataFrame, col: str) -> bool:
    return df.schema[col].dataType.typeName() == "array"


def merge_upsert(
    target: DataFrame,
    batch: DataFrame,
    key: Sequence[str],
    *,
    refresh: dict[str, Column] | None = None,
    batch_wins: bool = False,
) -> DataFrame:
    """Full-outer merge of ``batch`` into ``target`` on ``key``.

    - scalar columns: ``coalesce(batch.c, target.c)`` (J1) or
      ``coalesce(target-side-only-if-batch-row-missing)`` when
      ``batch_wins`` (J2 overwrite semantics: a matched batch value —
      even null — replaces the target value).
    - MapType columns: right-biased null-stripped merge (F16).
    - ArrayType columns: distinct union (A10).
    - ``refresh``: expressions applied to matched/inserted rows only
      (e.g. ``{"updated_on": F.current_timestamp(), "removed_from_source":
      F.lit(False)}``), reference sql.py:250-252.

    Columns present in only one side pass through unchanged.
    """
    refresh = refresh or {}
    # string-qualified refs so self-join lineage (target and batch often
    # derive from the same scan) never trips ambiguous-column resolution
    t = target.alias("__t")
    b = batch.withColumn("__b_present", F.lit(True)).alias("__b")

    def tc(c: str) -> Column:
        return F.col(f"__t.{c}")

    def bc(c: str) -> Column:
        return F.col(f"__b.{c}")

    # plain equality, NOT eqNullSafe: Postgres unique indexes treat
    # NULL keys as distinct (ON CONFLICT never fires on them), so
    # null-keyed rows pass through unmatched on both sides — and plain
    # keys let a bucketed target join without reshuffling
    # (tests/test_plans.py asserts the Exchange-free target side)
    cond = None
    for k in key:
        clause = tc(k) == bc(k)
        cond = clause if cond is None else cond & clause
    joined = t.join(b, cond, "full_outer")

    # a batch row exists iff the sentinel survived the outer join
    # (key-nullness can't tell: null keys never match but are valid rows)
    batch_present = bc("__b_present").isNotNull()

    out: list[Column] = []
    t_cols, b_cols = set(target.columns), set(batch.columns)
    for c in target.columns:
        if c in key:
            out.append(F.coalesce(bc(c), tc(c)).alias(c))
            continue
        if c in refresh:
            merged = F.when(batch_present, refresh[c]).otherwise(tc(c))
        elif c not in b_cols:
            merged = tc(c)
        elif _is_map(target, c) and _is_map(batch, c):
            merged = jsonb_object_merge(tc(c), bc(c))
        elif _is_array(target, c) and _is_array(batch, c):
            merged = tags_distinct_union(tc(c), bc(c))
        elif batch_wins:
            merged = F.when(batch_present, bc(c)).otherwise(tc(c))
        else:
            merged = F.coalesce(bc(c), tc(c))
        out.append(merged.alias(c))
    # batch-only columns (e.g. system columns added at insert time)
    for c in batch.columns:
        if c not in t_cols and c not in key:
            out.append(bc(c).alias(c))
    return joined.select(*out)


def image_merge(
    target: DataFrame,
    batch: DataFrame,
    *,
    now: Column | None = None,
) -> DataFrame:
    """The reference upsert, fully assembled (J1, util/loader/sql.py:
    185-271 + system columns sql.py:220-252): merge on IMAGE_KEY with

    - ``updated_on`` / ``last_synced_with_source`` refreshed to ``now``
      on every touched row (matched or inserted);
    - ``removed_from_source`` reset to false on touched rows;
    - ``created_on`` stamped and ``identifier`` (uuid) assigned for
      inserted rows only (column defaults in the DDL);
    - everything else: newest-non-null scalars, right-biased
      null-stripped meta_data merge, tag distinct union.

    ``now`` defaults to current_timestamp(); pass a literal for
    deterministic tests.
    """
    from cccatalog_spark.schemas import IMAGE_KEY

    now = now if now is not None else F.current_timestamp()
    merged = merge_upsert(
        target,
        batch,
        IMAGE_KEY,
        refresh={
            "updated_on": now,
            "last_synced_with_source": now,
            "removed_from_source": F.lit(False),
        },
    )
    # insert-time defaults: rows new to the target have null
    # created_on/identifier (target-side-only columns)
    if "created_on" in merged.columns:
        merged = merged.withColumn(
            "created_on", F.coalesce(F.col("created_on"), now)
        )
    if "identifier" in merged.columns:
        merged = merged.withColumn(
            "identifier", F.coalesce(F.col("identifier"), F.expr("uuid()"))
        )
    return merged


def merge_overwrite(
    target: DataFrame, batch: DataFrame, key: Sequence[str]
) -> DataFrame:
    """J2: matched batch values overwrite target values outright
    (util/loader/sql.py:274-316)."""
    return merge_upsert(target, batch, key, batch_wins=True)


def replay_collapse(
    batch: DataFrame,
    key: Sequence[str],
    order_by: str,
) -> DataFrame:
    """Collapse a multi-version batch to one row per key, as if each
    version had been upserted in ``order_by`` order (J7 single-pass).

    Per column: last non-null value in order; maps: ordered right-biased
    merge; arrays: distinct union in order. ``order_by`` must be a
    totally-ordering column (add a tiebreaker upstream if needed).
    """
    ordcol = F.col(order_by)
    aggs: list[Column] = []
    for c in batch.columns:
        if c in key:
            continue
        if c == order_by:
            aggs.append(F.max(ordcol).alias(c))
        elif _is_map(batch, c):
            # fold maps in ascending order; LAST_WIN map_concat = newest wins.
            # custom comparator on the order field only — maps themselves
            # are not orderable so plain array_sort would reject the struct
            pairs = F.array_sort(
                F.collect_list(F.struct(ordcol.alias("o"), F.col(c).alias("m"))),
                lambda x, y: F.when(x["o"] < y["o"], -1)
                .when(x["o"] > y["o"], 1)
                .otherwise(0),
            )
            empty = F.map_from_arrays(
                F.array().cast("array<string>"), F.array().cast("array<string>")
            )
            folded = F.aggregate(
                pairs,
                empty,
                lambda acc, x: F.map_concat(
                    acc, F.map_filter(F.coalesce(x["m"], empty), lambda k, v: v.isNotNull())
                ),
            )
            # null only when EVERY version's map was null — an empty
            # (but present) map must stay {}, matching what sequential
            # jsonb merges produce
            aggs.append(
                F.when(F.max(F.col(c).isNotNull()), folded).alias(c)
            )
        elif _is_array(batch, c):
            pairs = F.array_sort(
                F.collect_list(F.struct(ordcol.alias("o"), F.col(c).alias("a")))
            )
            folded = F.array_distinct(
                F.flatten(F.transform(pairs, lambda x: F.coalesce(x["a"], F.array())))
            )
            aggs.append(
                F.when(F.max(F.col(c).isNotNull()), folded).alias(c)
            )
        else:
            # last non-null in order: max_by ignores rows whose ordering
            # key is null, so null-out the ordering key where c is null
            aggs.append(
                F.max_by(F.col(c), F.when(F.col(c).isNotNull(), ordcol)).alias(c)
            )
    return batch.groupBy(*key).agg(*aggs)
