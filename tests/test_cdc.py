"""Snapshot CDC + SCD2 (operators/cdc.py): hand-computed change sets,
null-safe compares, and plan shape (single join, no driver state)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy sweep; excluded from the fast loop (-m "not slow")

from pyspark.sql import functions as F

from cccatalog_spark.operators.cdc import scd2_from_snapshots, snapshot_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, w long")


def test_diff_all_change_types(spark):
    old = _snap(spark, [(1, "a", 1), (2, "b", 2), (3, "c", 3), (4, None, 4)])
    new = _snap(spark, [(2, "b", 2), (3, "C", 3), (4, None, 4), (5, "e", 5)])
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"], ["v", "w"]).collect()
    }
    assert got == {
        1: "delete",
        2: "unchanged",
        3: "update",
        4: "unchanged",  # NULL == NULL is unchanged (null-safe compare)
        5: "insert",
    }


def test_diff_null_transitions_are_updates(spark):
    old = _snap(spark, [(1, None, 1), (2, "x", 2)])
    new = _snap(spark, [(1, "now", 1), (2, None, 2)])
    got = {
        r["k"]: r
        for r in snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    assert got[1]["change_type"] == "update"
    assert got[1]["old_v"] is None and got[1]["new_v"] == "now"
    assert got[2]["change_type"] == "update"
    assert got[2]["new_v"] is None


def test_scd2_version_rows(spark):
    old = _snap(spark, [(1, "a", 1), (2, "b", 2), (3, "c", 3)])
    new = _snap(spark, [(2, "b", 2), (3, "C", 3), (5, "e", 5)])
    rows = sorted(
        (r["k"], r["v"], r["valid_from"], r["valid_to"])
        for r in scd2_from_snapshots(old, new, ["k"], ["v", "w"]).collect()
    )
    assert rows == [
        (1, "a", 0, 1),      # deleted: closed only
        (2, "b", 0, None),   # unchanged: one open row
        (3, "C", 1, None),   # updated: open new version...
        (3, "c", 0, 1),      # ...plus closed old version
        (5, "e", 1, None),   # inserted: open only
    ]


def test_diff_single_join_in_plan(spark):
    old = _snap(spark, [(1, "a", 1)])
    new = _snap(spark, [(1, "a", 1)])
    plan = (
        snapshot_diff(old, new, ["k"], ["v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Join") <= 1


# ---------------------------------------------------------------------------
# property: SCD2 open rows reconstruct the new snapshot exactly, and
# closed+open rows partition the diff
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_snapshot = st.dictionaries(
    st.integers(min_value=0, max_value=20),
    st.one_of(st.none(), st.text(alphabet="abc", max_size=2)),
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(old=_snapshot, new=_snapshot)
def test_scd2_open_rows_equal_new_snapshot(spark, old, new):
    mk = lambda d: spark.createDataFrame(
        [(k, v) for k, v in d.items()] or [(None, None)], "k long, v string"
    ).where(F.col("k").isNotNull())
    hist = scd2_from_snapshots(mk(old), mk(new), ["k"], ["v"]).collect()

    open_rows = {r["k"]: r["v"] for r in hist if r["valid_to"] is None}
    assert open_rows == new
    closed = {r["k"]: r["v"] for r in hist if r["valid_to"] is not None}
    # closed rows are exactly the old values of updated/deleted keys
    want_closed = {
        k: v
        for k, v in old.items()
        if k not in new or new[k] != v
    }
    assert closed == want_closed


def test_apply_changes_roundtrips_snapshot_diff(spark):
    from cccatalog_spark.operators.cdc import apply_changes, snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10),            # unchanged
         (2, "B", 20),            # update (string col)
         (3, "c", 99),            # update (numeric col)
         (5, "e", 50)],           # insert; key 4 deleted
        "k long, s string, v long",
    )
    diff = snapshot_diff(old, new, ["k"], ["s", "v"])
    rebuilt = apply_changes(old, diff, ["k"], ["s", "v"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_apply_changes_ignores_unchanged_rows(spark):
    from cccatalog_spark.operators.cdc import apply_changes

    old = spark.createDataFrame([(1, 10)], "k long, v long")
    feed = spark.createDataFrame(
        [(1, "unchanged", 999)], "k long, change_type string, new_v long"
    )
    out = apply_changes(old, feed, ["k"], ["v"]).collect()
    assert [tuple(r) for r in out] == [(1, 10)]


def test_maintain_grouped_sums_roundtrip(spark):
    import pyspark.sql.functions as F

    from cccatalog_spark.operators.cdc import (
        maintain_grouped_sums,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "c", 40.0)],
        "k long, g string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),    # unchanged
            (2, "b", 25.0),    # group migration a -> b + value change
            (3, "b", 30.0),    # unchanged
            (5, "d", 50.0),    # insert into brand-new group
        ],                      # 4 deleted -> group c disappears
        "k long, g string, v double",
    )
    agg_old = old.groupBy("g").agg(
        F.count("*").alias("cnt"), F.sum("v").alias("total")
    )
    feed = snapshot_diff(old, new, ["k"], ["g", "v"])
    got = sorted(
        map(tuple, maintain_grouped_sums(agg_old, feed, "g", "v").collect())
    )
    want = sorted(
        map(
            tuple,
            new.groupBy("g")
            .agg(F.count("*").alias("cnt"), F.sum("v").alias("total"))
            .collect(),
        )
    )
    assert got == want
    assert not any(r[0] == "c" for r in got)   # zero-count group retired
