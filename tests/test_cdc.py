"""Snapshot CDC + SCD2 (operators/cdc.py): hand-computed change sets,
null-safe compares, and plan shape (single join, no driver state)."""

from __future__ import annotations

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
