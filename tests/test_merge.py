"""Executable spec for the merge engine (J1/J2/J7) — the semantics of
util/loader/sql.py:185-316 encoded as micro-frame tests, mirroring the
reference's util/loader/test_sql.py strategy (SURVEY §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cccatalog_spark.operators.merge import (
    merge_overwrite,
    merge_upsert,
    replay_collapse,
)

SCHEMA = (
    "k string, val string, num int, "
    "meta map<string,string>, tags array<string>"
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _by_key(df):
    return {r["k"]: r.asDict() for r in df.collect()}


def test_upsert_newest_non_null(spark):
    target = _frame(spark, [("a", "old", 1, None, None)])
    batch = _frame(spark, [("a", None, 2, None, None)])
    out = _by_key(merge_upsert(target, batch, ["k"]))
    # batch null does NOT clobber target value (coalesce(new, old))
    assert out["a"]["val"] == "old"
    assert out["a"]["num"] == 2


def test_upsert_insert_and_keep(spark):
    target = _frame(spark, [("keep", "t", 1, None, None)])
    batch = _frame(spark, [("new", "b", 2, None, None)])
    out = _by_key(merge_upsert(target, batch, ["k"]))
    assert set(out) == {"keep", "new"}
    assert out["keep"]["val"] == "t"
    assert out["new"]["val"] == "b"


def test_upsert_jsonb_object_merge(spark):
    # jsonb_strip_nulls(old) || jsonb_strip_nulls(new): right side wins,
    # null values dropped both sides (sql.py:194-204)
    target = _frame(
        spark, [("a", None, None, {"x": "1", "y": "old", "dead": None}, None)]
    )
    batch = _frame(spark, [("a", None, None, {"y": "new", "z": "3"}, None)])
    out = _by_key(merge_upsert(target, batch, ["k"]))
    assert out["a"]["meta"] == {"x": "1", "y": "new", "z": "3"}


def test_upsert_jsonb_null_sides(spark):
    target = _frame(spark, [("a", None, None, None, None),
                            ("b", None, None, {"x": "1"}, None)])
    batch = _frame(spark, [("a", None, None, {"z": "9"}, None),
                           ("b", None, None, None, None)])
    out = _by_key(merge_upsert(target, batch, ["k"]))
    assert out["a"]["meta"] == {"z": "9"}
    assert out["b"]["meta"] == {"x": "1"}


def test_upsert_tags_distinct_union(spark):
    target = _frame(spark, [("a", None, None, None, ["t1", "t2"])])
    batch = _frame(spark, [("a", None, None, None, ["t2", "t3"])])
    out = _by_key(merge_upsert(target, batch, ["k"]))
    assert out["a"]["tags"] == ["t1", "t2", "t3"]  # first-occurrence order


def test_upsert_refresh_applies_to_touched_rows_only(spark):
    target = _frame(spark, [("hit", "t", 1, None, None),
                            ("miss", "t", 1, None, None)])
    batch = _frame(spark, [("hit", "b", 2, None, None)])
    out = _by_key(
        merge_upsert(target, batch, ["k"], refresh={"val": F.lit("REFRESHED")})
    )
    assert out["hit"]["val"] == "REFRESHED"
    assert out["miss"]["val"] == "t"


def test_overwrite_batch_null_wins(spark):
    # J2: matched batch values replace outright, even when null
    target = _frame(spark, [("a", "old", 1, None, None)])
    batch = _frame(spark, [("a", None, 2, None, None)])
    out = _by_key(merge_overwrite(target, batch, ["k"]))
    assert out["a"]["val"] is None
    assert out["a"]["num"] == 2


def test_replay_collapse_last_non_null(spark):
    rows = [
        ("a", 1, "v1", 10, {"m": "1"}, ["t1"]),
        ("a", 2, None, 20, {"m": "2", "n": "x"}, ["t2"]),
        ("a", 3, "v3", None, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "k string, ord int, val string, num int, "
        "meta map<string,string>, tags array<string>",
    )
    out = _by_key(replay_collapse(df, ["k"], "ord"))
    a = out["a"]
    assert a["val"] == "v3"      # last non-null
    assert a["num"] == 20        # null in v3 does not clobber
    assert a["meta"] == {"m": "2", "n": "x"}  # ordered right-biased fold
    assert sorted(a["tags"]) == ["t1", "t2"]
    assert a["ord"] == 3


def test_image_merge_system_columns(spark):
    from cccatalog_spark.operators.merge import image_merge

    t_schema = (
        "identifier string, provider string, foreign_identifier string, "
        "title string, created_on string, updated_on string, "
        "last_synced_with_source string, removed_from_source boolean"
    )
    old = "2020-01-01 00:00:00"
    target = spark.createDataFrame(
        [
            ("uuid-1", "p", "f1", "old title", old, old, old, True),
            ("uuid-2", "p", "f2", "untouched", old, old, old, False),
        ],
        t_schema,
    ).selectExpr(
        "identifier", "provider", "foreign_identifier", "title",
        "CAST(created_on AS TIMESTAMP) created_on",
        "CAST(updated_on AS TIMESTAMP) updated_on",
        "CAST(last_synced_with_source AS TIMESTAMP) last_synced_with_source",
        "removed_from_source",
    )
    batch = spark.createDataFrame(
        [("p", "f1", "new title"), ("p", "f3", "inserted")],
        "provider string, foreign_identifier string, title string",
    )
    now = F.lit("2024-06-01 12:00:00").cast("timestamp")
    out = {
        r["foreign_identifier"]: r
        for r in image_merge(target, batch, now=now).collect()
    }
    f1, f2, f3 = out["f1"], out["f2"], out["f3"]
    # matched: refreshed timestamps, removed reset, created_on kept
    assert str(f1["updated_on"]) == "2024-06-01 12:00:00"
    assert f1["removed_from_source"] is False
    assert str(f1["created_on"]) == "2020-01-01 00:00:00"
    assert f1["identifier"] == "uuid-1"
    assert f1["title"] == "new title"
    # untouched: nothing refreshed, removed flag kept
    assert str(f2["updated_on"]) == "2020-01-01 00:00:00"
    assert f2["removed_from_source"] is False
    # inserted: created_on stamped, identifier assigned
    assert str(f3["created_on"]) == "2024-06-01 12:00:00"
    assert f3["identifier"] is not None and len(f3["identifier"]) == 36
    assert f3["removed_from_source"] is False


def test_ensure_ingestion_type_backfill(spark):
    from cccatalog_spark.operators.normalize import ensure_ingestion_type

    df = spark.createDataFrame(
        [("a", "commoncrawl"), ("b", "flickr")],
        "foreign_identifier string, source string",
    )
    out = {r["foreign_identifier"]: r["ingestion_type"]
           for r in ensure_ingestion_type(df).collect()}
    assert out == {"a": "commoncrawl", "b": "provider_api"}
    # already-migrated frames pass through untouched
    again = ensure_ingestion_type(
        ensure_ingestion_type(df), default="ignored"
    )
    assert again.columns.count("ingestion_type") == 1


def test_replay_collapse_then_upsert_equals_sequential_upserts(spark):
    """J7 equivalence: collapse+one-upsert == N sequential upserts."""
    target = _frame(spark, [("a", "t0", 0, {"base": "1"}, ["t0"])])
    versions = [
        _frame(spark, [("a", "v1", None, {"k": "1"}, ["x"])]),
        _frame(spark, [("a", None, 5, {"k": "2"}, ["y"])]),
    ]
    seq = target
    for v in versions:
        seq = merge_upsert(seq, v, ["k"])
    batch = spark.createDataFrame(
        [("a", 1, "v1", None, {"k": "1"}, ["x"]),
         ("a", 2, None, 5, {"k": "2"}, ["y"])],
        "k string, ord int, val string, num int, "
        "meta map<string,string>, tags array<string>",
    )
    collapsed = replay_collapse(batch, ["k"], "ord").drop("ord")
    one = merge_upsert(target, collapsed, ["k"])
    s, o = _by_key(seq)["a"], _by_key(one)["a"]
    assert s["val"] == o["val"] == "v1"
    assert s["num"] == o["num"] == 5
    assert s["meta"] == o["meta"] == {"base": "1", "k": "2"}
    assert sorted(s["tags"]) == sorted(o["tags"]) == ["t0", "x", "y"]
