"""JSONL + ORC source/sink round trips (sources/jsonl.py), including
the malformed-line quarantine contract."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cccatalog_spark.sources.jsonl import (
    load_jsonl,
    load_orc,
    write_jsonl,
    write_orc,
)


def test_jsonl_quarantine_split(spark, tmp_path):
    p = str(tmp_path / "in.jsonl")
    lines = [
        '{"id": 1, "name": "ok"}',
        'this is not json',
        '{"id": 2, "name": "also ok"}',
        '{"id": "not-a-number", "name": 3}',  # type mismatch -> corrupt
        '{"id": 3}',  # missing field is fine (null), not corrupt
    ]
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    good, quarantine = load_jsonl(spark, p, "id long, name string")
    g = sorted((r["id"], r["name"]) for r in good.collect())
    assert g == [(1, "ok"), (2, "also ok"), (3, None)]
    q = sorted(r["raw"] for r in quarantine.collect())
    assert q == ['this is not json', '{"id": "not-a-number", "name": 3}']


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).cast("string").alias("tag")
    )
    out = str(tmp_path / "out")
    write_jsonl(df, out, partitions=3)
    back, quarantine = load_jsonl(spark, out, "id long, tag string")
    assert sorted((r["id"], r["tag"]) for r in back.collect()) == sorted(
        (r["id"], r["tag"]) for r in df.collect()
    )
    assert quarantine.count() == 0


def test_orc_roundtrip_preserves_types(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 1.5, "a", [1, 2]), (2, float("nan"), None, [])],
        "i long, d double, s string, arr array<long>",
    )
    out = str(tmp_path / "orc")
    write_orc(df, out)
    back = load_orc(spark, out)
    assert back.schema == df.schema
    rows = sorted(back.collect(), key=lambda r: r["i"])
    assert rows[0]["arr"] == [1, 2]
    assert rows[1]["s"] is None
    assert rows[1]["d"] != rows[1]["d"]  # NaN preserved


def test_orc_predicate_pushdown_in_plan(spark, tmp_path):
    out = str(tmp_path / "orc2")
    write_orc(spark.range(1000).select("id", (F.col("id") % 10).alias("k")), out)
    plan = (
        load_orc(spark, out)
        .where(F.col("k") == 3)
        .select("id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "k" in plan.split("PushedFilters")[1][:60]


def test_sitemap_xml_clean_and_quarantine(spark, tmp_path):
    from cccatalog_spark.sources.xml import read_sitemap

    p = tmp_path / "sitemap.xml"
    p.write_text(
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "<url><loc>https://a/1</loc><lastmod>2024-01-01</lastmod>"
        "<priority>0.5</priority></url>\n"
        "<url><loc>https://a/2</loc><priority>high</priority></url>\n"
        "<url><loc>https://a/3</loc></url>\n"
        "</urlset>\n"
    )
    clean, quarantined = read_sitemap(spark, str(p))
    rows = {r["loc"]: r for r in clean.collect()}
    assert set(rows) == {"https://a/1", "https://a/3"}
    assert rows["https://a/1"]["priority"] == 0.5
    assert rows["https://a/3"]["lastmod"] is None
    q = quarantined.collect()
    assert len(q) == 1 and "high" in q[0]["raw"]


def test_corrupt_parquet_file_skipped_with_flag(spark):
    """Operational resilience: a truncated parquet part is skipped
    under ignoreCorruptFiles (the lake-scale posture: quarantine and
    continue, never fail the whole scan) and the intact rows all
    survive; without the flag the scan raises."""
    import os
    import tempfile

    import pytest

    tmp = tempfile.mkdtemp(prefix="ccc_corrupt_")
    spark.range(0, 100).coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    bad = os.path.join(tmp, "part-corrupt.parquet")
    with open(os.path.join(tmp, part), "rb") as f:
        blob = f.read()
    with open(bad, "wb") as f:
        f.write(blob[: len(blob) // 3])  # truncated footer -> corrupt

    with pytest.raises(Exception):
        spark.read.option("ignoreCorruptFiles", "false").parquet(tmp).count()
    n = spark.read.option("ignoreCorruptFiles", "true").parquet(tmp).count()
    assert n == 100
