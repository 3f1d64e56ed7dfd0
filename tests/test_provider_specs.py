"""Provider mapping specs against canned JSON fixtures — the
reference's per-provider resource-file test strategy (SURVEY §5),
driven through the shared normalize pipeline."""

from __future__ import annotations

import json

from cccatalog_spark.operators.normalize import (
    normalize_image_batch,
    split_rejected,
)
from cccatalog_spark.operators.provider_specs import (
    apply_spec,
    flickr_spec,
    wikimedia_spec,
)

FLICKR_COMPLETE = {
    "id": "14962725130",
    "owner": "48600109821",
    "title": 'A  "test"  photo',
    "license": "4",
    "tags": "bird  nature bird zoo",
    "url_l": None,
    "url_m": "https://live.staticflickr.com/3921/m.jpg",
    "url_s": "https://live.staticflickr.com/3921/s.jpg",
    "width_l": None,
    "width_m": 800,
    "width_s": 240,
    "height_l": None,
    "height_m": 600,
    "height_s": 180,
    "views": "2100",
}


def _records(spark, dicts):
    rows = [(json.dumps(d) if isinstance(d, dict) else d,) for d in dicts]
    return spark.createDataFrame(rows, "json string")


def test_flickr_complete_record(spark):
    raw = apply_spec(_records(spark, [FLICKR_COMPLETE]), flickr_spec())
    good, bad = split_rejected(normalize_image_batch(raw))
    assert bad.count() == 0
    row = good.collect()[0]
    assert row["provider"] == "flickr"
    assert row["source"] == "flickr"  # defaulted
    assert row["foreign_identifier"] == "14962725130"
    assert (
        row["foreign_landing_url"]
        == "https://www.flickr.com/photos/48600109821/14962725130"
    )
    assert row["url"].endswith("/m.jpg")  # size preference l→m→s
    assert row["width"] == 800 and row["height"] == 600
    assert row["license"] == "by" and row["license_version"] == "2.0"
    assert row["title"] == "A 'test' photo"  # sanitized
    assert [t["name"] for t in row["tags"]] == ["bird", "nature", "zoo"]
    assert row["meta_data"]["views"] == "2100"
    assert "license_url" in row["meta_data"]


def test_flickr_non_cc_and_partial_records_rejected(spark):
    non_cc = dict(FLICKR_COMPLETE, license="0")  # all rights reserved
    no_url = dict(
        FLICKR_COMPLETE, url_l=None, url_m=None, url_s=None
    )
    undecodable = "{not json"
    raw = apply_spec(
        _records(spark, [FLICKR_COMPLETE, non_cc, no_url, undecodable]),
        flickr_spec(),
    )
    good, bad = split_rejected(normalize_image_batch(raw))
    assert good.count() == 1  # only the complete record survives
    assert bad.count() == 2  # non-CC license + missing url; bad JSON dropped


def test_flickr_tag_cap(spark):
    many = dict(FLICKR_COMPLETE, tags=" ".join(f"tag{i:02d}" for i in range(30)))
    raw = apply_spec(_records(spark, [many]), flickr_spec())
    row = normalize_image_batch(raw).collect()[0]
    assert len(row["tags"]) == 20  # A11 cap


def test_smithsonian_cc0_filter_and_creator_priority(spark):
    from cccatalog_spark.operators.provider_specs import smithsonian_spec

    rec = {
        "id": "edanmdm-1",
        "title": "Artifact",
        "unit_code": "NMNH",
        "landing_url": "https://si.edu/object/1",
        "image_url": "https://ids.si.edu/1.jpg",
        "media_type": "Images",
        "access": "CC0",
        "creators": [
            {"label": "Author", "content": "Writer W"},
            {"label": "Artist", "content": "Painter A"},
            {"label": "artist/maker", "content": "Painter B"},
            {"label": "Artist", "content": "Unknown person"},
            {"label": "irrelevant", "content": "Nobody"},
        ],
    }
    non_cc0 = dict(rec, id="2", access="Restricted")
    raw = apply_spec(_records(spark, [rec, non_cc0]), smithsonian_spec())
    good, bad = split_rejected(normalize_image_batch(raw))
    rows = good.collect()
    assert len(rows) == 1 and bad.count() == 0  # non-CC0 filtered pre-pipeline
    row = rows[0]
    assert row["license"] == "cc0" and row["license_version"] == "1.0"
    # priority 0 labels win; plural rendering 'a and b'; unknown dropped
    assert row["creator"] == "Painter A and Painter B"
    assert row["meta_data"]["unit_code"] == "NMNH"


def test_creator_priority_single_and_empty(spark):
    from pyspark.sql import functions as F

    from cccatalog_spark.operators.provider_specs import (
        SMITHSONIAN_CREATOR_TYPES,
        creator_by_priority,
    )

    df = spark.createDataFrame(
        [
            ([("Author", "Solo S")],),
            ([("nope", "X")],),
            ([],),
        ],
        "creators array<struct<label string, content string>>",
    )
    out = [
        r["c"]
        for r in df.select(
            creator_by_priority(
                F.col("creators"), SMITHSONIAN_CREATOR_TYPES
            ).alias("c")
        ).collect()
    ]
    assert out == ["Solo S", None, None]


def test_wikimedia_bitmap_filter_and_license_path(spark):
    bitmap = {
        "pageid": "81754323",
        "title": "File:Example.jpg",
        "mediatype": "BITMAP",
        "url": "https://upload.wikimedia.org/a.jpg",
        "descriptionurl": "https://commons.wikimedia.org/wiki/File:Example.jpg",
        "width": 1024,
        "height": 768,
        "license_url": "https://creativecommons.org/licenses/by-sa/4.0/",
        "artist": "Some  Artist",
        "global_usage_count": 3,
    }
    audio = dict(bitmap, pageid="9", mediatype="AUDIO")
    raw = apply_spec(_records(spark, [bitmap, audio]), wikimedia_spec())
    good, bad = split_rejected(normalize_image_batch(raw))
    assert bad.count() == 0
    rows = good.collect()
    assert len(rows) == 1  # AUDIO filtered out (P8)
    row = rows[0]
    assert row["license"] == "by-sa" and row["license_version"] == "4.0"
    assert row["creator"] == "Some Artist"
    assert row["meta_data"]["global_usage_count"] == "3"
