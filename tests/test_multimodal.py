"""Multimodal plumbing: metadata attach, Arrow-batched feature
extraction (deterministic fake codec), and loud codec stubs."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from cccatalog_spark.operators.multimodal import (
    attach_media_meta,
    extract_features,
    fake_decode,
    resize_images,
    sample_frames,
)


def _media(spark):
    rows = [(1, b"abcdefgh"), (2, b""), (3, None), (4, bytes(range(16)))]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_attach_media_meta(spark):
    df = attach_media_meta(_media(spark), "payload", "image", "image/png")
    m = {r["media_id"]: r["media_meta"] for r in df.collect()}
    assert m[1]["modality"] == "image"
    assert m[1]["byte_len"] == 8
    assert m[2]["byte_len"] == 0
    assert m[3]["byte_len"] is None


def test_extract_features_matches_local_decode(spark):
    feats = {
        r["media_id"]: r
        for r in extract_features(_media(spark), "media_id", "payload", dim=4)
        .collect()
    }
    assert feats[1]["feature"] == fake_decode(b"abcdefgh", 4)
    assert feats[1]["checksum"] == hashlib.md5(b"abcdefgh").hexdigest()
    assert feats[1]["byte_len"] == 8
    # empty and null payloads degrade deterministically
    assert feats[2]["feature"] == [0.0] * 4
    assert feats[3]["feature"] == [0.0] * 4
    assert feats[3]["checksum"] == hashlib.md5(b"").hexdigest()
    assert feats[4]["feature"] == fake_decode(bytes(range(16)), 4)


def test_codec_stubs_raise(spark):
    df = _media(spark)
    with pytest.raises(NotImplementedError):
        resize_images(df, "media_id", "payload", 64, 64)
    with pytest.raises(NotImplementedError):
        sample_frames(df, "media_id", "payload", 1000)
