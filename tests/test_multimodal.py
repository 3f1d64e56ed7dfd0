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


def test_codec_boundary_raises_without_library(spark):
    """Omitting codec= fails loudly when the real library is absent
    (never silent junk); with PIL installed resize picks it up
    automatically instead."""
    from cccatalog_spark.operators.multimodal import pil_resize_codec

    df = _media(spark)
    if pil_resize_codec(4, 4) is None:
        with pytest.raises(NotImplementedError):
            resize_images(df, "media_id", "payload", 64, 64).collect()
    with pytest.raises(NotImplementedError):
        sample_frames(df, "media_id", "payload", 1000)


def test_resize_plumbing_with_fake_codec(spark):
    from cccatalog_spark.operators.multimodal import fake_resize_codec

    df = _media(spark)
    out = {
        r["media_id"]: r
        for r in resize_images(
            df, "media_id", "payload", 4, 3, codec=fake_resize_codec(4, 3)
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    for r in out.values():
        assert r["width"] == 4 and r["height"] == 3
        assert r["byte_len"] == 12 and len(r["payload"]) == 12
    # deterministic: payload cycled to width*height bytes
    assert bytes(out[1]["payload"]) == (b"abcdefgh" * 2)[:12]


def test_resize_with_real_pil_when_available(spark):
    """Runs the SAME pipeline through the real PIL codec — skipped
    cleanly in environments without Pillow, exercised wherever it is
    installed."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    from cccatalog_spark.operators.multimodal import pil_resize_codec

    buf = io.BytesIO()
    Image.new("RGB", (10, 6), (200, 10, 10)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "media_id long, payload binary"
    )
    (row,) = resize_images(df, "media_id", "payload", 4, 3).collect()
    assert (row["width"], row["height"]) == (4, 3)
    with Image.open(io.BytesIO(bytes(row["payload"]))) as im:
        assert im.size == (4, 3)


def test_frame_sampling_plumbing_with_fake_codec(spark):
    from cccatalog_spark.operators.multimodal import fake_frame_codec

    df = _media(spark).where("media_id = 1")  # payload b'abcdefgh'
    rows = sample_frames(
        df, "media_id", "payload", 50, codec=fake_frame_codec(50, 200)
    ).collect()
    assert [r["frame_ms"] for r in sorted(rows, key=lambda r: r["frame_ms"])] \
        == [0, 50, 100, 150]
    assert all(r["media_id"] == 1 and len(r["frame"]) > 0 for r in rows)


def _wav_bytes(freq_hz=440, ms=100, rate=8000, amp=8000):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    n = rate * ms // 1000
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"".join(
            struct.pack("<h", int(amp * math.sin(2 * math.pi * freq_hz *
                                                 i / rate)))
            for i in range(n)
        ))
    return buf.getvalue()


def test_audio_features_real_wav_decode(spark):
    """The audio modality decodes for real (stdlib wave/audioop): WAV
    header fields and PCM RMS come back exact; junk bytes degrade to
    valid=false rows instead of failing the stage."""
    from cccatalog_spark.operators.multimodal import audio_features

    wav = _wav_bytes()
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, b"not a wav"), (3, None)],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in
           audio_features(df, "media_id", "payload").collect()}
    ok = out[1]
    assert ok["valid"] and ok["n_channels"] == 1
    assert ok["sample_rate"] == 8000 and ok["n_frames"] == 800
    assert ok["duration_ms"] == 100
    # RMS of a full-scale-8000 sine ~ 8000/sqrt(2) ± rounding
    assert abs(ok["rms"] - 5657) < 60
    assert not out[2]["valid"] and not out[3]["valid"]


def test_ahash_bits_match_python_model(spark):
    """Column-algebra aHash equals the per-row Python recipe."""
    from pyspark.sql import functions as F
    from cccatalog_spark.operators.multimodal import (
        ahash_from_features,
        fake_decode,
    )

    payloads = [b"hello world payload bytes", b"abcdefgh" * 5, b"x" * 33]
    rows = [(i, fake_decode(p, 32)) for i, p in enumerate(payloads)]

    def model(feat):
        m = sum(feat) / 32.0
        return sum(1 << j for j, v in enumerate(feat) if v > m)

    df = spark.createDataFrame(rows, ["media_id", "feature"])
    got = {
        r.media_id: r.h
        for r in df.select(
            "media_id", ahash_from_features("feature", 32).alias("h")
        ).collect()
    }
    assert got == {i: model(f) for i, f in rows}


def test_phash_neardup_exact_recall(spark):
    """Banded candidates find every pair within the radius (pigeonhole)
    and nothing outside it survives the verify."""
    import itertools
    from cccatalog_spark.operators.multimodal import (
        extract_features,
        fake_decode,
        phash_neardup_pairs,
    )
    from pyspark.sql import functions as F

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "completely different text with other characters",
        "the quick brown fox jumps over the lazy dot",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    feats = extract_features(
        df.select("doc_id", F.encode("text", "utf-8").alias("payload")),
        "doc_id", "payload", dim=32,
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_neardup_pairs(
            feats, "media_id", "feature", dim=32, n_bands=4, max_hamming=3
        ).collect()
    }

    def model_hash(t):
        f = fake_decode(t.encode(), 32)
        m = sum(f) / 32.0
        return sum(1 << j for j, v in enumerate(f) if v > m)

    hs = {i: model_hash(t) for i, t in enumerate(texts)}
    want = {
        (a, b): bin(hs[a] ^ hs[b]).count("1")
        for a, b in itertools.combinations(range(len(texts)), 2)
        if bin(hs[a] ^ hs[b]).count("1") <= 3
    }
    assert got == want


def test_phash_guards():
    import pytest
    from cccatalog_spark.operators.multimodal import (
        ahash_from_features,
        phash_neardup_pairs,
    )

    with pytest.raises(ValueError):
        ahash_from_features("f", 63)
    with pytest.raises(ValueError):
        phash_neardup_pairs(None, "id", "f", n_bands=4, max_hamming=4)
