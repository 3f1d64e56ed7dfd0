"""Multimodal columns — image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Extension layer (BASELINE.json north star): the reference stores only
image *metadata* (URLs); a training-data pipeline must also move the
bytes. Design:

- payloads ride an opaque ``binary`` column next to a typed metadata
  struct (modality, mime, width/height/duration, byte_len);
- decode / feature-extract / resize / frame-sample are ``mapInPandas``
  stages: Arrow batches in, Arrow batches out, schema pinned up front —
  the executor-side pattern that scales to 100 TB (no driver
  involvement, batch-granular memory);
- the actual codec calls (PIL/ffmpeg/...) are NOT available in this
  environment, so the codec boundary is explicit: ``decode_image``
  raises NotImplementedError unless handed a decoder, and the default
  test decoder is a deterministic fake (byte-stats "features") so the
  plumbing — schema, partitioning, UDF signature, batch shape — is
  real and tested end-to-end.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("byte_len", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def attach_media_meta(
    df: DataFrame, payload_col: str, modality: str, mime: str
) -> DataFrame:
    """Typed metadata struct derived from the payload (pure
    expressions; no decode)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.length(F.col(payload_col)).cast("long").alias("byte_len"),
        ),
    )


def fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a codec: per-byte-bucket means.
    Replace with a real decoder (PIL/librosa/pyav) in production."""
    if not payload:
        return [0.0] * dim
    buckets = [0.0] * dim
    counts = [0] * dim
    for i, b in enumerate(payload):
        buckets[i % dim] += b
        counts[i % dim] += 1
    return [round(buckets[i] / max(counts[i], 1), 6) for i in range(dim)]


def extract_features(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    decoder: Callable[[bytes], list[float]] | None = None,
    dim: int = 8,
) -> DataFrame:
    """Batch feature extraction over the payload column via
    ``mapInPandas`` — one Arrow batch at a time, constant memory per
    task, output schema pinned (FEATURE_SCHEMA).

    ``decoder=None`` uses the deterministic fake; pass a real codec
    wrapper in production. A genuinely missing codec should raise
    NotImplementedError('codec not available in this environment')
    inside the wrapper, failing the stage loudly rather than silently
    emitting junk.
    """
    import hashlib

    dec = decoder or (lambda b: fake_decode(b, dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "byte_len": payloads.map(
                        lambda b: len(b) if b is not None else 0
                    ).astype("int64"),
                    "checksum": payloads.map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "feature": payloads.map(lambda b: dec(b or b"")),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, FEATURE_SCHEMA)


def resize_images(
    df: DataFrame, id_col: str, payload_col: str, width: int, height: int
) -> DataFrame:
    """Image resize stage — plumbing only. The codec is not available
    in this container; wire a PIL-backed mapInPandas here in
    production."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "provide a decoder-backed mapInPandas (see extract_features)"
    )


def sample_frames(
    df: DataFrame, id_col: str, payload_col: str, every_ms: int
) -> DataFrame:
    """Video frame sampling stage — plumbing only (see resize_images)."""
    raise NotImplementedError(
        "video codec not available in this environment; "
        "provide a decoder-backed mapInPandas (see extract_features)"
    )
