"""Stream-stream event-time interval join (Structured Streaming's
symmetric-state join; SURVEY §2.9 streaming family next to the loader,
watermark aggs, and keyed-state ops).

The attribution shape: match every right-stream event to left-stream
events of the same key that happened at most ``max_gap`` earlier
(click→purchase attribution, request→response pairing, sensor
correlation). Spark buffers both sides in keyed state and the
time-range predicate lets the engine expire state once the watermark
passes — the state bound that keeps a perpetual join finite.

Scale notes:

- the join condition MUST carry the event-time range on top of the
  equi-key: without it the state store grows without bound (Spark
  cannot expire either side);
- the equi-key makes this a shuffled symmetric hash join — both
  streams partition by key once, state lives with its partition, and
  skewed keys are the same salting problem as any shuffle join;
- inner joins emit eagerly on match (no watermark wait), so end-to-end
  latency is one micro-batch; only outer-join nulls wait for the
  watermark;
- for a bounded replay (availableNow) a watermark longer than the
  replayed span makes the result exactly the batch interval join —
  which is how the oracle checks it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    max_gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner-join two streams on ``key_col`` where ``right_ts`` falls
    in ``[left_ts, left_ts + max_gap]``. Both sides get the same
    watermark delay; all non-key columns of both sides are kept (the
    key column once). ``left_ts``/``right_ts`` must be distinct
    timestamp column names."""
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct names")
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark).withColumnRenamed(
        key_col, "_rkey"
    )
    cond = (
        (F.col(key_col) == F.col("_rkey"))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_gap}"))
    )
    return l.join(r, cond, "inner").drop("_rkey")


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    keys: list[str],
    *,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: attach a batch dimension table
    to a stream (provider specs onto an ingest stream, user attributes
    onto events). Stateless — unlike the stream-stream join above,
    nothing is buffered: each micro-batch joins against the CURRENT
    dim snapshot, so a dim update applies from the next trigger on
    (the semantics to document, not a bug).

    Scale: the dim side broadcasts when small (the usual case) —
    per-batch map-side hash join, no shuffle of the stream; a huge dim
    falls back to a shuffled join per micro-batch, at which point
    pre-bucketing the dim by the key is the fix."""
    return stream.join(F.broadcast(dim), keys, how)
