"""Streaming windowed aggregation with late-data handling — the
Structured Streaming surface the reference's scheduler machinery
approximates (SURVEY §2.9). The reference has no true stream engine;
these are the engine-native equivalents its batch cadences map onto:

- tumbling event-time counts with a watermark (late rows beyond the
  watermark are dropped, state is bounded);
- the session windows / sliding windows appear in batch form as
  q31/q43; this module provides the genuinely-streaming tumbling path
  used by the loader's monitoring metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    stream: DataFrame,
    ts_col: str,
    group_col: str,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling counts with bounded state.

    The watermark bounds how long window state is retained: rows later
    than ``watermark`` behind the max seen event time are dropped —
    at 100 TB/day this is what keeps the state store finite.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), group_col)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col,
            "n",
        )
    )


def session_counts(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    *,
    gap: str = "30 minutes",
) -> DataFrame:
    """Event-time session windows per key (Structured Streaming's
    merging-session state): a session absorbs every event whose time
    is within ``gap`` of the session's current end (boundary-equal
    events merge), and the window end is last-event-time + gap.

    Emits ``(key, session_start, session_end, n_events)``. Complete/
    update output modes see sessions as they grow; append emits a
    session only once the watermark passes its end (set one upstream
    with ``withWatermark`` for bounded state on a perpetual stream —
    a bounded replay can run complete-mode without one, which is how
    the oracle checks it against the batch lag/cumsum sessionization
    (q31's relational form)).

    Scale: state is per (key, open session) and merges are local to
    the key's partition — the same shuffle key as any keyed agg.
    """
    return (
        stream.groupBy(
            F.session_window(F.col(ts_col), gap).alias("_w"), F.col(key_col)
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("_w.start").alias("session_start"),
            F.col("_w.end").alias("session_end"),
            "n_events",
        )
    )
