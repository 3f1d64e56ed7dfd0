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
