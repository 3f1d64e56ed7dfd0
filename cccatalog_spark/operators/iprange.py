"""Bucketed IP/numeric range join — map point values (IP addresses,
offsets, prices) onto interval catalogs (CIDR blocks, byte ranges,
bands) WITHOUT the BroadcastNestedLoopJoin a naive
``start <= ip AND ip <= end`` join plans.

The classic fix: pick a bucket width 2^shift, explode every interval
into the buckets it covers (``sequence(start >> shift, end >> shift)``
— cheap because real CIDR blocks span few buckets at a sane shift),
bucket each point by ``value >> shift``, equi-join on the bucket, and
re-check the exact range as a post-filter. The join is then an
ordinary hash/sort-merge equi-join that shuffles by bucket and scales
to any number of executors; the per-row fan-out is
``(end-start)/2^shift + 1``, bounded by construction.

Correctness: a point's bucket is covered by every interval containing
the point, so the equi-join superset never misses; the exact filter
removes same-bucket non-containments. One match row per (point,
interval) — the point's single bucket meets each interval once.

Used at 100 TB for geo-IP enrichment of crawl logs, byte-range →
shard ownership, and value-band classification. Choose ``shift`` so
typical intervals explode to a handful of buckets (for /16-ish CIDR
blocks, shift=12..16).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    point_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    shift: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point <= end`` (closed bounds) via bucket explode +
    equi-join + exact refilter. ``how='left'`` keeps unmatched points
    with null interval columns."""
    # arithmetic right shift = exact floor division by 2^shift: no
    # double-precision loss past 2^53, and correct (floor, not
    # truncate-toward-zero) bucketing for negative domains
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.shiftright(F.col(start_col).cast("long"), shift),
                F.shiftright(F.col(end_col).cast("long"), shift),
            )
        ),
    )
    pt = points.withColumn(
        "_bkt", F.shiftright(F.col(point_col).cast("long"), shift)
    )
    cond = (
        (pt["_bkt"] == iv["_bkt"])
        & (pt[point_col] >= iv[start_col])
        & (pt[point_col] <= iv[end_col])
    )
    joined = pt.join(iv, cond, how)
    return joined.drop(iv["_bkt"]).drop(pt["_bkt"])
