"""RFM segmentation — the classic recency/frequency/monetary
customer (or domain, or crawl-source) segmentation: each entity gets a
1..k quantile code per dimension and the output is the segment-level
rollup a curation dashboard shows ("which R5-F5-M5 sources feed the
corpus?").

Quantile codes use the rank formula ``1 + ((rank − 1) · k) / n`` over
the total order (metric, key) — deterministic, SQL-expressible, and
crucially computed WITHOUT a single-partition window: each dimension's
global rank is the two-phase prefix sum of
:func:`cccatalog_spark.operators.cumsum.global_running_sum` (range
partition + local window + offset broadcast), so the plan scales to
billions of entities where ``ntile()`` would sort on one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cccatalog_spark.operators.cumsum import global_running_sum
from cccatalog_spark.operators.dedup import _truncate_lineage


def quantile_code(
    df: DataFrame,
    metric_col: str,
    key_col: str,
    k: int,
    out_col: str,
) -> DataFrame:
    """Adds ``out_col`` = 1..k quantile bucket of ``metric_col`` in
    ascending order (ties broken by ``key_col``), via a distributed
    global rank — no single-partition exchange."""
    ranked = global_running_sum(
        df.withColumn("_one", F.lit(1)),
        [F.col(metric_col).asc(), F.col(key_col).asc()],
        "_one",
        out_col="_rank",
    )
    total = ranked.agg(F.max("_rank").alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(
            out_col,
            F.expr(
                f"1 + (CAST(_rank AS BIGINT) - 1) * {int(k)}"
                " div CAST(_n AS BIGINT)"
            ),
        )
        .drop("_one", "_rank", "_n")
    )


def rfm_segments(
    entities: DataFrame,
    key_col: str,
    recency_col: str,
    frequency_col: str,
    monetary_col: str,
    k: int = 5,
) -> DataFrame:
    """Input: one row per entity with the three metrics. Output: the
    segment rollup ``(rq, fq, mq, entities, avg_monetary)`` sorted by
    code. Three rank passes (one range shuffle each) + one tiny
    groupBy — every stage scales linearly."""
    # each rank pass re-reads its input several times (local window +
    # totals + offsets join) — truncate lineage between passes so the
    # three passes chain without plan/recompute blow-up
    d = _truncate_lineage(
        quantile_code(entities, recency_col, key_col, k, "rq")
    )
    d = _truncate_lineage(
        quantile_code(d, frequency_col, key_col, k, "fq")
    )
    d = quantile_code(d, monetary_col, key_col, k, "mq")
    return (
        d.groupBy("rq", "fq", "mq")
        .agg(
            F.count("*").cast("long").alias("entities"),
            F.round(F.avg(monetary_col), 6).alias("avg_monetary"),
        )
        .orderBy("rq", "fq", "mq")
    )
