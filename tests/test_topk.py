"""Skew-safe grouped top-k: two-phase salted plan agrees exactly with
the single-window form under a total order."""

from __future__ import annotations

from pyspark.sql import functions as F

from cccatalog_spark.operators.topk import grouped_topk


def _df(spark):
    rows = []
    # hot key 'a' with 500 rows, cold keys with a handful
    rows += [("a", i, (i * 37) % 101) for i in range(500)]
    rows += [("b", i, i) for i in range(7)]
    rows += [("c", 0, 5)]
    return spark.createDataFrame(rows, "k string, rid long, score long")


def test_salted_equals_single_phase(spark):
    df = _df(spark)
    order = [F.desc("score"), F.asc("rid")]  # total order (rid tiebreak)
    plain = sorted(
        tuple(r) for r in grouped_topk(df, ["k"], order, 5).collect()
    )
    salted = sorted(
        tuple(r)
        for r in grouped_topk(
            df, ["k"], order, 5, salt_col=F.col("rid"), salt_buckets=16
        ).collect()
    )
    assert plain == salted
    assert len([t for t in plain if t[0] == "a"]) == 5
    assert len([t for t in plain if t[0] == "c"]) == 1  # groups < k kept whole


def test_keeps_all_when_group_smaller_than_k(spark):
    df = _df(spark).where("k = 'b'")
    out = grouped_topk(
        df, ["k"], [F.desc("score"), F.asc("rid")], 100,
        salt_col=F.col("rid"), salt_buckets=4,
    ).collect()
    assert len(out) == 7
