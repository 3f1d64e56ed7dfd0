"""Mergeable partial-aggregate state (operators/rollup_state.py):
merged-from-partials must equal computed-from-raw, including the HLL
register merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from cccatalog_spark.functions.sketches import hll_distinct
from cccatalog_spark.operators.rollup_state import build_partials, merge_partials


def _raw(spark):
    rows = [
        # (day, value, user)
        (0, 10.0, 1), (0, 20.0, 2), (1, 5.0, 1), (6, 1.0, 3),
        (7, 100.0, 1), (8, 2.5, 4), (13, 7.5, 4),
    ]
    return spark.createDataFrame(rows, "day long, value double, user long")


def test_merge_equals_direct(spark):
    raw = _raw(spark)
    scalars, regs = build_partials(raw, "day", "value", "user")
    merged = {
        r["_g"]: r
        for r in merge_partials(
            scalars, regs, "day", F.expr("day div 7")
        ).collect()
    }
    direct = raw.select(F.expr("day div 7").alias("w"), "value", "user")
    dsc = {
        r["w"]: r
        for r in direct.groupBy("w")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("value"), 2).alias("sum_v"),
            F.round(F.sum("value") / F.count("*"), 4).alias("avg_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        .collect()
    }
    dhll = {
        r["w"]: r["hll_distinct"]
        for r in hll_distinct(direct, ["w"], "user").collect()
    }
    assert set(merged) == {0, 1}
    for w in merged:
        got, want = merged[w], dsc[w]
        for c in ("n_rows", "sum_v", "avg_v", "min_v", "max_v"):
            assert got[c] == want[c], (w, c)
        # register merge is lossless: identical estimate
        assert got["approx_distinct"] == dhll[w]


def test_partials_never_rescan_raw(spark):
    # the merge plan reads only the partial frames (no scan of raw);
    # partial row count is the day-grain cardinality
    raw = _raw(spark)
    scalars, regs = build_partials(raw, "day", "value", "user")
    assert scalars.count() == 6  # 6 distinct days
    merged = merge_partials(scalars, regs, "day", F.expr("day div 7"))
    assert merged.count() == 2
