"""Rolling HLL union (functions/sketches.hll_rolling_estimate):
merged daily register states must equal the estimate computed from
the unioned raw rows, and the RANGE frame must respect calendar gaps."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hll_rolling_equals_union_of_daily_states(spark):
    from cccatalog_spark.functions.sketches import (
        hll_distinct,
        hll_rolling_estimate,
    )

    rows = []
    for day, users in [(0, range(0, 40)), (1, range(20, 70)),
                       (3, range(60, 90))]:
        rows += [(day, u) for u in users]
    df = spark.createDataFrame(rows, "day long, user_id long")
    rolled = {
        r["day"]: r["hll_distinct"]
        for r in hll_rolling_estimate(
            df, "day", "user_id", window_days=2
        ).collect()
    }
    # window 2 at day d = union of days {d-1, d}: the rolling merge
    # must give EXACTLY the estimate of the unioned raw rows
    for d, days in [(0, [0]), (1, [0, 1]), (3, [3])]:
        sub = df.where(F.col("day").isin(days)).withColumn(
            "g", F.lit(1)
        )
        exact_state = hll_distinct(sub, ["g"], "user_id").collect()[0][
            "hll_distinct"
        ]
        assert rolled[d] == exact_state, (d, rolled[d], exact_state)
    # day 3 is 2 calendar days after day 1: the RANGE frame must NOT
    # include day 1 despite being the previous row
    assert set(rolled) == {0, 1, 3}


def test_dedup_impact_histogram(spark):
    from cccatalog_spark.operators.dedup import dedup_impact

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 4), (5, 5), (6, 5), (7, 5)],
        "doc_id long, cluster_id long",
    )
    got = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"])
        for r in dedup_impact(clusters).collect()
    }
    assert got == {1: (2, 2), 2: (1, 2), 3: (1, 3)}
