"""hashing_collision_audit (operators/features.py) and
timing_regularity (operators/temporal.py)."""

from __future__ import annotations

from cccatalog_spark.operators.features import hashing_collision_audit
from cccatalog_spark.operators.temporal import timing_regularity


def test_hashing_collisions_shrink_with_dims(spark):
    docs = spark.createDataFrame(
        [(" ".join(f"w{i}" for i in range(200)),)], "text string"
    )
    out = {r["dims"]: r for r in
           hashing_collision_audit(docs, "text", [16, 4096]).collect()}
    small, big = out[16], out[4096]
    assert small["vocab"] == 200 and big["vocab"] == 200
    assert small["buckets_used"] <= 16
    assert small["collision_rate"] > big["collision_rate"]
    assert big["collision_rate"] < 0.05
    assert small["max_bucket"] >= 200 / 16 * 0.5


def test_hashing_audit_mass_weighting(spark):
    # one dominant term: its bucket carries most of the mass
    docs = spark.createDataFrame(
        [("the " * 100 + "rare1 rare2 rare3",)], "text string"
    )
    out = hashing_collision_audit(docs, "text", [8]).collect()[0]
    assert out["mass_top_bucket"] >= 100 / 103 * 0.9 or out["max_bucket"] >= 1


def test_timing_regularity_flags_metronome(spark):
    rows = [("bot", float(t * 10)) for t in range(20)] + [
        ("human", float(v))
        for v in [0, 1, 9, 11, 40, 41, 42, 90, 300, 301]
    ]
    df = spark.createDataFrame(rows, "key string, t double")
    out = {r["key"]: r for r in
           timing_regularity(df, "key", "t").collect()}
    assert out["bot"]["is_regular"] and out["bot"]["cv"] == 0.0
    assert out["bot"]["mean_gap"] == 10.0
    assert not out["human"]["is_regular"]
    assert out["human"]["cv"] > 0.5


def test_timing_regularity_min_events_gate(spark):
    rows = [("few", 0.0), ("few", 5.0), ("few", 10.0)]
    df = spark.createDataFrame(rows, "key string, t double")
    assert timing_regularity(df, "key", "t", min_events=5).count() == 0
    assert timing_regularity(df, "key", "t", min_events=3).count() == 1
