

def test_lsh_parameter_plan_scurve(spark):
    import pytest as _pytest

    from cccatalog_spark.operators.planner import lsh_parameter_plan

    out = {
        (r["b"], r["r"]): r
        for r in lsh_parameter_plan(
            spark, num_hashes=16, threshold=0.5
        ).collect()
    }
    assert set(out) == {(1, 16), (2, 8), (4, 4), (8, 2), (16, 1)}
    # extremes are bad: b=16/r=1 fires on everything (huge FP area),
    # b=1/r=16 fires on almost nothing (huge FN area)
    assert out[(16, 1)]["fp_area"] > out[(4, 4)]["fp_area"]
    assert out[(1, 16)]["fn_area"] > out[(4, 4)]["fn_area"]
    best = min(out.values(), key=lambda r: r["rank"])
    # the balanced factorization wins for threshold 0.5 at 16 hashes
    assert (best["b"], best["r"]) == (4, 4)
    assert best["rank"] == 1
    with _pytest.raises(ValueError):
        lsh_parameter_plan(spark, num_hashes=1)
    with _pytest.raises(ValueError):
        lsh_parameter_plan(spark, threshold=1.0)
