"""mad_outliers (operators/stats.py), lexical_profile
(operators/corpus_stats.py), heavy_hitters_topk summary logic
(streaming/stateful.py — state transition exercised directly; the
end-to-end stream runs under q317's oracle)."""

from __future__ import annotations

from cccatalog_spark.operators.corpus_stats import lexical_profile
from cccatalog_spark.operators.stats import mad_outliers


def test_mad_outliers_flags_only_the_spike(spark):
    rows = [("g", float(v)) for v in [10, 11, 12, 10, 11, 12, 9, 13, 500]]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = mad_outliers(df, "grp", "v", threshold=3.5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["value"] == 500.0 and r["med"] == 11.0 and r["mad"] == 1.0
    assert abs(r["mod_z"] - 0.6745 * (500 - 11) / 1.0) < 1e-4


def test_mad_outliers_zero_mad_group_silent(spark):
    # >half the mass on one value -> MAD 0 -> no rows even with a spike
    rows = [("g", 5.0)] * 6 + [("g", 99.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    assert mad_outliers(df, "grp", "v").count() == 0


def test_mad_outliers_two_sided(spark):
    rows = [("g", float(v)) for v in [100, 101, 99, 100, 102, 98, -300, 477]]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = {r["value"]: r["mod_z"] for r in mad_outliers(df, "grp", "v").collect()}
    assert -300.0 in out and out[-300.0] < 0
    assert 477.0 in out and out[477.0] > 0


def test_lexical_profile_hand_computed(spark):
    docs = spark.createDataFrame(
        [("a", "the cat the dog"), ("a", "the bird"), ("b", "x")],
        "grp string, text string",
    )
    out = {r["group"]: r for r in lexical_profile(docs, "text", "grp").collect()}
    a = out["a"]
    assert a["n_docs"] == 2 and a["n_tokens"] == 6 and a["n_types"] == 4
    assert abs(a["ttr"] - 4 / 6) < 1e-6
    # hapax: cat, dog, bird (the occurs 3x) -> 3/4
    assert abs(a["hapax_share"] - 0.75) < 1e-6
    assert abs(a["avg_token_len"] - (3 * 3 + 3 + 3 + 4) / 6) < 1e-6
    assert out["b"]["n_types"] == 1


def test_lexical_profile_empty_docs_group(spark):
    docs = spark.createDataFrame(
        [("a", "  "), ("a", "")], "grp string, text string"
    )
    out = lexical_profile(docs, "text", "grp").collect()[0]
    assert out["n_docs"] == 2 and out["n_tokens"] == 0
    assert out["ttr"] is None


def _run_summary(batches, capacity):
    # replicate the per-shard SpaceSaving transition for direct tests
    summ = {}
    for batch in batches:
        counts = {}
        for k in batch:
            counts[k] = counts.get(k, 0) + 1
        for k in sorted(counts):
            c = counts[k]
            if k in summ:
                summ[k][0] += c
            elif len(summ) < capacity:
                summ[k] = [c, 0]
            else:
                victim = min(summ, key=lambda x: (summ[x][0], x))
                vcount = summ[victim][0]
                del summ[victim]
                summ[k] = [vcount + c, vcount]
    return summ


def test_spacesaving_exact_when_capacity_suffices():
    summ = _run_summary([["a", "a", "b"], ["b", "c", "a"]], capacity=8)
    assert summ == {"a": [3, 0], "b": [2, 0], "c": [1, 0]}


def test_spacesaving_eviction_bound():
    # capacity 2: 'c' evicts the min and inherits its count as err
    summ = _run_summary([["a", "a", "b"], ["c"]], capacity=2)
    assert "a" in summ and "c" in summ and "b" not in summ
    est, err = summ["c"]
    # SpaceSaving bound: true <= est <= true + err
    assert err == 1 and est == 2 and 1 <= est


def test_spacesaving_sorted_processing_determinism():
    # the docstring's determinism contract: per-batch keys collapse
    # to counts and apply in sorted order, so permuting arrival order
    # within a batch cannot change the summary
    batches = [["b", "a", "a"], ["c"]]
    summ = _run_summary(batches, capacity=2)
    assert summ == {"a": [2, 0], "c": [2, 1]}
    summ2 = _run_summary([["a", "b", "a"], ["c"]], capacity=2)
    assert summ2 == summ
