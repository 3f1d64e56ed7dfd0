"""link_prediction_scores (operators/graph.py), t_closeness_audit
(operators/privacy.py), ngram_novelty (operators/corpus_stats.py)."""

from __future__ import annotations

import math

from cccatalog_spark.operators.corpus_stats import ngram_novelty
from cccatalog_spark.operators.graph import link_prediction_scores
from cccatalog_spark.operators.privacy import t_closeness_audit


def test_link_prediction_hand_computed(spark):
    # containers: c1={a,b,c}, c2={a,b}, c3={a,b}, c4={d} (degree-1,
    # can never witness a pair), so (a,b) share 3 containers of
    # degrees 3,2,2; (a,c)/(b,c) share only c1.
    rows = [
        ("a", "c1"), ("b", "c1"), ("c", "c1"),
        ("a", "c2"), ("b", "c2"),
        ("a", "c3"), ("b", "c3"),
        ("d", "c4"),
    ]
    df = spark.createDataFrame(rows, "item string, container string")
    out = {
        (r["id_a"], r["id_b"]): r
        for r in link_prediction_scores(
            df, "item", "container", min_common=1
        ).collect()
    }
    ab = out[("a", "b")]
    assert ab["common"] == 3
    # deg(a)=deg(b)=3 containers -> union = 3+3-3
    assert abs(ab["jaccard"] - 1.0) < 1e-9
    assert abs(
        ab["adamic_adar"]
        - (1 / math.log(3) + 1 / math.log(2) + 1 / math.log(2))
    ) < 1e-9
    ac = out[("a", "c")]
    assert ac["common"] == 1
    assert abs(ac["jaccard"] - 1 / 3) < 1e-9
    assert ("c", "d") not in out and ("a", "d") not in out


def test_link_prediction_min_common_and_hub_cap(spark):
    rows = [
        ("a", "c1"), ("b", "c1"), ("c", "c1"),
        ("a", "c2"), ("b", "c2"),
    ]
    df = spark.createDataFrame(rows, "item string, container string")
    out = link_prediction_scores(df, "item", "container", min_common=2)
    assert [(r["id_a"], r["id_b"]) for r in out.collect()] == [("a", "b")]
    # capping out the degree-3 hub leaves only c2's pair
    capped = {
        (r["id_a"], r["id_b"]): r["common"]
        for r in link_prediction_scores(
            df, "item", "container", min_common=1,
            max_container_degree=2,
        ).collect()
    }
    assert capped == {("a", "b"): 1}


def test_t_closeness_hand_computed(spark):
    # g1 4x v0; g2 2x v0 + 2x v1; g3 2x v1 -> 10 rows,
    # global p = (v0: 6/10, v1: 4/10), m = 2 values
    rows = (
        [("g1", 0)] * 4 + [("g2", 0)] * 2 + [("g2", 1)] * 2
        + [("g3", 1)] * 2
    )
    df = spark.createDataFrame(rows, "grp string, v int")
    out = {
        r["grp"]: r for r in t_closeness_audit(df, ["grp"], "v").collect()
    }
    # g1: q=(1,0), cum=(0.4, 0) -> t = 0.4/(m-1)
    assert abs(out["g1"]["t"] - 0.4) < 1e-6
    # g2: q=(.5,.5), cum=(-.1, 0) -> t=.1
    assert abs(out["g2"]["t"] - 0.1) < 1e-6
    # g3: q=(0,1), cum=(-.6, 0) -> t=.6
    assert abs(out["g3"]["t"] - 0.6) < 1e-6
    assert out["g1"]["n"] == 4 and out["g3"]["n"] == 2


def test_t_closeness_single_value_guard(spark):
    df = spark.createDataFrame(
        [("g1", 7), ("g2", 7)], "grp string, v int"
    )
    out = t_closeness_audit(df, ["grp"], "v").collect()
    assert all(r["t"] == 0.0 for r in out)


def test_ngram_novelty_first_doc_owns_everything(spark):
    rows = [
        ("d1", "the quick brown fox jumps"),
        ("d2", "the quick brown fox jumps"),  # exact copy: novelty 0
        ("d3", "an entirely different sentence here"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["id"]: r for r in ngram_novelty(df, "text", "doc_id").collect()}
    assert out["d1"]["novelty"] == 1.0
    assert out["d2"]["novelty"] == 0.0
    assert out["d3"]["novelty"] == 1.0
    # 5 tokens -> 3 distinct 3-gram shingles
    assert out["d1"]["n_sh"] == 3 and out["d1"]["novel"] == 3


def test_ngram_novelty_partial_overlap(spark):
    rows = [
        ("d1", "a b c d"),            # shingles: abc, bcd
        ("d2", "a b c x"),            # shingles: abc (seen), bcx (new)
        ("d3", "x"),                  # too short: excluded
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["id"]: r for r in ngram_novelty(df, "text", "doc_id").collect()}
    assert abs(out["d2"]["novelty"] - 0.5) < 1e-6
    assert "d3" not in out
