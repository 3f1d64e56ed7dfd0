"""hyperball_harmonic (operators/graph.py) and concentration_report
(operators/corpus_stats.py)."""

from __future__ import annotations

import math

from cccatalog_spark.operators.corpus_stats import concentration_report
from cccatalog_spark.operators.graph import (
    harmonic_centrality,
    hyperball_harmonic,
)


def test_hyperball_tracks_exact_on_small_graph(spark):
    # star: hub h + 6 leaves. Exact truncated harmonic at h=2:
    # hub = 6; leaf = 1 + 5*(1/2) = 3.5. At tiny cardinalities the
    # HLL linear-counting branch is near-exact, so the sketch ranking
    # must match the exact one.
    edges = spark.createDataFrame(
        [("h", f"l{i}") for i in range(6)], "src string, dst string"
    )
    hb = {r["node"]: r for r in hyperball_harmonic(edges, max_hops=2).collect()}
    ex = {r["node"]: r for r in harmonic_centrality(edges, max_hops=2).collect()}
    assert set(hb) == set(ex)
    top_hb = max(hb.values(), key=lambda r: r["harmonic_hll"])["node"]
    assert top_hb == "h"
    # sketch estimate of the hub's 2-ball ~ 7 nodes (itself + 6)
    assert abs(hb["h"]["ball_est"] - 7.0) < 1.0
    # leaves all get the same sketch value by symmetry of ball SIZES
    leaf_vals = {hb[f"l{i}"]["ball_est"] for i in range(6)}
    assert all(abs(v - 7.0) < 1.0 for v in leaf_vals)


def test_hyperball_monotone_nonnegative(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    out = hyperball_harmonic(edges, max_hops=3).collect()
    assert all(r["harmonic_hll"] >= 0.0 for r in out)
    # middle of the path dominates the ends
    d = {r["node"]: r["harmonic_hll"] for r in out}
    assert d["c"] >= d["a"] and d["c"] >= d["e"]


def test_concentration_uniform_mix(spark):
    rows = [(f"s{i % 4}",) for i in range(40)]
    df = spark.createDataFrame(rows, "source string")
    out = concentration_report(df, "source").collect()[0]
    assert out["n_rows"] == 40 and out["n_groups"] == 4
    assert out["top1_share"] == 0.25
    assert out["hhi"] == 0.25
    assert abs(out["entropy"] - math.log(4)) < 1e-6
    assert abs(out["effective_groups"] - 4.0) < 1e-5
    assert out["gini"] == 0.0


def test_concentration_single_source_degenerate(spark):
    df = spark.createDataFrame([("only",)] * 7, "source string")
    out = concentration_report(df, "source").collect()[0]
    assert out["top1_share"] == 1.0 and out["hhi"] == 1.0
    assert out["entropy"] == 0.0 and out["effective_groups"] == 1.0
    assert out["gini"] == 0.0


def test_concentration_skewed_gini(spark):
    # sizes 1, 1, 8 sorted asc -> gini = (2*(1*1+2*1+3*8) - 4*10)/(3*10)
    rows = [("a",), ("b",)] + [("c",)] * 8
    df = spark.createDataFrame(rows, "source string")
    out = concentration_report(df, "source").collect()[0]
    assert abs(out["gini"] - (2 * 27 - 40) / 30) < 1e-6
    assert out["top1_share"] == 0.8
    # nulls count as a category
    rows2 = rows + [(None,)] * 2
    df2 = spark.createDataFrame(rows2, "source string")
    out2 = concentration_report(df2, "source").collect()[0]
    assert out2["n_groups"] == 4 and out2["n_rows"] == 12
