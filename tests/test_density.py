"""DBSCAN (operators/density.py) and multi-source BFS
(operators/graph.multi_source_bfs)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy sweep; excluded from the fast loop (-m "not slow")

from cccatalog_spark.operators.density import dbscan_2d
from cccatalog_spark.operators.graph import multi_source_bfs


def test_dbscan_two_blobs_and_noise(spark):
    # two tight blobs ~0.01 deg apart internally (~1.1 km), blobs
    # separated by ~0.5 deg (~55 km), plus one isolated point
    pts = []
    for i, (blat, blon) in enumerate([(45.0, 8.0), (45.5, 8.0)]):
        for j in range(4):
            pts.append((i * 10 + j, blat + j * 0.01, blon))
    pts.append((99, 47.0, 9.0))  # noise
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    out = {
        r["id"]: r
        for r in dbscan_2d(df, "id", "lat", "lon", 5.0, 3).collect()
    }
    # both blobs fully core, two distinct clusters labeled by min id
    assert all(out[i]["is_core"] for i in (0, 1, 2, 3, 10, 11, 12, 13))
    assert {out[i]["cluster"] for i in (0, 1, 2, 3)} == {0}
    assert {out[i]["cluster"] for i in (10, 11, 12, 13)} == {10}
    # the isolated point is noise
    assert not out[99]["is_core"] and out[99]["cluster"] is None
    assert out[99]["n_nbrs"] == 0


def test_dbscan_border_attaches_to_core_cluster(spark):
    # chain: 3 mutually-close cores + one point near only ONE core
    pts = [
        (1, 45.0, 8.0), (2, 45.005, 8.0), (3, 45.01, 8.0),
        (4, 45.035, 8.0),   # ~2.8 km from id 3 only -> border
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    out = {
        r["id"]: r
        for r in dbscan_2d(df, "id", "lat", "lon", 3.0, 3).collect()
    }
    assert out[1]["is_core"] and out[2]["is_core"] and out[3]["is_core"]
    assert not out[4]["is_core"]
    assert out[4]["cluster"] == 1     # attached to the min-id cluster
    assert out[4]["n_nbrs"] == 1


def test_multi_source_bfs_layers(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "src string, dst string",
    )
    out = {
        r["node"]: r["dist"]
        for r in multi_source_bfs(edges, ["a", "x"], max_hops=2).collect()
    }
    assert out == {"a": 0, "x": 0, "b": 1, "y": 1, "c": 2}
    # d is 3 hops away -> absent at max_hops=2


def test_multi_source_bfs_undirected_and_min(spark):
    edges = spark.createDataFrame(
        [("hub", "a"), ("b", "hub")], "src string, dst string"
    )
    out = {
        r["node"]: r["dist"]
        for r in multi_source_bfs(edges, ["a"], max_hops=3).collect()
    }
    # edges traverse both directions; hub reached at 1, b at 2
    assert out == {"a": 0, "hub": 1, "b": 2}


def test_multi_source_bfs_frontier_only_bound(spark):
    # Line graph a-b-c-d-e seeded at 'a': the frontier each round is
    # EXACTLY one node, and the probe pins that round r joins only
    # |frontier_r| rows against the edge list — not the accumulated
    # reached set (the canonical BFS work bound the verdict asked to
    # pin). An accumulated-dist join would show 1, 2, 3, 4 here.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    probe: list[int] = []
    out = {
        r["node"]: r["dist"]
        for r in multi_source_bfs(
            edges, ["a"], max_hops=4, _frontier_probe=probe
        ).collect()
    }
    assert out == {"a": 0, "b": 1, "c": 2, "d": 3, "e": 4}
    assert probe == [1, 1, 1, 1]


def test_multi_source_bfs_frontier_drains(spark):
    # Once every reachable node is settled the frontier is empty and
    # later rounds join zero rows — extra hops cost (near) nothing.
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "src string, dst string"
    )
    probe: list[int] = []
    out = {
        r["node"]: r["dist"]
        for r in multi_source_bfs(
            edges, ["a"], max_hops=4, _frontier_probe=probe
        ).collect()
    }
    assert out == {"a": 0, "b": 1, "c": 1}
    assert probe == [1, 2, 0, 0]
