"""PageRank (operators/graph.py) against an independent Python power
iteration on crafted graphs."""

from __future__ import annotations

from cccatalog_spark.operators.graph import pagerank


def _model(edges, iterations=5, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        msgs = {}
        for u, v in edges:
            msgs[v] = msgs.get(v, 0.0) + r[u] / out[u]
        r = {v: (1.0 - d) / n + d * msgs.get(v, 0.0) for v in nodes}
    return r


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


def test_pagerank_matches_model(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("d", "a"), ("e", "d"),
    ]
    got = {r["node"]: r["r"] for r in pagerank(_edges_df(spark, edges)).collect()}
    want = _model(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, v


def test_pagerank_sink_gets_only_base_mass(spark):
    # 'sink' has no outlinks and nobody links to 'lonely' beyond base
    edges = [("x", "sink"), ("y", "sink"), ("y", "x"), ("x", "y")]
    got = {r["node"]: r["r"] for r in pagerank(_edges_df(spark, edges)).collect()}
    want = _model(edges)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12
    # the sink absorbs from both sources: highest rank
    assert max(got, key=got.get) == "sink"


def test_pagerank_duplicate_edges_collapse(spark):
    # edge dedup: a->b listed 3 times must weigh once
    e1 = [("a", "b")] * 3 + [("b", "a")]
    e2 = [("a", "b"), ("b", "a")]
    g1 = {r["node"]: r["r"] for r in pagerank(_edges_df(spark, e1)).collect()}
    g2 = {r["node"]: r["r"] for r in pagerank(_edges_df(spark, e2)).collect()}
    assert g1 == g2
