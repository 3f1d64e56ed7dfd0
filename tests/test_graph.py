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


def test_triangle_counts_known_graph(spark):
    """K4 plus a pendant: every K4 node sits in 3 triangles; the
    pendant has none and clustering 0."""
    from cccatalog_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(k4 + [(3, 9)], ["u", "v"])
    out = {r.node: (r.degree, r.triangles, r.clustering)
           for r in triangle_counts(edges).collect()}
    for n in range(3):
        assert out[n] == (3, 3, 1.0)
    assert out[3] == (4, 3, 0.5)     # 3 of C(4,2)=6 wedges closed
    assert out[9] == (1, 0, 0.0)


def test_triangle_counts_matches_networkx_free_model(spark):
    """Random graph vs a pure-Python triangle counter."""
    import itertools
    import random
    from cccatalog_spark.operators.graph import triangle_counts

    rng = random.Random(11)
    nodes = list(range(30))
    edges = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(120)})
    adj = {n: set() for n in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    want = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for x in (a, b, c):
                want[x] += 1
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {r.node: r.triangles for r in triangle_counts(df).collect()}
    for n in nodes:
        if adj[n]:
            assert got[n] == want[n], n


def test_k_core_keeps_clique_drops_pendants(spark):
    from cccatalog_spark.operators.graph import k_core

    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    chain = [(3, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(k4 + chain, "u long, v long")
    rows = {r["node"]: r["degree"] for r in k_core(edges, 3).collect()}
    assert rows == {0: 3, 1: 3, 2: 3, 3: 3}


def test_k_core_cascading_peel_empties_path(spark):
    from cccatalog_spark.operators.graph import k_core

    # path graph: peeling an endpoint exposes the next — the loop
    # must cascade across rounds until nothing is left at k=2
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "u long, v long"
    )
    assert k_core(edges, 2).count() == 0


def test_k_core_cycle_is_its_own_2core(spark):
    from cccatalog_spark.operators.graph import k_core

    n = 5
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "u long, v long"
    )
    rows = {r["node"]: r["degree"] for r in k_core(edges, 2).collect()}
    assert rows == {i: 2 for i in range(n)}
