"""PageRank (operators/graph.py) against an independent Python power
iteration on crafted graphs."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy sweep; excluded from the fast loop (-m "not slow")

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


def test_label_propagation_triangle_converges_to_min(spark):
    from cccatalog_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2)], "u long, v long"
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(edges, rounds=3).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0}


def test_label_propagation_bridged_triangles_split(spark):
    from cccatalog_spark.operators.graph import label_propagation

    # two triangles joined by one bridge edge: LPA keeps them as two
    # communities (hand-traced synchronous rounds with min tie-break),
    # exactly where connected components would merge everything
    tri_a = [(0, 1), (1, 2), (0, 2)]
    tri_b = [(10, 11), (11, 12), (10, 12)]
    edges = spark.createDataFrame(
        tri_a + tri_b + [(2, 10)], "u long, v long"
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(edges, rounds=4).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 10: 2, 11: 2, 12: 2}


def test_k_truss_keeps_k4_drops_attached_triangle(spark):
    from cccatalog_spark.operators.graph import k_truss

    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    pendant_tri = [(3, 10), (10, 11), (3, 11)]
    edges = spark.createDataFrame(k4 + pendant_tri, "u long, v long")
    got = {(r["u"], r["v"]): r["support"] for r in k_truss(edges, 4).collect()}
    # every K4 edge sits in exactly 2 triangles; the attached triangle's
    # edges sit in 1 and are peeled in round one
    assert got == {(u, v): 2 for (u, v) in k4}


def test_k_truss_cascading_peel_empties_bowtie(spark):
    from cccatalog_spark.operators.graph import k_truss

    # two triangles sharing edge (1,2): that edge has support 2 but
    # survives round one alone, then loses both triangles — the loop
    # must cascade to empty at k=4
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)], "u long, v long"
    )
    assert k_truss(edges, 4).count() == 0


def test_k_truss_3_is_triangle_membership(spark):
    from cccatalog_spark.operators.graph import k_truss

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 10)], "u long, v long"
    )
    got = {(r["u"], r["v"]): r["support"] for r in k_truss(edges, 3).collect()}
    assert got == {(0, 1): 1, (1, 2): 1, (0, 2): 1}


def test_personalized_pagerank_mass_decays_from_seed(spark):
    from cccatalog_spark.operators.graph import personalized_pagerank

    # A→B plus a disconnected C→D; seed {A}. Hand-traced 2 iterations:
    # r(A) = 0.15 every round (only teleport mass), r(B) = 0.85·r(A),
    # and the C/D component never receives any mass
    edges = spark.createDataFrame(
        [("A", "B"), ("C", "D")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("A",)], "node string")
    got = {
        r["node"]: r["r"]
        for r in personalized_pagerank(edges, seeds, iterations=2).collect()
    }
    assert abs(got["A"] - 0.15) < 1e-12
    assert abs(got["B"] - 0.85 * 0.15) < 1e-12
    assert got["C"] == 0.0 and got["D"] == 0.0


def test_personalized_pagerank_all_seeds_equals_pagerank(spark):
    from cccatalog_spark.operators.graph import pagerank, personalized_pagerank

    edges = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("C", "A"), ("A", "C")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame(
        [("A",), ("B",), ("C",)], "node string"
    )
    pr = {r["node"]: r["r"] for r in pagerank(edges, iterations=4).collect()}
    ppr = {
        r["node"]: r["r"]
        for r in personalized_pagerank(edges, seeds, iterations=4).collect()
    }
    for n in pr:
        assert abs(pr[n] - ppr[n]) < 1e-12, n


def test_label_propagation_string_ids_min_label_tiebreak(spark):
    from cccatalog_spark.operators.graph import label_propagation

    # string node ids exercise the type-agnostic tie-break (the old
    # arithmetic -label negation threw CAST_INVALID_INPUT under ANSI)
    edges = spark.createDataFrame(
        [("b", "c"), ("c", "a"), ("b", "a")], "u string, v string"
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(edges, rounds=3).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_k_truss_exhausted_fallback_support_within_truss(spark):
    from cccatalog_spark.operators.graph import k_truss

    # K4 {1,2,3,4} + triangle (1,2,5) hanging off edge (1,2). k=4:
    # round 1 prunes (1,5),(2,5). With max_rounds=1 the loop exits
    # un-converged; the fallback must recompute support on the FINAL
    # edge set — edge (1,2) has support 2 within K4, not the pre-prune
    # 3 (which counted triangle 125 through removed edges).
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    edges = spark.createDataFrame(
        k4 + [(1, 5), (2, 5)], "u long, v long"
    )
    got = {
        (r["u"], r["v"]): r["support"]
        for r in k_truss(edges, 4, max_rounds=1).collect()
    }
    assert got == {(u, v): 2 for u, v in k4}


def test_random_walks_follow_md5_choices(spark):
    import hashlib

    from cccatalog_spark.operators.graph import random_walks

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (3, 0)],
        "src long, dst long",
    )
    adj = {0: [1, 2], 1: [2], 2: [0, 3], 3: [0]}

    def model(start, walk_len=4):
        cur, path = start, [start]
        for t in range(1, walk_len):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            h = hashlib.md5(
                f"walk:{start}:{t}:{cur}".encode()
            ).hexdigest()[:8]
            cur = nbrs[int(h, 16) % len(nbrs)]
            path.append(cur)
        return "->".join(map(str, path))

    got = {
        r["start"]: (r["path"], r["n_steps"])
        for r in random_walks(edges, walk_len=4).collect()
    }
    for s in range(4):
        exp = model(s)
        assert got[s] == (exp, exp.count("->") + 1)


def test_random_walks_stop_at_sinks(spark):
    from cccatalog_spark.operators.graph import random_walks

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {
        r["start"]: r["n_steps"]
        for r in random_walks(edges, walk_len=5).collect()
    }
    # 3 is a sink: walk of 1; 2 reaches 3 then stops; 1 walks 1->2->3
    assert got == {1: 3, 2: 2, 3: 1}


def test_random_walks_deterministic_under_repartition(spark):
    from cccatalog_spark.operators.graph import random_walks

    rows = [(i, (i * 7 + 3) % 20) for i in range(40)]
    e1 = spark.createDataFrame(rows, "src long, dst long")
    e2 = e1.repartition(13)
    a = sorted(map(tuple, random_walks(e1, walk_len=3).collect()))
    b = sorted(map(tuple, random_walks(e2, walk_len=3).collect()))
    assert a == b


def test_deepwalk_pairs_hand_counted(spark):
    from cccatalog_spark.operators.graph import deepwalk_pairs

    # a line graph a->b->c: walks are a->b->c (from a), b->c (from b),
    # c (from c) at walk_len=3; window=1 pairs are adjacent positions
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    got = {
        (r["center"], r["context"]): r["n_pairs"]
        for r in deepwalk_pairs(edges, walk_len=3, window=1).collect()
    }
    # walk a: (a,b),(b,a),(b,c),(c,b); walk b: (b,c),(c,b); walk c: none
    assert got == {
        ("a", "b"): 1,
        ("b", "a"): 1,
        ("b", "c"): 2,
        ("c", "b"): 2,
    }


def test_deepwalk_window_width(spark):
    from cccatalog_spark.operators.graph import deepwalk_pairs

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    got = {
        (r["center"], r["context"]): r["n_pairs"]
        for r in deepwalk_pairs(edges, walk_len=4, window=3).collect()
    }
    # the full walk from 'a' is a->b->c->d: distance-3 pair present
    assert got[("a", "d")] == 1 and got[("d", "a")] == 1


def test_graph_report_hand_computed(spark):
    from cccatalog_spark.operators.graph import graph_report

    # directed: a->b, b->a (reciprocal pair), a->c
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c")], "src string, dst string"
    )
    got = graph_report(edges).collect()[0]
    assert got["n_nodes"] == 3
    assert got["n_edges_directed"] == 3
    assert got["n_edges_undirected"] == 2
    assert got["density"] == 0.5          # 3 / (3*2)
    assert got["reciprocity"] == round(2 / 3, 6)
    # star a-(b,c): deg a=2, b=c=1; ends (2,1),(2,1) symmetrized:
    # mean=1.5, var=0.25, sjk/m=2 -> r = (2-2.25)/0.25 = -1
    assert got["assortativity"] == -1.0


def test_graph_report_degenerate_variance_null(spark):
    from cccatalog_spark.operators.graph import graph_report

    # a single edge: both endpoint degrees 1, zero variance -> null
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = graph_report(edges).collect()[0]
    assert got["assortativity"] is None
    assert got["reciprocity"] == 0.0
