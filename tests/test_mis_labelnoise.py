"""maximal_independent_set (operators/graph.py) and the q338
label-noise composition."""

from __future__ import annotations

from cccatalog_spark.operators.graph import maximal_independent_set


def _assert_mis(edges_rows, mis_nodes, all_nodes):
    adj = set()
    for a, b in edges_rows:
        adj.add((a, b))
        adj.add((b, a))
    m = set(mis_nodes)
    # independence
    for a in m:
        for b in m:
            assert a == b or (a, b) not in adj
    # maximality: every non-member has a member neighbor
    for v in all_nodes - m:
        assert any((v, u) in adj for u in m), f"{v} could join"


def test_mis_path_graph(spark):
    rows = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    df = spark.createDataFrame(rows, "src string, dst string")
    out = maximal_independent_set(df, max_rounds=8).collect()
    nodes = {r["node"] for r in out}
    _assert_mis(rows, nodes, {"a", "b", "c", "d", "e"})
    assert 2 <= len(nodes) <= 3  # path of 5 has MIS size 2 or 3


def test_mis_star_graph(spark):
    rows = [("hub", f"l{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "src string, dst string")
    out = {r["node"] for r in maximal_independent_set(df, max_rounds=8).collect()}
    # either the hub alone, or all leaves
    assert out == {"hub"} or out == {f"l{i}" for i in range(6)}
    _assert_mis(rows, out, {"hub"} | {f"l{i}" for i in range(6)})


def test_mis_deterministic_across_runs(spark):
    rows = [(f"n{i}", f"n{(i * 3 + 1) % 20}") for i in range(20)]
    rows = [(a, b) for a, b in rows if a != b]
    df = spark.createDataFrame(rows, "src string, dst string")
    a = sorted((r["node"], r["round"]) for r in
               maximal_independent_set(df).collect())
    b = sorted((r["node"], r["round"]) for r in
               maximal_independent_set(df.repartition(7)).collect())
    assert a == b and len(a) > 0
    _assert_mis(rows, {n for n, _ in a}, {x for e in rows for x in e})


def test_mis_triangle_single_member(spark):
    rows = [("a", "b"), ("b", "c"), ("c", "a")]
    df = spark.createDataFrame(rows, "src string, dst string")
    out = {r["node"] for r in maximal_independent_set(df).collect()}
    assert len(out) == 1
