"""Iterative link analysis: PageRank over an edge frame — the
web-graph curation primitive (rank domains/hosts by link authority
before sampling a crawl corpus; the Common Crawl companion step to the
link extraction in operators/cc_links.py).

Simplified PageRank (no dangling-mass redistribution — sinks leak
mass, the common formulation for ranking *relative* authority):

    r_{t+1}(v) = (1-d)/N + d * Σ_{u→v} r_t(u) / outdeg(u)

Scale shape per iteration: ONE shuffle keyed by dst for the
contribution aggregation (map-side combine) plus the rank-frame join
keyed by src; ranks and edges are persisted frame-to-frame with
lineage truncated per round (same discipline as
operators/dedup.connected_components). The iteration count is fixed
(power iteration converges geometrically at rate d), so plans stay
bounded — no driver-side graph state, no per-node loops. At 100 TB
the edge frame would be bucketed by src so the per-iteration join
reuses the bucket distribution.

The driver-side scalars are the node count N (one bounded count) and
nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cccatalog_spark.operators.dedup import _truncate_lineage

# Iterative operators join a node-sized iterate (a checkpoint leaf —
# size stats UNKNOWN to the planner) against the persisted edge frame
# (size stats KNOWN and locally small).  Left alone, the planner
# broadcasts the EDGE side every round — locally wasteful (|E| ≥ |V|
# rows collected to the driver per round) and exactly backwards, since
# the iterate has one row per node by construction.  When the node
# count (already a driver scalar in every iterative operator) bounds
# the iterate comfortably under the broadcast threshold, hint it;
# above the bound, leave strategy to the planner (SMJ/SHJ at scale).
_BCAST_ITERATE_MAX_NODES = 1_000_000  # ~tens of MB at ~32 B/row


def _iterate_side(x: DataFrame, n_nodes: int) -> DataFrame:
    return F.broadcast(x) if n_nodes <= _BCAST_ITERATE_MAX_NODES else x


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Rank every node of the (deduplicated) edge frame; returns
    ``(node, rank)`` at full precision — callers round for output.
    Deterministic: fixed iterations, no RNG, rational init 1/N.

    ``checkpoint_every``: rounds chain LAZILY and lineage is truncated
    only every k-th round (plus once on return, so the returned frame
    stays a materialized leaf).  The rank frame is referenced exactly
    ONCE per round, so the un-truncated plan grows linearly — unlike
    connected_components' multiply-nested rounds — and a k-round chain
    executes as one job with the same k shuffle pairs instead of k
    jobs each paying checkpoint write+read and scheduling (guide §2.4:
    two operations keyed the same way share work; §5: localCheckpoint
    is for cutting lineage, not a per-round obligation)."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # bounded catalog scalar (like CC convergence sums)
    base = (1.0 - damping) / n
    outdeg = e.groupBy("src").agg(
        F.count("*").cast("double").alias("deg")
    )
    # materialize the degree-annotated edge list once: every iteration
    # joins against it, and without the persist the e⋈outdeg join (and
    # the deg aggregation under it) re-executes per round
    contrib_src = e.join(outdeg, "src").persist()

    ranks = nodes.withColumn("r", F.lit(1.0 / n))
    # zero-contribution seed rows replace the per-round
    # nodes ⋈ msgs LEFT JOIN (a SortMergeJoin costing two exchanges +
    # two sorts per round, there only to keep zero-in-degree nodes):
    # union them into the message aggregation instead, so one
    # map-side-combinable groupBy(dst) yields every node directly
    # (guide §2.4 — remove shuffles outright; +0.0 terms are exact)
    zeros = nodes.select(F.col("node").alias("dst"), F.lit(0.0).alias("c"))
    for it in range(iterations):
        ranks = (
            contrib_src.join(ranks, F.col("src") == F.col("node"))
            .select("dst", (F.col("r") / F.col("deg")).alias("c"))
            .unionByName(zeros)
            .groupBy("dst")
            .agg(F.sum("c").alias("m"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(base) + F.lit(damping) * F.col("m")).alias("r"),
            )
        )
        # truncate periodically (and always on return, below): bounds
        # Catalyst time without a materialization job per round
        if (it + 1) % max(1, checkpoint_every) == 0 and it + 1 < iterations:
            ranks = _truncate_lineage(ranks)
    ranks = _truncate_lineage(ranks)
    contrib_src.unpersist()
    return ranks


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact per-node triangle participation counts over a canonical
    undirected edge list (``src < dst``, distinct pairs).

    Plan: the wedge join — e(a,b) ⋈ e(b,c) gives the open wedges
    a<b<c, and a semi-check against e(a,c) closes them; each triangle
    is found exactly once thanks to the canonical ordering. Two
    equi-joins, both on edge keys, then one explode + groupBy for the
    per-node rollup.

    Scale: wedge volume is Σ deg(v)² on the JOIN key's side — the
    classic skew point. The canonical a<b<c form already charges each
    wedge to its *middle* vertex; production hardening for power-law
    graphs re-orders vertices by degree first (node-iterator++ /
    Schank 2007: orient every edge low-degree → high-degree, making
    wedge volume Σ min-degree² ≈ m^1.5 worst case) — same joins,
    degree-ranked ids. AQE skew-split covers moderate hubs either way.
    """
    e1 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e2 = edges.select(F.col(src).alias("b"), F.col(dst).alias("c"))
    e3 = edges.select(F.col(src).alias("a"), F.col(dst).alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    return (
        tri.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """HITS hubs/authorities (Kleinberg 1999) over a directed edge
    frame — PageRank's companion for link curation: authorities are
    the pages worth crawling, hubs the link pages that find them.

    Power iteration with L1 normalization (sum-to-1 — chosen over the
    textbook L2 because it keeps every step closed under exact
    relational algebra; the ranking order is identical):

        a_{t+1}(v) = Σ_{u→v} h_t(u) / ‖·‖₁
        h_{t+1}(u) = Σ_{u→v} a_{t+1}(v) / ‖·‖₁

    Returns (node, hub, authority) at full precision. Fixed iteration
    count; nodes without in-edges hold authority 0, without out-edges
    hub 0. Fully collect-free: the normalization scalar is a 1-row
    frame cross-broadcast into the update, and lineage is truncated
    per round (the PageRank discipline above). Per iteration: one
    shuffle keyed by dst, one keyed by src.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )

    def normalized(frame: DataFrame, col: str) -> DataFrame:
        total = frame.agg(F.sum(col).alias("__t"))
        return frame.crossJoin(F.broadcast(total)).select(
            "node", (F.col(col) / F.col("__t")).alias(col)
        )

    n = nodes.count()  # bounded catalog scalar (sizes the iterate hint)
    hubs = nodes.withColumn("h", F.lit(1.0))
    auths = nodes.withColumn("a", F.lit(1.0))
    # zero-contribution rows replace the per-half-round
    # nodes ⋈ raw LEFT JOIN (SortMergeJoin: two exchanges + two sorts)
    # — union them into the message aggregation so one groupBy yields
    # every node, 0.0 for the no-in/out-edge ones (guide §2.4; +0.0
    # terms are exact).  Persist the pre-normalization frame: the L1
    # total and the division both read it (guide §5 reuse rule; the
    # eager truncation right after materializes the cache, so the
    # unpersist below is safe).
    zeros = nodes.select(F.col("node").alias("_z"), F.lit(0.0).alias("_c"))
    for _ in range(iterations):
        a_full = (
            e.join(_iterate_side(hubs, n), F.col("src") == F.col("node"))
            .select(F.col("dst").alias("_z"), F.col("h").alias("_c"))
            .unionByName(zeros)
            .groupBy("_z")
            .agg(F.sum("_c").alias("a"))
            .select(F.col("_z").alias("node"), "a")
            .persist()
        )
        auths = _truncate_lineage(normalized(a_full, "a"))
        a_full.unpersist()
        h_full = (
            e.join(_iterate_side(auths, n), F.col("dst") == F.col("node"))
            .select(F.col("src").alias("_z"), F.col("a").alias("_c"))
            .unionByName(zeros)
            .groupBy("_z")
            .agg(F.sum("_c").alias("h"))
            .select(F.col("_z").alias("node"), "h")
            .persist()
        )
        hubs = _truncate_lineage(normalized(h_full, "h"))
        h_full.unpersist()
    return (
        nodes.join(hubs, "node", "left")
        .join(auths, "node", "left")
        .select(
            "node",
            F.coalesce("h", F.lit(0.0)).alias("hub"),
            F.coalesce("a", F.lit(0.0)).alias("authority"),
        )
    )


def triangle_counts(
    edges: DataFrame, u_col: str = "u", v_col: str = "v"
) -> DataFrame:
    """Per-node triangle counts with degrees and local clustering
    coefficients — the compact-forward / degree-ordered-orientation
    algorithm (Latapy 2008), the standard distributed shape:

    1. canonicalize undirected edges (u < v, distinct);
    2. orient every edge from its (degree, id)-smaller endpoint — the
       resulting DAG has out-degree O(√m), so
    3. wedge generation (self-join of oriented edges on the source) is
       Σ outdeg² ≤ m^1.5 instead of Σ deg² (which a hub node would
       blow up), and
    4. each triangle is found EXACTLY once as wedge (a→b, a→c) closed
       by oriented edge b→c.

    Exchanges: one distinct, one degree groupBy, two joins keyed by
    node, the wedge self-join keyed by source, and the closing join
    keyed by the (b, c) pair — every key is data-proportional, no
    broadcast of anything unbounded. Returns (node, degree,
    triangles, clustering) for every node of degree ≥ 1.
    """
    # persist the canonical edge list: it feeds BOTH the degree build
    # and the orientation join — un-persisted, the caller's (possibly
    # expensive) edge derivation executed twice (guide §5 reuse rule)
    e = (
        edges.select(
            F.least(F.col(u_col), F.col(v_col)).alias("u"),
            F.greatest(F.col(u_col), F.col(v_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
        .persist()
    )
    ed = (
        e.join(deg.select(F.col("node").alias("u"), F.col("degree").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("degree").alias("dv")), "v")
    )
    fwd = F.struct(
        F.col("du").alias("d"), F.col("u").alias("n")
    ) < F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    oriented = ed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    ).persist()
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src"))
        & (
            F.struct(F.col("o1.ddst").alias("d"), F.col("o1.dst").alias("n"))
            < F.struct(F.col("o2.ddst").alias("d"), F.col("o2.dst").alias("n"))
        ),
    ).select(
        F.col("o1.src").alias("a"),
        F.col("o1.dst").alias("b"),
        F.col("o2.dst").alias("c"),
    )
    closer = oriented.select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    )
    tris = wedges.join(closer, ["b", "c"])
    per_node = (
        tris.select(F.col("a").alias("node"))
        .unionAll(tris.select(F.col("b").alias("node")))
        .unionAll(tris.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    2.0
                    * F.coalesce("triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                    6,
                ),
            ).otherwise(F.lit(0.0)).alias("clustering"),
        )
    )


def k_core(
    edges: DataFrame,
    k: int,
    u_col: str = "u",
    v_col: str = "v",
    max_rounds: int = 50,
) -> DataFrame:
    """k-core of the undirected graph (Seidman 1983): iteratively peel
    nodes with degree < k until a fixed point — the link-graph
    curation filter that strips pendant chains and leaves the densely
    cross-linked core (spam farms are low-core; reference hubs are
    high-core), and the standard preprocessing cut before the heavier
    PageRank/HITS/triangle passes above.

    Returns ``(node, degree)`` with degree measured WITHIN the core.
    Semantics note: peeling is monotone, so extra rounds past the
    fixed point are no-ops — an unrolled fixed-round replay (the SQL
    oracle) equals the converged loop whenever both reach the fixed
    point.

    Scale shape: per round one degree aggregate + two left-semi joins
    keyed by endpoint (the same exchanges a join-pruning filter
    costs), lineage truncated per round; convergence is a 1-row
    scalar aggregate (nodes still below k), the same bounded driver
    signal the connected-components loop uses (dedup.py:429). Rounds
    = peeling depth — single digits on power-law graphs; the
    ``max_rounds`` guard bounds pathological chains (the result is
    then peel(max_rounds), documented, not an error).
    """
    e = edges.select(
        F.col(u_col).alias("u"), F.col(v_col).alias("v")
    )
    e = _truncate_lineage(
        e.union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
    )
    for _ in range(max_rounds):
        deg = e.groupBy("u").agg(F.count("*").alias("degree"))
        below = deg.agg(
            F.sum((F.col("degree") < k).cast("long")).alias("n")
        ).first()["n"]
        if not below:
            break
        keep = deg.where(F.col("degree") >= k).select("u")
        e = _truncate_lineage(
            e.join(keep, "u", "left_semi").join(
                keep.select(F.col("u").alias("v")), "v", "left_semi"
            )
        )
    return e.groupBy("u").agg(F.count("*").alias("degree")).select(
        F.col("u").alias("node"), "degree"
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 4,
    u_col: str = "u",
    v_col: str = "v",
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over the undirected graph: every node starts in its
    own community, then each round adopts the most frequent label among
    its neighbors, ties broken to the SMALLEST label — the corpus-
    curation step that groups cross-linked page/domain clusters (and
    near-dup clusters connected through weak bridges) into communities
    for per-community sampling caps, where connected components
    (dedup.connected_components) would over-merge everything reachable.

    Fully deterministic: synchronous updates (all nodes read the
    previous round's labels), a fixed round count, and the min-label
    tie-break — so an unrolled fixed-round SQL replay is exact.
    Synchronous LPA can 2-cycle on bipartite structure instead of
    converging; the fixed ``rounds`` cut makes that a documented
    property (result = state after ``rounds`` steps), not flakiness.

    Returns ``(node, label)``.

    Scale shape per round: one labels⋈edges join keyed by endpoint,
    one (node, label) count aggregate (map-side combinable), one
    per-node argmax — all exchanges data-proportional, labels frame is
    |V| rows, rounds chained lazily with periodic lineage truncation
    like the PageRank loop above. No driver-side state at all (not
    even a convergence scalar).
    """
    e = edges.select(
        F.col(u_col).alias("u"), F.col(v_col).alias("v")
    )
    e = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .persist()
    )
    labels = e.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    # the label frame is referenced exactly ONCE per round and there
    # is no per-round action/barrier (fixed rounds, no convergence
    # probe), so rounds chain lazily with periodic truncation — the
    # pagerank discipline (NOT the eigenvector case, whose normalizer
    # forces a barrier every round)
    for it in range(rounds):
        msgs = e.join(
            labels, e["v"] == labels["node"]
        ).select("u", "label")
        counts = msgs.groupBy("u", "label").agg(F.count("*").alias("c"))
        # per-node argmax with min-label tie-break, type-agnostic:
        # rank (desc count, asc label) and keep rank 1 — works for
        # string node ids too (an arithmetic -label negation would
        # throw CAST_INVALID_INPUT under ANSI mode on strings)
        win = Window.partitionBy("u").orderBy(
            F.desc("c"), F.asc("label")
        )
        labels = (
            counts.withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") == 1)
            .select(F.col("u").alias("node"), "label")
        )
        if (it + 1) % 3 == 0 and it + 1 < rounds:
            labels = _truncate_lineage(labels)
    labels = _truncate_lineage(labels)
    e.unpersist()
    return labels


def k_truss(
    edges: DataFrame,
    k: int,
    u_col: str = "u",
    v_col: str = "v",
    max_rounds: int = 30,
) -> DataFrame:
    """k-truss of the undirected graph (Cohen 2008): iteratively drop
    edges supported by fewer than k-2 triangles until a fixed point —
    the edge-level sharpening of ``k_core``'s node peel. A spam ring
    of pairwise links without closing triangles survives a degree cut
    but not a truss cut, so this is the stricter curation filter for
    link-graph cohesion before sampling a crawl corpus.

    Returns ``(u, v, support)`` over canonical u < v edges, support
    measured WITHIN the truss. Peeling is monotone, so a fixed-round
    unrolled replay (the SQL oracle) equals the converged loop once
    both reach the fixed point.

    Scale shape per round: triangle enumeration on the canonical
    a < b < c orientation (two self-joins on endpoint keys — the same
    exchanges ``triangle_counts`` pays once), a 3-way edge explode +
    count for per-edge support (map-side combinable), and one inner
    join to prune. The edge set only shrinks, so per-round cost is
    monotonically decreasing; convergence is one bounded count scalar
    per round (the k_core discipline); lineage truncated per round.
    """
    e = (
        edges.select(F.col(u_col).alias("u"), F.col(v_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .persist()
    )
    def _support(es: DataFrame) -> DataFrame:
        ab, bc, ac = es.alias("ab"), es.alias("bc"), es.alias("ac")
        tri = (
            ab.join(bc, F.col("ab.v") == F.col("bc.u"))
            .join(
                ac,
                (F.col("ac.u") == F.col("ab.u"))
                & (F.col("ac.v") == F.col("bc.v")),
            )
            .select(
                F.col("ab.u").alias("a"),
                F.col("ab.v").alias("b"),
                F.col("bc.v").alias("c"),
            )
        )
        return (
            tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .unionAll(tri.select(F.col("b").alias("u"), F.col("c").alias("v")))
            .unionAll(tri.select(F.col("a").alias("u"), F.col("c").alias("v")))
            .groupBy("u", "v")
            .agg(F.count("*").alias("support"))
        )

    n_prev = e.count()
    empty = e.limit(0).withColumn("support", F.lit(0).cast("long"))
    prev = e  # persisted frame superseded by the next materialization
    for _ in range(max_rounds):
        if n_prev == 0:
            return empty
        # supp's (u, v) keys are by construction a subset of e (every
        # triangle side IS a distinct canonical edge of e), so the
        # thresholded support frame alone is the surviving edge set —
        # re-joining it back to e was a redundant per-round shuffle;
        # edges in zero triangles have no supp row and drop with the
        # below-threshold ones, exactly as the former inner join did
        kept = _support(e).where(F.col("support") >= k - 2)
        nxt = _truncate_lineage(kept).persist()
        n_next = nxt.count()
        prev.unpersist()
        if n_next == n_prev:
            # nothing removed: this round's support was computed on
            # exactly the surviving edge set — it IS the truss support
            return nxt
        e, prev, n_prev = nxt.select("u", "v"), nxt, n_next
    # max_rounds exhausted without a fixed point: recompute support on
    # the FINAL pruned edge set (one extra triangle enumeration) so
    # the reported support honors the "measured within the truss"
    # contract instead of overcounting triangles through edges removed
    # in the last prune
    final = _support(e)
    return e.join(
        final.withColumnRenamed("support", "s"), ["u", "v"], "left"
    ).select("u", "v", F.coalesce("s", F.lit(0)).cast("long").alias("support"))


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Personalized PageRank / random-walk-with-restart (the topic-
    sensitive variant of ``pagerank``): the teleport mass returns only
    to the SEED set instead of uniformly to all nodes, so ranks decay
    with graph distance from the seeds — "find pages/domains related
    to this trusted set", the link-graph analog of the corpus-level
    similarity searches in operators/similarity.py (and the TrustRank
    construction when seeds are a vetted whitelist).

        r_{t+1}(v) = (1-d)·p(v) + d · Σ_{u→v} r_t(u) / outdeg(u)
        p = uniform over seeds;  r_0 = p/(1-d) mass, i.e. 1/|S| on seeds

    Same simplified dangling stance as ``pagerank`` (sinks leak mass —
    relative ranking unaffected). Deterministic: fixed iterations, no
    RNG. Returns ``(node, r)`` at full precision.

    Scale shape: identical per-iteration exchanges to ``pagerank``
    (one shuffle keyed by dst, one rank-frame join keyed by src) plus
    a one-time seed flag join — the seed frame is tiny by construction
    (a curated whitelist) and broadcasts; |S| is the only driver
    scalar (bounded-catalog discipline). Lineage truncated per round.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    sd = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    n_seeds = sd.count()  # bounded catalog scalar
    base = nodes.join(
        F.broadcast(sd.withColumn("_s", F.lit(1))), "node", "left"
    ).select(
        "node",
        F.when(
            F.col("_s").isNotNull(),
            F.lit((1.0 - damping) / n_seeds),
        ).otherwise(F.lit(0.0)).alias("b"),
    ).persist()
    outdeg = e.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    contrib_src = e.join(outdeg, "src").persist()
    ranks = base.select(
        "node", (F.col("b") / F.lit(1.0 - damping)).alias("r")
    )
    # same lazy round-chaining as ``pagerank``: the rank frame is
    # referenced once per round, so truncation is periodic + on return.
    # The per-node teleport mass ``b`` rides THROUGH the message
    # aggregation (zero-contribution seed rows carrying b; messages
    # carry null — max() picks the one non-null per group), replacing
    # the per-round base ⋈ msgs LEFT JOIN exactly as in ``pagerank``.
    seed_rows = base.select(
        F.col("node").alias("dst"),
        F.lit(0.0).alias("c"),
        F.col("b"),
    )
    for it in range(iterations):
        ranks = (
            contrib_src.join(ranks, F.col("src") == F.col("node"))
            .select(
                "dst",
                (F.col("r") / F.col("deg")).alias("c"),
                F.lit(None).cast("double").alias("b"),
            )
            .unionByName(seed_rows)
            .groupBy("dst")
            .agg(F.sum("c").alias("m"), F.max("b").alias("b"))
            .select(
                F.col("dst").alias("node"),
                (
                    F.col("b") + F.lit(damping) * F.col("m")
                ).alias("r"),
            )
        )
        if (it + 1) % 4 == 0 and it + 1 < iterations:
            ranks = _truncate_lineage(ranks)
    ranks = _truncate_lineage(ranks)
    contrib_src.unpersist()
    return ranks


def random_walks(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    walk_len: int = 4,
    salt: str = "walk:",
) -> DataFrame:
    """DeepWalk/node2vec-style walk-corpus generation (Perozzi et al.
    KDD'14): one fixed-length walk from every node, the training-data
    step that turns a link graph into "sentences" for embedding
    models. The next hop is chosen uniformly among out-neighbors —
    md5-DERANDOMIZED like the sampling module: the choice at step t is
    ``int(md5(salt‖start‖':'‖t‖':'‖cur)[:8], 16) % outdeg(cur)``
    against the neighbor's rank in dst order, so reruns, retries, and
    the SQL oracle reproduce the exact trajectory. Walks stop early at
    sink nodes (no out-edges).

    Returns ``(start, path, n_steps)`` with ``path`` the '->'-joined
    node sequence (a string, not an array — keeps downstream
    canonicalizers and sinks happy) and ``n_steps = |nodes on path|``.

    Scale shape per step: one |V|-row broadcast-or-hash join against
    the out-degree table to compute the choice, then ONE equi-join on
    ``(cur, rank)`` against the ranked adjacency — never a join on
    ``cur`` alone, so a hub's fan-out never explodes the walk frame
    (the candidate row is unique by construction). The adjacency is
    ranked once (one shuffle) and persisted; lineage truncated per
    step like the other iterative operators.
    """
    e = edges.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("d")
    ).distinct()
    rk = Window.partitionBy("s").orderBy("d")
    adj = e.select(
        "s", "d", (F.row_number().over(rk) - 1).alias("_idx")
    ).persist()
    # joined every step: persist so the degree aggregate runs once
    degs = adj.groupBy("s").agg(F.count("*").alias("_deg")).persist()
    nodes = (
        e.select(F.col("s").alias("start"))
        .union(e.select(F.col("d").alias("start")))
        .distinct()
    )
    w = nodes.select(
        "start",
        F.col("start").alias("_cur"),
        F.col("start").cast("string").alias("path"),
    )
    for t in range(1, walk_len):
        key = F.concat(
            F.lit(salt),
            F.col("start").cast("string"),
            F.lit(f":{t}:"),
            F.col("_cur").cast("string"),
        )
        choice = (
            F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
            % F.col("_deg")
        )
        stepped = (
            w.join(degs, w["_cur"] == degs["s"], "left")
            .drop("s")
            .withColumn("_choice", choice)
        )
        nxt = (
            stepped.join(
                adj,
                (stepped["_cur"] == adj["s"])
                & (stepped["_choice"] == adj["_idx"]),
                "left",
            )
            .select(
                "start",
                F.col("d").alias("_nxt"),
                F.when(
                    F.col("d").isNotNull(),
                    F.concat(
                        F.col("path"),
                        F.lit("->"),
                        F.col("d").cast("string"),
                    ),
                )
                .otherwise(F.col("path"))
                .alias("path"),
            )
            .withColumnRenamed("_nxt", "_cur")
        )
        w = _truncate_lineage(nxt)
    out = w.select(
        "start",
        "path",
        (F.size(F.split(F.col("path"), "->")) ).alias("n_steps"),
    )
    adj.unpersist()
    return out


def deepwalk_pairs(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    walk_len: int = 4,
    window: int = 2,
    salt: str = "walk:",
) -> DataFrame:
    """DeepWalk training pairs (Perozzi et al. KDD'14 §4.2): run the
    md5-derandomized ``random_walks`` corpus, then emit skip-gram
    (center, context) co-occurrence counts within ``window`` positions
    inside each walk — the node-embedding analogue of the text
    skip-gram generator (operators/sampling-adjacent skipgram.py); the
    output feeds the same hashed-feature / GloVe-style trainers.

    Returns ``(center, context, n_pairs)``; pairs are ordered
    (center, context both directions), center ≠ context positionally
    (self-pairs at distance 0 excluded, a node co-occurring with
    itself at distance ≥ 1 counts — standard skip-gram).

    Scale shape: walks are one frame keyed by ``start`` (one walk per
    node); the pair generator is ONE (walk, position) self-equi-join
    on the walk id with the |Δpos| ≤ window filter — the GloVe
    single-equi-join discipline (constant ≤ 2·window fan-out per
    position, never a cross join) — plus the final pair aggregate.
    """
    walks = random_walks(
        edges, src_col, dst_col, walk_len=walk_len, salt=salt
    )
    seq = walks.select(
        "start",
        F.posexplode(F.split(F.col("path"), "->")).alias("pos", "node"),
    )
    a = seq.select(
        F.col("start").alias("_w"),
        F.col("pos").alias("_pa"),
        F.col("node").alias("center"),
    )
    b = seq.select(
        F.col("start").alias("_w"),
        F.col("pos").alias("_pb"),
        F.col("node").alias("context"),
    )
    pairs = a.join(b, "_w").where(
        (F.col("_pa") != F.col("_pb"))
        & (F.abs(F.col("_pa") - F.col("_pb")) <= window)
    )
    return pairs.groupBy("center", "context").agg(
        F.count("*").alias("n_pairs")
    )


def graph_report(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """One-row graph health report — the summary card a link-graph
    ingest ships before anyone runs PageRank on it:

    - ``density`` = m_directed / (n·(n−1));
    - ``reciprocity`` = fraction of directed edges whose reverse also
      exists (spam link farms score high);
    - ``assortativity`` = Pearson correlation of endpoint TOTAL
      degrees over the undirected edge set (Newman 2002, full-degree
      variant) — positive: hubs link hubs; negative: hub-and-spoke.
      Both edge orientations enter the sums, the standard
      symmetrization; degenerate variance → null.

    Scale shape: one distinct + one degree aggregate + a reverse-edge
    semi-join keyed by the (dst, src) pair + two degree-attach joins —
    every key data-proportional; the report itself is three scalar
    aggregates folded into one row (explicit sum formulas, not corr(),
    so the oracle replays them exactly).
    """
    e = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .where(F.col("s") != F.col("d"))
        .distinct()
        .persist()
    )
    n_nodes = (
        e.select(F.col("s").alias("n"))
        .unionAll(e.select(F.col("d").alias("n")))
        .distinct()
        .agg(F.count("*").alias("n_nodes"))
    )
    rev = e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    recip = e.join(rev, ["s", "d"], "left_semi").agg(
        F.count("*").alias("_nrecip")
    )
    m_dir = e.agg(F.count("*").alias("n_edges_directed"))
    und = e.select(
        F.least("s", "d").alias("u"), F.greatest("s", "d").alias("v")
    ).distinct()
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("double").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("_ju"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("_jv"))
    ends = und.join(du, "u").join(dv, "v")
    # symmetrized sums: each undirected edge contributes both (j,k)
    # and (k,j), which makes Sj == Sk and the formula the textbook one
    sums = ends.agg(
        F.count("*").cast("double").alias("_m"),
        F.sum(F.col("_ju") * F.col("_jv")).alias("_sjk"),
        F.sum(F.col("_ju") + F.col("_jv")).alias("_sj2x"),
        F.sum(
            F.col("_ju") * F.col("_ju") + F.col("_jv") * F.col("_jv")
        ).alias("_sq2x"),
    )
    mm = F.lit(2.0) * F.col("_m")
    mean = F.col("_sj2x") / mm
    var = F.col("_sq2x") / mm - mean * mean
    r = (F.col("_sjk") / F.col("_m") - mean * mean) / var
    return (
        m_dir.crossJoin(F.broadcast(n_nodes))
        .crossJoin(F.broadcast(recip))
        .crossJoin(F.broadcast(und.agg(F.count("*").alias("n_edges_undirected"))))
        .crossJoin(F.broadcast(sums))
        .select(
            "n_nodes",
            "n_edges_directed",
            "n_edges_undirected",
            F.round(
                F.col("n_edges_directed")
                / (
                    F.col("n_nodes").cast("double")
                    * (F.col("n_nodes") - 1)
                ),
                6,
            ).alias("density"),
            F.round(
                F.col("_nrecip")
                / F.col("n_edges_directed").cast("double"),
                6,
            ).alias("reciprocity"),
            F.round(
                F.when(var > 0, r), 6
            ).alias("assortativity"),
        )
    )


def multi_source_bfs(
    edges: DataFrame,
    seeds: list,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 4,
    _frontier_probe: list | None = None,
) -> DataFrame:
    """Multi-source BFS hop distances over an UNDIRECTED view of the
    edge list — the shortest-path primitive beside PageRank/HITS/CC:
    "how many hops is every node from the nearest seed?" (seed set =
    trusted domains, gold documents, known-spam hubs; the distance is
    the classic TrustRank-style propagation feature).

    Returns ``(node, dist)`` for nodes REACHED within ``max_hops``
    (unreached nodes are absent — at 100 TB materializing the
    unreachable set is the expensive non-answer). Deterministic: BFS
    layers are unique minima, no tie-breaks needed.

    Scale shape per round — FRONTIER-ONLY (the canonical BFS work
    bound): only the nodes first reached in round ``r`` join the edge
    list in round ``r+1`` (frontier⋈edges, one shuffle keyed by node),
    followed by an anti-join against the accumulated ``dist`` frame to
    drop already-settled nodes; per-round lineage truncation keeps the
    plan flat.  Work per round is O(deg(frontier_r)), not
    O(deg(reached_{≤r})) — at 100 TB the difference is the whole
    algorithm.  ``max_hops`` bounds rounds, and the dist frame only
    ever holds reached nodes.

    ``_frontier_probe`` is a test hook: when a list is passed, the
    row count of each round's frontier is appended (one tiny count job
    per round — tests only, never set on the hot path).  It pins the
    bound "round r joins exactly |frontier_r| rows against the edges".
    """
    from cccatalog_spark.operators.dedup import _truncate_lineage

    spark = edges.sparkSession
    und = edges.select(
        F.col(src_col).alias("n"), F.col(dst_col).alias("nbr")
    ).unionAll(
        edges.select(F.col(dst_col).alias("n"), F.col(src_col).alias("nbr"))
    ).distinct().persist()
    frontier = _truncate_lineage(
        spark.createDataFrame(
            [(s, 0) for s in seeds], ["node", "dist"]
        )
    )
    # dist stays a LAZY union of the per-round checkpointed frontiers:
    # every constituent is already a materialized leaf, so the union
    # plan is flat and nothing recomputes — re-truncating the union
    # each round was one extra materialization job per hop for a frame
    # whose pieces were all just materialized (guide §5:
    # localCheckpoint cuts lineage; a union of leaves has none to cut)
    dist = frontier
    for r in range(max_hops):
        if _frontier_probe is not None:
            _frontier_probe.append(frontier.count())
        hop = (
            und.join(frontier, und["n"] == frontier["node"])
            .select(F.col("nbr").alias("node"))
            .distinct()
        )
        frontier = _truncate_lineage(
            hop.join(dist, "node", "left_anti")
            .withColumn("dist", F.lit(r + 1).cast("long"))
        )
        dist = dist.unionAll(frontier)
    und.unpersist()
    return dist


def link_prediction_scores(
    memberships: DataFrame,
    item_col: str = "item",
    container_col: str = "container",
    min_common: int = 2,
    max_container_degree: int | None = None,
) -> DataFrame:
    """Link-prediction scores over a bipartite membership frame
    (item ∈ container — parts per order, users per session, terms per
    document): for every item pair sharing ≥ ``min_common``
    containers, the three classic neighborhood scores

        common      = |Γ(a) ∩ Γ(b)|             (shared containers)
        jaccard     = common / |Γ(a) ∪ Γ(b)|
        adamic_adar = Σ_{c ∈ Γ(a)∩Γ(b)} 1 / ln(deg(c))

    (Liben-Nowell & Kleinberg, CIKM'03; Adamic & Adar, Social
    Networks'03 — the degree-discounted variant downweights hub
    containers, exactly the "everyone touches the front page" fix).
    Mirrors the reference's tags-in-common enrichment idea
    (src/providers family) generalized to scored candidate pairs.

    Returns ``(id_a, id_b, common, jaccard, adamic_adar)`` with
    ``id_a < id_b``.

    Scale shape — identical to the shingle inverted index
    (operators/dedup._pair_jaccard): candidates are generated
    per-container, so pair volume is Σ_c deg(c)², NOT |items|².
    ``max_container_degree`` is the hub guard: a container holding
    100k items would alone emit 10^10 pairs, so real-scale callers cap
    it (the dropped hubs carry the least signal — 1/ln(deg) ≈ 0
    anyway, the same argument as dropping max-doc-freq shingles). A
    container of degree 1 can never witness a pair, so deg ≥ 2 is a
    lossless cut applied for free off the same degree aggregate. One
    shuffle keyed by container for degrees, one self-join keyed by
    container for pairs, one pair-keyed aggregate.
    """
    m = memberships.select(
        F.col(item_col).alias("i"), F.col(container_col).alias("c")
    ).distinct()
    deg = m.groupBy("c").agg(F.count("*").alias("deg"))
    cut = F.col("deg") >= 2
    if max_container_degree is not None:
        cut = cut & (F.col("deg") <= max_container_degree)
    # postings ⋈ per-container degree: degree frame is one row per
    # container — broadcastable at catalog scale, shuffle-joined at
    # corpus scale; either way the pair self-join below dominates
    md = m.join(deg.where(cut), "c").persist()
    item_deg = m.groupBy("i").agg(F.count("*").alias("di"))
    a = md.alias("a")
    b = md.hint("merge").alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.c") == F.col("b.c"))
            & (F.col("a.i") < F.col("b.i")),
        )
        .groupBy(
            F.col("a.i").alias("id_a"), F.col("b.i").alias("id_b")
        )
        .agg(
            F.count("*").alias("common"),
            F.sum(F.lit(1.0) / F.log(F.col("a.deg"))).alias("adamic_adar"),
        )
        .where(F.col("common") >= int(min_common))
    )
    da = item_deg.select(
        F.col("i").alias("id_a"), F.col("di").alias("_da")
    )
    db = item_deg.select(
        F.col("i").alias("id_b"), F.col("di").alias("_db")
    )
    return (
        pairs.join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a",
            "id_b",
            "common",
            (
                F.col("common")
                / (F.col("_da") + F.col("_db") - F.col("common"))
            ).alias("jaccard"),
            "adamic_adar",
        )
    )


def harmonic_centrality(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 2,
) -> DataFrame:
    """h-truncated harmonic centrality over the UNDIRECTED view of
    the edge list (Boldi & Vigna, "Axioms for centrality", 2014):

        H_h(v) = Σ_{u ≠ v, d(u,v) ≤ h} 1 / d(u,v)

    — the centrality that, unlike closeness, is defined on
    disconnected graphs (unreachable nodes contribute 0, no ∞). The
    hop bound IS the estimator every web-graph study uses in
    practice: beyond a few hops 1/d adds noise, not signal.

    Returns ``(node, n_reached, harmonic)`` (harmonic rounded 6).

    Scale shape: bounded all-pairs BFS carrying the SOURCE on every
    frontier row — per round one join keyed by node plus an anti-join
    against the settled pair set, with per-round lineage cuts (the
    multi_source_bfs discipline, pair-keyed). The pair frame is
    O(|V| · ball_h), which is exactly the cost of the truncated
    definition — real at h ≤ 2-3, explosive beyond; at full web
    scale swap the exact pair set for HyperBall's per-node HLL
    neighborhood counters (same recurrence, mergeable sketch state)
    and accept the sketch error. The aggregate is one
    map-side-combinable sum keyed by source.
    """
    spark = edges.sparkSession
    und = (
        edges.select(F.col(src_col).alias("n"), F.col(dst_col).alias("m"))
        .unionAll(
            edges.select(
                F.col(dst_col).alias("n"), F.col(src_col).alias("m")
            )
        )
        .distinct()
        .persist()
    )
    # settled pairs start with (v, v, 0) so the anti-join never
    # re-reaches a source from itself; dist-0 rows are excluded from
    # the final sum
    seeds = und.select(F.col("n").alias("s"), F.col("n").alias("node")) \
        .distinct().withColumn("dist", F.lit(0).cast("long"))
    frontier = (
        und.select(F.col("n").alias("s"), F.col("m").alias("node"))
        .distinct()
        .withColumn("dist", F.lit(1).cast("long"))
    )
    reached = _truncate_lineage(seeds.unionAll(frontier))
    for r in range(2, max_hops + 1):
        hop = (
            frontier.join(und, frontier["node"] == und["n"])
            .select("s", F.col("m").alias("node"))
            .distinct()
        )
        frontier = _truncate_lineage(
            hop.join(reached, ["s", "node"], "left_anti")
            .withColumn("dist", F.lit(r).cast("long"))
        )
        reached = _truncate_lineage(reached.unionAll(frontier))
    out = (
        reached.where(F.col("dist") > 0)
        .groupBy(F.col("s").alias("node"))
        .agg(
            F.count("*").alias("n_reached"),
            F.round(F.sum(F.lit(1.0) / F.col("dist")), 6).alias(
                "harmonic"
            ),
        )
    )
    und.unpersist()
    return out


def hyperball_harmonic(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 2,
) -> DataFrame:
    """HyperBall harmonic centrality (Boldi & Vigna, WSDM'14 "In-core
    computation of geometric centralities with HyperBall") — THE
    full-web-scale form of :func:`harmonic_centrality`: instead of the
    exact O(|V|·ball) pair frame, every node carries a mergeable
    256-register HLL sketch of its ball, and

        B_t(v) = B_{t-1}(v) ∪ ⋃_{(v,u)∈E} B_{t-1}(u)

    is just an elementwise register max. Harmonic centrality is then
    Σ_t (|B_t| − |B_{t−1}|)/t on the sketch estimates (increments
    clamped at 0 — estimator branch switches can dip, ball sizes
    can't).

    md5-derandomized registers (functions/sketches) make the sketch
    itself SQL-replayable: the oracle reproduces the IDENTICAL
    estimate, so even the approximation sits under a hard value gate.

    Returns ``(node, ball_est, harmonic_hll)`` (rounded 4).

    Scale shape per round: one join of the register frame keyed by
    node against the edge list + one (node, register) groupBy-max —
    state is ≤ |V|·256 rows FOREVER, independent of ball size; that
    bound is the whole point vs the exact operator. Estimates are one
    more (node)-keyed aggregate per round; lineage cut per round.
    """
    from cccatalog_spark.functions.sketches import (
        hll_estimate,
        hll_registers,
    )

    und = (
        edges.select(F.col(src_col).alias("n"), F.col(dst_col).alias("m"))
        .unionAll(
            edges.select(
                F.col(dst_col).alias("n"), F.col(src_col).alias("m")
            )
        )
        .distinct()
        .persist()
    )
    nodes = und.select(F.col("n").alias("node")).distinct()
    regs = _truncate_lineage(
        hll_registers(nodes, ["node"], "node")
    ).persist()
    acc = hll_estimate(regs, ["node"], out_col="_e").select(
        "node", F.col("_e").alias("_prev")
    ).withColumn("_h", F.lit(0.0))
    for t in range(1, max_hops + 1):
        inherited = und.join(regs, regs["node"] == und["m"]).select(
            F.col("n").alias("node"), "_j", "_m"
        )
        regs = _truncate_lineage(
            inherited.unionAll(regs.select("node", "_j", "_m"))
            .groupBy("node", "_j")
            .agg(F.max("_m").alias("_m"))
        ).persist()
        est = hll_estimate(regs, ["node"], out_col="_e")
        acc = _truncate_lineage(
            acc.join(est.select("node", "_e"), "node").select(
                "node",
                F.col("_e").alias("_prev"),
                (
                    F.col("_h")
                    + F.greatest(
                        F.col("_e") - F.col("_prev"), F.lit(0.0)
                    )
                    / float(t)
                ).alias("_h"),
            )
        )
    und.unpersist()
    # harmonic rounds at 5 decimals, NOT 4: round-4 estimates divided
    # by hop t=2 are exact multiples of 5e-5, i.e. they sit ON the
    # 4-decimal half boundary where engines' rounding of the double
    # representation disagrees; 5 decimals is the identity on that
    # lattice
    return acc.select(
        "node",
        F.round("_prev", 4).alias("ball_est"),
        F.round("_h", 5).alias("harmonic_hll"),
    )


def maximal_independent_set(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 6,
    salt: str = "mis:",
) -> DataFrame:
    """Luby's maximal independent set (Luby, STOC'85) over the
    undirected view of the edge list — the conflict-free scheduling
    primitive (pick a maximal set of mutually non-adjacent items:
    parallel-safe updates, seed selection with no near-dup pairs,
    one-per-conflict-group sampling):

    per round, every undecided node draws an md5-derandomized
    priority; a node joins the MIS iff its priority beats every
    undecided neighbor's; its neighbors drop out. Expected O(log n)
    rounds; priorities are pure functions of (round, node), so the
    result is deterministic, repartition-stable, and SQL-replayable
    — a "random" distributed algorithm under an exact value gate.

    Returns ``(node, round)`` for MIS members.

    Scale shape per round: one join of the undecided-priority frame
    keyed by node against the edge list + one max aggregate (the
    neighbor-priority bound), one anti-join to shrink the undecided
    set; per-round lineage cuts; the convergence probe is a bounded
    scalar (the connected-components discipline).
    """
    from cccatalog_spark.operators.sampling import md5_u01

    spark = edges.sparkSession
    und = (
        edges.select(F.col(src_col).alias("n"), F.col(dst_col).alias("m"))
        .unionAll(
            edges.select(
                F.col(dst_col).alias("n"), F.col(src_col).alias("m")
            )
        )
        .distinct()
        .persist()
    )
    undecided = _truncate_lineage(
        und.select(F.col("n").alias("node")).distinct()
    ).persist()
    mis = spark.createDataFrame([], "node string, round int")
    for r in range(max_rounds):
        if undecided.isEmpty():
            break
        pri = undecided.withColumn(
            "_p", md5_u01(F.col("node"), f"{salt}{r}:")
        ).persist()
        nbr_max = (
            und.join(
                pri.select(F.col("node").alias("m"), F.col("_p").alias("_pm")),
                "m",
            )
            .groupBy("n")
            .agg(F.max("_pm").alias("_mx"))
        )
        cand = (
            pri.join(
                nbr_max.select(F.col("n").alias("node"), "_mx"),
                "node",
                "left",
            )
            .where(F.col("_mx").isNull() | (F.col("_p") > F.col("_mx")))
            .select("node")
        ).persist()
        # truncate only this round's DELTA (the winners), not the
        # whole accumulated MIS: the running union is a union of
        # already-materialized leaves, so re-truncating it each round
        # re-materialized O(rounds x |mis|) rows for nothing (the
        # multi_source_bfs settled-set lesson)
        cand_t = _truncate_lineage(
            cand.select("node", F.lit(r).cast("int").alias("round"))
        )
        mis = mis.unionAll(cand_t)
        excluded = (
            und.join(cand.select(F.col("node").alias("n")), "n")
            .select(F.col("m").alias("node"))
            .distinct()
        )
        prev_undecided = undecided
        undecided = _truncate_lineage(
            undecided.join(
                cand.unionAll(excluded).distinct(), "node", "left_anti"
            )
        ).persist()
        # superseded round frames: both truncations above consumed
        # them, and nothing later re-reads them (guide §5 - don't
        # leak a persist per round)
        prev_undecided.unpersist()
        pri.unpersist()
        cand.unpersist()
    und.unpersist()
    return mis


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """Newman modularity of a node partition (Newman & Girvan 2004)
    over the undirected view of the edge list:

        Q = Σ_c ( e_c/m − (d_c/2m)² )

    e_c = intra-community edges, d_c = community degree sum, m =
    total edges — THE score for "are these communities real":
    community detectors (q209's LPA) produce labels, this prices
    them; Q < 0 means anti-community structure (a bipartite split
    scores negative by construction).

    Returns one row ``(n_nodes, n_edges, n_communities, q)``
    (rounded 6) plus per-community detail is deliberately not
    emitted — the scalar is the decision.

    Scale shape: two label joins against the edge list (keyed by
    endpoint — broadcast when the label frame is a catalog, shuffle
    otherwise), one community aggregate, one 1-row fold. Degrees
    come from the same edge scan.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    la = labels.select(
        F.col(node_col).alias("a"), F.col(label_col).alias("_la")
    )
    lb = labels.select(
        F.col(node_col).alias("b"), F.col(label_col).alias("_lb")
    )
    j = e.join(la, "a").join(lb, "b")
    m = j.agg(F.count("*").cast("double").alias("_m"))
    # community degree sums from the labeled edge endpoints
    deg = (
        j.select(F.col("_la").alias("_c"))
        .unionAll(j.select(F.col("_lb").alias("_c")))
        .groupBy("_c")
        .agg(F.count("*").cast("double").alias("_d"))
    )
    intra = j.where(F.col("_la") == F.col("_lb")).groupBy(
        F.col("_la").alias("_c")
    ).agg(F.count("*").cast("double").alias("_e"))
    per = deg.join(intra, "_c", "left").crossJoin(F.broadcast(m))
    qterm = F.coalesce(F.col("_e"), F.lit(0.0)) / F.col("_m") - (
        F.col("_d") / (2.0 * F.col("_m"))
    ) * (F.col("_d") / (2.0 * F.col("_m")))
    nn = labels.agg(F.countDistinct(node_col).alias("n_nodes"))
    out = per.agg(
        F.count("*").cast("long").alias("n_communities"),
        F.sum(qterm).alias("_q"),
        F.max("_m").cast("long").alias("n_edges"),
    )
    return out.crossJoin(F.broadcast(nn)).select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        "n_edges",
        "n_communities",
        F.round("_q", 6).alias("q"),
    )


def degree_assortativity(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of the
    UNDIRECTED view of the edge list: the Pearson correlation of the
    endpoint degrees over every edge counted in both directions —
    "do hubs link to hubs?" (positive: social/citation shape;
    negative: web/biological shape). The one-number structural
    fingerprint beside the q290 graph report.

    Returns ONE row ``(n_edges, r)`` where ``n_edges`` is the
    directed-both-ways edge count entering the correlation.

    The correlation uses the integer computational formula
    (n·Σxy − Σx·Σy) / √(n·Σxx − (Σx)²) / √(n·Σyy − (Σy)²) — every sum
    is an exact integer in both engines, so the result is
    deterministic to the last bit before the final division.

    Scale shape: one degree aggregate (shuffle by node), two
    broadcast-or-shuffle joins to attach endpoint degrees, one scalar
    aggregate. No windows, no iteration.
    """
    und = (
        edges.select(
            F.col(src_col).alias("a"), F.col(dst_col).alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    both = und.unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()  # degree agg + the correlation join both read it
    deg = both.groupBy("a").agg(F.count("*").alias("deg"))
    da = deg.select(F.col("a"), F.col("deg").alias("dx"))
    db = deg.select(
        F.col("a").alias("b"), F.col("deg").alias("dy")
    )
    j = both.join(da, "a").join(db, "b")
    agg = j.agg(
        F.count("*").alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    r = F.when(
        (vx > 0) & (vy > 0),
        num
        / F.sqrt(vx.cast("double"))
        / F.sqrt(vy.cast("double")),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_edges"),
        F.round(r, 6).alias("r"),
    )


def strongly_connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 8,
    prop_rounds: int = 25,
) -> DataFrame:
    """Strongly connected components of a DIRECTED edge frame via the
    distributed Trim + Forward-Min coloring algorithm (Orzan 2004 /
    Hong et al. 2013 FW-BW-Trim family) — mutual-reachability
    clusters in redirect graphs, crawl link graphs, citation loops.

    Returns ``(node, scc)`` where ``scc`` is the minimum node id of
    the component (deterministic, type-agnostic via min).

    Per outer round:
    1. **Trim** to fixpoint: any node with in-degree 0 or out-degree 0
       in the remaining subgraph is a singleton SCC — removed
       immediately. This resolves DAG-like regions (chains, trees) in
       O(depth) cheap rounds, the known cure for the coloring
       algorithm's worst case.
    2. **Color**: propagate c(v) = min({v} ∪ {c(u) : u→v}) along edge
       direction to fixpoint — c(v) is the smallest id that reaches v
       within the subgraph.
    3. **Backward mark**: the pivot of each color class is the node
       c itself; propagate "reaches pivot" backward along edges inside
       the same color class to fixpoint. Marked nodes form exactly
       SCC(pivot) — emitted, removed, repeat. All color classes are
       processed in the SAME Spark jobs (one pivot per class, all in
       parallel), so each outer round removes one SCC per color.

    Scale shape: every step is an equi-join keyed by node plus a
    min-aggregate (map-side combinable); per-round lineage truncation
    (operators/dedup._truncate_lineage) keeps plans flat; convergence
    checks are single-scalar counts. ``max_rounds`` bounds outer
    iterations; nodes still unresolved after that are returned with
    ``scc`` NULL (loud, never silently wrong — callers at 100 TB size
    the rounds to the condensation depth, which trim keeps small).
    """
    spark = edges.sparkSession
    e_all = (
        edges.select(
            F.col(src_col).alias("s"), F.col(dst_col).alias("d")
        )
        .where(F.col("s") != F.col("d"))
        .distinct()
        .persist()
    )
    remaining = _truncate_lineage(
        e_all.select(F.col("s").alias("node"))
        .unionAll(e_all.select(F.col("d").alias("node")))
        .distinct()
    )
    done_parts: list[DataFrame] = []

    er = e_all
    for _ in range(max_rounds):
        if remaining.limit(1).count() == 0:
            break
        # restrict edges to the remaining subgraph
        er = _truncate_lineage(
            e_all.join(
                remaining.withColumnRenamed("node", "s"), "s", "left_semi"
            ).join(
                remaining.withColumnRenamed("node", "d"), "d", "left_semi"
            )
        )
        # --- trim to fixpoint -----------------------------------------
        while True:
            srcs = er.select(F.col("s").alias("node")).distinct()
            dsts = er.select(F.col("d").alias("node")).distinct()
            keep = srcs.join(dsts, "node", "inner")
            # probe emptiness LAZILY (limit-1 short-circuits on the
            # first non-empty partition — the common exit), then
            # materialize the trimmed-away set ONCE: the former code
            # re-executed this anti-join pipeline for the done-part
            # truncation AND inlined it again in the remaining update
            trivial_lazy = remaining.join(keep, "node", "left_anti")
            if trivial_lazy.limit(1).count() == 0:
                break
            trivial = _truncate_lineage(trivial_lazy)
            done_parts.append(
                trivial.select("node", F.col("node").alias("scc"))
            )
            remaining = _truncate_lineage(
                remaining.join(trivial, "node", "left_anti")
            )
            er = _truncate_lineage(
                er.join(
                    remaining.withColumnRenamed("node", "s"),
                    "s",
                    "left_semi",
                ).join(
                    remaining.withColumnRenamed("node", "d"),
                    "d",
                    "left_semi",
                )
            )
        if remaining.limit(1).count() == 0:
            break
        # --- forward min coloring to fixpoint --------------------------
        colors = _truncate_lineage(
            remaining.select("node", F.col("node").alias("c"))
        )
        for _p in range(prop_rounds):
            msgs = er.join(
                colors.withColumnRenamed("node", "s"), "s"
            ).select(F.col("d").alias("node"), "c")
            # carry the old color through the min-aggregate (min
            # ignores the message rows' null oc; every remaining node
            # has exactly one colors row), so the convergence probe is
            # a filter on the truncated leaf instead of a per-round
            # shuffle join of old vs new colors — colors only ever
            # decrease, so "changed" ⟺ some c < oc
            merged = _truncate_lineage(
                colors.select("node", "c", F.col("c").alias("oc"))
                .unionAll(
                    msgs.select(
                        "node",
                        "c",
                        F.lit(None).cast(
                            colors.schema["c"].dataType
                        ).alias("oc"),
                    )
                )
                .groupBy("node")
                .agg(F.min("c").alias("c"), F.min("oc").alias("oc"))
            )
            changed = (
                merged.where(F.col("c") < F.col("oc")).limit(1).count()
            )
            colors = merged.select("node", "c")
            if changed == 0:
                break
        # --- backward mark within color class --------------------------
        marked = _truncate_lineage(
            colors.where(F.col("c") == F.col("node"))
        )
        # marked only grows; carrying its count in a driver variable
        # makes the convergence check ONE count job per round (over
        # the just-materialized leaf) instead of re-counting the
        # previous round's frame too
        n_marked = marked.count()
        for _p in range(prop_rounds):
            msgs = (
                er.join(marked.withColumnRenamed("node", "d"), "d")
                .select(F.col("s").alias("node"), "c")
                .join(colors, ["node", "c"], "left_semi")
            )
            marked = _truncate_lineage(
                marked.unionAll(msgs).distinct()
            )
            n_new = marked.count()
            if n_new == n_marked:
                break
            n_marked = n_new
        done_parts.append(
            _truncate_lineage(
                marked.select("node", F.col("c").alias("scc"))
            )
        )
        remaining = _truncate_lineage(
            remaining.join(marked, "node", "left_anti")
        )
    e_all.unpersist()
    out = done_parts[0] if done_parts else remaining.select(
        "node", F.lit(None).alias("scc")
    )
    for part in done_parts[1:]:
        out = out.unionAll(part)
    if done_parts and remaining.limit(1).count() > 0:
        out = out.unionAll(
            remaining.select(
                "node", F.lit(None).cast(out.schema["scc"].dataType).alias("scc")
            )
        )
    return out


def feature_propagation(
    edges: DataFrame,
    features: DataFrame,
    node_col: str = "node",
    feat_col: str = "h",
    rounds: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Mean-aggregate feature propagation over the UNDIRECTED view of
    the edge list — the message-passing layer of GraphSAGE/GCN
    (Hamilton et al. 2017, Kipf & Welling 2017) stripped to its Spark
    shape: h_{r+1}(v) = mean_{u ∈ N(v)} h_r(u), ``rounds`` times.
    The label/score smoother for web graphs ("average the spam score
    of my neighbors") and the cheap embedding for nodes without one.

    Returns ``(node, degree, h0, h_out)`` for every node with ≥ 1
    neighbor; nodes missing an input feature contribute nothing and
    receive means over featured neighbors only (documented semantics,
    mirrored by the oracle).

    Determinism note: feed an INTEGER-VALUED feature (scale currency
    to cents) — round 1's mean is then exact-integer/count, identical
    in any engine; only later rounds carry association noise, and a
    coarse ``round_digits`` keeps it far from rounding boundaries
    (the q360 contract).

    Scale shape per round: ONE equi-join keyed by neighbor + ONE
    mean-aggregate keyed by node (both map-side combinable) — the
    standard GNN full-batch round. ``rounds`` is small and fixed;
    lineage stays flat because each round's output is a plain
    aggregate of the previous (no recursive growth at these depths).
    """
    und = (
        edges.select(
            F.col(edges.columns[0]).alias("n"),
            F.col(edges.columns[1]).alias("nbr"),
        )
        .where(F.col("n") != F.col("nbr"))
        .distinct()
    )
    und = und.unionAll(
        und.select(F.col("nbr").alias("n"), F.col("n").alias("nbr"))
    ).distinct().persist()  # reused by the degree agg + every round
    deg = und.groupBy("n").agg(F.count("*").alias("degree"))
    h = features.select(
        F.col(node_col).alias("n"),
        F.col(feat_col).cast("double").alias("h"),
    )
    h0 = h
    for _ in range(int(rounds)):
        h = (
            und.join(
                h.withColumnRenamed("n", "nbr"), "nbr"
            )
            .groupBy("n")
            .agg(F.avg("h").alias("h"))
        )
    return (
        deg.join(h0.withColumnRenamed("h", "h0"), "n", "left")
        .join(h.withColumnRenamed("h", "h_out"), "n", "left")
        .select(
            F.col("n").alias("node"),
            "degree",
            F.round("h0", int(round_digits)).alias("h0"),
            F.round("h_out", int(round_digits)).alias("h_out"),
        )
    )


def dyad_census(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Holland–Leinhardt dyad census of a DIRECTED edge frame: how
    many node pairs are MUTUAL (both directions), ASYMMETRIC (one),
    and what fraction of directed edges are reciprocated — the
    one-row directionality fingerprint (follow-back rate in social
    graphs, bidirectional-link rate in web graphs) beside q354's
    assortativity.

    Returns ONE row ``(n_edges, mutual_dyads, asym_dyads,
    reciprocity)`` with reciprocity = 2·mutual / n_edges (Garlaschelli
    & Loffredo 2004 definition over distinct directed edges, self
    loops excluded).

    Scale shape: ONE canonical-pair aggregate (key = (min, max)) — the
    reverse-edge join expressed as a 2-row-per-dyad groupBy, map-side
    combinable; one scalar fold after it.
    """
    e = (
        edges.select(
            F.col(src_col).alias("s"), F.col(dst_col).alias("d")
        )
        .where(F.col("s") != F.col("d"))
        .distinct()
    )
    dyads = e.groupBy(
        F.least("s", "d").alias("a"),
        F.greatest("s", "d").alias("b"),
    ).agg(F.count("*").alias("_dirs"))
    return dyads.agg(
        F.sum("_dirs").cast("long").alias("n_edges"),
        F.sum((F.col("_dirs") == 2).cast("long"))
        .cast("long")
        .alias("mutual_dyads"),
        F.sum((F.col("_dirs") == 1).cast("long"))
        .cast("long")
        .alias("asym_dyads"),
        F.round(
            2.0
            * F.sum((F.col("_dirs") == 2).cast("long"))
            / F.sum("_dirs"),
            6,
        ).alias("reciprocity"),
    )


def multi_source_distances(
    edges: DataFrame,
    seeds: list,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 4,
) -> DataFrame:
    """Per-seed BFS distances over an undirected view of the edge
    list: ``(seed, node, dist)`` for every (seed, node) pair reached
    within ``max_hops`` — the k-source generalization of
    ``multi_source_bfs`` (which keeps only min-over-seeds).  Feeds
    harmonic centrality and per-hub reachability features.

    Same frontier-only discipline, keyed by (seed, node): round r
    joins exactly the pairs first reached in round r-1 against the
    edge frame, anti-joins the settled set, and truncates lineage —
    work per round is O(Σ_s deg(frontier_r(s))), i.e. k independent
    BFS waves sharing one shuffle.
    """
    from cccatalog_spark.operators.dedup import _truncate_lineage

    spark = edges.sparkSession
    und = edges.select(
        F.col(src_col).alias("n"), F.col(dst_col).alias("nbr")
    ).unionAll(
        edges.select(F.col(dst_col).alias("n"), F.col(src_col).alias("nbr"))
    ).distinct().persist()
    frontier = _truncate_lineage(
        spark.createDataFrame(
            [(s, s, 0) for s in seeds], ["seed", "node", "dist"]
        )
    )
    # dist stays a LAZY union of checkpointed frontiers — same
    # reasoning as multi_source_bfs: every piece is a materialized
    # leaf, so re-truncating the union per hop bought nothing
    dist = frontier
    for r in range(max_hops):
        hop = (
            und.join(frontier, und["n"] == frontier["node"])
            .select("seed", F.col("nbr").alias("node"))
            .distinct()
        )
        frontier = _truncate_lineage(
            hop.join(dist, ["seed", "node"], "left_anti")
            .withColumn("dist", F.lit(r + 1).cast("long"))
        )
        dist = dist.unionAll(frontier)
    und.unpersist()
    return dist


def sampled_harmonic_centrality(
    edges: DataFrame,
    seeds: list,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 4,
) -> DataFrame:
    """Sampled harmonic centrality (Marchiori & Latora 2000; Boldi &
    Vigna 2014 argue it is THE principled closeness variant because
    unreachable pairs contribute 0, not ∞): per node,
    Σ over sample seeds of 1/d(seed, node) within a hop budget —
    the pivot-sampling estimator (Eppstein-Wang 2004) with a
    deterministic seed set, scaled to the full node count upstream if
    an absolute estimate is needed.

    Returns ``(node, n_reached, harmonic)``, harmonic rounded to 6;
    seeds themselves score their distance-0 row as 0 contribution.

    Scale: k BFS waves in one frame (see ``multi_source_distances``);
    the rollup is one groupBy keyed by node.
    """
    d = multi_source_distances(
        edges, seeds, src_col=src_col, dst_col=dst_col, max_hops=max_hops
    )
    pos = d.where(F.col("dist") > 0)
    return (
        pos.groupBy("node")
        .agg(
            F.count("*").cast("bigint").alias("n_reached"),
            F.round(
                F.sum(F.lit(1.0) / F.col("dist").cast("double")), 6
            ).alias("harmonic"),
        )
    )


def eigenvector_centrality(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 6,
) -> DataFrame:
    """Eigenvector centrality by SHIFTED power iteration over the
    undirected graph (Bonacich 1987; shift per standard practice so
    the bipartite/periodic case still converges): x ← (x + A·x) /
    ‖x + A·x‖₁ from the uniform vector, fixed ``iterations`` rounds —
    deterministic, no RNG, exactly unrollable in the SQL oracle.

    Returns ``(node, r)`` at full precision; callers round for output.

    Scale shape: per round ONE hash join (x ⋈ edges, keyed by node) +
    one groupBy(dst) message sum; the L1 normalizer is a 1-row
    broadcast aggregate (never a driver collect); lineage truncated
    per round like :func:`pagerank`.  Edge list symmetrized + deduped
    once and persisted across rounds.
    """
    fwd = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    rev = edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    und = fwd.union(rev).where(F.col("src") != F.col("dst")).distinct().persist()
    nodes = und.select(F.col("src").alias("node")).distinct().persist()
    n = nodes.count()  # bounded catalog scalar (matches pagerank's init)

    x = nodes.withColumn("r", F.lit(1.0 / n))
    # Power iteration is SCALE-INVARIANT: every per-round L1
    # normalizer is a positive scalar that commutes with the linear
    # map (I + A), so x_k = (I+A)^k x_0 / ‖(I+A)^k x_0‖₁ — normalize
    # ONCE at the end instead of paying a persist + 1-row broadcast
    # aggregate + division per round.  Iterate magnitudes grow by
    # ~(1+avg-degree) per round — a handful of rounds stays far from
    # double overflow at any graph size.  Per round: the shift term
    # x(v) rides through the message aggregation as a
    # self-contribution row (x is an eager checkpoint leaf each
    # round, so the second reference is a cheap leaf rescan) —
    # replacing the old per-round x ⋈ msgs LEFT JOIN (a
    # SortMergeJoin: two exchanges + two sorts) with one groupBy(dst)
    # that yields every node directly.
    for _ in range(iterations):
        x = _truncate_lineage(
            und.join(_iterate_side(x, n), F.col("src") == F.col("node"))
            .select("dst", F.col("r").alias("c"))
            .unionByName(
                x.select(F.col("node").alias("dst"), F.col("r").alias("c"))
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("r"))
            .select(F.col("dst").alias("node"), "r")
        )
    s = x.agg(F.sum("r").alias("s"))
    out = x.crossJoin(F.broadcast(s)).select(
        "node", (F.col("r") / F.col("s")).alias("r")
    )
    und.unpersist()
    nodes.unpersist()
    return out
