"""Similarity search: cosine values on known vectors, exact top-k
ordering, knn join shape, and LSH recall vs the exact baseline."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy sweep; excluded from the fast loop (-m "not slow")

from pyspark.sql import functions as F

from cccatalog_spark.operators.similarity import (
    cosine,
    cosine_topk,
    knn_join_topk,
    lsh_cosine_topk,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]),
         ([1.0, 2.0], [2.0, 4.0])],
        "a array<double>, b array<double>",
    )
    out = [r["c"] for r in df.select(
        F.round(cosine(F.col("a"), F.col("b")), 9).alias("c")).collect()]
    assert out[0] == 1.0
    assert out[1] == 0.0
    assert out[2] == 1.0


def test_cosine_topk_exact_ordering(spark):
    df = _vecs(spark, [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [1.0, 0.01]),
    ])
    rows = cosine_topk(df, "embedding", "vec_id", [1.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in rows] == [0, 3, 1]
    assert rows[0]["cosine_sim"] == 1.0


def test_knn_join_excludes_self_and_ranks(spark):
    df = _vecs(spark, [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]),
    ])
    probes = df.where(F.col("vec_id") == 0)
    rows = knn_join_topk(df, probes, "embedding", "vec_id", k=2).collect()
    assert all(r["neighbor_id"] != 0 for r in rows)
    assert [r["neighbor_id"] for r in rows] == [1, 2]
    assert [r["rank"] for r in rows] == [1, 2]


def test_ivf_topk_recall_and_degeneration(spark, sf_dir):
    """IVF with nprobe=n_lists must equal the exact scan (no pruning);
    with nprobe<n_lists it keeps the self-match and decent recall."""
    from cccatalog_spark.operators.similarity import ivf_cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probe = [float(x) for x in
             emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    exact = [r["vec_id"] for r in
             cosine_topk(emb, "embedding", "vec_id", probe, k=10).collect()]
    full = [r["vec_id"] for r in
            ivf_cosine_topk(emb, "embedding", "vec_id", probe, k=10,
                            n_lists=8, nprobe=8).collect()]
    assert full == exact  # degenerate IVF == exact scan
    pruned = {r["vec_id"] for r in
              ivf_cosine_topk(emb, "embedding", "vec_id", probe, k=10,
                              n_lists=8, nprobe=2).collect()}
    assert 0 in pruned
    assert len(set(exact) & pruned) >= 3


def test_vectorized_knn_matches_hof_topk(spark, sf_dir):
    """The numpy mapInPandas scorer must retrieve the same neighbor
    set (and same rounded sims) as the JVM expression scorer."""
    from cccatalog_spark.operators.similarity import knn_topk_vectorized

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probe = [float(x) for x in
             emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    hof = cosine_topk(emb, "embedding", "vec_id", probe, k=10).collect()
    vec = knn_topk_vectorized(emb, "embedding", "vec_id", probe, k=10).collect()
    assert [r["vec_id"] for r in hof] == [r["vec_id"] for r in vec]
    for a, b in zip(hof, vec):
        assert abs(a["cosine_sim"] - b["cosine_sim"]) <= 1e-6


def test_lsh_topk_hits_exact_top1(spark, sf_dir):
    """LSH with few bits over the real embeddings table: recall of the
    exact top-1 (the probe itself lives in its own bucket, so the top-1
    self-match is guaranteed; check top-k overlap is non-trivial)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probe = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    probe = [float(x) for x in probe]
    exact = {r["vec_id"] for r in
             cosine_topk(emb, "embedding", "vec_id", probe, k=10).collect()}
    approx = {r["vec_id"] for r in
              lsh_cosine_topk(emb, "embedding", "vec_id", probe, k=10,
                              bits=2).collect()}
    assert 0 in approx          # self-match always recalled
    assert len(exact & approx) >= 3  # loose recall floor at 2 bits


def test_lsh_neardup_matches_exact_allpairs(spark, sf_dir):
    """The q28 wiring contract: banded-LSH candidates + exact verify
    returns the SAME pair set and cosines as the all-pairs form on the
    real corpus (recall = 1 at the near-dup margin), so the all-pairs
    shape is only ever an oracle, never the plan."""
    from cccatalog_spark.operators.similarity import (
        cosine_neardup_pairs,
        lsh_neardup_pairs,
    )
    from cccatalog_spark.plans.queries import neardup_corpus

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = neardup_corpus(emb)
    lsh = {(r["id_a"], r["id_b"]): r["cosine_sim"]
           for r in lsh_neardup_pairs(
               corpus, "embedding", "vec_id", 0.99,
               bands=6, band_bits=12, dim=64).collect()}
    exact = {(r["id_a"], r["id_b"]): r["cosine_sim"]
             for r in cosine_neardup_pairs(
                 corpus, "embedding", "vec_id", 0.99).collect()}
    assert lsh == exact
    assert len(lsh) > 0  # the corpus really contains near-duplicates


def test_lsh_neardup_max_bucket_guard(spark):
    """Degenerate-bucket cap drops candidates from oversized buckets
    (recall knob for adversarial skew) without emitting false pairs."""
    from cccatalog_spark.operators.similarity import lsh_neardup_pairs

    # 30 identical vectors: every band collapses to one bucket of 30
    df = _vecs(spark, [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(30)])
    full = lsh_neardup_pairs(df, "embedding", "vec_id", 0.99,
                             bands=2, band_bits=4, dim=4)
    capped = lsh_neardup_pairs(df, "embedding", "vec_id", 0.99,
                               bands=2, band_bits=4, dim=4, max_bucket=10)
    assert full.count() == 30 * 29 // 2
    assert capped.count() == 0


def test_q28_plan_is_banded_not_allpairs(spark, sf_dir):
    """Plan-shape regression: the q28 entry must contain no nested-loop
    or cartesian join — candidate generation is an equi join on
    (band, bucket)."""
    from cccatalog_spark.plans.queries import all_queries

    plan = all_queries()["q28_embedding_neardup"](
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_vectorized_signatures_match_expression_path(spark, sf_dir):
    """The numpy GEMV signature path and the Catalyst expression path
    produce identical (id, band, bucket) rows — so switching the
    default changes cost, never candidates."""
    from cccatalog_spark.operators.similarity import (
        _hyperplanes,
        _norm,
        lsh_bucket,
        lsh_signatures_vectorized,
    )
    from cccatalog_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("vec_id").alias("_id"),
        F.col("embedding").alias("_v"),
        _norm(F.col("embedding")).alias("_n"),
    )
    bands, band_bits = 4, 8
    planes = _hyperplanes(64, bands * band_bits, 42)
    vec = {
        (r["_id"], r["band"]): r["bucket"]
        for r in lsh_signatures_vectorized(
            base, planes, bands, band_bits
        ).collect()
    }
    expr_rows = base.select(
        "_id",
        *[
            lsh_bucket(
                F.col("_v"), planes[b * band_bits : (b + 1) * band_bits]
            ).cast("long").alias(f"b{b}")
            for b in range(bands)
        ],
    ).collect()
    exp = {
        (r["_id"], b): r[f"b{b}"] for r in expr_rows for b in range(bands)
    }
    assert vec == exp


def test_quantize_int8_bounds_and_roundtrip(spark):
    from cccatalog_spark.operators.similarity import (
        dequant_error_l2,
        quantize_int8,
    )

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "id long, v array<double>",
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            quantize_int8(F.col("v")).alias("qz"),
            dequant_error_l2(
                F.col("v"), quantize_int8(F.col("v"))
            ).alias("err"),
        ).collect()
    }
    q1 = out[1]["qz"]["q"]
    # max element maps to ±127, everything within int8 range
    assert q1[0] == 127 and all(-127 <= x <= 127 for x in q1)
    # reconstruction error bounded by dim * (scale/2)
    assert out[1]["err"] <= 4 * out[1]["qz"]["scale"] / 2 + 1e-9
    # zero vector: epsilon scale, all-zero codes, zero error
    assert out[2]["qz"]["q"] == [0, 0, 0, 0]
    assert out[2]["err"] == 0.0


def test_kmeans_assign_exact_vs_numpy(spark):
    import numpy as np

    from cccatalog_spark.operators.similarity import kmeans_assign

    rng = np.random.RandomState(7)
    vecs = rng.randn(60, 5).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["seed_id"]: (r["n_assigned"], r["avg_dist"], r["max_dist"])
        for r in kmeans_assign(df, "embedding", "vec_id", n_seeds=4).collect()
    }
    v = vecs.astype("float64")
    d = np.sqrt(((v[:, None, :] - v[None, :4, :]) ** 2).sum(axis=2))
    assign = d.argmin(axis=1)
    want = {}
    for s in range(4):
        m = assign == s
        if m.any():
            want[s] = (
                int(m.sum()),
                round(float(d[m, s].mean()), 6),
                round(float(d[m, s].max()), 6),
            )
    assert set(got) == set(want)
    for s in want:
        assert got[s][0] == want[s][0]
        assert abs(got[s][1] - want[s][1]) < 1e-5
        assert abs(got[s][2] - want[s][2]) < 1e-5


def test_kmeans_assign_tie_goes_to_lower_seed(spark):
    from cccatalog_spark.operators.similarity import kmeans_assign

    # seeds 0 and 1 identical -> every vector ties; all go to seed 0
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [5.0, 5.0]), (3, [-3.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["seed_id"]: r["n_assigned"] for r in
           kmeans_assign(df, "embedding", "vec_id", n_seeds=2).collect()}
    assert got == {0: 4}


def test_kmeans_lloyd_matches_numpy_model(spark):
    import numpy as np

    from cccatalog_spark.operators.similarity import kmeans_lloyd

    rng = np.random.RandomState(11)
    vecs = rng.randn(80, 6).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(80)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["cid"]: (r["n_assigned"], r["avg_dist"], r["max_dist"])
        for r in kmeans_lloyd(
            df, "embedding", "vec_id", n_seeds=3, iterations=2
        ).collect()
    }

    v = vecs.astype("float64")
    cents = v[:3].copy()
    for _ in range(2):
        d = np.sqrt(((v[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2))
        assign = d.argmin(axis=1)
        new = []
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                new.append(np.round(v[m].mean(axis=0), 9))
        cents = np.array(new)
    d = np.sqrt(((v[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2))
    assign = d.argmin(axis=1)
    want = {}
    for c in range(len(cents)):
        m = assign == c
        if m.any():
            want[c] = (
                int(m.sum()),
                round(float(d[m, c].mean()), 6),
                round(float(d[m, c].max()), 6),
            )
    assert {k: g[0] for k, g in got.items()} == {k: w[0] for k, w in want.items()}
    for c in want:
        assert abs(got[c][1] - want[c][1]) < 1e-5
        assert abs(got[c][2] - want[c][2]) < 1e-5


# ---------------------------------------------------------------------------
# mean_pool (per-group mean vectors)
# ---------------------------------------------------------------------------

def test_mean_pool_hand_computed(spark):
    from cccatalog_spark.operators.similarity import mean_pool

    rows = [
        ("a", [1.0, 2.0, 3.0]),
        ("a", [3.0, 4.0, 5.0]),
        ("b", [10.0, 0.0, -2.0]),
    ]
    df = spark.createDataFrame(rows, "g string, v array<double>")
    got = {r["g"]: r for r in mean_pool(df, "v", "g").collect()}
    assert got["a"]["n_vectors"] == 2
    assert got["a"]["pooled"] == [2.0, 3.0, 4.0]
    assert got["b"]["n_vectors"] == 1
    assert got["b"]["pooled"] == [10.0, 0.0, -2.0]


def test_mean_pool_matches_kmeans_mstep(spark):
    # pooling members by their assigned cluster == the M-step centroid
    from cccatalog_spark.operators.similarity import kmeans_assign, mean_pool

    e = spark.createDataFrame(
        [(i, [float(i % 4), float(i % 7)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    # trivially: pool everything as one group vs numpy mean
    import numpy as np

    pooled = mean_pool(
        e.selectExpr("1 AS g", "embedding AS v"), "v", "g"
    ).collect()[0]["pooled"]
    want = np.mean([[float(i % 4), float(i % 7)] for i in range(40)], axis=0)
    assert pooled == [round(float(x), 9) for x in want]


def test_multiprobe_recall_dominates_single_probe(spark):
    from cccatalog_spark.operators.similarity import (
        cosine_topk,
        lsh_cosine_topk,
        lsh_cosine_topk_multiprobe,
    )

    import math
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    qv = rows[0][1]
    exact = [r["vec_id"] for r in cosine_topk(df, "v", "vec_id", qv, k=10).collect()]
    single = {
        r["vec_id"]
        for r in lsh_cosine_topk(df, "v", "vec_id", qv, k=10, bits=4).collect()
    }
    multi = {
        r["vec_id"]
        for r in lsh_cosine_topk_multiprobe(
            df, "v", "vec_id", qv, k=10, bits=4
        ).collect()
    }
    r_single = len(single & set(exact)) / 10
    r_multi = len(multi & set(exact)) / 10
    assert r_multi >= r_single
    assert r_multi >= 0.6  # hamming-1 probes recover boundary misses


def test_multiprobe_probe_budget_respected(spark):
    from cccatalog_spark.operators.similarity import lsh_cosine_topk_multiprobe

    df = spark.createDataFrame(
        [(i, [float(i % 5 - 2), float(i % 3 - 1)]) for i in range(50)],
        "vec_id long, v array<double>",
    )
    # n_probes=1 == single-probe bucket only
    got = lsh_cosine_topk_multiprobe(
        df, "v", "vec_id", [1.0, 0.5], k=5, bits=3, n_probes=1
    )
    assert got.count() <= 5


def test_semantic_dedup_within_cluster_only(spark):
    from cccatalog_spark.operators.similarity import semantic_dedup

    # two seeds (0: x-axis, 1: y-axis); 10/11 near-dup x-cluster pair;
    # 20 identical to 0 (dup of a SEED); 30 y-cluster singleton near
    # x-cluster vectors in id-space but not in embedding space
    df = _vecs(spark, [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (10, [0.95, 0.05]),
        (11, [0.949, 0.051]),
        (20, [1.0, 0.0]),
        (30, [0.05, 0.95]),
    ])
    got = {
        r["vec_id"]: (r["cid"], r["is_dup"])
        for r in semantic_dedup(
            df, "embedding", "vec_id", n_seeds=2, threshold=0.999
        ).collect()
    }
    assert got[0] == (0, 0)        # seed, lowest id in cluster
    assert got[1] == (1, 0)
    assert got[10][0] == 0 and got[10][1] == 0   # first of the near pair
    assert got[11] == (0, 1)       # dominated by 10 (cos > .999)
    assert got[20] == (0, 1)       # exact copy of seed 0
    assert got[30] == (1, 0)       # y-cluster: no lower-id near vector


def test_semantic_dedup_cross_cluster_pair_not_compared(spark):
    from cccatalog_spark.operators.similarity import semantic_dedup

    # 10 and 11 are near-identical (cos ≈ .956 > threshold) but land in
    # DIFFERENT clusters (each nearest a different seed) -> never
    # compared -> neither dup; each is < .95 to its own seed.
    df = _vecs(spark, [
        (0, [1.0, 0.2]),
        (1, [0.2, 1.0]),
        (10, [0.8, 0.59]),
        (11, [0.59, 0.8]),
    ])
    got = {
        r["vec_id"]: (r["cid"], r["is_dup"])
        for r in semantic_dedup(
            df, "embedding", "vec_id", n_seeds=2, threshold=0.95
        ).collect()
    }
    assert got[10][0] != got[11][0]
    assert got[10][1] == 0 and got[11][1] == 0


def test_semantic_dedup_matches_brute_force(spark):
    import itertools
    import math

    from cccatalog_spark.operators.similarity import semantic_dedup

    rows = [
        (i, [math.cos(0.37 * i) + 0.1 * (i % 5), math.sin(0.37 * i), 0.2 * (i % 3)])
        for i in range(40)
    ]
    n_seeds, thr = 4, 0.98
    seeds = {i: v for i, v in rows if i < n_seeds}

    def l2(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return d / (na * nb)

    asg = {i: min(seeds, key=lambda s: (l2(v, seeds[s]), s)) for i, v in rows}
    vecs = dict(rows)
    want = {}
    for i, v in rows:
        want[i] = int(any(
            asg[j] == asg[i] and cos(vecs[j], v) >= thr
            for j in vecs if j < i
        ))
    got = {
        r["vec_id"]: (r["cid"], r["is_dup"])
        for r in semantic_dedup(
            _vecs(spark, rows), "embedding", "vec_id",
            n_seeds=n_seeds, threshold=thr,
        ).collect()
    }
    assert {i: g[0] for i, g in got.items()} == asg
    assert {i: g[1] for i, g in got.items()} == want


def test_silhouette_separated_vs_overlapping(spark):
    from cccatalog_spark.operators.similarity import silhouette_centroid

    def corpus(spread):
        rows = []
        # seeds 0 and 1 define two centers; members jitter by `spread`
        centers = {0: [0.0, 0.0], 1: [10.0, 0.0]}
        for cid, c in centers.items():
            rows.append((cid, c))
        i = 2
        for cid, c in centers.items():
            for dx in (-spread, spread):
                rows.append((i, [c[0] + dx, c[1] + spread / 2]))
                i += 1
        return spark.createDataFrame(
            rows, "vec_id long, emb array<double>"
        )

    tight = silhouette_centroid(corpus(0.5), "emb", "vec_id", n_seeds=2)
    loose = silhouette_centroid(corpus(4.0), "emb", "vec_id", n_seeds=2)
    t = tight.collect()[0]["overall_s"]
    l_ = loose.collect()[0]["overall_s"]
    assert t > l_           # tighter clusters score higher
    assert 0.0 <= l_ <= t <= 1.0


def test_silhouette_seed_rows_score_one(spark):
    from cccatalog_spark.operators.similarity import silhouette_centroid

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [5.0, 0.0]), (2, [0.1, 0.0])],
        "vec_id long, emb array<double>",
    )
    rows = {
        r["seed_id"]: r
        for r in silhouette_centroid(df, "emb", "vec_id", n_seeds=2).collect()
    }
    # each seed contains its own vector at distance 0 -> s = 1 exactly
    assert rows[1]["n"] == 1 and rows[1]["mean_s"] == 1.0
    assert rows[0]["n"] == 2
    assert rows[0]["overall_s"] == rows[1]["overall_s"]


def test_matryoshka_overlap_detects_truncation_loss(spark):
    from cccatalog_spark.operators.similarity import matryoshka_overlap

    # first 2 dims identical everywhere; last 2 dims carry the signal
    rows = [
        (0, [1.0, 1.0, 1.0, 0.0]),    # probe
        (1, [1.0, 1.0, 0.9, 0.1]),    # true near neighbor
        (2, [1.0, 1.0, -1.0, 0.2]),   # far in full space
        (3, [1.0, 1.0, 0.8, 0.05]),
        (4, [1.0, 1.0, -0.9, 0.9]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    out = {
        r["d"]: r
        for r in matryoshka_overlap(
            df, "emb", "vec_id", probe_id=0, dims=(2, 4), k=3
        ).collect()
    }
    assert out[4]["overlap"] == 1.0          # full dim = reference
    # at d=2 every vector ties at cosine 1 -> id-order top-3 (0,1,2)
    # vs full-space top-3 (0,1,3): overlap must drop below 1
    assert out[2]["overlap"] < 1.0
    assert out[2]["n_common"] == 2


def test_silhouette_rejects_single_seed(spark):
    import pytest as _pytest

    from cccatalog_spark.operators.similarity import silhouette_centroid

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])], "vec_id long, emb array<double>"
    )
    with _pytest.raises(ValueError):
        silhouette_centroid(df, "emb", "vec_id", n_seeds=1)


def test_pq_encode_hand_computed(spark):
    from cccatalog_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )

    # 4-dim vectors, m=2 subspaces of 2 dims, k=2 codebooks from the
    # first two vectors by id
    rows = [
        (0, [0.0, 0.0, 10.0, 10.0]),
        (1, [4.0, 4.0, 0.0, 0.0]),
        (2, [0.5, 0.5, 0.2, 0.2]),   # sub0 -> c0, sub1 -> c1
        (3, [3.0, 3.0, 9.0, 9.0]),   # sub0 -> c1, sub1 -> c0
    ]
    df = spark.createDataFrame(rows, "vec_id long, emb array<float>")
    books = pq_codebooks(df, "emb", "vec_id", m=2, k=2)
    assert books == [
        [[0.0, 0.0], [4.0, 4.0]],
        [[10.0, 10.0], [0.0, 0.0]],
    ]
    got = {
        r["vec_id"]: r
        for r in pq_encode(df, "emb", "vec_id", books).collect()
    }
    assert list(got[0]["pq_code"]) == [0, 0] and got[0]["pq_err"] == 0.0
    assert list(got[1]["pq_code"]) == [1, 1] and got[1]["pq_err"] == 0.0
    assert list(got[2]["pq_code"]) == [0, 1]
    assert got[2]["pq_err"] == round(0.5**2 * 2 + 0.2**2 * 2, 6)
    assert list(got[3]["pq_code"]) == [1, 0]
    assert got[3]["pq_err"] == round(1.0 * 2 + 1.0 * 2, 6)


def test_pq_tie_breaks_to_lower_ordinal(spark):
    from cccatalog_spark.operators.similarity import pq_encode

    # duplicate centroids -> equidistant -> code must pick ordinal 0
    books = [[[1.0, 1.0], [1.0, 1.0]]]
    df = spark.createDataFrame(
        [(7, [2.0, 2.0])], "vec_id long, emb array<float>"
    )
    got = pq_encode(df, "emb", "vec_id", books).collect()[0]
    assert list(got["pq_code"]) == [0]


def test_pq_rejects_indivisible_dim(spark):
    import pytest as _pytest

    from cccatalog_spark.operators.similarity import pq_codebooks

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, emb array<float>"
    )
    with _pytest.raises(ValueError):
        pq_codebooks(df, "emb", "vec_id", m=2, k=1)


def test_bitext_margin_hand_computed(spark):
    from cccatalog_spark.operators.similarity import bitext_margin_mine

    probes = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.0, 1.0])],
        "vec_id long, emb array<float>",
    )
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.7071, 0.7071])],
        "vec_id long, emb array<float>",
    )
    got = {
        r["probe_id"]: r
        for r in bitext_margin_mine(
            probes, corpus, "emb", "vec_id", k=1
        ).collect()
    }
    # axis probes pick their axis twins with margin 1 and mutuality
    assert got[100]["cand_id"] == 1 and got[100]["mutual"] is True
    assert got[101]["cand_id"] == 2 and got[101]["mutual"] is True
    assert got[100]["margin"] == 1.0 and got[101]["margin"] == 1.0


def test_bitext_margin_cancels_hub(spark):
    from cccatalog_spark.operators.similarity import bitext_margin_mine

    # the hub candidate is moderately close to BOTH probes; raw cosine
    # would rank it near the top for probe B, but its own top-1
    # neighborhood mean is high, so the margin demotes it below B's
    # true twin
    probes = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.0, 1.0])],
        "vec_id long, emb array<float>",
    )
    corpus = spark.createDataFrame(
        [(1, [0.9, 0.05]), (2, [0.05, 0.9]), (9, [0.8, 0.8])],
        "vec_id long, emb array<float>",
    )
    got = {
        r["probe_id"]: r["cand_id"]
        for r in bitext_margin_mine(
            probes, corpus, "emb", "vec_id", k=1
        ).collect()
    }
    assert got == {100: 1, 101: 2}
