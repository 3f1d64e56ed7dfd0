"""Dedup family on crafted micro-corpora: exact survivor rule, Jaccard
values, MinHash-LSH recall on identical/near-identical docs, SimHash
Hamming banding guarantees."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy sweep; excluded from the fast loop (-m "not slow")

from cccatalog_spark.operators.dedup import (
    dedup_exact,
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = BASE.replace("today", "tonight")
OTHER = "completely different words about spark shuffles and parquet files"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_exact_dedup_min_id_survivor(spark):
    df = _docs(spark, [BASE, BASE, OTHER])
    out = {r["doc_id"]: r for r in dedup_exact(df, "text", "doc_id").collect()}
    assert set(out) == {0, 2}
    assert out[0]["dup_count"] == 2
    assert out[2]["dup_count"] == 1


def test_jaccard_identical_is_one(spark):
    df = _docs(spark, [BASE, BASE, OTHER])
    rows = dedup_ngram_jaccard(df, "text", "doc_id", k=3, threshold=0.9).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (0, 1)
    assert abs(r["jaccard"] - 1.0) < 1e-12


def test_jaccard_near_dup_detected_not_unrelated(spark):
    df = _docs(spark, [BASE, NEAR, OTHER])
    rows = dedup_ngram_jaccard(df, "text", "doc_id", k=3, threshold=0.4).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in rows}
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)


def test_minhash_lsh_identical_always_candidate(spark):
    # identical docs share every band signature: recall 1.0 guaranteed
    df = _docs(spark, [BASE, BASE, OTHER])
    rows = dedup_minhash_lsh(
        df, "text", "doc_id", k=3, num_hashes=8, bands=4, threshold=0.9
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(0, 1)}
    assert rows[0]["est_jaccard"] == 1.0
    assert rows[0]["jaccard"] == 1.0


def test_simhash_identical_distance_zero(spark):
    df = _docs(spark, [BASE, BASE, OTHER])
    rows = dedup_simhash(df, "text", "doc_id", max_hamming=3).collect()
    out = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    assert out.get((0, 1)) == 0
    assert not any(2 in p for p in out)


def test_simhash_near_dup_within_banding_bound(spark):
    # banding (4×16-bit chunks) is complete for distance ≤ 3 by pigeonhole
    df = _docs(spark, [BASE, NEAR])
    rows = dedup_simhash(df, "text", "doc_id", max_hamming=16).collect()
    if rows:  # near-dup signatures are close; if ≤16 it must be found
        assert rows[0]["hamming"] <= 16


# ---------------------------------------------------------------------------
# Connected-components dedup clustering
# ---------------------------------------------------------------------------

def test_connected_components_chain_and_singleton(spark):
    from cccatalog_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "node long")
    # chain 1-2-3-4 (diameter 3 → needs >1 propagation round),
    # pair 5-6, singleton 7
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "src long, dst long"
    )
    out = {
        r["node"]: r["cluster_id"]
        for r in connected_components(nodes, edges).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}


def test_connected_components_label_flows_against_edge_direction(spark):
    from cccatalog_spark.operators.dedup import connected_components

    # min id is at the DST end: propagation must treat edges as
    # undirected
    nodes = spark.createDataFrame([(i,) for i in (10, 20, 1)], "node long")
    edges = spark.createDataFrame([(10, 20), (20, 1)], "src long, dst long")
    out = {
        r["node"]: r["cluster_id"]
        for r in connected_components(nodes, edges).collect()
    }
    assert out == {10: 1, 20: 1, 1: 1}


def test_connected_components_matches_union_find_random_graph(spark):
    """Seeded random graph vs an independent union-find model."""
    import random

    rng = random.Random(20260813)
    n = 120
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(140)
    ]
    edges = [(a, b) for a, b in edges if a != b]

    # independent model: union-find with path compression
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    expected = {}
    comp_min = {}
    for node in range(n):
        comp_min.setdefault(find(node), []).append(node)
    for root, members in comp_min.items():
        m = min(members)
        for node in members:
            expected[node] = m

    from cccatalog_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(nodes, e, max_iterations=60).collect()
    }
    assert got == expected

    # the O(log d) large-star/small-star variant agrees exactly
    from cccatalog_spark.operators.dedup import connected_components_star

    got_star = {
        r["node"]: r["cluster_id"]
        for r in connected_components_star(
            nodes, e, max_iterations=60
        ).collect()
    }
    assert got_star == expected


def test_connected_components_star_long_chain_few_rounds(spark):
    """A 40-node chain has diameter 39; the alternating star algorithm
    must resolve it within O(log d) rounds (10 here), where min-label
    propagation would need 39."""
    from cccatalog_spark.operators.dedup import connected_components_star

    n = 40
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    out = {
        r["node"]: r["cluster_id"]
        for r in connected_components_star(
            nodes, edges, max_iterations=10
        ).collect()
    }
    assert out == {i: 0 for i in range(n)}


def test_connected_components_star_chain_and_singleton(spark):
    from cccatalog_spark.operators.dedup import connected_components_star

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "node long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "src long, dst long"
    )
    out = {
        r["node"]: r["cluster_id"]
        for r in connected_components_star(nodes, edges).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}


def test_incremental_lsh_finds_batch_vs_corpus_only(spark):
    from cccatalog_spark.operators.dedup import dedup_minhash_lsh_incremental

    # corpus: 0=BASE, 1=BASE (corpus-internal dup), 2=OTHER
    # batch:  10=BASE (dup of corpus), 11=unique
    corpus = _docs(spark, [BASE, BASE, OTHER])
    batch = spark.createDataFrame(
        [(10, BASE), (11, "totally novel text with many unseen words")],
        "doc_id long, text string",
    )
    rows = dedup_minhash_lsh_incremental(
        batch, corpus, "text", "doc_id", k=3, threshold=0.9
    ).collect()
    pairs = {(r["batch_id"], r["corpus_id"]) for r in rows}
    # batch doc 10 hits BOTH corpus copies of BASE; the corpus-internal
    # (0,1) dup and any batch-batch pair are NOT reported
    assert pairs == {(10, 0), (10, 1)}
    for r in rows:
        assert abs(r["jaccard"] - 1.0) < 1e-12


def test_incremental_lsh_near_duplicate_recall(spark):
    from cccatalog_spark.operators.dedup import dedup_minhash_lsh_incremental

    corpus = _docs(spark, [BASE, OTHER])
    batch = spark.createDataFrame([(20, NEAR)], "doc_id long, text string")
    rows = dedup_minhash_lsh_incremental(
        batch, corpus, "text", "doc_id", k=3, threshold=0.5
    ).collect()
    assert {(r["batch_id"], r["corpus_id"]) for r in rows} == {(20, 0)}


def test_prefix_join_equals_full_inverted_index(spark):
    """Prefix filtering is lossless: same pairs as dedup_ngram_jaccard."""
    from cccatalog_spark.operators.dedup import (
        dedup_ngram_jaccard,
        jaccard_prefix_pairs,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "a completely different sentence about spark engines"),
        (4, "a completely different sentence about spark planners"),
        (5, "nothing in common with anything else at all here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    full = {
        (r.id_a, r.id_b, r.common)
        for r in dedup_ngram_jaccard(
            df, "text", "doc_id", k=3, threshold=0.5
        ).collect()
    }
    pref = {
        (r.id_a, r.id_b, r.common)
        for r in jaccard_prefix_pairs(
            df, "text", "doc_id", k=3, threshold=0.5
        ).collect()
    }
    assert pref == full
    assert (1, 2, 7) in pref or len(pref) > 0


def test_containment_prefix_filter_equals_full_self_join(spark):
    """Asymmetric prefix filtering is lossless: the prefix×full
    candidate join + array_intersect verify reports exactly the pairs
    (and common counts) of the unguarded full-postings self-join."""
    from pyspark.sql import functions as F
    from cccatalog_spark.functions.text import shingles
    from cccatalog_spark.operators.dedup import (
        _pair_jaccard,
        containment_pairs,
    )

    t = 0.6
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon "
            + " ".join(f"pad{i} fill{i} more{i}" for i in range(8))),
        (3, "the quick brown fox jumps over the lazy dog today"),
        (4, "the quick brown fox jumps over the lazy dog tonight"),
        (5, "spark catalyst tungsten codegen arrow pandas shuffle"),
        (6, "nothing shared with anything else whatsoever here now"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    shingled = (
        df.select("doc_id", shingles(F.col("text"), 3).alias("sh"))
        .withColumn("n_sh", F.size("sh"))
        .where(F.col("n_sh") > 0)
    )
    full = {
        (r.id_a, r.id_b, r.common)
        for r in _pair_jaccard(shingled, "doc_id")
        .where(
            (F.col("common") / F.col("n_a") >= t)
            | (F.col("common") / F.col("n_b") >= t)
        )
        .collect()
    }
    pref = {
        (r.id_a, r.id_b, r.common)
        for r in containment_pairs(
            df, "text", "doc_id", k=3, threshold=t
        ).collect()
    }
    assert pref == full and (1, 2, 3) in pref


def test_prefix_join_indexes_fewer_postings(spark):
    """The prefix index must be strictly smaller than the full index
    (that is the point of the operator)."""
    from pyspark.sql import functions as F
    from cccatalog_spark.functions.text import shingles

    rows = [(i, "alpha beta gamma delta epsilon zeta common common common") for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = df.select(shingles(F.col("text"), 3).alias("sh"))
    full_postings = sh.select(F.explode("sh")).count()
    # prefix length for t=0.5 on n=7 shingles: 7 - ceil(3.5) + 1 = 4
    n = sh.select(F.size("sh")).first()[0]
    import math
    assert n - math.ceil(0.5 * n) + 1 < n
    assert full_postings == 6 * n


def test_sorted_neighborhood_window_bound(spark):
    """Pairs can only come from ranks within the window; identical
    texts sorting adjacently are always found."""
    from cccatalog_spark.operators.dedup import dedup_sorted_neighborhood

    rows = [
        (1, "aaa identical text body for the window test here now"),
        (2, "aaa identical text body for the window test here now"),
        (3, "mmm middle text entirely unlike the others in corpus"),
        (4, "zzz far away text entirely unlike the others present"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup_sorted_neighborhood(
        df, "text", "doc_id", window=2, threshold=0.9
    ).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(1, 2)}
    assert out[0].jaccard == 1.0


def test_sorted_neighborhood_linear_candidates(spark):
    """window=w produces at most (w-1) * n verify candidates."""
    from cccatalog_spark.operators.dedup import dedup_sorted_neighborhood

    rows = [(i, f"text body shared words {i % 2} plus tail {i}") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup_sorted_neighborhood(
        df, "text", "doc_id", window=3, threshold=0.0
    )
    assert out.count() <= 2 * 10


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc fully quoted inside a long one: containment_a = 1.0
    while Jaccard is small."""
    from cccatalog_spark.operators.dedup import (
        containment_pairs,
        dedup_ngram_jaccard,
    )

    quote = "alpha beta gamma delta epsilon"
    filler = " ".join(f"pad{i} filler{i} extra{i}" for i in range(12))
    rows = [(1, quote), (2, quote + " " + filler)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    cont = containment_pairs(df, "text", "doc_id", threshold=0.9).collect()
    assert len(cont) == 1 and cont[0].containment_a == 1.0
    jac = dedup_ngram_jaccard(df, "text", "doc_id", threshold=0.5).collect()
    assert jac == []  # symmetric Jaccard misses the quotation


def test_multipass_snm_recall_exceeds_single_pass(spark):
    """A pair whose texts share a SUFFIX but not a prefix is invisible
    to the prefix-key pass and found by the reversed-key pass."""
    from pyspark.sql import functions as F
    from cccatalog_spark.operators.dedup import (
        dedup_sorted_neighborhood,
        dedup_sorted_neighborhood_multipass,
    )

    shared = "identical shared tail words here now again and again more"
    rows = [
        (1, "aaaa " + shared),
        (2, "zzzz " + shared),
        (3, "mmmm unrelated middle text entirely different body here"),
        (4, "qqqq other unrelated text another different body present"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    single = dedup_sorted_neighborhood(
        df, "text", "doc_id", window=2, threshold=0.5
    ).collect()
    assert (1, 2) not in {(r.id_a, r.id_b) for r in single}
    keys = [
        F.substring(F.lower(F.col("text")), 1, 12),
        F.substring(F.reverse(F.lower(F.col("text"))), 1, 12),
    ]
    multi = dedup_sorted_neighborhood_multipass(
        df, "text", "doc_id", keys, window=2, threshold=0.5
    ).collect()
    assert (1, 2) in {(r.id_a, r.id_b) for r in multi}


def test_dedup_exact_by_keeps_best_quality_tie_min_id(spark):
    from cccatalog_spark.operators.dedup import dedup_exact_by

    rows = [
        (1, "same text", 0.2), (2, "same text", 0.9), (3, "same text", 0.9),
        (4, "other text", 0.1),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "q"])
    out = {
        r.doc_id: (r.q, r.dup_count)
        for r in dedup_exact_by(df, "text", "doc_id", "q").collect()
    }
    # survivor of the triplicate: highest q, tie -> min id (2 not 3)
    assert out == {2: (0.9, 3), 4: (0.1, 1)}


def test_line_dedup_keeps_first_occurrence(spark):
    from cccatalog_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(
        [
            (1, "unique alpha. shared footer"),
            (2, "unique beta. shared footer"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r for r in line_dedup(df, "text", "doc_id").collect()
    }
    assert rows[1]["clean_text"] == "unique alpha | shared footer"
    assert rows[2]["clean_text"] == "unique beta"
    assert rows[1]["n_dup_lines"] == 1 and rows[2]["n_dup_lines"] == 1
    assert abs(rows[1]["dup_ratio"] - 0.5) < 1e-9


def test_line_dedup_within_doc_repeat_and_all_dup_doc(spark):
    from cccatalog_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(
        [
            (1, "same line. same line. other"),
            (2, "same line"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r for r in line_dedup(df, "text", "doc_id").collect()
    }
    # doc 1 keeps the first copy only; doc 2's sole line is a later
    # corpus-wide copy, so its cleaned text is empty
    assert rows[1]["clean_text"] == "same line | other"
    assert rows[1]["n_lines"] == 3 and rows[1]["n_dup_lines"] == 2
    assert rows[2]["clean_text"] == ""
    assert rows[2]["dup_ratio"] == 1.0


def test_overlap_stitch_tail_meets_head(spark):
    from cccatalog_spark.operators.dedup import overlap_stitch

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "gamma delta epsilon zeta"),   # 1 stitches into 2
            (3, "unrelated words entirely here"),
            (4, "x"),                           # < k tokens: excluded
        ],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in overlap_stitch(docs, "text", "doc_id", k=2).collect()
    }
    assert got == {(1, 2)}


def test_overlap_stitch_no_self_pairs(spark):
    from cccatalog_spark.operators.dedup import overlap_stitch

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c d")], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in overlap_stitch(docs, "text", "doc_id", k=2).collect()
    }
    # doc 1's tail 'a b' == its own head but self-pairs are excluded;
    # it does stitch into doc 2's head 'a b'
    assert got == {(1, 2)}


def test_shared_shingle_seam_matches_default_path(spark):
    """r8 optimization seam: passing a precomputed shingle_docs frame
    must give byte-identical pairs to the internal tokenize+shingle
    path, for BOTH Jaccard truth and MinHash-LSH detection (the q245
    recall audit builds the index once and shares it)."""
    from cccatalog_spark.operators.dedup import shingle_docs

    df = _docs(spark, [BASE, NEAR, BASE, OTHER])
    sh = shingle_docs(df, "text", "doc_id", k=3).persist()
    try:
        for fn, kw in (
            (dedup_ngram_jaccard, dict(threshold=0.4)),
            (dedup_minhash_lsh, dict(num_hashes=8, bands=4, threshold=0.4)),
        ):
            base = sorted(
                map(tuple, fn(df, "text", "doc_id", k=3, **kw).collect())
            )
            seamed = sorted(
                map(
                    tuple,
                    fn(df, "text", "doc_id", k=3, shingled=sh, **kw).collect(),
                )
            )
            assert seamed == base
    finally:
        sh.unpersist()
