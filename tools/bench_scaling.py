"""Scaling-curve bench: time the most expensive inventory queries at
sf0.1 and at the 3x key-offset replica (.scratch/sf0.3, built by
tools/gen_scale.py) and record the wall-time ratio per query.

A ratio far above the 3x data-growth ratio exposes a hidden
super-linear stage sf0.1 alone cannot; a sub-3x ratio just means fixed
overhead (session, streaming triggers, Python worker spin-up) still
dominates at this scale. Each timing is the MIN of two runs (the
repo-wide noise defense — the sandbox shows multi-tenant CPU bursts).

Writes BENCH_SCALING.json at the repo root.

Usage: python tools/bench_scaling.py [big_sf_dir]
       python tools/bench_scaling.py big_sf_dir big2_dir ratio2 [n_worst]
       (the 3-arg form adds a second curve: the worst-n_worst ratio
       queries re-timed min-of-3 at big2_dir, e.g. .scratch/sf1.0 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

# the 15 most expensive queries in BENCH_LOCAL.json (round 5), the
# verdict-prescribed scaling set: dedup pair generators, iterative
# graph algorithms, stateful streaming, column stats, DBSCAN, salted
# join — every family where a super-linear stage could hide
QUERIES = [
    "q24_ngram_jaccard",
    "q97_pagerank",
    "q106_stream_stream_join",
    "q150_column_stats",
    "q185_jaccard_prefix_join",
    "q186_sorted_neighborhood",
    "q198_containment_pairs",
    "q211_personalized_pagerank",
    "q237_sif_embeddings",
    "q245_lsh_recall_audit",
    "q254_stream_lsh_neardup",
    "q267_salted_join",
    "q268_stream_window_distinct",
    "q269_dbscan",
    "q270_multi_source_bfs",
    # round-6 additions: valuation scoring scan, multiset-Jaccard
    # pair generator, MG candidate pass, RAKE windows, per-seed BFS,
    # vocabulary self-join
    "q372_knn_shapley",
    "q376_weighted_jaccard",
    "q377_heavy_hitters",
    "q379_rake_keywords",
    "q381_sampled_harmonic",
    "q386_vocab_overlap",
    # final round-6 batch: chunk explode + hash dedup, single-pass
    # gram, per-round normalized power iteration, blocked reciprocal
    # kNN, candidate-filtered co-occurrence, trigram profile scoring
    "q396_cdc_dedup",
    "q397_linear_cka",
    "q398_eigenvector_centrality",
    "q404_mutual_knn",
    "q413_topic_coherence",
    "q419_langid_profile_eval",
]

RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))


def _q404_scaled(spark, sf_dir: str):
    """Scale-faithful q404 fixture (round-7 verdict item 4).

    The inventory query blocks on ``label`` — a FIXED 10-value key, the
    exact anti-shape ``mutual_knn_pairs``' docstring warns about, so at
    3x data it measured 9x per-block candidates: the fixture, not the
    operator.  Here the bench does what a 100 TB caller does: block on
    an LSH sign-bucket whose bit-width grows with the corpus
    (bits = ceil(log2(n / target_block)), i.e. cluster cardinality
    scales with n and per-block size stays ~constant), then time the
    identical operator.
    """
    import math

    from pyspark.sql import functions as F

    from cccatalog_spark.operators.similarity import (
        _hyperplanes,
        lsh_bucket,
        mutual_knn_pairs,
    )
    from cccatalog_spark.plans.queries import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n = emb.count()
    bits = max(1, math.ceil(math.log2(max(n, 2) / 40.0)))
    planes = _hyperplanes(64, bits)
    blocked = emb.withColumn(
        "_blk", lsh_bucket(F.col("embedding"), planes)
    )
    return mutual_knn_pairs(blocked, "embedding", "vec_id", "_blk", k=5)


# bench-only fixture overrides: same operator, caller-scaled inputs
# (the operator contract the inventory fixture can't express)
OVERRIDES = {"q404_mutual_knn": _q404_scaled}


def _time(fn, spark, sf_dir: str, runs: int = RUNS) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    big = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf0.3"
    small = "/root/testdata/sf0.1"
    data_ratio = 3.0

    from cccatalog_spark.plans.queries import all_queries
    from cccatalog_spark.session import get_spark

    spark = get_spark("cccatalog-bench-scaling")
    qs = all_queries()

    # warm JVM + Python workers (same protocol as bench.py)
    qs["q01_pricing_summary"](spark, small).count()
    n_workers = spark.sparkContext.defaultParallelism
    spark.range(0, n_workers * 10, 1, n_workers).mapInPandas(
        lambda batches: (b for b in batches), "id long"
    ).count()

    out = {"small_sf": small, "big_sf": big, "data_ratio": data_ratio,
           "queries": {}}
    for name in QUERIES:
        fn = OVERRIDES.get(name, qs.get(name))
        t_small = _time(fn, spark, small)
        t_big = _time(fn, spark, big)
        ratio = t_big / t_small if t_small > 0 else float("inf")
        out["queries"][name] = {
            "sec_small": round(t_small, 2),
            "sec_big": round(t_big, 2),
            "ratio": round(ratio, 2),
        }
        if name in OVERRIDES:
            out["queries"][name]["fixture"] = (
                "bench override: caller-scaled block key "
                "(see tools/bench_scaling.py)"
            )
        print(f"{name}: {t_small:.2f}s -> {t_big:.2f}s  ratio {ratio:.2f}",
              flush=True)

    # outlier re-probes as ARTIFACTS, not prose (round-7 verdict item
    # 6): any query whose first-pass ratio exceeds the data ratio gets
    # an independent min-of-3 re-timing committed beside it, so the
    # next reader verifies numbers, not sentences.
    for name, rec in out["queries"].items():
        if rec["ratio"] > data_ratio:
            fn = OVERRIDES.get(name, qs.get(name))
            r_small = _time(fn, spark, small, runs=3)
            r_big = _time(fn, spark, big, runs=3)
            rr = r_big / r_small if r_small > 0 else float("inf")
            rec["reprobe"] = {
                "runs": 3,
                "sec_small": round(r_small, 2),
                "sec_big": round(r_big, 2),
                "ratio": round(rr, 2),
            }
            print(f"{name} reprobe: {r_small:.2f}s -> {r_big:.2f}s  "
                  f"ratio {rr:.2f}", flush=True)

    ratios = [v["ratio"] for v in out["queries"].values()]
    out["max_ratio"] = max(ratios)
    out["median_ratio"] = sorted(ratios)[len(ratios) // 2]
    # written justifications for ratios above the data-growth ratio
    # (the BENCH_SCALING contract: >2x needs a stated cause).  The
    # round-6 q376 exemption is GONE: gen_scale.py now grows the
    # vocabulary per replica (Heaps-law-faithful), so per-feature df —
    # and hence the Σ df² candidate bound of exact similarity joins —
    # no longer scales with replica count (q376 measured 1.06 at the
    # 3.0 data ratio, was 5.99).
    # No prose exemptions remain: q404 runs the operator under its
    # documented caller contract (OVERRIDES above), and any residual
    # outlier carries its own min-of-3 "reprobe" artifact inline.
    out["notes"] = {}

    # Optional second scaling point (round-7 verdict item 7): rerun
    # the worst-N ratio queries at a larger replica (e.g. sf1.0 = 10x)
    # — the cheap way to catch a quadratic term the 3x step hides
    # (ratio^2 vs ratio separates cleanly at 10x where 3x is noise).
    if len(sys.argv) > 3:
        big2, ratio2 = sys.argv[2], float(sys.argv[3])
        n_worst = int(sys.argv[4]) if len(sys.argv) > 4 else 8
        worst = sorted(
            out["queries"], key=lambda n: -out["queries"][n]["ratio"]
        )[:n_worst]
        curve2 = {"big_sf": big2, "data_ratio": ratio2, "queries": {}}
        for name in worst:
            fn = OVERRIDES.get(name, qs.get(name))
            t_small = out["queries"][name]["sec_small"]
            t_big2 = _time(fn, spark, big2, runs=3)
            r2 = t_big2 / t_small if t_small > 0 else float("inf")
            curve2["queries"][name] = {
                "sec_small": t_small,
                "sec_big": round(t_big2, 2),
                "ratio": round(r2, 2),
            }
            print(f"{name} @{ratio2:g}x: {t_small:.2f}s -> "
                  f"{t_big2:.2f}s  ratio {r2:.2f}", flush=True)
        curve2["max_ratio"] = max(
            v["ratio"] for v in curve2["queries"].values()
        )
        out["extra_curve"] = curve2
    with open("BENCH_SCALING.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"max_ratio": out["max_ratio"],
                      "median_ratio": out["median_ratio"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
