"""Benchmark: run the query inventory at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (the driver captures the output TAIL, so the smallest
must-survive line prints LAST):
  line 1: full driver line {"metric", "value", "unit", "queries", "sf"}
  line 2: {"metric", "value", "unit", "sf", "n_queries"} -- tiny summary,
          printed LAST so tail truncation can never destroy it
The full line is also written to BENCH_LOCAL.json in the repo root so a
truncated tail capture can never destroy the per-query detail either.

Noise defense (round-6 verdict item 2 — the old design let the wall
budget trip mid-suite and, because queries ran in lexicographic order,
the budget cut min-of-2 down to one noisy draw for exactly the
longest-lived q42–q99 queries, inflating round-over-round deltas):

1. SENTINELS — the long-lived q01–q99 queries — are timed FIRST,
   min-of-3, before any budget pressure exists.  They are the stable
   round-over-round comparison set and are additionally reported under
   a separate "sentinels" key.
2. The remaining queries run in seeded-SHUFFLED order (seed 7), so if
   the budget does degrade runs the degradation is uncorrelated with
   query age / name.
3. The wall budget scales with inventory size
   (max(1500 s, 6 s x n_queries)) instead of a fixed 1500 s that a
   422-query suite inevitably trips.

Each timing is the MIN across runs (the min of k runs is a far better
estimator of true cost in a sandbox with ~15x multi-tenant CPU bursts
than one draw).  Set SPARK_GRAFT_BENCH_RUNS=1 for a quick single pass.
"""

from __future__ import annotations

import json
import os
import random
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
SENTINEL_RUNS = max(RUNS, int(os.environ.get("SPARK_GRAFT_SENTINEL_RUNS", "3")))
# sentinel set: the original long-lived inventory (q01-q99), stable
# across rounds since round 4 — timed min-of-3 before budget pressure
SENTINEL_MAX_QNUM = 99


def _qnum(name: str) -> int:
    m = re.match(r"q(\d+)_", name)
    return int(m.group(1)) if m else 10**9


def main() -> int:
    from cccatalog_spark.plans.queries import all_queries
    from cccatalog_spark.session import get_spark

    spark = get_spark("cccatalog-bench")
    queries = all_queries()

    # wall budget: once exceeded, remaining NON-sentinel queries run
    # once instead of RUNS times (graceful degradation instead of the
    # whole bench overrunning the driver's patience); scaled with
    # inventory size so a full-inventory pass doesn't trip it by design
    budget_s = float(
        os.environ.get(
            "SPARK_GRAFT_BENCH_BUDGET_S", str(max(1500.0, 6.0 * len(queries)))
        )
    )

    # warm the JVM + parquet footers so q01 isn't charged for JIT/startup,
    # and spawn the Python UDF workers (one per core; they're long-lived
    # in production) so the first mapInPandas query isn't charged ~10s of
    # interpreter startup
    queries["q01_pricing_summary"](spark, SF_DIR).count()
    n_workers = spark.sparkContext.defaultParallelism
    spark.range(0, n_workers * 10, 1, n_workers).mapInPandas(
        lambda batches: (b for b in batches), "id long"
    ).count()

    sentinel_names = sorted(
        n for n in queries if _qnum(n) <= SENTINEL_MAX_QNUM
    )
    rest = [n for n in queries if n not in set(sentinel_names)]
    rest.sort()
    random.Random(7).shuffle(rest)

    def time_query(name: str, runs: int) -> float:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
            # dedup/LSH operators persist their index frames; drop them
            # so one run's cache doesn't speed up or crowd out the next
            spark.catalog.clearCache()
        return round(best, 3)

    timings: dict[str, float] = {}
    sentinels: dict[str, float] = {}
    for name in sentinel_names:
        sentinels[name] = timings[name] = time_query(name, SENTINEL_RUNS)

    t_start = time.perf_counter()
    for name in rest:
        runs = RUNS if (time.perf_counter() - t_start) < budget_s else 1
        timings[name] = time_query(name, runs)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    payload = {
        "metric": "query_inventory_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sentinels": sentinels,
        "sentinel_total": round(sum(sentinels.values()), 3),
        "sf": sf_val,
    }
    line = json.dumps(payload)
    here = os.path.dirname(os.path.abspath(__file__))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    try:
        with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as f:
            f.write(line + "\n")
        # per-core-count copy so a lower-core scaling pass can't
        # clobber the main pass's per-query artifact
        if cpus:
            with open(
                os.path.join(here, f"BENCH_LOCAL_c{cpus}.json"), "w"
            ) as f:
                f.write(line + "\n")
    except OSError:
        pass
    # full line first, tiny summary LAST (tail-capture-safe)
    print(line)
    # round-8 verdict item 2: the full line is ~15 KB at 423 queries
    # and a bounded tail capture truncates it, losing per-query data.
    # Re-emit the queries map CHUNKED across bounded-length lines
    # (key "queries_part", so no parser can mistake a chunk for the
    # main payload); any line-based reader can reassemble the map.
    chunk: dict[str, float] = {}
    chunks: list[dict[str, float]] = []
    for k in sorted(timings):
        chunk[k] = timings[k]
        if len(chunk) == 45:
            chunks.append(chunk)
            chunk = {}
    if chunk:
        chunks.append(chunk)
    for i, c in enumerate(chunks):
        print(
            json.dumps(
                {
                    "metric": "query_inventory_chunk",
                    "chunk": i,
                    "chunks": len(chunks),
                    "queries_part": c,
                },
                separators=(",", ":"),
            )
        )
    print(
        json.dumps(
            {
                "metric": "query_inventory_total_wall",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "sentinel_total": round(sum(sentinels.values()), 3),
                "chunks": len(chunks),
                "queries_file": "BENCH_LOCAL.json",
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
