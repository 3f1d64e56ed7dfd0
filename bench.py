"""Benchmark: run the query inventory at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (the driver captures the output TAIL, so the smallest
must-survive line prints LAST):
  line 1: full driver line {"metric", "value", "unit", "queries", "sf"}
  line 2: {"metric", "value", "unit", "sf", "n_queries"} -- tiny summary,
          printed LAST so tail truncation can never destroy it
The full line is also written to BENCH_LOCAL.json in the repo root so a
truncated tail capture can never destroy the per-query detail either.

Noise defense: the sandbox shows up to ~15x multi-tenant CPU bursts, so
each query is timed twice and the MIN is reported (the min of two runs
is a far better estimator of the query's true cost than one draw).
Set SPARK_GRAFT_BENCH_RUNS=1 for a quick single-pass run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
# wall budget: once exceeded, remaining queries run once instead of
# RUNS times (noise defense degrades gracefully instead of the whole
# bench overrunning the driver's patience)
BUDGET_S = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "1500"))


def main() -> int:
    from cccatalog_spark.plans.queries import all_queries
    from cccatalog_spark.session import get_spark

    spark = get_spark("cccatalog-bench")
    queries = all_queries()

    # warm the JVM + parquet footers so q01 isn't charged for JIT/startup,
    # and spawn the Python UDF workers (one per core; they're long-lived
    # in production) so the first mapInPandas query isn't charged ~10s of
    # interpreter startup
    queries["q01_pricing_summary"](spark, SF_DIR).count()
    n_workers = spark.sparkContext.defaultParallelism
    spark.range(0, n_workers * 10, 1, n_workers).mapInPandas(
        lambda batches: (b for b in batches), "id long"
    ).count()

    timings: dict[str, float] = {}
    t_start = time.perf_counter()
    for name, fn in sorted(queries.items()):
        best = float("inf")
        runs = RUNS if (time.perf_counter() - t_start) < BUDGET_S else 1
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
            # dedup/LSH operators persist their index frames; drop them
            # so one run's cache doesn't speed up or crowd out the next
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

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
        "sf": sf_val,
    }
    line = json.dumps(payload)
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LOCAL.json"), "w"
        ) as f:
            f.write(line + "\n")
    except OSError:
        pass
    # full line first, tiny summary LAST (tail-capture-safe)
    print(line)
    print(
        json.dumps(
            {
                "metric": "query_inventory_total_wall",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
