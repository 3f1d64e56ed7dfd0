"""Benchmark: run the query inventory at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is driven to completion with a count-style action (full plan
executes; nothing is collected to the driver beyond the count).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


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
    for name, fn in sorted(queries.items()):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        # dedup/LSH operators persist their index frames; drop them so
        # one query's cache doesn't occupy memory for the next
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "query_inventory_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
