"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at the given
sf, compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
       python tools/check_oracle.py --json OUT.json [sf_dir] [query ...]

With --json, also writes a driver-format artifact (one object per query
with rows_match/schema_match/hash_match/spark_rows/oracle_rows/err) so a
full-inventory run can be committed as CORRECTNESS_LOCAL_r{N}.json.
"""

from __future__ import annotations

import json
import math
import sys

import duckdb

sys.path.insert(0, ".")


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return repr(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(out)


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entry_mod
    from cccatalog_spark.session import get_spark

    spark = get_spark("oracle-check", cpus=8)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    report: dict[str, dict] = {}

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        report[name] = rec
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            try:
                s_rows = [tuple(r) for r in sdf.collect()]
            except Exception as first:
                # one retry: a 248-query marathon in a single JVM can
                # hit transient executor/codegen hiccups (the r4 q167
                # collectToPython flake) that a fresh evaluation of
                # the same deterministic plan does not reproduce
                print(f"RETRY {name}: first collect failed: {first}")
                s_rows = [tuple(r) for r in fn(spark, sf_dir).collect()]
            rec["spark_rows"] = len(s_rows)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            rec["err"] = f"spark: {e}"
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(s_rows)} rows, no oracle)")
            rec["err"] = "no_oracle"
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
            rec["oracle_rows"] = len(d_rows)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            rec["err"] = f"duckdb: {e}"
            failures.append(name)
            continue
        problems = []
        rec["schema_match"] = sorted(s_cols) == sorted(d_cols)
        if not rec["schema_match"]:
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        rec["rows_match"] = len(s_rows) == len(d_rows)
        if not rec["rows_match"]:
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            sc = _canon(s_rows, s_cols)
            dc = _canon(d_rows, d_cols)
            rec["hash_match"] = sc == dc
            if not rec["hash_match"]:
                diff = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        else:
            rec["hash_match"] = False
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
    spark.stop()
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_out} ({len(report)} queries)")
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall queries match the oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
