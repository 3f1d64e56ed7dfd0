"""Simulate the correctness driver: vanilla SparkSession (none of our
session tuning), entry() smoke at sf0.001, queries() vs oracle_sql()
via DuckDB at sf0.01."""

from __future__ import annotations

import math
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, ".")


def _type_cat(t: str) -> str:
    """Collapse a type name into a hash-compatibility category.

    The real driver hashes Arrow-normalized values type-sensitively: DuckDB
    sum(<integer>) returns HUGEINT (arrow decimal128) while Spark returns
    BIGINT, and that alone fails hash_match even when values are equal
    (round-1 verdict root cause). Mirror that here so it fails locally too.
    """
    t = t.lower()
    if "decimal" in t or "hugeint" in t:
        return "decimal"
    if any(k in t for k in ("int", "long", "short", "byte")):
        return "int"
    if any(k in t for k in ("float", "double", "halffloat")):
        return "float"
    return "other"


def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.10g}"
    import decimal, datetime

    if isinstance(v, decimal.Decimal):
        return f"{float(v):.10g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return repr(v)


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em

    df = em.entry(spark)
    rows = df.collect()
    print(f"entry(): {len(rows)} rows, schema={df.columns}")
    assert len(rows) > 0

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    qs, oracles = em.queries(), em.oracle_sql()
    bad = []
    for name, fn in sorted(qs.items()):
        sdf = fn(spark, sf)
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"ok?  {name}: rows-only {len(srows)}")
            continue
        tbl = con.execute(oracles[name]).arrow()
        dcols = list(tbl.schema.names)
        dtypes = {f.name: str(f.type) for f in tbl.schema}
        drows = [tuple(d[c] for c in dcols) for d in tbl.to_pylist()]
        scols = sdf.columns
        stypes = dict(sdf.dtypes)
        tmism = [
            c for c in scols
            if c in dtypes and _type_cat(stypes[c]) != _type_cat(dtypes[c])
        ]
        if tmism:
            bad.append(name)
            print(f"FAIL {name} TYPE-SENSITIVE hash mismatch: "
                  f"{[(c, stypes[c], dtypes[c]) for c in tmism]}")
            continue
        sidx = sorted(range(len(scols)), key=lambda i: scols[i])
        didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
        sset = sorted(tuple(norm(r[i]) for i in sidx) for r in srows)
        dset = sorted(tuple(norm(r[i]) for i in didx) for r in drows)
        if sorted(scols) != sorted(dcols) or sset != dset:
            bad.append(name)
            diffs = [(a, b) for a, b in zip(sset, dset) if a != b][:2]
            print(f"FAIL {name} cols={sorted(scols)==sorted(dcols)} "
                  f"rows={len(srows)}/{len(drows)} diffs={diffs}")
        else:
            print(f"PASS {name} ({len(srows)})")
    print("FAILURES:", bad or "none")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
