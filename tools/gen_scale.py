"""Scale-up fixture builder for the scaling-curve bench (BENCH_SCALING).

Builds an sf0.{K/10} directory by key-offset replication of the
driver-generated sf0.1 tables: every fact/dim key space is shifted per
replica so referential integrity holds and per-key group sizes stay
constant while table row counts grow Kx — the property a scaling curve
needs (a super-linear wall-time ratio then indicts the PLAN, not the
data shape).

Two deliberate perturbations keep the corpus honest:
- documents: replicas > 0 get a GROWING vocabulary via a LENGTH-
  PRESERVING per-replica seeded alphabet permutation (so the feature
  space grows with the corpus, Heaps-law-style, and per-feature
  document frequency stays constant instead of growing Kx — while
  text length, token counts, and chunking statistics stay identical
  to the source), plus a unique per-doc suffix token (and a
  recomputed n_chars) so exact/near-dup pair counts don't explode
  with fake Kx duplicates.  A fixed shared vocabulary would
  manufacture quadratic df growth in exact similarity joins (Σ df²
  candidates) that no real corpus exhibits — the round-6 q376 lesson;
  a token-suffix transform was tried first and REJECTED: it grew
  replica text ~1.33x, super-linearizing every per-character operator
  (CDC chunking hit 6x at a 3x data ratio);
- embeddings: replicas > 0 get deterministic per-replica noise so ANN
  buckets don't fill with exact clones.

The driver's testdata is READ-ONLY; output goes under the repo's
gitignored .scratch/ dir.

Usage: python tools/gen_scale.py [K] [out_dir]
       (default K=3 -> .scratch/sf0.3)
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# table -> {column: key-space it belongs to}; every key column shifts
# by replica * (max(key space at sf0.1) + 1)
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "order",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
SPACES = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}
COPY_ONLY = ["region", "nation"]


def _space_bases() -> dict[str, int]:
    bases = {}
    for space, (table, col) in SPACES.items():
        t = pq.read_table(os.path.join(SRC, f"{table}.parquet"), columns=[col])
        bases[space] = int(pc.max(t[col]).as_py()) + 1
    return bases


def _replica(table: str, t: pa.Table, i: int, bases: dict[str, int]) -> pa.Table:
    if i == 0 and table not in ("documents", "embeddings"):
        return t
    out = t
    for col, space in KEYED.get(table, {}).items():
        if i > 0:
            idx = out.schema.get_field_index(col)
            shifted = pc.add(out[col], i * bases[space]).cast(t.schema.field(col).type)
            out = out.set_column(idx, t.schema.field(col), shifted)
    if table == "documents" and i > 0:
        ids = out["doc_id"].to_pylist()
        texts = out["text"].to_pylist()
        lo = "abcdefghijklmnopqrstuvwxyz"
        hi = lo.upper()
        # Seeded full alphabet permutation, not a rotation: a rotation
        # has only 26 distinct values, so replicas 26, 52, ... would
        # reuse the base vocabulary verbatim and the quadratic
        # per-feature-df artifact this fixture removes would return at
        # replication factors >= 26 (round-7 advice). A permutation is
        # equally length/frequency/boundary-preserving and is distinct
        # for every replica.
        perm = list(lo)
        random.Random(1000 + i).shuffle(perm)
        perm = "".join(perm)
        shift = str.maketrans(lo + hi, perm + perm.upper())
        texts = [
            f"{txt.translate(shift)} rep{i}tok{d}"
            if txt is not None
            else None
            for txt, d in zip(texts, ids)
        ]
        n_chars = [len(x) if x is not None else None for x in texts]
        out = out.set_column(
            out.schema.get_field_index("text"),
            t.schema.field("text"),
            pa.array(texts, type=t.schema.field("text").type),
        )
        out = out.set_column(
            out.schema.get_field_index("n_chars"),
            t.schema.field("n_chars"),
            pa.array(n_chars, type=t.schema.field("n_chars").type),
        )
    if table == "embeddings" and i > 0:
        embs = out["embedding"].to_pylist()
        rng = np.random.default_rng(42 + i)
        noisy = []
        for e in embs:
            v = np.asarray(e, dtype=np.float32)
            v = v + rng.normal(0.0, 0.02, size=v.shape).astype(np.float32)
            noisy.append(v.tolist())
        out = out.set_column(
            out.schema.get_field_index("embedding"),
            t.schema.field("embedding"),
            pa.array(noisy, type=t.schema.field("embedding").type),
        )
    return out


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    label = f"sf{k / 10:.1f}"  # k=3 -> sf0.3, k=10 -> sf1.0
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", label)
    )
    os.makedirs(out_dir, exist_ok=True)
    bases = _space_bases()
    for table in COPY_ONLY:
        t = pq.read_table(os.path.join(SRC, f"{table}.parquet"))
        pq.write_table(t, os.path.join(out_dir, f"{table}.parquet"))
        print(f"{table}: {t.num_rows} rows (copied)")
    for table in KEYED:
        t = pq.read_table(os.path.join(SRC, f"{table}.parquet"))
        reps = [_replica(table, t, i, bases) for i in range(k)]
        big = pa.concat_tables(reps)
        pq.write_table(big, os.path.join(out_dir, f"{table}.parquet"))
        print(f"{table}: {t.num_rows} -> {big.num_rows} rows")
    print(f"wrote {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
