"""hll_distinct_stream register math (streaming/stateful.py) — the
Python state transition must match the batch sketch's column algebra
(functions/sketches.py) bit-for-bit, which is what q341's oracle
relies on."""

from __future__ import annotations

import hashlib
import math

from cccatalog_spark.functions.sketches import hll_distinct


def _py_regs(values):
    regs = [0] * 256
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        j, w = h % 256, h // 256
        rho = 53 if w == 0 else (w & -w).bit_length()
        regs[j] = max(regs[j], rho)
    return regs


def _py_estimate(regs):
    from cccatalog_spark.functions.sketches import _HLL_ALPHA_M2

    n_used = sum(1 for r in regs if r > 0)
    z = float(256 - n_used) + sum(2.0 ** -r for r in regs if r > 0)
    e_raw = _HLL_ALPHA_M2 / z
    if e_raw <= 2.5 * 256 and n_used < 256:
        return round(256.0 * math.log(256.0 / float(256 - n_used)), 4)
    return round(e_raw, 4)


def test_python_state_matches_batch_sketch(spark):
    vals = [f"user{i % 77}" for i in range(500)]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v string")
    batch = hll_distinct(df, ["g"], "v").collect()[0]
    regs = _py_regs(vals)
    assert _py_estimate(regs) == batch["hll_distinct"]
    assert sum(1 for r in regs if r > 0) == batch["n_used"]


def test_register_merge_is_batch_order_independent():
    a = _py_regs([f"x{i}" for i in range(100)])
    # same values split across "batches" in a different order
    b1 = _py_regs([f"x{i}" for i in range(50, 100)])
    b2 = _py_regs([f"x{i}" for i in range(50)])
    merged = [max(x, y) for x, y in zip(b1, b2)]
    assert merged == a


def test_linear_counting_branch_small_cardinality():
    regs = _py_regs(["a", "b", "c"])
    est = _py_estimate(regs)
    assert abs(est - 3.0) < 0.1
