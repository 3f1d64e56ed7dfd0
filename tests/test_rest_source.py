"""S8 REST source engine half: slice fan-out, page-chain walk,
runaway-page guard, DelayedRequester-style rate gate
(common/requester.py:9-60; flickr.py:77-188)."""

from __future__ import annotations

import time

from cccatalog_spark.sources.rest import RateGate, paginated_api_frame


def test_paginated_source_walks_each_slice_chain(spark):
    # closure, not module-level: executors can't import test modules,
    # cloudpickle serializes closures by value
    def _fetch(params, token):
        s = params["slice"]
        page = 0 if token is None else token
        items = [{"item_id": s * 10 + page}]
        return items, (page + 1 if page < 2 else None)

    slices = spark.createDataFrame([(0,), (1,), (2,)], "slice long")
    out = paginated_api_frame(
        slices, _fetch, "slice long, item_id long", num_tasks=3
    ).collect()
    got = sorted((r["slice"], r["item_id"]) for r in out)
    assert got == [
        (0, 0), (0, 1), (0, 2),
        (1, 10), (1, 11), (1, 12),
        (2, 20), (2, 21), (2, 22),
    ]


def test_paginated_source_page_guard_bounds_runaway_chain(spark):
    def never_ends(params, token):
        page = 0 if token is None else token
        return [{"item_id": page}], page + 1  # never returns None

    slices = spark.createDataFrame([(0,)], "slice long")
    out = paginated_api_frame(
        slices, never_ends, "slice long, item_id long",
        max_pages_per_slice=7,
    ).collect()
    assert len(out) == 7  # MEAN_GLOBAL_USAGE_LIMIT-style bound


def test_rate_gate_enforces_min_interval():
    gate = RateGate(0.05)
    t0 = time.monotonic()
    for _ in range(3):
        gate.wait()
    assert time.monotonic() - t0 >= 0.09  # ≥2 full intervals after first


def test_rate_gate_zero_interval_is_free():
    gate = RateGate(0.0)
    t0 = time.monotonic()
    for _ in range(1000):
        gate.wait()
    assert time.monotonic() - t0 < 0.5
