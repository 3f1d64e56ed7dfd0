"""The driver's correctness gate reads only the first 50 ``queries()``
entries in insertion order.  Pin the window so a refactor can't silently
push a composite operator query out of the hard driver signal."""

from __future__ import annotations

from cccatalog_spark.plans.queries import (
    DRIVER_WINDOW,
    all_oracles,
    all_queries,
)


def test_window_is_exactly_fifty_known_queries():
    qs = all_queries()
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    assert list(qs)[:50] == DRIVER_WINDOW


def test_every_window_query_is_oracle_paired():
    oracles = all_oracles()
    missing = [n for n in DRIVER_WINDOW if n not in oracles]
    assert missing == []


def test_oracles_follow_query_order():
    qs = list(all_queries())
    oracles = list(all_oracles())
    pos = {n: i for i, n in enumerate(qs)}
    assert oracles == sorted(oracles, key=pos.__getitem__)


def test_full_inventory_counts():
    qs = all_queries()
    oracles = all_oracles()
    # 423 = the frozen 422 + q423 (the round-7 STAGED CLIP retrieval
    # leg, promoted per the round-7 verdict with a driver-window seat)
    assert len(qs) == 423
    # every query is oracle-paired (q47/q50 gained literal-plane /
    # deterministic-quantizer oracles in round 3)
    assert sorted(set(qs) - set(oracles)) == []
