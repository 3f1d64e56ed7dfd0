"""Reingestion schedule generation — util/dag_factory.py:92-231 and
docs/image-data-reingestion-strategy.md:52-120 in the reference.

Providers re-ingest historical days in exponentially-thinning tiers:
recent days every run, older days progressively less often. The
reference builds Airflow task lists from ``dated_list_length_list``
day-shift tiers; here the same policy is a pure function producing
(provider, ingest_date) pairs — each pair is one batch query, which is
all the orchestration layer needs (SURVEY §7.0: orchestration holds
zero compute logic).
"""

from __future__ import annotations

import datetime as dt


def reingestion_day_shifts(tiers: list[tuple[int, int]]) -> list[int]:
    """Day-shift list from (gap, count) tiers, reference semantics:
    each tier appends ``count`` shifts spaced ``gap`` days after the
    previous shift. tiers=[(1,2),(7,3)] → [1, 2, 9, 16, 23]."""
    shifts: list[int] = []
    cur = 0
    for gap, count in tiers:
        for _ in range(count):
            cur += gap
            shifts.append(cur)
    return shifts


def reingestion_schedule(
    base_date: dt.date, tiers: list[tuple[int, int]], include_today: bool = True
) -> list[dt.date]:
    """Concrete ingest dates for one run: today plus each shifted day."""
    days = [base_date] if include_today else []
    days += [
        base_date - dt.timedelta(days=s) for s in reingestion_day_shifts(tiers)
    ]
    return days
