"""S8 — paginated REST API source, engine half (SURVEY §2.1).

The reference runs 18 per-provider ingestion scripts as driver-side
loops: build query params, GET a page, decode JSON, follow pagination
(page number / continue token / cursor / hash-prefix+offset), rate
limited by ``DelayedRequester`` (common/requester.py:9-60; flickr
flickr.py:77-188; europeana cursor europeana.py:66-127; smithsonian
hash-prefix smithsonian.py:114-231).

Spark-first shape: the unit of parallelism is the REQUEST SLICE (a
time window, a hash prefix, a cursor seed) — a small DataFrame of
slice parameters fans out across executors, and each task walks its
slice's page chain inside ``mapInPandas``, yielding item rows as Arrow
batches. Network is injected as a callable so the engine half is fully
testable offline (the same boundary as the multimodal codec,
operators/multimodal.py): a deployment passes a requests-backed
fetcher; tests pass a deterministic fake.

Why this scales: slices are independent (no shuffle anywhere — the
only exchange is the initial round-robin of slice rows), page chains
are walked sequentially WITHIN a slice exactly like the reference's
loop, and the per-partition rate limiter reproduces
``DelayedRequester``'s minimum-interval contract per executor core —
aggregate request rate = cores × 1/interval, the knob the reference
tunes per provider.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame

# fetch_page(slice_params, page_token) -> (items, next_token).
# ``items`` is a list of dicts matching item_schema; next_token None
# ends the slice's chain (the reference's 'batchcomplete' / absent
# cursor / empty page).
FetchPage = Callable[
    [dict[str, Any], Any], tuple[list[dict[str, Any]], Any]
]


class RateGate:
    """DelayedRequester's minimum-interval gate (requester.py:9-34):
    at most one request per ``interval`` seconds per task."""

    def __init__(self, interval: float) -> None:
        self.interval = interval
        self._last = 0.0

    def wait(self) -> None:
        if self.interval <= 0:
            return
        now = time.monotonic()
        delta = now - self._last
        if delta < self.interval:
            time.sleep(self.interval - delta)
        self._last = time.monotonic()


def paginated_api_frame(
    slices: DataFrame,
    fetch_page: FetchPage,
    item_schema: str,
    *,
    max_pages_per_slice: int = 100,
    request_interval: float = 0.0,
    num_tasks: int | None = None,
) -> DataFrame:
    """Fan a frame of request-slice parameter rows out across
    executors; walk each slice's page chain with ``fetch_page``; return
    the item rows under ``item_schema`` (which must include the slice
    key columns the caller wants to keep — each yielded item dict is
    augmented with its slice's params under their column names).

    ``max_pages_per_slice`` is the reference's loop bound
    (MEAN_GLOBAL_USAGE_LIMIT-style runaway guard, wikimedia:122).
    """
    work = slices
    if num_tasks:
        work = work.repartition(num_tasks)

    slice_cols = slices.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gate = RateGate(request_interval)
        for pdf in batches:
            out: list[dict[str, Any]] = []
            for rec in pdf.to_dict("records"):
                token: Any = None
                for _ in range(max_pages_per_slice):
                    gate.wait()
                    items, token = fetch_page(rec, token)
                    for it in items:
                        out.append({**rec, **it})
                    if token is None:
                        break
            if out:
                yield pd.DataFrame(out)

    return work.mapInPandas(run, item_schema)
