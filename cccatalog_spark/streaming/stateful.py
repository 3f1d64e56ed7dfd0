"""Custom stateful streaming operators via ``applyInPandasWithState``
— the escape hatch for semantics Structured Streaming's built-in
aggregations can't express (SURVEY §2.9: the reference's
upsert-on-conflict state and continue-token accumulations are keyed
state updated per micro-batch; here that pattern is engine-native).

``running_counts``: per-key totals carried across micro-batches in the
state store — the streaming form of the ImageStore running totals
(A12). The same skeleton (state in, Arrow batches in, rows + new state
out) hosts continue-token session merging (wikimedia_commons.py:
110-222) or streaming dedup-by-key.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_counts(stream: DataFrame, key_col: str) -> DataFrame:
    """Streaming per-key running row counts.

    State: one long per key. Each micro-batch adds its rows to the
    key's total and emits the updated total — exactly-once per trigger
    in update mode. State size is O(distinct keys); pair with a
    timeout (GroupStateTimeout) when keys churn at 100 TB.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({key_col: [key[0]], "n": [total]})

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} string, n long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
