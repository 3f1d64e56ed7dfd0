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


def dedup_first_seen(
    stream: DataFrame,
    key_col: str,
    payload_schema: str,
    order_cols: list[str],
) -> DataFrame:
    """Streaming dedup-by-key: emit each key's FIRST row only, across
    all micro-batches — the exactly-once ingest primitive (a replayed
    or duplicated upstream row can never re-enter the corpus).

    State per key: one seen-flag (a long). Within a trigger the key's
    rows are ordered by ``order_cols`` (total order — callers include
    a unique id as the last column) and the head row is emitted iff
    the key was never seen before; later triggers emit nothing for it.
    Emission is deterministic given the trigger order (the loader's
    oldest-first file gate, streaming/loader.py).

    ``payload_schema`` is the full output schema DDL, e.g.
    ``"user_id long, event_type string, sec long"`` — the key column
    plus the payload columns, all present in the input stream.
    """

    # resolve output column names DRIVER-side: DDL parsing needs the
    # JVM session, which doesn't exist inside the state function
    out_cols = [f.name for f in _ddl_fields(payload_schema)]

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # a seen key can never emit again — skip the per-chunk sorting
        # entirely (guide §4.2; the chunks are left unconsumed, which
        # the serializer's lazy slicing supports)
        if state.exists:
            yield pd.DataFrame({c: [] for c in out_cols})
            return
        best: pd.DataFrame | None = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            head = pdf.sort_values(order_cols).head(1)
            both = head if best is None else pd.concat([best, head])
            best = both.sort_values(order_cols).head(1)
        if best is None:
            yield pd.DataFrame({c: [] for c in out_cols})
        else:
            state.update((1,))
            yield best[out_cols]

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=payload_schema,
        stateStructType="seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _ddl_fields(ddl: str):
    from pyspark.sql.types import StructType

    return StructType.fromDDL(ddl).fields


def dedup_within_watermark(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    delay: str,
) -> DataFrame:
    """Engine-native replay dedup: keep the first arrival per key,
    dropping re-deliveries that arrive within ``delay`` of the
    watermark (`dropDuplicatesWithinWatermark`) — the built-in
    alternative to ``dedup_first_seen``'s custom keyed state when
    at-least-once delivery has a bounded replay horizon.

    The trade: state for a key expires ``delay`` past the watermark
    (bounded state — the point), so a duplicate arriving later than
    that re-emits; the custom-state form above never forgets but must
    manage its own state size. Pick by replay horizon.
    """
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def ewma_tracker(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    order_col: str,
    alpha: float,
) -> DataFrame:
    """Per-key exponentially-weighted moving average carried across
    micro-batches — the quality/latency drift tracker of a streaming
    ingest pipeline.

    Semantics: rows of a key are folded in ``order_col`` order within
    each batch (callers make that a total order and deliver batches in
    non-decreasing order ranges, the loader's oldest-first contract);
    ``s := x`` on the first row, ``s := alpha*x + (1-alpha)*s`` after.
    Each trigger emits the key's updated ``(n, ewma)`` — the latest
    emission (max ``n``) is the current value, and under a bounded
    replay the fold equals the batch closed form
    ``sum alpha*(1-alpha)^(n-i)*x_i`` (+ the seed term), which is what
    the exact oracle computes.

    State: one (double, long) per key — O(distinct keys), RocksDB-
    backed at scale; add a GroupStateTimeout when keys churn. Spark
    4's ``transformWithStateInPandas`` (StatefulProcessor +
    ValueState) is the successor API for this operator; its driver
    worker needs the ``google.protobuf`` package, absent from this
    environment, so the operator rides the stable
    ``applyInPandasWithState`` surface with identical state semantics.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        s, n = state.get if state.exists else (0.0, 0)
        # fold over plain Python floats in order_col order (guide §4.2:
        # no per-row pandas objects). np.argsort(stable) + .tolist()
        # replaces sort_values().iterrows() — identical IEEE arithmetic
        # (the fold itself is unchanged), ~50x less per-row overhead.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
            order = np.argsort(batch[order_col].to_numpy(), kind="stable")
            xs = batch[value_col].to_numpy(dtype="float64")[order].tolist()
            for x in xs:
                s = x if n == 0 else alpha * x + (1.0 - alpha) * s
                n += 1
        state.update((float(s), int(n)))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "ewma": [s]})

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} long, n long, ewma double",
        stateStructType="s double, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def quota_admit(
    stream: DataFrame,
    key_col: str,
    order_cols: list[str],
    quota: int,
    payload_schema: str,
) -> DataFrame:
    """Streaming per-key admission quota: admit each key's first
    ``quota`` rows (in ``order_cols`` order, across all micro-batches)
    and drop the rest — the ingest cap that stops one hot source/
    domain from flooding a corpus between rebalances
    (:func:`cccatalog_spark.operators.sampling.token_budget_take` is
    the batch sibling; this is its incremental form).

    State per key: one admitted-count long. Deterministic under the
    loader's ordered-batch replay contract, which is what puts it
    under an exact row_number-based oracle. ``payload_schema`` is the
    output DDL (key + payload columns present in the stream).
    """

    out_cols = [f.name for f in _ddl_fields(payload_schema)]

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        admitted = state.get[0] if state.exists else 0
        if admitted >= quota:
            # quota exhausted: nothing can ever be admitted again —
            # skip the sort, leave state as-is (identical value)
            yield pd.DataFrame({c: [] for c in out_cols})
            return
        chunks = [pdf for pdf in pdfs if len(pdf)]
        batch = (
            chunks[0] if len(chunks) == 1
            else pd.concat(chunks) if chunks
            else pd.DataFrame({c: [] for c in out_cols})
        )
        take = max(0, quota - admitted)
        head = batch.sort_values(order_cols).head(take)
        state.update((int(admitted + len(head)),))
        yield head[out_cols] if len(head) else pd.DataFrame(
            {c: [] for c in out_cols}
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=payload_schema,
        stateStructType="admitted long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def match_sequence_stream(
    stream: DataFrame,
    key_col: str,
    time_col: str,
    type_col: str,
    steps: list[str],
    *,
    within: int,
    tiebreak_col: str,
) -> DataFrame:
    """Streaming twin of ``operators.temporal.match_event_sequence``:
    the greedy CEP automaton (all non-overlapping matches, skip-past-
    last-row, window-violation retry) carried across micro-batches in
    keyed state.

    State is BOUNDED by construction: only events of the pattern's
    types are buffered, and only from the current unresolved anchor
    onward — an anchor older than ``max_seen − within`` can never
    complete inside the window (later steps only get later), so it is
    retried immediately and the buffer never spans more than
    ``within`` seconds of step-type events. Under the loader's
    ordered-replay contract the drained output equals the batch
    operator exactly (pinned by test and by the recursive-CTE oracle).
    """
    # kinds buffer distinct-TYPE ids (not step positions): a pattern
    # with a repeated step type (['view','view','purchase']) matches an
    # event against every step wanting its type, same as the batch twin.
    type_ids = {t: i for i, t in enumerate(dict.fromkeys(steps))}
    want_kind = [type_ids[s] for s in steps]
    n_steps = len(steps)
    key_type = dict(
        (f.name, f.dataType.simpleString()) for f in stream.schema.fields
    )[key_col]
    out_schema = (
        f"{key_col} {key_type}, match_n int, start_sec long, end_sec long"
    )
    state_schema = (
        "secs array<long>, eids array<long>, kinds array<int>, done long"
    )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            secs, eids, kinds, done = state.get
            buf = list(zip(secs, eids, kinds))
        else:
            buf, done = [], 0
        new_rows = []
        for pdf in pdfs:
            for sec, eid, t in zip(
                pdf[time_col], pdf[tiebreak_col], pdf[type_col]
            ):
                if t in type_ids:
                    new_rows.append((int(sec), int(eid), type_ids[t]))
        new_rows.sort()
        buf.extend(new_rows)  # ordered replay: new batch >= buffered
        out_m, out_s, out_e = [], [], []
        ptr = 0
        max_seen = buf[-1][0] if buf else None
        while True:
            i = ptr
            while i < len(buf) and buf[i][2] != want_kind[0]:
                i += 1
            if i >= len(buf):
                ptr = len(buf)
                break
            cur, idx0, complete = i, i, True
            for want in range(1, n_steps):
                j = cur + 1
                while j < len(buf) and buf[j][2] != want_kind[want]:
                    j += 1
                if j >= len(buf):
                    complete = False
                    break
                cur = j
            if not complete:
                # candidate runs off the batch; if the anchor already
                # expired it can never complete -> retry, else wait
                if buf[idx0][0] < max_seen - within:
                    ptr = idx0 + 1
                    continue
                ptr = idx0
                break
            if buf[cur][0] - buf[idx0][0] <= within:
                done += 1
                out_m.append(int(done))
                out_s.append(buf[idx0][0])
                out_e.append(buf[cur][0])
                ptr = cur + 1
            else:
                ptr = idx0 + 1
        buf = buf[ptr:]
        state.update(
            (
                [b[0] for b in buf],
                [b[1] for b in buf],
                [b[2] for b in buf],
                done,
            )
        )
        if out_m:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(out_m),
                    "match_n": out_m,
                    "start_sec": out_s,
                    "end_sec": out_e,
                }
            )

    # project/filter before the exchange (guide §2.3): rows of
    # non-pattern types never enter the buffer, never move max_seen
    # (it is derived from buffered step-type rows only) and never
    # emit; a key whose batch rows are all non-pattern would re-run
    # the automaton on an unchanged buffer — a no-op. Dropping them
    # in the scan stage shrinks the shuffle, the Python crossing and
    # the per-key dispatch count with an identical drained output.
    from pyspark.sql import functions as _F

    filtered = stream.where(
        _F.col(type_col).isin(list(type_ids))
    ).select(key_col, time_col, type_col, tiebreak_col)

    return filtered.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def lsh_bucket_claims(
    banded_stream: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming LSH near-dup screen, bucket stage: keyed state per
    LSH band bucket ``(band, bsig)`` remembering the first document
    that claimed it. Each input row (one doc x one band, produced by
    the same banded-signature column algebra as the batch LSH —
    operators/dedup._banded_sig — which runs unchanged on a stream)
    emits ``(band, bsig, doc_id, owner_id, is_first)``: ``owner_id``
    the bucket's established owner, ``is_first`` whether THIS row
    established it. A document that owns none of its buckets collided
    with earlier documents on every band — the streaming analog of
    the batch LSH candidate test, decided per micro-batch with O(1)
    state per bucket and no joins.

    Within a trigger, ties go to the smallest ``id_col`` (sorted
    before the claim), so replays and same-batch races are
    deterministic. Downstream, a per-doc batch aggregate over the
    sink (``min(is_first ? 1 : 0)``... i.e. "no bucket owned") yields
    the near-dup-candidate flag; candidates then verify with the
    exact Jaccard join, as in the batch path.

    State never expires here (corpus dedup wants full history); at
    100 TB bound it by sharding buckets across jobs or adding an
    EventTimeTimeout when the dedup horizon is finite.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = [pdf for pdf in pdfs if len(pdf)]
        if not rows:
            yield pd.DataFrame(
                {
                    "band": [], "bsig": [], id_col: [],
                    "owner_id": [], "is_first": [],
                }
            )
            return
        batch = rows[0] if len(rows) == 1 else pd.concat(rows)
        ids = batch[id_col].to_numpy()
        if state.exists:
            owner = state.get[0]
            first_mask = [False] * len(batch)
        else:
            # the claim only needs the MINIMUM id (same tie rule as the
            # previous sorted-head form); no per-group sort (guide
            # §4.2) — output row order is irrelevant downstream (the
            # consumer is a per-doc aggregate)
            owner = int(ids.min())
            state.update((owner,))
            first_mask = (ids == owner).tolist()
        yield pd.DataFrame(
            {
                "band": batch["band"].values,
                "bsig": batch["bsig"].values,
                id_col: ids,
                "owner_id": [owner] * len(batch),
                "is_first": first_mask,
            }
        )

    return banded_stream.groupBy("band", "bsig").applyInPandasWithState(
        update,
        outputStructType=(
            f"band int, bsig string, {id_col} long, owner_id long,"
            " is_first boolean"
        ),
        stateStructType="owner long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def heavy_hitters_topk(
    stream: DataFrame,
    key_col: str,
    capacity: int = 8,
    n_shards: int = 4,
) -> DataFrame:
    """Streaming heavy hitters by sharded SpaceSaving (Metwally,
    Agrawal & El Abbadi, ICDT'05) — "which keys dominate the stream,
    in bounded memory" when the key domain is too large for an exact
    per-key state store. Each of ``n_shards`` hash shards keeps a
    ``capacity``-entry summary in state; when a new key arrives at a
    full summary it REPLACES the current minimum, inheriting its
    count as the overestimation error:

        est(k) ∈ [true(k), true(k) + err(k)]   (the SpaceSaving bound)

    Per trigger the shard emits its full summary (update mode);
    shard summaries merge downstream by summing ests per key (the
    standard Misra-Gries-family merge). When every shard's distinct
    keys fit in ``capacity`` the summary is EXACT (err 0) — the
    regime the oracle pins; tests pin the eviction path.

    Determinism: batch rows collapse to per-key counts first and
    summaries apply keys in sorted order, so the evicted victim never
    depends on partition order (ties break toward the smallest key,
    which holds the minimum slot after the sorted sweep).

    State per shard: three parallel arrays (keys, counts, errs) of
    length ≤ capacity — O(shards·capacity) total, independent of the
    stream's key cardinality; that bound is the operator's contract
    at 100 TB.
    """
    from pyspark.sql import functions as F

    if capacity < 1 or n_shards < 1:
        raise ValueError("capacity and n_shards must be >= 1")

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            keys, counts, errs = state.get
            summ = {
                k: [c, e] for k, c, e in zip(keys, counts, errs)
            }
        else:
            summ = {}
        batch: dict[str, int] = {}
        for pdf in pdfs:
            for k, c in pdf[key_col].value_counts().items():
                batch[k] = batch.get(k, 0) + int(c)
        for k in sorted(batch):
            c = batch[k]
            if k in summ:
                summ[k][0] += c
            elif len(summ) < capacity:
                summ[k] = [c, 0]
            else:
                victim = min(summ, key=lambda x: (summ[x][0], x))
                vcount = summ[victim][0]
                del summ[victim]
                summ[k] = [vcount + c, vcount]
        ks = sorted(summ)
        state.update(
            ([k for k in ks],
             [summ[k][0] for k in ks],
             [summ[k][1] for k in ks])
        )
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(ks),
                key_col: ks,
                "est": [summ[k][0] for k in ks],
                "err": [summ[k][1] for k in ks],
            }
        )

    sharded = stream.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=(
            f"shard long, {key_col} string, est long, err long"
        ),
        stateStructType=(
            "keys array<string>, counts array<long>, errs array<long>"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def hll_distinct_stream(
    stream: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Streaming per-key approximate COUNT(DISTINCT) with the
    256-register HLL as KEYED STATE — the sketch form of
    running_counts: exact distinct state grows with the key's value
    cardinality, this is 256 ints per key forever (the only
    COUNT(DISTINCT) that exists on an unbounded stream).

    Registers use functions/sketches' md5-derandomized hash layout
    (same bucket/rho algebra bit-for-bit), and register max is
    order- and batch-independent, so the final state equals the
    batch sketch of the same rows — which is exactly what lets a SQL
    oracle replay the "streaming" estimate.

    Emits per trigger: ``(key, n_used, hll_distinct)`` (estimate
    rounded 4, the hll_estimate convention, linear-counting branch
    included).
    """
    import hashlib
    import math as _m

    from pyspark.sql import functions as F  # noqa: F401 (parity import)

    from cccatalog_spark.functions.sketches import _HLL_ALPHA_M2

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        regs = list(state.get[0]) if state.exists else [0] * 256
        for pdf in pdfs:
            for v in pdf[value_col]:
                h = int(
                    hashlib.md5(str(v).encode("utf-8")).hexdigest()[:15],
                    16,
                )
                j = h % 256
                w = h // 256
                rho = 53 if w == 0 else (w & -w).bit_length()
                if rho > regs[j]:
                    regs[j] = rho
        state.update((regs,))
        n_used = sum(1 for r in regs if r > 0)
        z = float(256 - n_used) + sum(
            2.0 ** -r for r in regs if r > 0
        )
        e_raw = _HLL_ALPHA_M2 / z
        if e_raw <= 2.5 * 256 and n_used < 256:
            est = 256.0 * _m.log(256.0 / float(256 - n_used))
        else:
            est = e_raw
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_used": [n_used],
                "hll_distinct": [round(est, 4)],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} string, n_used int, hll_distinct double"
        ),
        stateStructType="regs array<int>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def page_hinkley_tracker(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    order_col: str,
    delta: float,
    threshold: float,
) -> DataFrame:
    """Per-key Page-Hinkley mean-shift monitor carried across
    micro-batches — the ONLINE form of operators/temporal.page_hinkley
    (same recursion: running mean m_t, U_t = Σ(x_i − m_i − δ), alarm
    when U_t − min U > λ), for drift-watching a quality-score stream
    as it ingests.  Rows fold in ``order_col`` order within each batch
    under the loader's oldest-first batch contract, so the fold equals
    the batch-mode prefix windows and the exact SQL oracle replays it.

    Each trigger emits the key's updated ``(n, ph_max, n_alarms,
    first_alarm_ord)``; the latest emission (max n) is current.

    State: six scalars + the first-alarm ordinal per key — O(distinct
    keys), RocksDB-backed at scale (same surface note as
    :func:`ewma_tracker` re transformWithStateInPandas).
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            n, s, u, minu, phmax, alarms, first = state.get
        else:
            n, s, u, minu, phmax, alarms, first = 0, 0.0, 0.0, 0.0, 0.0, 0, None
        # plain-float fold in order_col order (guide §4.2): argsort +
        # tolist replaces sort_values().iterrows(); the recursion below
        # is unchanged, so the IEEE arithmetic is identical
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
            ordv = batch[order_col].to_numpy()
            idx = np.argsort(ordv, kind="stable")
            xs = batch[value_col].to_numpy(dtype="float64")[idx].tolist()
            ords = ordv[idx].tolist()
            for x, o in zip(xs, ords):
                n += 1
                s += x
                u += x - s / n - delta
                # prefix-min of U INCLUDING the current row (the batch
                # twin's window frame) — the first row's min is itself
                minu = u if n == 1 else min(minu, u)
                ph = u - minu
                phmax = max(phmax, ph)
                if ph > threshold:
                    alarms += 1
                    if first is None:
                        first = int(o)
        state.update(
            (
                int(n),
                float(s),
                float(u),
                float(minu),
                float(phmax),
                int(alarms),
                first,
            )
        )
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n": [n],
                "ph_max": [phmax],
                "n_alarms": [alarms],
                "first_alarm_ord": [first],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} long, n long, ph_max double, n_alarms long, "
            "first_alarm_ord long"
        ),
        stateStructType=(
            "n long, s double, u double, minu double, phmax double, "
            "alarms long, first long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
