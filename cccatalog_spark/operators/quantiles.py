"""Exact distributed quantiles by iterative histogram refinement.

:func:`cccatalog_spark.functions.popularity.percentile_disc` computes
PostgreSQL ``percentile_disc`` parity by collecting the group's values
— exact, but documented as unusable for billion-row groups (its
docstring defers those to ``percentile_approx``). This module closes
that divergence: the same exact ``sorted_values[ceil(p*n)-1]`` datum,
computed with bounded driver state at any scale.

Algorithm (the classic iterative-refinement / BigQuery-style exact
quantile): maintain, per requested fraction, a candidate row set that
provably contains the answer and the answer's rank within it. Each
round runs ONE aggregate job that histograms every active fraction's
candidate set into ``bins`` buckets (a ≤ fractions×bins row result),
walks the cumulative counts driver-side, and descends into the bucket
containing the target rank — shrinking the candidate set ~``bins``×
per round. When a candidate set fits a bounded tail threshold, the
exact k-th smallest inside it is one ``TakeOrdered(k)`` job.

Robustness detail: candidate-set membership is re-expressed as the
CHAIN of bucket predicates that selected it (the same floor expression
used for counting), never re-derived from arithmetic bounds — so
floating-point boundary drift between "which bucket did the count see"
and "which rows does the next round scan" is impossible by
construction.

Scale shape at 100 TB: driver state is O(fractions × bins) counts per
round; the data is never sorted globally, never collected, and every
round is a single map-side-combinable aggregate over one cached scan.
Rounds are logarithmic (width ÷ bins each round). Contrast with
``sort + row_number`` (a full global sort) or single-partition
``WITHIN GROUP`` execution — both of which put the whole column
through one machine.

Reference anchor: the reference's popularity refresh runs Postgres
``percentile_disc`` server-side (util/popularity/sql.py:146-167);
this is the engine-side equivalent that survives when the metric
table outgrows one node.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _kth_smallest(pool: DataFrame, k: int):
    """Exact k-th smallest value of pool.v via TakeOrdered(k)."""
    row = pool.orderBy("v").limit(k).agg(F.max("v").alias("v")).collect()[0]
    return row["v"]


def _kth_smallest_batch(frame, items: list) -> dict:
    """Resolve MANY (predicate, k) k-th-smallest lookups over
    ``frame.v`` in ONE job.

    ``items``: list of ``(key, pred, k)``. Each item's candidate rows
    (≤ tail_threshold by the caller's invariant) are tagged with the
    item index, ranked by value within the tag, and the k-th smallest
    (duplicates counted) picked per tag — identical semantics to
    ``_kth_smallest`` per item, but one shuffle for the whole batch
    instead of one TakeOrdered job per (column, fraction).  This is
    what keeps ANALYZE-style multi-column stats from degenerating into
    #columns × #fractions sequential driver round-trips (guide §1.2:
    the per-task work was fine, the JOB COUNT was the bottleneck —
    measured 21 tail jobs → 1 on q150).
    """
    if not items:
        return {}
    structs = [
        F.when(pred, F.struct(F.lit(i).alias("q"), F.col("v").alias("v")))
        for i, (_key, pred, _k) in enumerate(items)
    ]
    ks = F.array(*[F.lit(int(k)) for (_key, _pred, k) in items])
    w = Window.partitionBy("q").orderBy("v")
    rows = (
        frame.select(
            F.explode(
                F.filter(F.array(*structs), lambda s: s.isNotNull())
            ).alias("s")
        )
        .select("s.q", "s.v")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == F.element_at(ks, F.col("q") + 1))
        .select("q", "v")
        .collect()
    )
    got = {r["q"]: r["v"] for r in rows}
    return {key: got.get(i) for i, (key, _pred, _k) in enumerate(items)}


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    fractions: list[float],
    *,
    bins: int = 128,
    tail_threshold: int = 65536,
    max_rounds: int = 64,
) -> list[tuple[float, float]]:
    """Exact ``percentile_disc`` for every fraction in one pass
    structure: returns ``[(fraction, value), ...]`` in input order.

    ``value`` is the smallest datum whose rank is ≥ ``ceil(f·n)`` —
    identical to PostgreSQL/DuckDB ``percentile_disc(f) WITHIN GROUP
    (ORDER BY v)`` over the non-null values.
    """
    for f in fractions:
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction out of [0,1]: {f}")
    base = (
        df.select(F.col(value_col).cast("double").alias("v"))
        .where(F.col("v").isNotNull())
        # spread across the cluster: inheriting a handful of file
        # partitions would make every refinement job a straggler
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
        .persist()
    )
    try:
        stats = base.agg(
            F.count("*").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        ).collect()[0]
        n = stats["n"]
        if n == 0:
            return [(f, None) for f in fractions]

        # per-fraction state: (lo, hi, k, pred, count, chain) — the
        # answer is the k-th smallest v among rows matching pred;
        # lo/hi are (approximate) bounds used only to parametrize the
        # next bucketing; count is the candidate-set size; chain is a
        # HASHABLE identity of the bucket-predicate chain (the bucket
        # indices descended so far) — fractions whose chains are equal
        # provably share (lo, hi, pred), so the histogram job tags
        # each row once per DISTINCT candidate set, not once per
        # fraction (in round 1 every fraction shares one set).
        results: dict[float, float] = {}
        states: dict[float, tuple] = {}
        for f in fractions:
            if f in states or f in results:
                continue
            k = max(1, math.ceil(f * n))
            states[f] = (
                float(stats["mn"]),
                float(stats["mx"]),
                k,
                F.lit(True),
                n,
                (),
            )

        for _ in range(max_rounds):
            # resolve finished / degenerate states — ALL in one job
            # (degenerate min == 1st smallest, so it rides the batch)
            ready: list = []
            for f, (lo, hi, k, pred, cnt, chain) in list(states.items()):
                width = (hi - lo) / bins
                if cnt <= tail_threshold:
                    ready.append((f, pred, k))
                    del states[f]
                elif width <= 0 or not math.isfinite(width) or (
                    # bucketing below float resolution can no longer
                    # split the set; every remaining value is within
                    # one representable step — take the exact minimum.
                    width <= max(abs(lo), abs(hi)) * 1e-15
                ):
                    ready.append((f, pred, 1))
                    del states[f]
            results.update(_kth_smallest_batch(base, ready))
            if not states:
                break

            # one histogram job over all DISTINCT active candidate sets
            sets: dict[tuple, tuple] = {}
            for f, (lo, hi, k, pred, cnt, chain) in states.items():
                sets.setdefault(chain, (lo, hi, pred))
            set_ids = {chain: i for i, chain in enumerate(sets)}
            structs = []
            for chain, (lo, hi, pred) in sets.items():
                width = (hi - lo) / bins
                b = F.floor((F.col("v") - F.lit(lo)) / F.lit(width))
                b = F.least(
                    F.greatest(b, F.lit(0)), F.lit(bins - 1)
                ).cast("int")
                structs.append(
                    F.when(
                        pred,
                        F.struct(
                            F.lit(set_ids[chain]).alias("q"), b.alias("b")
                        ),
                    )
                )
            hist = (
                base.select(
                    F.explode(
                        F.filter(
                            F.array(*structs), lambda s: s.isNotNull()
                        )
                    ).alias("s")
                )
                .groupBy("s.q", "s.b")
                .agg(F.count("*").alias("c"))
                .collect()
            )
            counts: dict[int, dict[int, int]] = {}
            for r in hist:
                counts.setdefault(r["q"], {})[r["b"]] = r["c"]

            for f, (lo, hi, k, pred, cnt, chain) in list(states.items()):
                width = (hi - lo) / bins
                b_counts = counts.get(set_ids[chain], {})
                cum = 0
                for b in range(bins):
                    c = b_counts.get(b, 0)
                    if cum + c >= k:
                        bucket_b = F.least(
                            F.greatest(
                                F.floor(
                                    (F.col("v") - F.lit(lo)) / F.lit(width)
                                ),
                                F.lit(0),
                            ),
                            F.lit(bins - 1),
                        ).cast("int")
                        states[f] = (
                            lo + b * width,
                            lo + (b + 1) * width if b < bins - 1 else hi,
                            k - cum,
                            pred & (bucket_b == b),
                            c,
                            chain + (b,),
                        )
                        break
                    cum += c
        # max_rounds exhausted (pathological distribution): the
        # candidate sets are still bounded-shrinking; finish exact.
        results.update(
            _kth_smallest_batch(
                base,
                [(f, st[3], st[2]) for f, st in states.items()],
            )
        )
        return [(f, results[f]) for f in fractions]
    finally:
        base.unpersist()


def exact_quantiles_df(
    spark,
    df: DataFrame,
    value_col: str,
    fractions: list[float],
    **kwargs,
) -> DataFrame:
    """DataFrame wrapper: (fraction double, value double) — the
    result set is |fractions| rows, built from the driver-side exact
    computation."""
    rows = exact_quantiles(df, value_col, fractions, **kwargs)
    return spark.createDataFrame(rows, "fraction double, value double")


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Per-group weighted (lower) median: the smallest value whose
    cumulative weight reaches half the group's total — e.g. the
    token-weighted median quality score, where long documents should
    pull the statistic proportionally.

    One exchange keyed by group + two streaming windows (ordered
    cumulative weight, then the threshold pick) — no collect_list,
    spillable sorts, billion-row groups hold (same discipline as
    :func:`exact_quantiles` and quality.robust_outliers).
    Returns (group, wmedian, total_weight).
    """
    wo = Window.partitionBy(group_col).orderBy(
        F.col(value_col), F.col(weight_col)
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wg = Window.partitionBy(group_col)
    cum = (
        df.withColumn("__cw", F.sum(weight_col).over(wo))
        .withColumn("__tw", F.sum(weight_col).over(wg))
    )
    pick = F.when(
        F.col("__cw") * 2 >= F.col("__tw"), F.col(value_col)
    )
    return (
        cum.withColumn("__pick", pick)
        .groupBy(group_col)
        .agg(
            F.min("__pick").alias("wmedian"),
            F.max("__tw").alias("total_weight"),
        )
    )


def exact_quantiles_multi(
    df: DataFrame,
    value_cols: list[str],
    fractions: list[float],
    *,
    bins: int = 64,
    tail_threshold: int = 65536,
    max_rounds: int = 64,
    base_stats_out: dict | None = None,
) -> dict[str, list[tuple[float, float]]]:
    """Exact ``percentile_disc`` for SEVERAL columns in one shared
    pass structure: the table is melted to (column-id, value) ONCE,
    cached once, and every refinement round histograms ALL still-active
    (column, fraction) candidate sets in a single aggregate job — the
    ANALYZE-grade form of :func:`exact_quantiles` (which this
    generalizes; n columns no longer means n cached scans).

    ``base_stats_out``: optional dict the caller provides to ALSO
    receive ANALYZE-grade base statistics per column —
    ``{col: (n_rows, n_nulls, min, max, ndv)}`` — fused into the same
    melt pass and its first aggregate (guide §1.2: don't rescan the
    corpus for stats the melt already carries; ``column_stats``
    previously paid a second full scan + a 5-agg-per-column expand for
    these). Exactness note: values are folded through the melt's
    ``double`` cast, so distinct counts require value-preserving
    numeric columns (identity for double/float/int ≤ 2^53 — every
    column this engine's stats surface accepts).

    Returns {column: [(fraction, value), ...]}.
    """
    for f in fractions:
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction out of [0,1]: {f}")
    with_stats = base_stats_out is not None
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).alias("c"),
                        F.col(col).cast("double").alias("v"),
                    )
                    for ci, col in enumerate(value_cols)
                ]
            )
        ).alias("s")
    ).select("s.c", "s.v")
    if not with_stats:
        # quantiles ignore nulls; without the stats request they are
        # dropped before the cache (smaller cached frame)
        melted = melted.where(F.col("v").isNotNull())
    # spread the melt across the cluster: the parent's file-partition
    # count (often a handful of parquet files) would otherwise make
    # every refinement job a straggler over 3 fat cached partitions
    melted = melted.repartition(
        df.sparkSession.sparkContext.defaultParallelism
    ).persist()
    try:
        first_aggs = [
            F.count("v").alias("n"),  # non-null count (quantile pool)
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        ]
        if with_stats:
            first_aggs += [
                F.count(F.lit(1)).alias("n_rows"),
                F.count_distinct(F.col("v")).alias("ndv"),
            ]
        base_stats = {
            r["c"]: r
            for r in melted.groupBy("c").agg(*first_aggs).collect()
        }
        if with_stats:
            for ci, col in enumerate(value_cols):
                st = base_stats.get(ci)
                base_stats_out[col] = (
                    (0, 0, None, None, 0)
                    if st is None
                    else (
                        st["n_rows"],
                        st["n_rows"] - st["n"],
                        st["mn"],
                        st["mx"],
                        st["ndv"],
                    )
                )
        # the refinement pool: non-null values over the cached melt (a
        # cached-frame filter in stats mode, the cached frame itself
        # otherwise — `melted` keeps naming the persisted frame so the
        # finally-unpersist below releases the right one)
        pool = (
            melted.where(F.col("v").isNotNull()) if with_stats else melted
        )
        results: dict[tuple[int, float], float] = {}
        states: dict[tuple[int, float], tuple] = {}
        for ci in range(len(value_cols)):
            st = base_stats.get(ci)
            for f in fractions:
                if st is None or st["n"] == 0:
                    results[(ci, f)] = None
                    continue
                k = max(1, math.ceil(f * st["n"]))
                states[(ci, f)] = (
                    float(st["mn"]),
                    float(st["mx"]),
                    k,
                    F.col("c") == ci,
                    st["n"],
                    (ci,),
                )

        for _ in range(max_rounds):
            # resolve finished / degenerate states — ALL in one job
            ready: list = []
            for key, (lo, hi, k, pred, cnt, chain) in list(states.items()):
                width = (hi - lo) / bins
                if cnt <= tail_threshold:
                    ready.append((key, pred, k))
                    del states[key]
                elif width <= 0 or not math.isfinite(width) or (
                    width <= max(abs(lo), abs(hi)) * 1e-15
                ):
                    ready.append((key, pred, 1))
                    del states[key]
            results.update(_kth_smallest_batch(pool, ready))
            if not states:
                break
            # one histogram job over all DISTINCT active candidate
            # sets (all fractions of a column share one set in round
            # 1 — tag each melted row once per set, not per fraction)
            sets: dict[tuple, tuple] = {}
            for key, (lo, hi, k, pred, cnt, chain) in states.items():
                sets.setdefault(chain, (lo, hi, pred))
            set_ids = {chain: i for i, chain in enumerate(sets)}
            structs = []
            for chain, (lo, hi, pred) in sets.items():
                width = (hi - lo) / bins
                b = F.floor((F.col("v") - F.lit(lo)) / F.lit(width))
                b = F.least(
                    F.greatest(b, F.lit(0)), F.lit(bins - 1)
                ).cast("int")
                structs.append(
                    F.when(
                        pred,
                        F.struct(
                            F.lit(set_ids[chain]).alias("q"), b.alias("b")
                        ),
                    )
                )
            hist = (
                pool.select(
                    F.explode(
                        F.filter(
                            F.array(*structs), lambda s: s.isNotNull()
                        )
                    ).alias("s")
                )
                .groupBy("s.q", "s.b")
                .agg(F.count("*").alias("cnt"))
                .collect()
            )
            counts: dict[int, dict[int, int]] = {}
            for r in hist:
                counts.setdefault(r["q"], {})[r["b"]] = r["cnt"]
            for key, (lo, hi, k, pred, cnt, chain) in list(states.items()):
                width = (hi - lo) / bins
                b_counts = counts.get(set_ids[chain], {})
                cum = 0
                for b in range(bins):
                    c = b_counts.get(b, 0)
                    if cum + c >= k:
                        bucket_b = F.least(
                            F.greatest(
                                F.floor(
                                    (F.col("v") - F.lit(lo)) / F.lit(width)
                                ),
                                F.lit(0),
                            ),
                            F.lit(bins - 1),
                        ).cast("int")
                        states[key] = (
                            lo + b * width,
                            lo + (b + 1) * width if b < bins - 1 else hi,
                            k - cum,
                            pred & (bucket_b == b),
                            c,
                            chain + (b,),
                        )
                        break
                    cum += c
        results.update(
            _kth_smallest_batch(
                pool,
                [(key, st[3], st[2]) for key, st in states.items()],
            )
        )
        return {
            col: [(f, results[(ci, f)]) for f in fractions]
            for ci, col in enumerate(value_cols)
        }
    finally:
        melted.unpersist()


def histogram_partials(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Fixed-boundary histogram partial state ``(group..., bin, n)`` —
    the MERGEABLE quantile sketch that complements ``exact_quantiles``
    (exact but iterative) for incremental/streaming rollups: partials
    built at a fine grain merge to any coarser grain by plain
    ``sum(n)`` (associative + commutative), and because the boundaries
    are fixed constants the merged estimate is IDENTICAL to the
    estimate computed directly from raw rows — the same exactly-
    checkable-merge property as rollup_state's HLL registers.

    Values outside [lo, hi) clamp to the edge bins. One exchange,
    map-side combined; state per group is ≤ n_bins rows.
    """
    width = (hi - lo) / n_bins
    b = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    ).cast("int")
    return (
        df.select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").alias("n"))
    )


def merge_histogram_partials(
    parts: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Re-aggregate histogram partials to the grain of ``group_cols``
    (a subset of the build grain): touches only partial rows."""
    return parts.groupBy(*group_cols, "bin").agg(F.sum("n").alias("n"))


def quantiles_from_histogram(
    hist: DataFrame,
    group_cols: list[str],
    fractions: list[float],
    *,
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Per-group quantile estimates from histogram state: for each
    fraction f, the UPPER EDGE of the first bin whose cumulative count
    reaches ceil(f·total) — deterministic (no interpolation), error
    bounded by one bin width. Windows are partitioned by group over
    ≤ n_bins rows — bounded catalogs, never the corpus."""
    width = (hi - lo) / n_bins
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*group_cols)
    cum = hist.select(
        *group_cols,
        "bin",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_tot).alias("total"),
    )
    fr = F.explode(
        F.array(*[F.lit(float(f)) for f in fractions])
    ).alias("fraction")
    hit = (
        cum.select(*group_cols, "bin", "cum", "total", fr)
        .where(F.col("cum") >= F.ceil(F.col("fraction") * F.col("total")))
        .groupBy(*group_cols, "fraction", "total")
        .agg(F.min("bin").alias("_bin"))
    )
    return hit.select(
        *group_cols,
        "fraction",
        F.col("total").cast("long").alias("total"),
        (F.lit(lo) + (F.col("_bin") + 1) * F.lit(width)).alias("q_est"),
    )


def quantile_normalize(
    df: DataFrame,
    id_col: str,
    group_col: str,
    value_col: str,
    grid: int = 100,
) -> DataFrame:
    """Cross-group score calibration by quantile normalization: map
    each value onto the POOLED distribution at its within-group
    percentile, so a "0.8 quality" from a lenient provider and a
    "0.3" from a harsh one land on comparable scales before a single
    global threshold is applied (the microarray-normalization trick,
    Bolstad et al. 2003, applied to per-provider quality scores).

    Steps: (1) within-group ``percent_rank`` — one window shuffle
    keyed by group; (2) the pooled distribution reduced to a
    ``grid+1``-point exact-percentile sketch — ONE global aggregate
    whose result is a single broadcast row; (3) each row reads the
    pooled quantile at ``floor(p * grid)`` — column algebra on the
    broadcast array. No per-row pooled lookup join, no global sort.

    Returns ``(id, group, value, pct_rank, normalized)`` with floats
    rounded to 6. Step-function semantics (no interpolation between
    grid points) keep the result exactly SQL-replayable; grid=100
    bounds the calibration error at the pooled 1%-ile resolution.
    """
    x = F.col(value_col).cast("double")
    # null scores carry no rank information, and engines disagree on
    # null ordering (Spark NULLS FIRST vs DuckDB NULLS LAST) — exclude
    df = df.where(x.isNotNull())
    w = Window.partitionBy(group_col).orderBy(x)
    ranked = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("group"),
        x.alias("value"),
        F.percent_rank().over(w).alias("_p"),
    )
    fractions = F.array(*[F.lit(j / grid) for j in range(grid + 1)])
    pooled = df.agg(F.percentile(x, fractions).alias("_q"))
    return ranked.crossJoin(F.broadcast(pooled)).select(
        "id",
        "group",
        "value",
        F.round("_p", 6).alias("pct_rank"),
        F.round(
            F.element_at(
                F.col("_q"),
                (F.floor(F.col("_p") * grid) + 1).cast("int"),
            ),
            6,
        ).alias("normalized"),
    )
