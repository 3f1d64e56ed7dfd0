"""Similarity search over embedding columns (array<float>).

Extension layer (BASELINE.json north star): approximate-nearest-neighbor
search a 100 TB training-data pipeline needs.

- ``cosine_topk``: brute-force baseline. The query vector is a literal
  (broadcast by construction); the scan is embarrassingly parallel; the
  global top-k is a TakeOrderedAndProject (no full sort, no shuffle of
  the data — each partition keeps k candidates).
- ``knn_join_topk``: per-probe top-k against the corpus, the batched
  variant (broadcast the probe set, crossJoin-free via explicit
  broadcast + window).
- ``lsh_cosine_topk``: the scale path — random-hyperplane LSH buckets
  (sign bits of d deterministic pseudo-random projections) shrink the
  candidate set; exact re-rank inside the probed buckets. Recall is
  tunable via bits/tables; deterministic seeds keep results stable.

All dot products run JVM-side via zip_with/aggregate higher-order
functions in double precision — no Python in the loop.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cccatalog_spark.sources.tables import fan_out


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.
    Ties broken by id for full determinism."""
    q = F.array(*[F.lit(float(v)) for v in query])
    scored = fan_out(df).select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def cosine_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup family).

    Exact all-pairs semantics (matches a brute-force oracle), shaped to
    be as cheap as an O(n²) scan can be:

    - per-row norms computed ONCE before the join (n, not n²/2 times);
    - the pair dot product evaluated once, via a select-then-filter on
      the materialized column (the naive where(cos)+select(cos) form
      evaluates the whole dot twice);
    - cosine = dot/(norm_a*norm_b) in the exact same operation order as
      computing it per-pair, so results are bit-identical to the naive
      form (and to DuckDB's list_cosine_similarity on DOUBLE[]).

    At 100 TB this operator is the *verification* stage; candidate
    generation must come from LSH bucketing (``lsh_bucket``) — an
    unbucketed n² over the full corpus is never the plan.
    """
    base = fan_out(df).select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        _norm(F.col(vec_col)).alias("_n"),
    )
    a = base.select(
        F.col(id_col).alias("id_a"), F.col("_v").alias("_va"), F.col("_n").alias("_na")
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))).alias(
                "_cos"
            ),
        )
        .where(F.col("_cos") >= threshold)
        .select("id_a", "id_b", F.round("_cos", 6).alias("cosine_sim"))
    )


def lsh_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    bands: int = 4,
    band_bits: int = 8,
    seed: int = 42,
    dim: int | None = None,
    max_bucket: int | None = None,
    vectorized: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via banded LSH candidates + exact cosine verify.

    The scale-safe composition of this module's two halves: random-
    hyperplane sign bits (``lsh_bucket``) shard the corpus into
    ``bands`` independent hash tables of ``band_bits`` bits each; a
    pair is a candidate iff it collides in at least one band; every
    candidate is then verified with the exact ``cosine`` ≥ threshold.
    Verification never changes — only which pairs we bother scoring.

    Plan shape (the point, vs the all-pairs anti-model):
    - candidate generation is an EQUI self-join on (band, bucket) —
      sort-merge/hash, never a nested-loop; candidates ≈ Σ bucket²
      per band, not n²;
    - pair ids are ``distinct``-ed BEFORE vectors are re-attached, so
      the wide embedding arrays never ride through the candidate
      shuffle — only (id_a, id_b);
    - at real scale the (band, bucket) column is the stored partition
      key, turning the self-join into co-located partition work, and
      ``max_bucket`` caps degenerate buckets (same role as
      ``max_doc_freq`` in the n-gram inverted index — a recall/cost
      knob for adversarial skew).

    Recall < 1 by construction for pairs barely at the threshold; for
    actual near-duplicates (cosine ≥ .98, the dedup use case) the
    band-miss probability is (1 - agree^band_bits)^bands — e.g. ≈6e-6
    at cosine .9998 with 4×8 bits. Tests pin recall = 1 against the
    exact all-pairs form on the real test corpora.
    """
    if dim is None:
        # bounded driver action: one row, to size the hyperplane catalog
        dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bands * band_bits, seed)
    # base feeds the signature computation AND both vector re-attach
    # sides; sig feeds both sides of the candidate self-join. Persist
    # both, or projection collapse re-inlines the bands*band_bits
    # hyperplane dot products (and the norms) once PER CONSUMER —
    # measured 2x on the bench corpus.
    base = fan_out(df).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        _norm(F.col(vec_col)).alias("_n"),
    ).persist()
    if vectorized:
        sig = lsh_signatures_vectorized(base, planes, bands, band_bits)
    else:
        band_structs = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    lsh_bucket(
                        F.col("_v"), planes[b * band_bits : (b + 1) * band_bits]
                    ).cast("long").alias("bucket"),
                )
                for b in range(bands)
            ]
        )
        sig = base.select("_id", F.explode(band_structs).alias("bb")).select(
            "_id", F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
        )
    sig = sig.persist()
    if max_bucket is not None:
        from pyspark.sql.window import Window

        wide = (
            sig.groupBy("band", "bucket")
            .count()
            .where(F.col("count") > max_bucket)
            .select("band", "bucket")
        )
        sig = sig.join(F.broadcast(wide), ["band", "bucket"], "left_anti")
    x = sig.select(
        F.col("_id").alias("id_a"), "band", "bucket"
    )
    y = sig.select(F.col("_id").alias("id_b"), "band", "bucket")
    pairs = (
        x.join(y, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = base.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("_va"), F.col("_n").alias("_na")
    )
    vb = base.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb")
    )
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            (_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))).alias(
                "_cos"
            ),
        )
        .where(F.col("_cos") >= threshold)
        .select("id_a", "id_b", F.round("_cos", 6).alias("cosine_sim"))
    )


def knn_join_topk(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """For every probe row, its k nearest corpus rows by cosine.

    Broadcast the (small) probe side against the corpus scan, score,
    then per-probe top-k via window rank. The corpus is scanned once,
    never shuffled; only (|corpus|×|probes|) scored pairs flow into the
    per-probe rank, so keep probes bounded (batch them upstream).
    """
    from pyspark.sql.window import Window

    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    corpus = fan_out(corpus)
    scored = corpus.alias("c").join(F.broadcast(p), F.col(f"c.{id_col}") != F.col("probe_id")).select(
        "probe_id",
        F.col(f"c.{id_col}").alias("neighbor_id"),
        F.round(cosine(F.col(f"c.{vec_col}"), F.col("probe_vec")), 6).alias(
            "cosine_sim"
        ),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine_sim", "rank")
    )


def _cos_py(a: list[float], b: list[float]) -> float:
    num = sum(x * y for x, y in zip(a, b))
    return num / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
    )


def bitext_margin_mine(
    probes: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 4,
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk ACL'19, the
    CCMatrix recipe): score every (probe, candidate) cross-lingual
    pair by cosine NORMALIZED by both sides' top-k neighborhood means,

        margin(x, y) = cos(x, y) / ((avgtopk_x + avgtopk_y) / 2),

    which cancels hubness (a candidate close to everything gains no
    margin).  Returns one row per probe: its argmax-margin candidate,
    the margin, and ``mutual`` (is the probe also the candidate's best
    probe) — the mutual-best filter is the standard mining threshold.

    Scale shape: ``probes`` is a BOUNDED batch (broadcast; the q27 kNN
    sanction) scored against a linear corpus scan — |corpus|·|probes|
    rows, never corpus×corpus; both neighborhood means and both argmax
    directions are rank windows over that one scored frame (keyed by
    probe / by candidate).  For corpus-scale mining runs, feed probe
    batches through this operator; the per-batch plan is unchanged.
    Determinism: ranks order by the ROUNDED cosine/margin with id
    tiebreaks (the q261 engine-stability contract).
    """
    from pyspark.sql.window import Window

    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("_pv")
    )
    scored = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("_cv")
    ).join(F.broadcast(p), F.lit(True)).select(
        "probe_id",
        "cand_id",
        F.round(cosine(F.col("_cv"), F.col("_pv")), 6).alias("_cos"),
    )
    wf = Window.partitionBy("probe_id").orderBy(
        F.desc("_cos"), F.asc("cand_id")
    )
    wb = Window.partitionBy("cand_id").orderBy(
        F.desc("_cos"), F.asc("probe_id")
    )
    ranked = scored.withColumn("_rf", F.row_number().over(wf)).withColumn(
        "_rb", F.row_number().over(wb)
    )
    af = Window.partitionBy("probe_id")
    ab = Window.partitionBy("cand_id")
    topk = ranked.withColumn(
        "_avgf",
        F.avg(F.when(F.col("_rf") <= k, F.col("_cos"))).over(af),
    ).withColumn(
        "_avgb",
        F.avg(F.when(F.col("_rb") <= k, F.col("_cos"))).over(ab),
    )
    margin = F.round(
        F.col("_cos")
        / ((F.col("_avgf") + F.col("_avgb")) / F.lit(2.0)),
        6,
    )
    m = topk.withColumn("_margin", margin)
    mf = Window.partitionBy("probe_id").orderBy(
        F.desc("_margin"), F.asc("cand_id")
    )
    mb = Window.partitionBy("cand_id").orderBy(
        F.desc("_margin"), F.asc("probe_id")
    )
    best = (
        m.withColumn("_bf", F.row_number().over(mf))
        .withColumn("_bb", F.row_number().over(mb))
    )
    return (
        best.where(F.col("_bf") == 1)
        .select(
            "probe_id",
            "cand_id",
            F.col("_margin").alias("margin"),
            (F.col("_bb") == 1).alias("mutual"),
        )
    )


def pq_codebooks(
    df: DataFrame, vec_col: str, id_col: str, m: int, k: int
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jégou et al. TPAMI 2011): split
    the vector space into ``m`` contiguous subspaces and give each a
    ``k``-centroid codebook.  Centroids are the sub-vectors of the
    first ``k`` vectors by id — the same deterministic k-means
    stand-in as ``ivf_centroids`` (identical plan shape downstream;
    swap in trained centroids without touching the encoder).  A
    driver-resident catalog (m·k·(dim/m) = k·dim floats), never
    distributed data."""
    rows = df.orderBy(F.col(id_col).asc()).limit(k).collect()
    dim = len(rows[0][vec_col])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return [
        [
            [float(x) for x in r[vec_col]][j * sub : (j + 1) * sub]
            for r in rows
        ]
        for j in range(m)
    ]


def _ssd(seg, centroid: list[float]):
    """Σ (x_t − c_t)² as an in-order left fold — float-deterministic
    across engines (both sides sum in index order)."""
    c = F.array(*[F.lit(float(t)) for t in centroid])
    return F.aggregate(
        F.zip_with(seg, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    codebooks: list[list[list[float]]],
) -> DataFrame:
    """PQ encoder: per subspace, the argmin-L2 centroid ordinal —
    ``(id, pq_code array<int>, pq_err double)`` where ``pq_err`` is
    the total squared reconstruction error (the quantizer's quality
    metric; recall curves track it).

    The 100 TB story: a 64-dim float corpus (256 B/vector) compresses
    to ``m`` bytes/vector (m=8: 32× less memory), which is what lets
    a billion-vector index live in RAM; ADC search then scans codes
    against a query's per-subspace distance tables.

    Scale shape: codebooks are literals in the plan, so encoding is
    ONE narrow whole-stage-codegen pass — no join, no shuffle, no UDF
    (the ``ivf_assign`` discipline).  Ties break to the lower centroid
    ordinal via the (dist, ordinal) struct min."""
    sub = len(codebooks[0][0])
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    best = []
    for j, book in enumerate(codebooks):
        seg = F.slice(vec, j * sub + 1, sub)
        cand = F.array(
            *[
                F.struct(
                    _ssd(seg, c).alias("d"),
                    F.lit(i).alias("c"),
                )
                for i, c in enumerate(book)
            ]
        )
        best.append(F.array_min(cand))
    return df.select(
        id_col,
        F.array(*[b["c"] for b in best]).alias("pq_code"),
        F.round(
            sum((b["d"] for b in best), F.lit(0.0)), 6
        ).alias("pq_err"),
    )


def fetch_probe(
    df: DataFrame, vec_col: str, id_col: str, id_val
) -> list[float]:
    """Fetch ONE probe vector by id as a driver-resident catalog value
    (dim floats — the same footprint class as ``ivf_centroids``).  ANN
    entry points genuinely need the query vector driver-side: IVF ranks
    its centroid catalog against it and LSH derives the probe bucket
    ids from it, both before any distributed stage is planned.  This is
    the sanctioned bounded-catalog fetch (a 1-row limit under a
    pushed-down id filter), kept here so query plans never carry a raw
    ``.collect()``."""
    rows = (
        df.where(F.col(id_col) == F.lit(id_val))
        .select(vec_col)
        .limit(1)
        .collect()
    )
    return [float(x) for x in rows[0][vec_col]]


def ivf_centroids(
    df: DataFrame, vec_col: str, id_col: str, n_lists: int
) -> list[tuple[int, list[float]]]:
    """IVF coarse-quantizer centroids: the first ``n_lists`` vectors by
    id — deterministic stand-in for a k-means train step (identical
    plan shape downstream). Centroids are a driver-resident catalog
    (n_lists × dim floats), never distributed data."""
    rows = df.orderBy(F.col(id_col).asc()).limit(n_lists).collect()
    return [(r[id_col], [float(x) for x in r[vec_col]]) for r in rows]


def ivf_assign(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: list[tuple[int, list[float]]],
) -> DataFrame:
    """Corpus + ``_ivf_list`` (argmax-cosine centroid id) in ONE narrow
    pass — centroid vectors are literals in the plan, so assignment is
    pure whole-stage-codegen'd expression work: no join, no shuffle.
    At scale, write the output partitioned by ``_ivf_list`` so probes
    become partition pruning."""
    # argmax_c cosine(v, c) = argmax_c dot(v, c)/||c||: the row norm
    # is a constant positive factor across candidates, so it never
    # changes the argmax — drop it, and fold 1/||c|| into the centroid
    # literals driver-side. One dot per centroid per row, nothing else.
    cand = F.array(
        *[
            F.struct(
                _dot(
                    F.col(vec_col),
                    F.array(
                        *[
                            F.lit(x / (math.sqrt(sum(y * y for y in vec)) or 1.0))
                            for x in vec
                        ]
                    ),
                ).alias("sim"),
                F.lit(lid).alias("lid"),
            )
            for lid, vec in centroids
        ]
    )
    return df.withColumn("_ivf_list", F.array_max(cand)["lid"])


def ivf_cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF ANN top-k: rank centroids against the query driver-side,
    scan only the ``nprobe`` closest inverted lists, exact re-rank
    inside (TakeOrderedAndProject — no global sort).

    Scan fraction ≈ nprobe/n_lists; recall grows with nprobe (nprobe =
    n_lists degenerates to the exact scan). Paired with cosine_topk in
    tests/test_similarity.py to report recall@k.
    """
    centroids = ivf_centroids(df, vec_col, id_col, n_lists)
    ranked = sorted(
        ((_cos_py(query, vec), lid) for lid, vec in centroids), reverse=True
    )
    probe_lists = [lid for _, lid in ranked[:nprobe]]
    q = F.array(*[F.lit(float(v)) for v in query])
    assigned = ivf_assign(fan_out(df), vec_col, id_col, centroids)
    return (
        assigned.where(F.col("_ivf_list").isin(probe_lists))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def knn_topk_vectorized(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact top-k like ``cosine_topk``, but the per-batch scoring runs
    as a numpy matrix-vector product inside ``mapInPandas`` — the
    Arrow-vectorized alternative to the JVM higher-order-function dot
    product. Preferable when dim is large (hundreds+): one BLAS GEMV
    per Arrow batch beats per-element codegen. Per-partition top-k is
    computed in numpy; only ≤k rows per partition reach the final
    TakeOrderedAndProject.

    Results can differ from cosine_topk in the last float ulps (BLAS
    accumulation order) — fine for ANN retrieval, not for hash-exact
    oracles; tests assert neighbor-set equality.
    """
    import numpy as np
    import pandas as pd

    q = np.asarray(query, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))

    def score(batches):
        for pdf in batches:
            m = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if len(m) == 0:
                continue
            sims = (m @ q) / (np.sqrt((m * m).sum(axis=1)) * qn)
            top = np.argsort(-sims)[:k]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[top],
                    "cosine_sim": np.round(sims[top], 6),
                }
            )

    scored = fan_out(corpus).select(id_col, vec_col).mapInPandas(
        score, f"{id_col} long, cosine_sim double"
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (LCG-based — no
    numpy dependency in the plan, reproducible across runs/engines)."""
    state = seed & 0x7FFFFFFF
    planes = []
    for _ in range(bits):
        v = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) & 0x7FFFFFFF
            # map to (-1, 1)
            v.append(state / 0x40000000 - 1.0)
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def lsh_signatures_vectorized(
    base: DataFrame,
    planes: list[list[float]],
    bands: int,
    band_bits: int,
) -> DataFrame:
    """(id, band, bucket) signature rows via one numpy GEMV per Arrow
    batch: all bands*band_bits hyperplane projections of a batch are a
    single (n x dim) @ (dim x bits) matmul, then each band's sign-bit
    block packs into a bucket int — replacing bands*band_bits separate
    Catalyst aggregate() dot products per row (the expression path
    stays in ``lsh_bucket`` and is pinned equal by test).

    Sign parity note: numpy sums the projection in vectorized order,
    the expression path left-folds — they can only disagree when a
    projection sits within float-ulp distance of exactly 0, which the
    equivalence test would surface; verification is exact either way.
    """
    import numpy as np

    P = np.asarray(planes, dtype=np.float64).T  # dim x bits
    weights = (1 << np.arange(band_bits)).astype(np.int64)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.vstack(pdf["_v"].to_numpy()).astype(np.float64)
            bits = (V @ P) >= 0  # n x (bands*band_bits)
            out = []
            for b in range(bands):
                block = bits[:, b * band_bits : (b + 1) * band_bits]
                out.append(
                    pd.DataFrame(
                        {
                            "_id": pdf["_id"].to_numpy(),
                            "band": np.full(len(pdf), b, dtype=np.int32),
                            "bucket": block.astype(np.int64) @ weights,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return base.select("_id", "_v").mapInPandas(
        run, "_id long, band int, bucket long"
    )


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id (int) from random-hyperplane projections."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(_dot(vec, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    bits: int = 4,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: probe only the query's LSH bucket, exact re-rank inside.

    With b sign bits the corpus shards into 2^b buckets; the scan prunes
    to ~1/2^b of rows (bucket column should be a partition key of the
    stored table at real scale, making this partition pruning instead of
    a filter). Recall < 1 by construction — the benchmark pairs it with
    the exact baseline to report recall@k.
    """
    dim = len(query)
    planes = _hyperplanes(dim, bits, seed)
    qbucket = sum(
        (1 << i)
        for i, plane in enumerate(planes)
        if sum(a * b for a, b in zip(query, plane)) >= 0
    )
    q = F.array(*[F.lit(float(v)) for v in query])
    bucketed = fan_out(df).withColumn("_bucket", lsh_bucket(F.col(vec_col), planes))
    return (
        bucketed.where(F.col("_bucket") == qbucket)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def quantize_int8(vec: Column) -> Column:
    """Symmetric int8 vector quantization (the standard 4× compression
    for an embedding corpus at rest — 100 TB of float32 becomes 25 TB
    plus one scale per vector): per-vector scale = max|x|/127,
    elements round(x/scale). Returns struct(scale double, q array<int>)
    — pure column algebra, one narrow pass. Dequantize = q[i]*scale;
    ANN pipelines re-rank the top candidates with the original
    vectors, so the quantization error only affects candidate order.
    """
    dv = F.transform(vec, lambda x: x.cast("double"))
    scale = (
        F.greatest(
            F.array_max(F.transform(dv, lambda x: F.abs(x))),
            F.lit(1e-12),
        )
        / 127.0
    )
    return F.struct(
        scale.alias("scale"),
        F.transform(dv, lambda x: F.round(x / scale).cast("int")).alias("q"),
    )


def dequant_error_l2(vec: Column, quant: Column) -> Column:
    """L2 reconstruction error of a quantized vector vs the original."""
    dv = F.transform(vec, lambda x: x.cast("double"))
    diffs = F.zip_with(
        dv,
        quant["q"],
        lambda x, q: F.pow(x - q.cast("double") * quant["scale"], F.lit(2.0)),
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda a, v: a + v))


def l2_distance(a: Column, b: Column) -> Column:
    """sqrt(Σ(x−y)²) in sequential double order — bit-identical to
    DuckDB's ``list_distance`` on DOUBLE[], so assignment argmins are
    oracle-exact (same contract as ``cosine`` above)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def kmeans_assign(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_seeds: int = 8,
) -> DataFrame:
    """One exact k-means assignment step (E-step) against
    deterministic seed centroids (the ``n_seeds`` lowest-id vectors —
    k-means|| seeding would slot in here; determinism keeps it
    oracle-checkable): every vector goes to its nearest seed by L2,
    ties to the smaller seed id. Returns per-cluster profile
    ``(seed_id, n_assigned, avg_dist, max_dist)``.

    Scale shape: the seed frame is k rows — broadcast; the fact side
    computes k distances per row map-side (never reshuffled) and the
    argmin is a per-vector struct-min aggregation, so the only wide
    stage is the final per-cluster rollup. This is the inner loop of
    IVF list training (`ivf_*` above) made checkable.
    """
    seeds = (
        df.where(F.col(id_col) < n_seeds)
        .select(
            F.col(id_col).alias("seed_id"),
            F.col(vec_col).alias("seed_vec"),
        )
    )
    dist = l2_distance(F.col(vec_col), F.col("seed_vec"))
    best = (
        df.crossJoin(F.broadcast(seeds))
        .select(
            F.col(id_col),
            F.struct(dist.alias("dist"), F.col("seed_id").alias("seed_id")).alias(
                "cand"
            ),
        )
        .groupBy(id_col)
        .agg(F.min("cand").alias("best"))
        .select(F.col("best.seed_id").alias("seed_id"), F.col("best.dist").alias("dist"))
    )
    return best.groupBy("seed_id").agg(
        F.count("*").alias("n_assigned"),
        F.round(F.avg("dist"), 6).alias("avg_dist"),
        F.round(F.max("dist"), 6).alias("max_dist"),
    )


def _assign_step(v: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """(id, cid, dist): nearest centroid per vector, ties to the
    smaller cid (struct-min). Centroid frame broadcast — k rows."""
    dist = l2_distance(F.col("emb"), F.col("cvec"))
    return (
        v.crossJoin(F.broadcast(cents))
        .select(
            F.col(id_col),
            F.struct(dist.alias("dist"), F.col("cid").alias("cid")).alias("c"),
        )
        .groupBy(id_col)
        .agg(F.min("c").alias("best"))
        .select(
            id_col,
            F.col("best.cid").alias("cid"),
            F.col("best.dist").alias("dist"),
        )
    )


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_seeds: int = 8,
    iterations: int = 2,
) -> DataFrame:
    """Full distributed Lloyd's k-means: ``iterations`` rounds of
    (assign → recompute centroids), then a final assignment profile
    ``(cid, n_assigned, avg_dist, max_dist)`` against the trained
    centroids. Deterministic end to end (lowest-id seeding, struct-min
    tiebreak) and oracle-exact: recomputed centroid coordinates are
    rounded to 9 places in BOTH engines, which pins the next round's
    distances bit-identical despite cross-engine partial-sum order.

    Scale shape per round: assignment is the broadcast map-side
    pattern of `kmeans_assign`; the M-step is ONE shuffle keyed by
    (cid, dim) with map-side partial avg — dimensions are bounded, so
    the centroid frame stays k×d rows and re-broadcasts each round.
    Empty clusters drop out (no member rows → no centroid row), same
    as the SQL formulation.
    """
    v = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("emb"),
    ).persist()
    cents = v.where(F.col(id_col) < n_seeds).select(
        F.col(id_col).alias("cid"), F.col("emb").alias("cvec")
    )
    dims = v.select(
        F.col(id_col), F.posexplode("emb").alias("dim", "val")
    )
    for _ in range(iterations):
        assign = _assign_step(v, cents, id_col).select(id_col, "cid")
        cents = (
            dims.join(assign, id_col)
            .groupBy("cid", "dim")
            .agg(F.round(F.avg("val"), 9).alias("cv"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("dim").alias("d"),
                                                F.col("cv").alias("v")))
                    ),
                    lambda s: s.getField("v"),
                ).alias("cvec")
            )
        )
    final = _assign_step(v, cents, id_col)
    return final.groupBy("cid").agg(
        F.count("*").alias("n_assigned"),
        F.round(F.avg("dist"), 6).alias("avg_dist"),
        F.round(F.max("dist"), 6).alias("max_dist"),
    )


def mean_pool(
    df: DataFrame,
    vec_col: str,
    group_col: str,
    *,
    round_to: int = 9,
) -> DataFrame:
    """Per-group mean vector: ``(group, n_vectors, pooled)`` — the
    pooling step that turns chunk/member embeddings into one
    representative vector (doc embedding from chunk embeddings,
    cluster centroid from members; k-means' M-step is this exact
    shape, see ``kmeans_lloyd``). Coordinates round to ``round_to``
    in-engine so the result is oracle-exact despite partial-sum order.

    Scale: posexplode → ONE shuffle keyed (group, dim) with map-side
    partial avg → per-group re-assembly of the d-length array. State
    per group is d rows, never the member vectors.
    """
    dims = df.select(
        F.col(group_col).alias("_g"),
        F.posexplode(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("dim", "val"),
    )
    per_dim = dims.groupBy("_g", "dim").agg(
        F.round(F.avg("val"), round_to).alias("cv"),
        F.count("*").alias("_n"),
    )
    return (
        per_dim.groupBy("_g")
        .agg(
            F.max("_n").alias("n_vectors"),
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("dim").alias("d"), F.col("cv").alias("v"))
                    )
                ),
                lambda s: s.getField("v"),
            ).alias("pooled"),
        )
        .select(F.col("_g").alias(group_col), "n_vectors", "pooled")
    )


def semantic_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    n_seeds: int = 8,
    threshold: float = 0.99,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, *SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication*): cluster the
    embedding space, then near-dedup only WITHIN each cluster — the
    cluster partition turns an O(n²) cosine self-join into
    Σ|cluster|², which is the entire reason the method scales.

    Stage 1 (assignment): nearest of the ``n_seeds`` lowest-id vectors
    by L2, ties to the smaller seed id — the same deterministic
    seeding contract as :func:`kmeans_assign` (production swaps in
    trained ``kmeans_lloyd`` centroids; determinism keeps this
    oracle-checkable). Centroids broadcast; distances computed
    map-side; argmin is a per-vector struct-min — no shuffle of the
    vectors themselves.

    Stage 2 (within-cluster dedup): vector *i* is a duplicate iff some
    lower-id vector *j* in the SAME cluster has cos(i, j) >=
    ``threshold`` (the q28 EXISTS-dominance rule, not greedy-chain —
    relational, recursion-free). The self-join keys on ``cid`` alone,
    so both sides shuffle ONCE on the cluster id and every candidate
    pair is cluster-local. At 100 TB, k is chosen ~√n so clusters stay
    ~√n and the pair volume stays ~n; a degenerate hot cluster is the
    workload telling you to re-train k upward (or salt via
    operators/skew) — the engine never falls back to all-pairs.

    Returns ``(id, cid, is_dup)`` for every input vector.
    """
    v = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
    cents = v.where(F.col(id_col) < n_seeds).select(
        F.col(id_col).alias("cid"), F.col("__v").alias("__cv")
    )
    dist = l2_distance(F.col("__v"), F.col("__cv"))
    assigned = (
        v.crossJoin(F.broadcast(cents))
        .select(
            F.col(id_col),
            F.struct(
                dist.alias("dist"), F.col("cid").alias("cid"), F.col("__v").alias("v")
            ).alias("c"),
        )
        .groupBy(id_col)
        .agg(F.min("c").alias("best"))
        .select(
            F.col(id_col),
            F.col("best.cid").alias("cid"),
            F.col("best.v").alias("__v"),
        )
    )
    left = assigned.select(
        F.col(id_col), F.col("cid"), F.col("__v").alias("__vi")
    )
    right = assigned.select(
        F.col(id_col).alias("__j"),
        F.col("cid").alias("__jcid"),
        F.col("__v").alias("__vj"),
    )
    joined = left.join(
        right,
        (left["cid"] == right["__jcid"]) & (right["__j"] < left[id_col]),
        "left",
    )
    return (
        joined.groupBy(id_col, "cid")
        .agg(
            F.max(
                F.when(
                    F.col("__j").isNotNull()
                    & (cosine(F.col("__vi"), F.col("__vj")) >= F.lit(threshold)),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("is_dup")
        )
    )


def lsh_cosine_topk_multiprobe(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    bits: int = 4,
    seed: int = 42,
    n_probes: int | None = None,
) -> DataFrame:
    """Multi-probe LSH ANN (Lv et al. VLDB'07 shape): probe the
    query's bucket AND its ``n_probes - 1`` Hamming-1 neighbors
    (flipping the sign bits most likely to be wrong — here all single
    flips, cheapest first is equivalent at this bit width). Recall
    strictly dominates single-probe at the cost of scanning
    ~n_probes/2^bits of the corpus; the standard recall/cost dial
    when one bucket misses near-boundary vectors.

    At scale the bucket column is the partition key, so multiprobe is
    a partition-pruned scan of n_probes partitions — an IN filter the
    planner turns into partition pruning, never a second index.
    """
    dim = len(query)
    planes = _hyperplanes(dim, bits, seed)
    qbucket = sum(
        (1 << i)
        for i, plane in enumerate(planes)
        if sum(a * b for a, b in zip(query, plane)) >= 0
    )
    probes = [qbucket] + [qbucket ^ (1 << i) for i in range(bits)]
    if n_probes is not None:
        probes = probes[: max(1, n_probes)]
    q = F.array(*[F.lit(float(v)) for v in query])
    bucketed = fan_out(df).withColumn(
        "_bucket", lsh_bucket(F.col(vec_col), planes)
    )
    return (
        bucketed.where(F.col("_bucket").isin(probes))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def silhouette_centroid(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_seeds: int = 8,
) -> DataFrame:
    """Simplified (centroid-based) silhouette — the cluster-quality
    report card run after k-means (the "did SemDeDup's k actually
    separate anything?" check). Per vector, with distances to the k
    centroids: ``a`` = distance to the nearest (its cluster), ``b`` =
    distance to the second-nearest, ``s = (b-a)/max(a,b)`` — the
    Pampalk/sklearn `silhouette (centroid) approximation`, which
    replaces the O(n²) pairwise a/b of Rousseeuw 1987 with k
    broadcast distances per row (the only silhouette that exists at
    100 TB).

    Seeds are the ``n_seeds`` lowest-id vectors (same deterministic
    convention as :func:`kmeans_assign`). Returns per-cluster rows
    ``(seed_id, n, mean_s, overall_s)`` with ``overall_s`` repeated
    (corpus mean silhouette). s in [0, 1] here since a <= b by
    construction; 0 = boundary point, 1 = glued to its centroid.

    Scale shape: one k-row broadcast, k distances per row map-side,
    one per-vector two-smallest aggregate (array_sort over k structs,
    k constant), one per-cluster rollup + a 1-row overall broadcast.
    No pairwise joins anywhere.

    Precondition: ids must include at least TWO values < n_seeds
    (dense-from-0 ids, the q96/kmeans_assign convention) — ``b`` is
    the distance to the second-nearest centroid, so with fewer than
    two seed rows every s is null.
    """
    if n_seeds < 2:
        raise ValueError(
            "silhouette needs >= 2 seed centroids (b is the distance"
            " to the SECOND-nearest)"
        )
    seeds = df.where(F.col(id_col) < n_seeds).select(
        F.col(id_col).alias("seed_id"),
        F.col(vec_col).alias("seed_vec"),
    )
    dist = l2_distance(F.col(vec_col), F.col("seed_vec"))
    two = (
        df.crossJoin(F.broadcast(seeds))
        .select(
            F.col(id_col),
            F.struct(dist.alias("dist"), F.col("seed_id").alias("seed_id")).alias(
                "c"
            ),
        )
        .groupBy(id_col)
        .agg(F.slice(F.array_sort(F.collect_list("c")), 1, 2).alias("t2"))
        .select(
            F.col("t2")[0]["seed_id"].alias("seed_id"),
            F.col("t2")[0]["dist"].alias("a"),
            F.col("t2")[1]["dist"].alias("b"),
        )
    )
    sil = two.select(
        "seed_id",
        F.when(
            F.greatest("a", "b") > 0,
            (F.col("b") - F.col("a")) / F.greatest("a", "b"),
        )
        .otherwise(F.lit(0.0))
        .alias("s"),
    )
    overall = sil.agg(F.avg("s").alias("_o"))
    return (
        sil.groupBy("seed_id")
        .agg(F.count("*").alias("n"), F.round(F.avg("s"), 6).alias("mean_s"))
        .crossJoin(F.broadcast(overall))
        .select(
            "seed_id", "n", "mean_s", F.round("_o", 6).alias("overall_s")
        )
    )


def matryoshka_overlap(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    probe_id: int,
    dims: tuple[int, ...] = (8, 16, 32, 64),
    k: int = 10,
) -> DataFrame:
    """Matryoshka / truncated-embedding retrieval audit (Kusupati et
    al. NeurIPS'22): how much of the full-dimension top-k survives
    when the index stores only the first d coordinates? Retrieval
    infra truncates embeddings to cut memory 4-8x; this measures the
    recall price per candidate d before committing an index build.

    Per d in ``dims``: exact cosine top-k against the probe vector
    using only coordinates 1..d, then the overlap |topk_d ∩
    topk_full| / k (full = max(dims), overlap 1.0 by construction).
    Returns ``(d, n_common, overlap)``.

    Scale shape: probe vector (1 row) and dim list (|dims| rows)
    broadcast; each corpus row scores |dims| slices map-side; per-d
    top-k is a rank window PARTITIONED by d (never global). Ordering
    on the ROUNDED score with id tiebreak keeps ranks cross-engine
    deterministic (the q26 contract).
    """
    from pyspark.sql.window import Window

    full_d = max(dims)
    probe = df.where(F.col(id_col) == probe_id).select(
        F.col(vec_col).alias("_qv")
    )
    ddf = df.sparkSession.createDataFrame([(d,) for d in dims], ["d"])
    s = cosine(
        F.slice(F.col(vec_col), 1, F.col("d")),
        F.slice(F.col("_qv"), 1, F.col("d")),
    )
    scored = (
        df.crossJoin(F.broadcast(probe))
        .crossJoin(F.broadcast(ddf))
        .select("d", F.col(id_col).alias("_id"), F.round(s, 6).alias("s"))
    )
    w = Window.partitionBy("d").orderBy(F.desc("s"), F.asc("_id"))
    topk = scored.select(
        "d", "_id", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= k)
    full = topk.where(F.col("d") == full_d).select(
        F.col("_id").alias("_fid")
    )
    return (
        topk.join(F.broadcast(full), topk["_id"] == full["_fid"], "left")
        .groupBy("d")
        .agg(
            F.count("_fid").alias("n_common"),
            F.round(F.count("_fid") / F.lit(float(k)), 6).alias("overlap"),
        )
    )


def jl_signs(in_dim: int, out_dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic ±1 Johnson-Lindenstrauss projection rows
    (Achlioptas 2003's database-friendly JL: Rademacher entries keep
    the guarantee of Gaussian JL while the projection stays exact
    integer-sign arithmetic). LCG-seeded like _hyperplanes — plan
    literals, reproducible across engines with no numpy in the plan.
    """
    state = seed & 0x7FFFFFFF
    rows = []
    for _ in range(out_dim):
        v = []
        for _ in range(in_dim):
            state = (1103515245 * state + 12345) & 0x7FFFFFFF
            v.append(1.0 if state & 1 else -1.0)
        rows.append(v)
    return rows


def jl_project(
    vec: Column, rows: list[list[float]]
) -> Column:
    """Project an embedding onto the JL sign rows:
    ``y_j = Σ_i x_i·r_ji / sqrt(k)``. Pure sequential-fold column
    algebra (same _dot discipline the cosine path uses → bit-identical
    in a SQL replay), no shuffle, no UDF — at 100 TB this is a narrow
    map stage that cuts every downstream distance computation by
    in_dim/out_dim."""
    k = len(rows)
    return F.array(
        *[
            (_dot(vec, F.array(*[F.lit(v) for v in r])) / math.sqrt(k))
            for r in rows
        ]
    )


def jl_distortion_audit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    out_dim: int = 16,
    in_dim: int = 64,
    eps: float = 0.5,
    seed: int = 7,
) -> DataFrame:
    """JL projection quality report over consecutive-id pairs: the
    squared-distance ratio ``||Px−Py||²/||x−y||²`` concentrates
    around 1 (the JL lemma); this audits how tight it actually is at
    the chosen ``out_dim`` before wiring the projection in front of
    an ANN stage (q26/q47's documented prefilter trade).

    Returns one row ``(n_pairs, out_dim, mean_ratio, min_ratio,
    max_ratio, frac_within)`` — ``frac_within`` = share of pairs with
    ratio in [1−eps, 1+eps]; floats rounded 6. Identical-vector pairs
    (zero original distance) are excluded (ratio undefined).

    Scale shape: projection is a narrow map; pairing is ONE id-keyed
    self-join (consecutive ids — the q286 pairing idiom, a stand-in
    for whatever bounded pair sample the caller prefers); the report
    is one aggregate.
    """
    rows = jl_signs(in_dim, out_dim, seed)
    proj = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_x"),
        jl_project(F.col(vec_col), rows).alias("_p"),
    )
    a = proj.alias("a")
    b = proj.alias("b")

    def _d2(u: Column, v: Column) -> Column:
        return F.aggregate(
            F.zip_with(
                u,
                v,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    pairs = a.join(
        b, F.col("a._id") + 1 == F.col("b._id")
    ).select(
        _d2(F.col("a._x"), F.col("b._x")).alias("_do"),
        _d2(F.col("a._p"), F.col("b._p")).alias("_dp"),
    ).where(F.col("_do") > 0)
    ratio = F.col("_dp") / F.col("_do")
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.lit(out_dim).alias("out_dim"),
        F.round(F.avg(ratio), 6).alias("mean_ratio"),
        F.round(F.min(ratio), 6).alias("min_ratio"),
        F.round(F.max(ratio), 6).alias("max_ratio"),
        F.round(
            F.avg(
                (
                    (ratio >= 1.0 - eps) & (ratio <= 1.0 + eps)
                ).cast("double")
            ),
            6,
        ).alias("frac_within"),
    )


def nearest_centroid_eval(
    df: DataFrame, vec_col: str, label_col: str, id_col: str
) -> DataFrame:
    """Rocchio nearest-centroid classification eval (Rocchio 1971 /
    the "centroid classifier" baseline): per-label embedding
    centroids, every vector assigned to its nearest centroid by
    squared L2, scored against the true label — the 30-second "are
    these embeddings linearly separable by class at all" sanity
    check run before training anything on them.

    Returns one row per true label: ``(label, n, correct, accuracy,
    top_confusion)`` — ``top_confusion`` is the most common predicted
    label among that class's errors (ties → smallest label; null when
    the class is perfectly classified). Floats rounded 6.

    Scale shape: centroids come from ONE posexplode → (label, dim)
    average (map-side combined) rebuilt into k array rows; assignment
    is a broadcast of the k-row centroid catalog against a narrow
    scan with the (dist, ordinal) struct-min argmin (the
    pq_encode/kmeans_assign discipline); scoring is one more
    aggregate. The corpus is never self-joined.
    """
    from pyspark.sql.window import Window

    base = df.where(
        F.col(vec_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_y"),
        F.col(vec_col).alias("_x"),
    )
    dims = base.select(
        "_y", F.posexplode(F.col("_x")).alias("_d", "_v")
    ).groupBy("_y", "_d").agg(F.avg(F.col("_v").cast("double")).alias("_m"))
    cents = dims.groupBy("_y").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("_d", "_m"))),
            lambda s: s["_m"],
        ).alias("_c")
    ).select(F.col("_y").alias("_cy"), "_c")
    crossed = base.crossJoin(F.broadcast(cents))
    d2 = F.aggregate(
        F.zip_with(
            F.col("_x"),
            F.col("_c"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    best = crossed.groupBy("_id", "_y").agg(
        F.min(F.struct(d2.alias("_dist"), F.col("_cy").alias("_pred")))
        .alias("_b")
    ).select("_y", F.col("_b._pred").alias("_pred"))
    per = best.groupBy("_y", "_pred").agg(F.count("*").alias("_n"))
    per = per.persist()
    tot = per.groupBy("_y").agg(
        F.sum("_n").alias("n"),
        F.sum(F.when(F.col("_pred") == F.col("_y"), F.col("_n"))
              .otherwise(0)).alias("correct"),
    )
    werr = Window.partitionBy("_y").orderBy(
        F.desc("_n"), F.asc("_pred")
    )
    conf = (
        per.where(F.col("_pred") != F.col("_y"))
        .withColumn("_r", F.row_number().over(werr))
        .where(F.col("_r") == 1)
        .select("_y", F.col("_pred").alias("top_confusion"))
    )
    from cccatalog_spark.operators.dedup import _truncate_lineage

    # Materialize the per-label catalog, then release the cached
    # confusion counts (same session-cache-leak fix as
    # mutual_knn_pairs below — round-6 advice).
    result = _truncate_lineage(
        tot.join(conf, "_y", "left")
        .select(
            F.col("_y").alias("label"),
            F.col("n").cast("long").alias("n"),
            F.col("correct").cast("long").alias("correct"),
            F.round(F.col("correct") / F.col("n"), 6).alias("accuracy"),
            "top_confusion",
        )
    )
    per.unpersist()
    return result


def mutual_knn_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    block_col: str,
    k: int = 5,
) -> DataFrame:
    """Reciprocal (mutual) k-NN pairs within blocks — the high-
    precision near-duplicate verification filter (a pair survives only
    if EACH side ranks the other in its top-k; one-directional hubs
    drop out).  Returns canonical ``(a, b, cosine_sim, rank_ab,
    rank_ba)`` with a < b.

    Pair generation is BLOCKED on ``block_col`` (Σ_b n_b² work, the
    soundex/sorted-neighborhood sanction) — at 100 TB the block key is
    an LSH bucket or cluster id, never a constant.

    Scale shape: one block-keyed self-join, per-point top-k via a
    window partitioned by point (no global sort), then the mutual
    check is a self-semi-join of the directed top-k edge list on the
    reversed key.
    """
    from pyspark.sql.window import Window

    a = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("a"),
        F.col(vec_col).alias("va"),
    )
    b = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("b"),
        F.col(vec_col).alias("vb"),
    )
    scored = (
        a.join(b, "blk")
        .where(F.col("a") != F.col("b"))
        .select(
            "a",
            "b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("a").orderBy(F.desc("cosine_sim"), F.asc("b"))
    topk = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .persist()  # read twice: forward edges + the reversed probe
    )
    rev = topk.select(
        F.col("b").alias("a"),
        F.col("a").alias("b"),
        F.col("rank").alias("rank_ba"),
    )
    from cccatalog_spark.operators.dedup import _truncate_lineage

    # Materialize the (bounded, ≤ N·k-edge) mutual pairs, then release
    # the cached directed top-k so long-lived sessions don't
    # accumulate it (round-6 advice).
    result = _truncate_lineage(
        topk.join(rev, ["a", "b"])
        .where(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            "cosine_sim",
            F.col("rank").alias("rank_ab"),
            "rank_ba",
        )
    )
    topk.unpersist()
    return result
