"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD'03 — the MOSS algorithm): select a position-robust subset of
k-gram hashes such that every window of ``w`` consecutive k-grams
contributes at least one selected hash. The guarantee makes any
shared substring of length >= w + k - 1 tokens produce at least one
SHARED fingerprint between two documents — local similarity detection
(plagiarism, quote reuse, template text) with storage ~2/(w+1) of the
full gram set, where q30's single min-hash fingerprint only catches
whole-document duplication.

Selection rule (textbook): for each window of ``w`` consecutive gram
hashes take the RIGHTMOST minimal hash; the selected set is the
distinct (position, hash) union over windows. Implemented as pure
array algebra per document — build the gram-hash array, then one
``transform`` over window starts taking the rightmost argmin of each
``slice`` — so it whole-stage-codegens and replays exactly in SQL
(DuckDB list_transform/list_slice/list_position on the reversed
slice). No UDF, no window function, no shuffle until the caller
aggregates fingerprints.

Scale: per-row cost is O(n_grams * w) comparisons inside codegen
(fine for w <= ~16; the classic algorithm's O(n) deque variant only
pays off in pointer-machine land); output fan-out is the ~2n/(w+1)
expected selected set. The cross-document join is an equi-join on the
fingerprint hash — shuffle keyed by hash, bounded by match counts,
with ubiquitous-hash skew capped by ``max_doc_freq`` exactly like the
shingle inverted index in operators/dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def gram_hashes(text: Column, k: int = 4) -> Column:
    """Array of md5 hex hashes of the k-gram token windows (md5 so the
    DuckDB oracle reproduces values exactly)."""
    toks = F.filter(F.split(text, r"\s+"), lambda t: t != "")
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.md5(F.array_join(F.slice(toks, i, k), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))


def winnow_positions(hashes: Column, w: int = 5) -> Column:
    """Distinct selected positions (1-based into the gram array) under
    the rightmost-min-per-window rule. Windows are the ``len-w+1``
    runs of ``w`` consecutive hashes; shorter docs fall back to one
    whole-array window."""
    n = F.size(hashes)
    n_win = F.greatest(n - F.lit(w) + 1, F.lit(1))
    win_len = F.least(F.lit(w), n)

    def rightmost_argmin(q: Column) -> Column:
        s = F.slice(hashes, q, win_len)
        # rightmost occurrence of the min = len - position-in-reverse + 1
        return (
            q
            + (
                F.size(s)
                - F.array_position(F.reverse(s), F.array_min(s))
            ).cast("int")
        )

    return F.when(n > 0, F.array_distinct(
        F.transform(F.sequence(F.lit(1), n_win), rightmost_argmin)
    )).otherwise(F.array().cast("array<int>"))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """Exploded fingerprint frame ``(id, pos, fp)`` — one row per
    selected (position, hash) per document."""
    g = df.select(
        F.col(id_col).alias("_id"),
        gram_hashes(F.col(text_col), k).alias("_h"),
    )
    sel = g.select(
        "_id",
        "_h",
        F.explode(winnow_positions(F.col("_h"), w)).alias("pos"),
    )
    return sel.select(
        F.col("_id").alias(id_col),
        "pos",
        F.element_at("_h", F.col("pos")).alias("fp"),
    )


def shared_fingerprint_pairs(
    fps: DataFrame,
    id_col: str,
    min_shared: int = 2,
    max_doc_freq: int = 50,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` distinct fingerprint
    hashes: ``(id_a, id_b, shared)`` with id_a < id_b. Hashes present
    in more than ``max_doc_freq`` documents are dropped first (the
    boilerplate guard every inverted-index joiner in this repo uses —
    a ubiquitous fingerprint pairs everything with everything)."""
    # consumed by the frequency count, and twice as join sides:
    # persist or the winnowing selection recomputes per consumer
    post = fps.select(F.col(id_col).alias("_id"), "fp").distinct().persist()
    rare = (
        post.groupBy("fp")
        .agg(F.count("*").alias("_df"))
        .where(F.col("_df") <= max_doc_freq)
        .select("fp")
    )
    p = post.join(rare, "fp", "left_semi")
    a = p.select(F.col("_id").alias("id_a"), "fp")
    b = p.select(F.col("_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
