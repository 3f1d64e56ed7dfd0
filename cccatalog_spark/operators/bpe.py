"""Distributed BPE merge learning (Sennrich et al. 2016, *Neural
Machine Translation of Rare Words with Subword Units*) — the
tokenizer-training half of the token-accounting story
(:func:`cccatalog_spark.functions.text.bpe_tokens` applies a learned
tokenizer's pre-split regex; this module LEARNS the merge table from
the corpus).

Classic BPE learning is an in-memory loop over a word-frequency dict.
The distributed re-expression keeps exactly that loop structure but
makes each step a bounded Spark job over the *word-type* table (vocab
rows, not corpus rows — the corpus is scanned once to build word
frequencies, then never again):

1. words → char-symbol arrays, weighted by corpus frequency;
2. per round: adjacent-pair counts = one explode + one
   map-side-combinable groupBy over vocab rows; the argmax pair is a
   deterministic TakeOrdered(1) (count desc, pair asc tiebreak);
3. the chosen pair is folded into every word's symbol array with a
   single codegen'd ``aggregate`` lambda implementing the standard
   greedy left-to-right non-overlapping merge;
4. repeat for ``n_merges`` rounds.

Driver state is one (left, right, count) row per round — the merge
table itself, which is the artifact you ship to the tokenizer. At
100 TB the vocab table is millions of rows (not corpus-sized), so
each round is seconds; rounds are inherently sequential in BPE by
definition, exactly as in the reference implementations.

Reference anchor: no BPE trainer exists in the reference (SURVEY §2
extension layer); its token-adjacent surface is tag/text cleanup in
ImageStore (image.py:200-233).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_frequencies(df: DataFrame, toks_col: Column) -> DataFrame:
    """(word, freq) over the corpus — the single corpus-wide scan;
    everything after runs on vocab rows."""
    return (
        df.select(F.explode(toks_col).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_pair(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping merge of adjacent
    (left, right) symbol pairs into one ``left+right`` symbol — the
    textbook BPE apply step, as one fold."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<l,r>> of adjacent symbol pairs."""
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(syms, 1, n - 1),
            F.slice(syms, 2, n - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def learn_merges(
    word_freqs: DataFrame, n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from a (word, freq) table.

    Returns ``[(step, left, right, pair_count), ...]`` — ``step`` is
    1-based; ``pair_count`` is the corpus-weighted frequency of the
    chosen pair at the time it was chosen. Stops early when no
    adjacent pair remains. Deterministic: the argmax tiebreak is
    (count desc, left asc, right asc).
    """
    cur = word_freqs.select(
        F.split(F.col("word"), "").alias("syms"), F.col("freq")
    ).persist()
    prev: DataFrame | None = None
    out: list[tuple[int, str, str, int]] = []
    try:
        for step in range(1, n_merges + 1):
            # ONE job per round: the argmax aggregation's scan of the
            # persisted-but-cold ``cur`` doubles as its cache
            # materialization (through ``prev``'s still-live cache),
            # so the old explicit ``nxt.count()`` job is gone.
            top = (
                cur.select(
                    F.explode(_adjacent_pairs(F.col("syms"))).alias("p"),
                    "freq",
                )
                .groupBy("p.l", "p.r")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top:
                break
            left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
            out.append((step, left, right, cnt))
            if step < n_merges:  # the final round's merged table is never read
                nxt = cur.select(
                    _merge_pair(F.col("syms"), left, right).alias("syms"),
                    "freq",
                ).persist()
                prev, cur = cur, nxt
        return out
    finally:
        cur.unpersist()
        if prev is not None:
            prev.unpersist()


def learn_merges_df(
    spark, df: DataFrame, toks_col: Column, n_merges: int
) -> DataFrame:
    """DataFrame wrapper: (step, left, right, merged, pair_count) —
    the merge table learned from a document frame."""
    merges = learn_merges(word_frequencies(df, toks_col), n_merges)
    return spark.createDataFrame(
        [(s, l, r, l + r, c) for s, l, r, c in merges],
        "step int, left string, right string, merged string, pair_count bigint",
    )


def apply_merges(syms: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply a learned merge table to a symbol-array column, in merge
    order — the BPE encode step. Each merge is one codegen'd fold;
    the whole chain is a single narrow projection (no shuffle, no
    UDF). ``merges`` is [(left, right), ...] as learned by
    :func:`learn_merges`."""
    out = syms
    for left, right in merges:
        out = _merge_pair(out, left, right)
    return out


def encode_report(
    df: DataFrame,
    toks_col: Column,
    group_col: str,
    n_merges: int,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus, apply them, and
    report per-``group_col`` token economics:

    (group, symbols_before, symbols_after, compression)

    ``symbols_before`` is the char-symbol count (pre-merge),
    ``symbols_after`` the post-merge symbol count; ``compression`` =
    after/before, rounded.

    Scale shape: both learning AND application run on the word-TYPE
    table (vocab rows); the corpus contributes one (group, word) count
    aggregation, and the final report re-joins vocab-level encode
    lengths to those counts — the corpus text is scanned exactly once
    and never re-tokenized per merge.
    """
    wsrc = (
        df.select(F.col(group_col), F.explode(toks_col).alias("word"))
        .groupBy(group_col, "word")
        .agg(F.count("*").alias("cnt"))
        .persist()
    )
    try:
        wf = wsrc.groupBy("word").agg(F.sum("cnt").alias("freq"))
        merges = [(l, r) for _, l, r, _ in learn_merges(wf, n_merges)]
        encoded = wsrc.select(group_col, "word", "cnt").join(
            wf.select(
                "word",
                F.length("word").alias("__before"),
                F.size(
                    apply_merges(F.split(F.col("word"), ""), merges)
                ).alias("__after"),
            ),
            "word",
        )
        return (
            encoded.groupBy(group_col)
            .agg(
                F.sum(F.col("cnt") * F.col("__before")).alias("symbols_before"),
                F.sum(F.col("cnt") * F.col("__after")).alias("symbols_after"),
            )
            .select(
                group_col,
                "symbols_before",
                "symbols_after",
                F.round(
                    F.col("symbols_after") / F.col("symbols_before"), 6
                ).alias("compression"),
            )
        )
    finally:
        wsrc.unpersist()
