"""Content-defined chunking (CDC) dedup — the rsync/LBFS/casync
primitive (Muthitacharoen et al. SOSP'01) applied to corpus text:
cut each document at content-determined anchor positions so that a
shared passage produces the SAME chunks regardless of where it sits
in the two documents, then dedup chunks corpus-wide by hash.  This is
what byte-shift-robust storage dedup and "how much of my corpus is
recycled boilerplate" audits run on; q89's suffix-style substring
dedup finds the overlaps, CDC prices them in storage terms.

Anchor rule (position-independent, hence embarrassingly parallel
within a document — no sequential rolling state): position ``i``
(1-based, ``i ≥ w``) is a cut iff the 48-bit md5 integer of the
``w``-char window ending at ``i`` is ≡ 0 (mod ``modulus``).  Expected
chunk length ≈ ``modulus`` chars.  The window hash doubles as the
gear/Rabin fingerprint of classical CDC; md5 keeps it exactly
replayable in the DuckDB oracle (same ``conv(substr(md5(...)))``
idiom as every derandomized sampler in this codebase).

Scale shape: chunking is pure per-row column algebra (sequence →
filter → transform → posexplode) — O(len·w) hash work, zero shuffle;
the dedup report is one groupBy on chunk hash.  No Python UDFs.
HOF lambdas get no CSE, so the anchor scan (the dominant O(len·w)
md5 work) and the document length are each BOUND ONCE per row via
``functions.text.bind_once`` — the naive inline form re-ran the full
anchor scan three times per row (size + two element_at references)
and re-counted ``length(text)`` once per candidate position.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cccatalog_spark.functions.text import bind_once


def _bounds(text: Column, w: int, modulus: int) -> Column:
    """Chunk boundary array ``[0, cut_1, …, len]`` for the anchor
    rule: cuts strictly BEFORE the end position, then the end
    appended — uniqueness and ascending order by construction (no
    distinct, whose list twin in the oracle engine does not pin
    order).  ``length(text)`` is bound once (it is O(len) to count
    and the filter lambda reads it at every candidate position)."""

    def body(n: Column) -> Column:
        def is_anchor(i: Column) -> Column:
            return (
                F.conv(
                    F.substring(
                        F.md5(text.substr(i - (w - 1), F.lit(w))), 1, 12
                    ),
                    16,
                    10,
                ).cast("bigint")
                % modulus
                == 0
            )

        cuts = F.concat(
            F.filter(
                F.sequence(F.lit(w), F.greatest(n, F.lit(w))),
                lambda i: (i < n) & is_anchor(i),
            ),
            F.array(n),
        )
        return F.concat(F.array(F.lit(0)), cuts)

    return bind_once(F.length(text), body)


def cdc_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    w: int = 8,
    modulus: int = 64,
) -> DataFrame:
    """Explode each document into its content-defined chunks:
    ``(id, chunk_idx, chunk_len, chunk_hash)`` (idx 1-based in
    document order).  Empty texts produce no rows.
    """
    text = F.col(text_col)

    def chunks_of(b: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(2), F.size(b)),
            lambda j: text.substr(
                F.element_at(b, j - 1) + 1,
                F.element_at(b, j) - F.element_at(b, j - 1),
            ),
        )

    chunks = bind_once(_bounds(text, w, modulus), chunks_of)
    return (
        df.where(F.length(text_col) > 0)
        .select(id_col, F.posexplode(chunks).alias("_p", "_c"))
        .select(
            id_col,
            (F.col("_p") + 1).cast("long").alias("chunk_idx"),
            F.length("_c").cast("long").alias("chunk_len"),
            F.md5("_c").alias("chunk_hash"),
        )
    )


def cdc_dedup_report(
    df: DataFrame,
    text_col: str,
    id_col: str,
    w: int = 8,
    modulus: int = 64,
) -> DataFrame:
    """One-row corpus CDC-dedup scorecard: ``(n_docs, n_chunks,
    n_distinct_chunks, total_chars, dedup_chars, dedup_ratio,
    avg_chunk_len, max_chunk_copies)``.

    ``dedup_chars`` = chars stored after keeping one copy per distinct
    chunk; ``dedup_ratio`` = dedup_chars / total_chars (1.0 = nothing
    shared).
    """
    ch = cdc_chunks(df, text_col, id_col, w=w, modulus=modulus)
    per_hash = ch.groupBy("chunk_hash").agg(
        F.count("*").cast("long").alias("copies"),
        F.max("chunk_len").alias("clen"),
    )
    return per_hash.agg(
        F.sum("copies").cast("long").alias("n_chunks"),
        F.count("*").cast("long").alias("n_distinct_chunks"),
        F.sum(F.col("copies") * F.col("clen")).cast("long").alias(
            "total_chars"
        ),
        F.sum("clen").cast("long").alias("dedup_chars"),
        F.max("copies").cast("long").alias("max_chunk_copies"),
    ).crossJoin(
        F.broadcast(
            df.where(F.length(text_col) > 0).agg(
                F.count("*").cast("long").alias("n_docs")
            )
        )
    ).select(
        "n_docs",
        "n_chunks",
        "n_distinct_chunks",
        "total_chars",
        "dedup_chars",
        F.round(
            F.when(
                F.col("total_chars") > 0,
                F.col("dedup_chars").cast("double") / F.col("total_chars"),
            ),
            6,
        ).alias("dedup_ratio"),
        F.round(
            F.col("total_chars").cast("double") / F.col("n_chunks"), 6
        ).alias("avg_chunk_len"),
        "max_chunk_copies",
    )
