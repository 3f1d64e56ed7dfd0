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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cuts_expr(text_col: str, w: int, modulus: int) -> str:
    """SQL expr: sorted cut positions (window ends) for the anchor
    rule, always terminated by len(text)."""
    anchor = (
        f"cast(conv(substring(md5(substring({text_col}, i - {w - 1}, {w})),"
        f" 1, 12), 16, 10) as bigint) % {modulus} = 0"
    )
    # cuts strictly BEFORE the end position, then the end appended —
    # uniqueness and ascending order by construction (no distinct,
    # whose list twin in the oracle engine does not pin order)
    return (
        f"concat("
        f"filter(sequence({w}, greatest(length({text_col}), {w})),"
        f" i -> i < length({text_col}) and {anchor}),"
        f" array(length({text_col})))"
    )


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
    cuts = _cuts_expr(text_col, w, modulus)
    bounds = f"concat(array(0), {cuts})"
    chunks = (
        f"transform(sequence(2, size({bounds})), j -> "
        f"substring({text_col}, element_at({bounds}, j - 1) + 1, "
        f"element_at({bounds}, j) - element_at({bounds}, j - 1)))"
    )
    return (
        df.where(F.length(text_col) > 0)
        .select(id_col, F.posexplode(F.expr(chunks)).alias("_p", "_c"))
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
