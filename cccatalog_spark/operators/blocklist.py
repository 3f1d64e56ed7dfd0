"""Token-n-gram phrase blocklist matching — the "does this doc
contain any banned phrase?" screen (toxicity lists, brand-safety
terms, spam templates) that runs ahead of quality filtering in a
training-data pipeline.

The classic single-node tool is Aho-Corasick over the raw bytes; the
Spark-native equivalent used here gets the same effect with relational
operators only: tokenize once, build every 1..L-token gram at each
position with lead() windows (L = longest phrase, a small constant),
and broadcast-hash-join the gram stream against the phrase set.
Matching is on NORMALIZED token boundaries (lowercase, non-alphanumeric
folded to single spaces) — substring false positives ("class" hitting
"ass") cannot happen, unlike raw LIKE scans.

Scale shape: one doc-keyed shuffle (the lead window over token
positions) + one broadcast join against the ≤thousands-row phrase
dim + one per-doc aggregate. Token stream is |tokens| rows with L
narrow string columns — linear, no self-join, no UDF. At 100 TB the
window shuffle shards by doc hash; the phrase dim broadcasts whole.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def normalize_for_match(col: Column) -> Column:
    """Lowercase, fold every non-alphanumeric run to one space, trim —
    the same normalization applied to docs and phrases so the equi-join
    is exact."""
    return F.trim(
        F.regexp_replace(F.lower(col), "[^a-z0-9]+", " ")
    )


def phrase_match_report(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    phrases: list[str],
) -> DataFrame:
    """Per-document blocklist hits: ``(id, n_matches, n_phrases,
    phrases, first_pos)`` for documents with >= 1 match. ``phrases``
    is '|'-joined sorted-distinct matched phrases (stringified so the
    driver's canonicalizer can sort it); ``first_pos`` is the
    1-based token position of the earliest match. Phrase matching is
    token-exact after :func:`normalize_for_match`; multi-token
    phrases match as contiguous token runs.
    """
    import re as _re

    # phrases get the SAME normalization as documents, so "don't
    # buy" matches the tokenized "don t buy" rather than silently
    # never matching
    norm = sorted({p for p in (
        _re.sub(r"[^a-z0-9]+", " ", ph.lower()).strip()
        for ph in phrases
    ) if p})
    if not norm:
        raise ValueError("phrases must contain at least one non-empty entry")
    max_n = max(len(p.split()) for p in norm)
    spark = docs.sparkSession
    pdim = spark.createDataFrame([(p,) for p in norm], ["gram"])

    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.split(normalize_for_match(F.col(text_col)), " ")
        ).alias("pos", "tok"),
    ).where(F.col("tok") != "")
    w = Window.partitionBy("_id").orderBy("pos")
    gram_cols = [F.col("tok").alias("g1")]
    run = F.col("tok")
    for n in range(2, max_n + 1):
        # concat (not concat_ws) so a missing lead token nulls the gram
        run = F.concat(run, F.lit(" "), F.lead("tok", n - 1).over(w))
        gram_cols.append(run.alias(f"g{n}"))
    stacked = (
        toks.select("_id", (F.col("pos") + 1).alias("pos"), *gram_cols)
        .select(
            "_id",
            "pos",
            F.explode(
                F.filter(
                    F.array(*[F.col(f"g{n}") for n in range(1, max_n + 1)]),
                    lambda g: g.isNotNull(),
                )
            ).alias("gram"),
        )
    )
    hits = stacked.join(F.broadcast(pdim), "gram")
    return hits.groupBy(F.col("_id").alias(id_col)).agg(
        F.count("*").alias("n_matches"),
        F.count_distinct("gram").alias("n_phrases"),
        F.concat_ws("|", F.array_sort(F.collect_set("gram"))).alias(
            "phrases"
        ),
        F.min("pos").alias("first_pos"),
    )
