"""Provider-maintenance operators — J3/J4/J5 sub-provider updates,
P9 expiration, U1 unit-code diff (SURVEY §2.3/§2.2/§2.7).

Reference realizations are row-at-a-time UPDATE loops over Postgres
(util/loader/sql.py:354-618, 621-667; smithsonian_unit_codes.py:57-75);
each becomes one broadcast join + column expression here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def apply_sub_providers(
    image: DataFrame,
    sub_providers: DataFrame,
    match_col: str,
    provider: str,
    *,
    sub_col: str = "sub_provider",
) -> DataFrame:
    """J3 (flickr shape, sql.py:354-451): broadcast the tiny
    (match_col, sub_provider) dimension, inner-match rows of the given
    provider on ``match_col``, set ``source`` to the sub-provider where
    matched, else keep the existing source. The reference loops an
    UPDATE per sub-provider; here the whole table updates in one pass
    and the big side never shuffles (broadcast hash join)."""
    dim = sub_providers.select(
        F.col(match_col).alias("_match"), F.col(sub_col).alias("_sub")
    )
    joined = image.join(
        F.broadcast(dim),
        (image[match_col] == F.col("_match"))
        & (image["provider"] == F.lit(provider)),
        "left",
    )
    return joined.withColumn(
        "source", F.coalesce(F.col("_sub"), F.col("source"))
    ).drop("_match", "_sub")


def apply_sub_providers_array(
    image: DataFrame,
    sub_providers: DataFrame,
    array_col: str,
    provider: str,
    *,
    key_col: str = "data_provider",
    sub_col: str = "sub_provider",
) -> DataFrame:
    """J4 (europeana shape, sql.py:454-565): the match key is
    membership in an array column (jsonb ``?`` containment). Ambiguity
    (a row matching >1 sub-provider) is an error in the reference; we
    surface it as ``_sub_matches`` for the caller to assert on."""
    dim = sub_providers.select(
        F.col(key_col).alias("_key"), F.col(sub_col).alias("_sub")
    )
    joined = image.join(
        F.broadcast(dim),
        F.array_contains(image[array_col], F.col("_key"))
        & (image["provider"] == F.lit(provider)),
        "left",
    )
    agg = {c: F.first(c) for c in image.columns if c != "identifier"}
    # one output row per image row; count matches for the assertion
    grouped = (
        joined.groupBy("identifier")
        .agg(
            F.count("_sub").alias("_sub_matches"),
            F.first("_sub", ignorenulls=True).alias("_sub_first"),
            *[v.alias(k) for k, v in agg.items()],
        )
    )
    return grouped.withColumn(
        "source", F.coalesce(F.col("_sub_first"), F.col("source"))
    ).drop("_sub_first")


def apply_sub_providers_array_exploded(
    image: DataFrame,
    sub_providers: DataFrame,
    array_col: str,
    provider: str,
    *,
    key_col: str = "data_provider",
    sub_col: str = "sub_provider",
    id_col: str = "identifier",
) -> DataFrame:
    """J4 at scale: same semantics as :func:`apply_sub_providers_array`
    but as explode → hash equi-join → per-id re-aggregate, instead of a
    BroadcastNestedLoopJoin evaluating ``array_contains`` per dim row.

    Shape: only rows of the target provider explode; the (id, element)
    pairs equi-join the dimension (broadcast while small, SMJ/SHJ when
    the dim outgrows broadcast — impossible for a non-equi BNLJ); only
    MATCHED ids re-join the image, so the wide image rows never pass
    through a groupBy/first over every column. ``array_distinct`` keeps
    one pair per (id, element), matching jsonb ``?`` containment."""
    dim = sub_providers.select(
        F.col(key_col).alias("_key"), F.col(sub_col).alias("_sub")
    )
    pairs = (
        image.where(F.col("provider") == F.lit(provider))
        .select(
            F.col(id_col).alias("_id"),
            F.explode(F.array_distinct(F.col(array_col))).alias("_elem"),
        )
    )
    matches = (
        pairs.join(F.broadcast(dim), F.col("_elem") == F.col("_key"))
        .groupBy("_id")
        .agg(
            F.count("_sub").alias("_sub_matches"),
            F.min("_sub").alias("_sub_first"),
        )
    )
    # matches derives from the big side — never force-broadcast it;
    # the equi-join lets AQE pick broadcast/SHJ/SMJ from its real size
    joined = image.join(matches, image[id_col] == matches["_id"], "left")
    return (
        joined.withColumn(
            "_sub_matches", F.coalesce(F.col("_sub_matches"), F.lit(0))
        )
        .withColumn("source", F.coalesce(F.col("_sub_first"), F.col("source")))
        .drop("_id", "_sub_first")
    )


def sub_provider_from_code(
    image: DataFrame,
    code_map: dict[str, str],
    code_col: str,
    provider: str,
) -> DataFrame:
    """J5 (smithsonian shape, sql.py:568-618 + provider_details.py):
    in-code dict → literal map expression; unknown codes raise in the
    reference — here they surface as null sub_provider plus an
    ``_unknown_code`` flag the caller can fail on."""
    pairs: list[Column] = []
    for k, v in code_map.items():
        pairs.extend([F.lit(k), F.lit(v)])
    m = F.create_map(*pairs)
    is_provider = F.col("provider") == provider
    sub = F.element_at(m, F.col(code_col))
    return image.withColumn(
        "source", F.when(is_provider, F.coalesce(sub, F.col("source"))).otherwise(F.col("source"))
    ).withColumn(
        "_unknown_code", is_provider & sub.isNull() & F.col(code_col).isNotNull()
    )


def mark_expired(
    image: DataFrame,
    ttl_by_provider: dict[str, str],
    *,
    now: Column | None = None,
    updated_col: str = "updated_on",
) -> DataFrame:
    """P9 (sql.py:621-667): set removed_from_source where updated_on is
    older than the provider's TTL interval. ``now`` defaults to
    current_timestamp; pass an anchor column for deterministic tests."""
    now = now if now is not None else F.current_timestamp()
    expired = F.lit(False)
    for provider, interval in ttl_by_provider.items():
        expired = expired | (
            (F.col("provider") == provider)
            & (F.col(updated_col) < now - F.expr(f"INTERVAL {interval}"))
        )
    return image.withColumn(
        "removed_from_source", F.col("removed_from_source") | expired
    )


def unit_code_diff(
    current: DataFrame, saved: DataFrame, code_col: str = "unit_code"
) -> tuple[DataFrame, DataFrame]:
    """U1 (smithsonian_unit_codes.py:57-75): (new codes, outdated
    codes) as two anti-joins."""
    cur = current.select(code_col).distinct()
    sav = saved.select(code_col).distinct()
    return cur.subtract(sav), sav.subtract(cur)


def merge_continue_batches(
    partials: DataFrame,
    key: str = "pageid",
    seq: str = "seq",
    *,
    list_cols: tuple[str, ...] = ("globalusage",),
) -> DataFrame:
    """Wikimedia continue-token response accumulation as an engine op
    (wikimedia_commons.py:110-222, _merge_response_jsons /
    _merge_image_pages): the API returns a page in PARTIAL slices
    across continue-token requests; per page-id, scalar fields are
    right-biased — the latest response that carries the field wins
    (dict.update semantics) — while the ``globalusage`` usage lists
    CONCATENATE in response order.

    One hash aggregation on ``key`` (single shuffle):

    - scalar columns → ``max_by(col, seq-where-present)``: the value
      from the highest ``seq`` whose slice has the field non-null;
    - list columns → ``flatten(sorted-by-seq collect_list)``: slice
      order is preserved no matter which partition each slice arrived
      in, so the op is deterministic under shuffle.

    Per-page slice counts are API-bounded (MEAN_GLOBAL_USAGE_LIMIT),
    so collect_list stays small per group — no skew concern at scale.
    """
    scalar_cols = [
        c for c in partials.columns if c not in {key, seq, *list_cols}
    ]
    aggs: list[Column] = [
        F.max_by(
            F.col(c), F.when(F.col(c).isNotNull(), F.col(seq))
        ).alias(c)
        for c in scalar_cols
    ]
    for c in list_cols:
        ordered = F.array_sort(
            F.collect_list(F.struct(F.col(seq).alias("_s"), F.col(c).alias("_v")))
        )
        aggs.append(
            F.flatten(F.transform(ordered, lambda s: s["_v"])).alias(c)
        )
    return partials.groupBy(key).agg(*aggs)
