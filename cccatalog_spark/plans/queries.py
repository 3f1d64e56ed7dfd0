"""Named end-to-end queries over the driver's synthetic tables.

Every entry maps an operator family from SURVEY §2 (or the
training-data extension layer) onto the testdata tables, paired with an
ANSI-SQL oracle that DuckDB executes over the same parquet for the
driver's correctness gate (row-count + schema + order-insensitive
value-hash at sf0.01).

Determinism rules followed throughout:
- every float column that results from re-ordered arithmetic (sums,
  averages, cosine) is ``round``-ed in BOTH engines;
- every top-k has a total ordering (explicit id tiebreak);
- no current_timestamp / uuid / random in oracle-checked queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cccatalog_spark.functions import text as TX
from cccatalog_spark.functions.licenses import license_from_path
from cccatalog_spark.functions.sanitize import enforce_char_limit, sanitize_string
from cccatalog_spark.functions.urls import strip_scheme, url_domain
from cccatalog_spark.operators import merge as M
from cccatalog_spark.operators import dedup as D
from cccatalog_spark.operators import similarity as SIM
from cccatalog_spark.operators.popularity import build_popularity, popularity_constants
from cccatalog_spark.sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]
QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# q01 — pricing summary (TPC-H Q1 shape; SURVEY A6/A12 agg family).
# Flagship: scan-heavy group-agg, fully codegen'd, partial agg map-side.
# ---------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q02 — top-k with total order (SURVEY O1/O2: ORDER BY ... LIMIT).
# Spark plans TakeOrderedAndProject — no global sort materialization.
# ---------------------------------------------------------------------------
@query(
    "q02_top_customers",
    oracle="""
    SELECT o_custkey,
           count(*)                   AS order_count,
           round(sum(o_totalprice),2) AS total_spend
    FROM orders
    GROUP BY o_custkey
    ORDER BY total_spend DESC, o_custkey ASC
    LIMIT 25
    """,
)
def q02_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
        .orderBy(F.desc("total_spend"), F.asc("o_custkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# q03 — broadcast dimension join chain (SURVEY J3/J5 shape).
# nation/region are broadcast by the planner (tiny); the big side is
# never shuffled for the join, only for the final group-by.
# ---------------------------------------------------------------------------
@query(
    "q03_region_rollup",
    oracle="""
    SELECT r.r_name, n.n_name,
           count(*)                    AS customer_count,
           round(sum(c.c_acctbal), 2)  AS sum_acctbal,
           round(avg(c.c_acctbal), 4)  AS avg_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q03_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("customer_count"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# q04/q05 — the MERGE engine (J1 upsert / J2 overwrite), reference
# util/loader/sql.py:185-316, as a full-outer coalesce merge.
# Target/batch are deterministic slices of orders.
# ---------------------------------------------------------------------------
_MERGE_ORACLE_BODY = """
    WITH target AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderpriority, o_orderdate
        FROM orders WHERE o_orderkey % 3 <> 0
    ),
    batch AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice + 1000.0 AS o_totalprice,
               CASE WHEN o_orderkey % 4 = 0 THEN NULL
                    ELSE o_orderpriority END AS o_orderpriority,
               o_orderdate
        FROM orders WHERE o_orderkey % 2 = 0
    )
"""


@query(
    "q04_merge_upsert",
    oracle=_MERGE_ORACLE_BODY
    + """
    SELECT coalesce(b.o_orderkey, t.o_orderkey)        AS o_orderkey,
           coalesce(b.o_custkey, t.o_custkey)          AS o_custkey,
           coalesce(b.o_orderstatus, t.o_orderstatus)  AS o_orderstatus,
           round(coalesce(b.o_totalprice, t.o_totalprice), 2) AS o_totalprice,
           coalesce(b.o_orderpriority, t.o_orderpriority)     AS o_orderpriority,
           coalesce(b.o_orderdate, t.o_orderdate)      AS o_orderdate
    FROM target t FULL OUTER JOIN batch b ON t.o_orderkey = b.o_orderkey
    """,
)
def q04_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority", "o_orderdate",
    )
    target = o.where(F.col("o_orderkey") % 3 != 0)
    batch = o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 4 == 0, F.lit(None))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
        "o_orderdate",
    )
    merged = M.merge_upsert(target, batch, ["o_orderkey"])
    return merged.withColumn("o_totalprice", F.round("o_totalprice", 2))


@query(
    "q05_merge_overwrite",
    oracle=_MERGE_ORACLE_BODY
    + """
    SELECT coalesce(b.o_orderkey, t.o_orderkey)  AS o_orderkey,
           coalesce(b.o_custkey, t.o_custkey)    AS o_custkey,
           CASE WHEN b.o_orderkey IS NOT NULL THEN b.o_orderstatus
                ELSE t.o_orderstatus END         AS o_orderstatus,
           round(CASE WHEN b.o_orderkey IS NOT NULL THEN b.o_totalprice
                      ELSE t.o_totalprice END, 2) AS o_totalprice,
           CASE WHEN b.o_orderkey IS NOT NULL THEN b.o_orderpriority
                ELSE t.o_orderpriority END       AS o_orderpriority,
           CASE WHEN b.o_orderkey IS NOT NULL THEN b.o_orderdate
                ELSE t.o_orderdate END           AS o_orderdate
    FROM target t FULL OUTER JOIN batch b ON t.o_orderkey = b.o_orderkey
    """,
)
def q05_merge_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority", "o_orderdate",
    )
    target = o.where(F.col("o_orderkey") % 3 != 0)
    batch = o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 4 == 0, F.lit(None))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
        "o_orderdate",
    )
    merged = M.merge_overwrite(target, batch, ["o_orderkey"])
    return merged.withColumn("o_totalprice", F.round("o_totalprice", 2))


# ---------------------------------------------------------------------------
# q06 — replay collapse (J7 single-pass): multi-version batch folded to
# one row per key with last-non-null scalars + right-biased map fold.
# ---------------------------------------------------------------------------
@query(
    "q06_replay_collapse",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS val,
               regexp_extract(props, '"k": ([0-9]+)', 1) AS k
        FROM events
    ),
    last_row AS (
        SELECT user_id, event_type, k FROM (
            SELECT user_id, event_type, k,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM e) WHERE rn = 1
    ),
    last_val AS (
        SELECT user_id, val FROM (
            SELECT user_id, val,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM e WHERE val IS NOT NULL) WHERE rn = 1
    )
    SELECT r.user_id,
           r.event_type AS last_event_type,
           round(v.val, 2) AS last_value,
           r.k AS last_k
    FROM last_row r LEFT JOIN last_val v ON r.user_id = v.user_id
    """,
)
def q06_replay_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.struct(F.col("ts"), F.col("event_id")).alias("_ord"),
        "event_type",
        F.when(F.col("event_type") == "error", F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("val"),
        F.from_json("props", "map<string,string>").alias("props_map"),
    )
    collapsed = M.replay_collapse(e, ["user_id"], "_ord")
    return collapsed.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.round("val", 2).alias("last_value"),
        F.element_at("props_map", "k").alias("last_k"),
    )


# ---------------------------------------------------------------------------
# q07 — window row_number (W1: the reference's only window function).
# ---------------------------------------------------------------------------
@query(
    "q07_latest_orders",
    oracle="""
    SELECT o_custkey, o_orderkey, rn FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders)
    WHERE rn <= 2
    """,
)
def q07_latest_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "rn")
    )


# ---------------------------------------------------------------------------
# q08 — discrete percentile within group (A8; percentile_disc parity,
# SURVEY §4.3.2: sorted[ceil(p*n)] — matches Postgres AND DuckDB).
# ---------------------------------------------------------------------------
@query(
    "q08_percentile_disc",
    oracle="""
    SELECT l_returnflag,
           percentile_disc(0.85) WITHIN GROUP (ORDER BY l_quantity) AS p85_qty,
           percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS p50_qty,
           round(percentile_disc(0.85) WITHIN GROUP (ORDER BY l_extendedprice), 2)
               AS p85_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q08_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cccatalog_spark.functions.popularity import percentile_disc

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        percentile_disc(F.col("l_quantity"), 0.85).alias("p85_qty"),
        percentile_disc(F.col("l_quantity"), 0.5).alias("p50_qty"),
        F.round(percentile_disc(F.col("l_extendedprice"), 0.85), 2).alias(
            "p85_price"
        ),
    )


# ---------------------------------------------------------------------------
# q09/q10 — popularity pipeline (A8+A9+F17+F18; util/popularity/sql.py),
# events as the fact table, event_type as the provider.
# ---------------------------------------------------------------------------
@query(
    "q09_popularity_constants",
    oracle="""
    WITH raw AS (
        SELECT event_type,
               percentile_disc(0.85) WITHIN GROUP (ORDER BY value) AS raw_value
        FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(0.85 AS DOUBLE) AS percentile,
           round(raw_value, 6) AS raw_value,
           round(CASE WHEN raw_value = 0 THEN 1.0 ELSE raw_value END, 6) AS value,
           round((1 - 0.85) / 0.85 *
                 CASE WHEN raw_value = 0 THEN 1.0 ELSE raw_value END, 6) AS constant
    FROM raw
    """,
)
def q09_popularity_constants(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    metrics = ev.select("event_type").distinct().withColumn(
        "percentile", F.lit(0.85)
    )
    consts = popularity_constants(ev, metrics, "event_type", F.col("value"))
    return consts.select(
        "event_type",
        "percentile",
        F.round("raw_value", 6).alias("raw_value"),
        F.round("value", 6).alias("value"),
        F.round("constant", 6).alias("constant"),
    )


@query(
    "q10_standardized_popularity",
    oracle="""
    WITH consts AS (
        SELECT event_type,
               (1 - 0.85) / 0.85 * (
                 CASE WHEN raw = 0 THEN 1.0 ELSE raw END) AS constant
        FROM (SELECT event_type,
                     percentile_disc(0.85) WITHIN GROUP (ORDER BY value) AS raw
              FROM events GROUP BY event_type)
    )
    SELECT e.event_type,
           count(*) AS n,
           round(avg(e.value / (e.value + c.constant)), 6) AS avg_score,
           round(max(e.value / (e.value + c.constant)), 6) AS max_score
    FROM events e JOIN consts c USING (event_type)
    GROUP BY e.event_type
    """,
)
def q10_standardized_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    metrics = ev.select("event_type").distinct().withColumn(
        "percentile", F.lit(0.85)
    )
    scored = build_popularity(ev, metrics, "event_type", F.col("value"))
    return scored.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg("standardized_popularity"), 6).alias("avg_score"),
        F.round(F.max("standardized_popularity"), 6).alias("max_score"),
    )


# ---------------------------------------------------------------------------
# q11 — grouped count-distinct (A6).
# ---------------------------------------------------------------------------
@query(
    "q11_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(*)                   AS n,
           count(DISTINCT l_partkey)  AS parts,
           count(DISTINCT l_suppkey)  AS supps,
           count(DISTINCT l_orderkey) AS orders
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q11_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.countDistinct("l_partkey").alias("parts"),
        F.countDistinct("l_suppkey").alias("supps"),
        F.countDistinct("l_orderkey").alias("orders"),
    )


# ---------------------------------------------------------------------------
# q12 — exact dedup (A3/A4/A5 family + training-data exact dedup):
# deterministic survivor (min id) per content hash.
# ---------------------------------------------------------------------------
@query(
    "q12_dedup_exact",
    oracle="""
    SELECT md5(text)   AS content_hash,
           min(doc_id) AS doc_id,
           count(*)    AS dup_count
    FROM documents GROUP BY md5(text)
    """,
)
def q12_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.dedup_exact(docs, "text", "doc_id").select(
        "content_hash", "doc_id", "dup_count"
    )


# ---------------------------------------------------------------------------
# q13 — set difference (U1).
# ---------------------------------------------------------------------------
@query(
    "q13_set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q13_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_ = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    done = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    # subtract = SQL EXCEPT (distinct semantics)
    return open_.subtract(done)


# ---------------------------------------------------------------------------
# q14 — JSON field extract + cast (F15: (meta_data->>metric)::float).
# regexp-based so Spark's get_json_object quirks can't diverge from
# DuckDB's json extension availability.
# ---------------------------------------------------------------------------
@query(
    "q14_json_extract",
    oracle="""
    SELECT event_type,
           sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS sum_k,
           max(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS max_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q14_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.regexp_extract("props", '"k": ([0-9]+)', 1).cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# q15 — distinct array union rendered stably (A10/U3 tag-merge family).
# ---------------------------------------------------------------------------
@query(
    "q15_tags_union",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list_distinct(list(event_type))), ',')
               AS event_types,
           count(*) AS n
    FROM events GROUP BY user_id
    """,
)
def q15_tags_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias(
            "event_types"
        ),
        F.count("*").alias("n"),
    )


def all_queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(ORACLE)
