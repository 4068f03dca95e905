"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` covers SURVEY.md §2's operator inventory plus the
large-scale-pipeline extensions (dedup / similarity / text analysis /
multimodal); each entry has an exactly-equivalent DuckDB oracle in
``oracle_sql()`` (same aliases, deterministic values).

Determinism design (why results hash-match an independent engine):

* money/value aggregates run in **integer cents** (every value column
  in the testdata is 2-decimal), so sums are exact integer math on
  both engines; final division to double is a single deterministic op;
* hashing uses the portable md5-prefix 60-bit family from
  :mod:`rheoceros_spark.functions.portable` (bit-equal in Spark and
  DuckDB);
* dot/cosine are sequential left folds in double — verified bit-exact
  across engines on the driver's embeddings;
* every ordering has a total tie-break; every computed column is
  aliased identically on both sides.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rheoceros_spark.functions.portable import jaccard_sql
from rheoceros_spark.operators import (
    ann_lsh_topk,
    attach_media,
    cosine_topk,
    dedup_exact,
    embedding_dup_pairs,
    embedding_dup_pairs_blocked,
    extract_features,
    fingerprint,
    contamination_ngrams,
    dup_clusters,
    lang_id,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    pack_sequences,
    pii_redact,
    quality_score,
    sample_frames,
    shuffle_shards,
    simhash_pairs,
    stratified_hash_sample,
    token_count,
    vocab_top_tokens,
)
from rheoceros_spark.functions.portable import tokens
from rheoceros_spark.sources.io import load_table

SF001 = "/root/testdata/sf0.001"

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}

#: Verification twins retired from the driver window (round 7).  The
#: 50-slot window + consecutive-round-coverage invariant caps the
#: registry at 100 queries, so each NEW registration must retire one.
#: Retirees stay fully implemented and DuckDB-oracle-gated — pytest
#: (tests/test_retired_oracles.py) and scripts/check_oracle.py
#: --retired run the same parity check the driver would; they are just
#: no longer certified by official rows.  Selection principle: retire
#: only queries whose *scalable sibling* holds a current official row,
#: so no operator family loses certification.
_RETIRED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_RETIRED_ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def q_retired(name: str, oracle: str | None = None):
    def deco(fn):
        _RETIRED_QUERIES[name] = fn
        if oracle is not None:
            _RETIRED_ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# shared portable snippets
# ---------------------------------------------------------------------------

def cents(col) -> F.Column:
    """Exact integer cents of a 2-decimal double column."""
    return F.round(col * 100, 0).cast("bigint")


def _c(expr: str) -> str:
    return f"CAST(round({expr} * 100) AS BIGINT)"


# normalized tokens (SQL side)
_TOK = "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"
_H64 = "CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)"


def _ngrams_sql(tok: str, n: int) -> str:
    return (
        f"list_transform(range(1, greatest(1, len({tok}) - {n - 1}) + 1), "
        f"i -> array_to_string(list_slice({tok}, i, i + {n - 1}), ' '))"
    )


def _subword_feats_sql(tok_expr: str, lo: int, hi: int) -> str:
    """DuckDB twin of text_analysis._feature_strings: the non-empty
    word tokens plus every boundary-marked char n-gram ('<w>', fastText
    subword scheme) for n in [lo, hi].  range(1, X+1) is empty when the
    padded token is shorter than n — unlike Spark's sequence, which
    descends and needs the explicit CASE on the Spark side."""
    words = f"list_filter({tok_expr}, t -> t <> '')"
    out = words
    for n in range(lo, hi + 1):
        grams = (
            f"flatten(list_transform({words}, t -> "
            f"list_transform(range(1, greatest(0, length('<' || t || '>') - {n - 1}) + 1), "
            f"i -> substr('<' || t || '>', i, {n}))))"
        )
        out = f"list_concat({out}, {grams})"
    return out


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (acc, x) -> acc + x)"
    )


def _cos_sql(a: str, b: str) -> str:
    return f"({_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)})))"


# ===========================================================================
# TPC-H-ish core (SURVEY §2.1-§2.8 inventory)
# ===========================================================================

@q(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum({_c('l_quantity')}) AS DOUBLE) / 100.0 AS sum_qty,
           CAST(sum({_c('l_extendedprice')}) AS DOUBLE) / 100.0 AS sum_base_price,
           CAST(sum({_c('l_extendedprice')} * (100 - {_c('l_discount')})) AS DOUBLE) / 10000.0 AS sum_disc_price,
           CAST(sum({_c('l_extendedprice')} * (100 - {_c('l_discount')}) * (100 + {_c('l_tax')})) AS DOUBLE) / 1000000.0 AS sum_charge,
           CAST(sum({_c('l_quantity')}) AS DOUBLE) / (100.0 * count(*)) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= "1998-09-02")
    qc, pc = cents(F.col("l_quantity")), cents(F.col("l_extendedprice"))
    dc, tc = cents(F.col("l_discount")), cents(F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(qc).cast("double") / 100.0).alias("sum_qty"),
        (F.sum(pc).cast("double") / 100.0).alias("sum_base_price"),
        (F.sum(pc * (100 - dc)).cast("double") / 10000.0).alias("sum_disc_price"),
        (F.sum(pc * (100 - dc) * (100 + tc)).cast("double") / 1000000.0).alias("sum_charge"),
        (F.sum(qc).cast("double") / (100.0 * F.count("*"))).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


@q(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(sum({_c('l_extendedprice')} * (100 - {_c('l_discount')})) AS DOUBLE) / 10000.0 AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1998-01-01")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1998-01-01")
    pc, dc = cents(F.col("l_extendedprice")), cents(F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(pc * (100 - dc)).cast("double") / 10000.0).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@q(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           CAST(sum({_c('l_extendedprice')} * (100 - {_c('l_discount')})) AS DOUBLE) / 10000.0 AS revenue
    FROM region JOIN nation ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
                JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    pc, dc = cents(F.col("l_extendedprice")), cents(F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg((F.sum(pc * (100 - dc)).cast("double") / 10000.0).alias("revenue"))
    )


@q_retired(
    "q6_revenue_forecast",
    oracle=f"""
    SELECT CAST(sum({_c('l_extendedprice')} * {_c('l_discount')}) AS DOUBLE) / 10000.0 AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND {_c('l_discount')} BETWEEN 5 AND 7 AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pc, dc = cents(F.col("l_extendedprice")), cents(F.col("l_discount"))
    return (
        li.where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & dc.between(5, 7)
            & (F.col("l_quantity") < 24)
        ).agg(
            (F.sum(pc * dc).cast("double") / 10000.0).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@q(
    "scan_pruned_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_shipdate < TIMESTAMP '2000-02-01'
      AND l_discount > 0.05
    """,
)
def scan_pruned_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S1/F8: projection + predicate reach the parquet scan (pushdown)
    return (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= "2000-01-01")
            & (F.col("l_shipdate") < "2000-02-01")
            & (F.col("l_discount") > 0.05)
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@q(
    "partition_ranged_union",
    oracle="""
    SELECT event_id, event_type, CAST(date_trunc('day', ts) AS DATE) AS day
    FROM events WHERE CAST(date_trunc('day', ts) AS DATE) = DATE '2024-01-01'
    UNION ALL
    SELECT event_id, event_type, CAST(date_trunc('day', ts) AS DATE) AS day
    FROM events WHERE CAST(date_trunc('day', ts) AS DATE) = DATE '2024-01-02'
    UNION ALL
    SELECT event_id, event_type, CAST(date_trunc('day', ts) AS DATE) AS day
    FROM events WHERE CAST(date_trunc('day', ts) AS DATE) = DATE '2024-01-03'
    """,
)
def partition_ranged_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S6/J6: a relative range consumed as one logical input (unionByName)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.to_date("ts").alias("day")
    )
    parts = [ev.where(F.col("day") == d) for d in ("2024-01-01", "2024-01-02", "2024-01-03")]
    return reduce(lambda a, b: a.unionByName(b), parts)


@q(
    "nearest_partition_asof",
    oracle="""
    SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS orderdate
    FROM orders
    WHERE o_orderdate = (
      SELECT max(o_orderdate) FROM orders WHERE o_orderdate <= TIMESTAMP '1998-08-15')
    """,
)
def nearest_partition_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S5/J5: newest existing partition at-or-before the anchor
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.where(F.col("o_orderdate") <= "1998-08-15").agg(
        F.max("o_orderdate").alias("__mx")
    )
    return (
        orders.join(F.broadcast(anchor), orders.o_orderdate == F.col("__mx"))
        .select("o_orderkey", "o_custkey", F.col("o_orderdate").cast("date").alias("orderdate"))
    )


@q_retired(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum({_c('l_quantity')}) AS DOUBLE) / 100.0 AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        (F.sum(cents(F.col("l_quantity"))).cast("double") / 100.0).alias("sum_qty"),
    )


@q(
    "agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sum({_c('o_totalprice')}) AS DOUBLE) / 100.0 AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        (F.sum(cents(F.col("o_totalprice"))).cast("double") / 100.0).alias("total"),
    )


@q(
    "window_topn_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    """,
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_orderpriority", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn")
        ).where(F.col("rn") <= 3)
    )


@q_retired(
    "window_running_total",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(sum({_c('o_totalprice')}) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS running_total
    FROM orders WHERE o_custkey < 100
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents(F.col("o_totalprice"))).over(w).cast("double") / 100.0).alias("running_total"),
    )


@q_retired(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@q(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    okeys = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return cust.exceptAll(okeys).distinct()


@q(
    "scalar_functions",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr, month(o_orderdate) AS mo, day(o_orderdate) AS dom,
           CAST(o_orderdate + INTERVAL 7 DAY AS DATE) AS plus_week,
           upper(substr(o_orderpriority, 1, 3)) AS pri3,
           lower(o_orderstatus) AS status_lc,
           length(o_orderpriority) AS pri_len,
           lpad(CAST(o_custkey AS VARCHAR), 8, '0') AS cust_pad,
           concat_ws('#', o_orderstatus, o_orderpriority) AS tag,
           abs(o_custkey - 1000) AS absdiff
    FROM orders WHERE o_orderkey < 500
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_add(F.col("o_orderdate").cast("date"), 7).alias("plus_week"),
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("pri3"),
        F.lower("o_orderstatus").alias("status_lc"),
        F.length("o_orderpriority").alias("pri_len"),
        F.lpad(F.col("o_custkey").cast("string"), 8, "0").alias("cust_pad"),
        F.concat_ws("#", "o_orderstatus", "o_orderpriority").alias("tag"),
        F.abs(F.col("o_custkey") - 1000).alias("absdiff"),
    )


@q_retired(
    "json_extract_events",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select((F.get_json_object("props", "$.k").cast("bigint") % 10).alias("k_mod"))
        .groupBy("k_mod")
        .agg(F.count("*").alias("n"))
    )


@q_retired(
    "events_tumbling_daily",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, count(*) AS n,
           CAST(sum({_c('value')}) AS DOUBLE) / 100.0 AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 day").start.cast("date").alias("day"), "event_type"
        ).agg(
            F.count("*").alias("n"),
            (F.sum(cents(F.col("value"))).cast("double") / 100.0).alias("total_value"),
        )
    )


@q(
    "events_sliding_2day",
    oracle="""
    WITH e AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d FROM events),
    w AS (SELECT unnest([d - 1, d]) AS window_day FROM e)
    SELECT window_day, count(*) AS n FROM w GROUP BY window_day
    """,
)
def events_sliding_2day(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sliding window: 2-day length, 1-day slide → each event in 2 windows
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 days", "1 day").start.cast("date").alias("window_day"))
        .agg(F.count("*").alias("n"))
    )


@q(
    "events_cohort_retention",
    oracle="""
    WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
    coh AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id),
    act AS (SELECT DISTINCT user_id, day FROM ev)
    SELECT coh.cohort_day,
           CAST(date_diff('day', coh.cohort_day, act.day) AS INT) AS day_offset,
           CAST(count(DISTINCT act.user_id) AS BIGINT) AS n_users
    FROM act JOIN coh ON act.user_id = coh.user_id
    WHERE date_diff('day', coh.cohort_day, act.day) <= 14
    GROUP BY 1, 2
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch cohort retention: users grouped by their first active
    day, counted on each later day (offset ≤ 14).  Scale shape: the
    cohort map is (user, date) — tiny vs the event stream — and both
    aggregates key on user_id, so the first groupBy's shuffle
    co-partitions the join for free (one Exchange reused)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    cohort = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = ev.distinct()
    return (
        act.join(cohort, "user_id")
        .withColumn("day_offset", F.datediff("day", "cohort_day").cast("int"))
        .where(F.col("day_offset") <= 14)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    )


@q_retired(
    "events_funnel_3step",
    oracle="""
    WITH f AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_view,
           CAST(sum(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_click_after_view,
           CAST(sum(CASE WHEN t_purchase > t_click AND t_click > t_view
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
    FROM f WHERE t_view IS NOT NULL
    """,
)
def events_funnel_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase conversion funnel, ordered by each
    user's FIRST occurrence of each step.  One conditional-min
    aggregate per user (map-side combinable, single shuffle on
    user_id) then a scalar rollup — no self-joins, no windows; the
    standard funnel shape that stays one pass at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    stepped = first.where(F.col("t_view").isNotNull())
    return stepped.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_view"),
        F.sum(
            F.when(F.col("t_click") > F.col("t_view"), 1).otherwise(0)
        ).cast("bigint").alias("n_click_after_view"),
        F.sum(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_full_funnel"),
    )


@q_retired(
    "metric_threshold_alarm",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_ts,
             CAST(sum({_c('value')}) AS DOUBLE) / (100.0 * count(*)) AS avg_value
      FROM events GROUP BY 1, 2
    ), breaches AS (
      SELECT event_type, hour_ts, avg_value,
             CASE WHEN avg_value > 10.0 THEN 1 ELSE 0 END AS breach
      FROM hourly
    )
    SELECT event_type, strftime(hour_ts, '%Y-%m-%d %H') AS hour_str, avg_value,
           CAST(sum(breach) OVER (PARTITION BY event_type ORDER BY hour_ts
                             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS breaches_3h
    FROM breaches
    """,
)
def metric_threshold_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SURVEY §2.9 metric/alarm semantics: period aggregate + datapoint-
    # count-over-evaluation-periods (reference metric_alarm_defs.py:271-285)
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg((F.sum(cents(F.col("value"))).cast("double") / (100.0 * F.count("*"))).alias("avg_value"))
    breaches = hourly.withColumn(
        "breach", F.when(F.col("avg_value") > 10.0, F.lit(1)).otherwise(F.lit(0))
    )
    w = Window.partitionBy("event_type").orderBy("hour_ts").rowsBetween(-2, 0)
    return breaches.select(
        "event_type",
        F.date_format("hour_ts", "yyyy-MM-dd HH").alias("hour_str"),
        "avg_value",
        F.sum("breach").over(w).alias("breaches_3h"),
    )


@q(
    "metric_period_stats_hourly",
    oracle=f"""
    SELECT event_type, date_trunc('hour', ts) AS period_start,
           count(value_cents) AS "SampleCount",
           CAST(sum(value_cents) AS BIGINT) AS "Sum",
           min(value_cents) AS "Minimum",
           max(value_cents) AS "Maximum",
           CAST(sum(value_cents) AS DOUBLE) / (100.0 * count(value_cents)) AS avg_value
    FROM (SELECT event_type, ts, {_c('value')} AS value_cents FROM events)
    GROUP BY 1, 2
    """,
)
def metric_period_stats_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric statistics over period-aligned windows (S11, reference
    metric_alarm_defs.py:55-133) via diagnostics.metric_period_stats;
    value pre-centified so every statistic is exact integer math."""
    from rheoceros_spark.diagnostics import MetricStatistic, metric_period_stats

    ev = load_table(spark, sf_dir, "events").withColumn("value_cents", cents(F.col("value")))
    stats = metric_period_stats(
        ev,
        period="1 hour",
        value_col="value_cents",
        dims=["event_type"],
        stats=[
            MetricStatistic.SAMPLE_COUNT,
            MetricStatistic.SUM,
            MetricStatistic.MINIMUM,
            MetricStatistic.MAXIMUM,
        ],
    )
    return stats.withColumn(
        "avg_value", F.col("Sum").cast("double") / (100.0 * F.col("SampleCount"))
    )


_ALARM_ORACLE = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS period_start,
         CAST(sum({_c('value')}) AS DOUBLE) / (100.0 * count(*)) AS avg_value
  FROM events GROUP BY 1, 2
), b AS (
  SELECT event_type, period_start, avg_value,
         CASE WHEN avg_value > 10.0 THEN 1 ELSE 0 END AS breach
  FROM hourly
), w AS (
  SELECT event_type, period_start, avg_value, breach,
         CAST(sum(breach) OVER (PARTITION BY event_type ORDER BY period_start
                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS breaches_in_window,
         count(breach) OVER (PARTITION BY event_type ORDER BY period_start
                             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS periods_in_window
  FROM b
)
SELECT event_type, strftime(period_start, '%Y-%m-%d %H') AS period_str, avg_value,
       breach, breaches_in_window,
       CASE WHEN breaches_in_window >= 2 THEN 'ALARM'
            WHEN periods_in_window < 3 THEN 'INSUFFICIENT_DATA'
            ELSE 'OK' END AS state
FROM w
"""


@q("alarm_m_of_n_state", oracle=_ALARM_ORACLE)
def alarm_m_of_n_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M-of-N alarm evaluation (2 of 3 periods breaching, reference
    metric_alarm_defs.py:271-285) via diagnostics.alarm_state."""
    from rheoceros_spark.diagnostics import alarm_state

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("period_start")).agg(
        (F.sum(cents(F.col("value"))).cast("double") / (100.0 * F.count("*"))).alias("avg_value")
    )
    st = alarm_state(
        hourly,
        metric_col="avg_value",
        threshold=10.0,
        comparison=">",
        evaluation_periods=3,
        datapoints_to_alarm=2,
        dims=["event_type"],
    )
    return st.select(
        "event_type",
        F.date_format("period_start", "yyyy-MM-dd HH").alias("period_str"),
        "avg_value",
        "breach",
        "breaches_in_window",
        "state",
    )


_COMPOSITE_ALARM_ORACLE = """
WITH err AS (
  SELECT date_trunc('day', ts) AS period_start, count(*) AS n
  FROM events WHERE event_type = 'error' GROUP BY 1
), pur AS (
  SELECT date_trunc('day', ts) AS period_start, count(*) AS n
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), ea AS (
  SELECT period_start, CASE WHEN n > 2 THEN 'ALARM' ELSE 'OK' END AS state FROM err
), pa AS (
  SELECT period_start, CASE WHEN n > 1 THEN 'ALARM' ELSE 'OK' END AS state FROM pur
)
SELECT CAST(coalesce(ea.period_start, pa.period_start) AS DATE) AS period_day,
       CASE WHEN coalesce(ea.state = 'ALARM', FALSE)
                 AND NOT coalesce(pa.state = 'ALARM', FALSE)
            THEN 'ALARM' ELSE 'OK' END AS state
FROM ea FULL OUTER JOIN pa ON ea.period_start = pa.period_start
"""


@q("composite_alarm_rule", oracle=_COMPOSITE_ALARM_ORACLE)
def composite_alarm_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite alarm: AlarmRule boolean algebra over two alarm-state
    streams — fires when errors are high AND purchases are NOT high
    (reference metric_alarm_defs.py:331-409 AND/OR/INVERT)."""
    from rheoceros_spark.diagnostics import AlarmRule, alarm_state

    ev = load_table(spark, sf_dir, "events")

    def daily_count_alarm(event_type: str, threshold: int) -> DataFrame:
        daily = (
            ev.where(F.col("event_type") == event_type)
            .groupBy(F.date_trunc("day", "ts").alias("period_start"))
            .agg(F.count("*").alias("n"))
        )
        return alarm_state(daily, metric_col="n", threshold=threshold, comparison=">")

    rule = AlarmRule.of("errors_high") & ~AlarmRule.of("purchases_high")
    out = rule.evaluate(
        {
            "errors_high": daily_count_alarm("error", 2),
            "purchases_high": daily_count_alarm("purchase", 1),
        }
    )
    return out.select(F.col("period_start").cast("date").alias("period_day"), "state")


@q_retired(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# Retired r7: a plain broadcast-join+agg demo — the broadcast-join
# shape holds official rows via q2/q5/q7/q8/q9 and is plan-gated by
# test_small_dims_broadcast; parity stays in tests/test_retired_oracles.py.
@q_retired(
    "broadcast_join_enrich",
    oracle=f"""
    SELECT p_brand, count(*) AS n,
           CAST(sum({_c('l_extendedprice')}) AS DOUBLE) / 100.0 AS total_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def broadcast_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents(F.col("l_extendedprice"))).cast("double") / 100.0).alias("total_price"),
        )
    )


# ===========================================================================
# time-series row-grain ops: as-of join / range join / sessionize
# (operators/timeseries.py — row-granular counterparts of the
# reference's partition-granular nearest/range semantics,
# signal.py:523-560)
# ===========================================================================

@q(
    "ts_asof_join",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts,
           r.ts AS click_ts, r.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def ts_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest click at-or-before each purchase, per user — the
    union+window as-of join (one shuffle on user_id, no non-equi
    join); oracle is DuckDB's native ASOF LEFT JOIN."""
    from rheoceros_spark.operators.timeseries import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "value")
    return asof_join(purchases, clicks, on="ts", by=["user_id"]).select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_matched").alias("click_ts"),
        F.col("value_matched").alias("click_value"),
    )


@q(
    "ts_range_join_counts",
    oracle="""
    SELECT e.event_id AS err_id, count(v.view_ts) AS views_next_hour
    FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT ts AS view_ts FROM events WHERE event_type = 'view') v
      ON v.view_ts > e.ts AND v.view_ts <= e.ts + INTERVAL 1 HOUR
    GROUP BY e.event_id
    """,
)
def ts_range_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Views in the hour after each error, with NO equi-key: the
    bucketed range join plans as a hash equi-join on the time bucket
    (candidates O(rows x 2 buckets)) where the raw interval predicate
    would be a BroadcastNestedLoopJoin over n x m rows."""
    from rheoceros_spark.operators.timeseries import range_join

    ev = load_table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
    )
    views = ev.where(F.col("event_type") == "view").select(F.col("ts").alias("view_ts"))
    pairs = range_join(
        errors, views, left_ts="err_ts", right_ts="view_ts",
        lower_seconds=0.0, upper_seconds=3600.0,
    )
    counts = pairs.groupBy("err_id").agg(F.count("*").alias("views_next_hour"))
    return errors.select("err_id").join(counts, "err_id", "left").select(
        "err_id", F.coalesce("views_next_hour", F.lit(0)).alias("views_next_hour")
    )


@q(
    "ts_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess,
             event_id
      FROM events
    ), sess AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
    FROM sess GROUP BY user_id, session_id
    """,
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user, one window pass (lag flag +
    running sum), then per-session aggregates — the batch twin of
    streaming/stream.py's sessionize_stream."""
    from rheoceros_spark.operators.timeseries import sessionize

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value", "event_id")
    s = sessionize(ev, ts_col="ts", by=["user_id"], gap_seconds=1800.0, tiebreak="event_id")
    return s.groupBy("user_id", F.col("session_id").cast("bigint").alias("session_id")).agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum(cents(F.col("value"))).alias("sum_value_cents"),
    )


# ===========================================================================
# deterministic sketches (operators/sketches.py): approximation
# algorithms whose synopses are pure functions of the data, so an
# independent engine matches bit-for-bit (unlike HLL/percentile_approx)
# ===========================================================================

@q("sketch_kmv_distinct", oracle=None)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count estimate of events.user_id: k smallest
    distinct h64 hashes, bounded per-partition state (mapInPandas),
    ≤ k×partitions-row merge — countDistinct cost without the
    distinct-value exchange."""
    from rheoceros_spark.operators.sketches import kmv_distinct

    return kmv_distinct(load_table(spark, sf_dir, "events"), "user_id", k=64)


@q("sketch_histogram_quantiles", oracle=None)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid quantiles (p50/p90/p99 of events.value at 0.5 width): one
    map-side-combined bucket count, histogram-sized cumulative pass —
    deterministic where percentile_approx is merge-order-dependent."""
    from rheoceros_spark.operators.sketches import histogram_quantiles

    return histogram_quantiles(
        load_table(spark, sf_dir, "events"), "value", quantiles=(0.5, 0.9, 0.99), bin_width=0.5
    )


def _sketch_oracles() -> None:
    from rheoceros_spark.operators.sketches import (
        histogram_quantiles_sql,
        kmv_distinct_sql,
    )

    _ORACLES["sketch_kmv_distinct"] = kmv_distinct_sql("events", "user_id", k=64)
    _ORACLES["sketch_histogram_quantiles"] = histogram_quantiles_sql(
        "events", "value", quantiles=(0.5, 0.9, 0.99), bin_width=0.5
    )


_sketch_oracles()


# ===========================================================================
# data layout: Z-order clustering key (operators/layout.py)
# ===========================================================================

@q(
    "layout_zorder_key",
    oracle=None,  # filled below — the SQL twin is generated
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key over (doc_id, text length) buckets — the clustering
    key zorder_write range-partitions on so file-level min/max prunes
    on BOTH dimensions; pure bit arithmetic, bit-identical to the
    generated SQL oracle."""
    from rheoceros_spark.operators.layout import zorder_key

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        zorder_key(
            [F.col("doc_id") % 1024, F.length("text") % 1024], bits=10
        ).alias("zkey"),
    )


def _zorder_oracle() -> str:
    from rheoceros_spark.operators.layout import zorder_key_sql

    key = zorder_key_sql(["(doc_id % 1024)", "(length(text) % 1024)"], bits=10)
    return f"SELECT doc_id, {key} AS zkey FROM documents"


_ORACLES["layout_zorder_key"] = _zorder_oracle()


# ===========================================================================
# TPC-H-ish joins / subqueries (widened surface: semi/anti joins,
# correlated + scalar subqueries, conditional aggs, pivot, grouping sets)
# ===========================================================================

@q_retired(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join (Catalyst rewrites correlated EXISTS the
    same way; we declare it directly)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@q_retired(
    "q10_returned_revenue",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(sum({_c('l_extendedprice')} * (100 - {_c('l_discount')})) AS DOUBLE) / 10000.0 AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    pc, dc = cents(F.col("l_extendedprice")), cents(F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(pc * (100 - dc)).cast("double") / 10000.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@q_retired(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate
    GROUP BY l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate >= orders.o_orderdate))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@q(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@q(
    "q14_promo_revenue_share",
    oracle=f"""
    SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                         THEN {_c('l_extendedprice')} * (100 - {_c('l_discount')})
                         ELSE 0 END) AS DOUBLE) * 100.0
           / CAST(sum({_c('l_extendedprice')} * (100 - {_c('l_discount')})) AS DOUBLE) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-07-01")
    )
    part = load_table(spark, sf_dir, "part")
    pc, dc = cents(F.col("l_extendedprice")), cents(F.col("l_discount"))
    rev = pc * (100 - dc)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).cast("double")
                * 100.0
                / F.sum(rev).cast("double")
            ).alias("promo_share")
        )
    )


@q(
    "q16_supplier_count",
    oracle="""
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size IN (1, 14, 23, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a non-null key → broadcast anti-join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_size").isin(1, 14, 23, 45))
    bad_supp = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@q_retired(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH part_avg AS (
      SELECT l_partkey AS pk, count(*) AS cnt, sum(CAST(l_quantity AS BIGINT)) AS sq
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum({_c('l_extendedprice')}) AS DOUBLE) / 700.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
                  JOIN part_avg ON pk = l_partkey
    WHERE p_brand = 'Brand#23'
      AND 5 * CAST(l_quantity AS BIGINT) * cnt < sq
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated 'below 20% of per-part average' predicate, decorrelated
    into a pre-aggregated join; the comparison is exact integer math
    (5·qty·cnt < sum) so both engines agree on the boundary."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count("*").alias("cnt"), F.sum(F.col("l_quantity").cast("bigint")).alias("sq")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(part_avg, li.l_partkey == part_avg.pk)
        .where(5 * F.col("l_quantity").cast("bigint") * F.col("cnt") < F.col("sq"))
        .agg((F.sum(cents(F.col("l_extendedprice"))).cast("double") / 700.0).alias("avg_yearly"))
    )


@q_retired(
    "q18_large_volume_orders",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
           CAST({_c('o_totalprice')} AS DOUBLE) / 100.0 AS totalprice,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("s"))
        .where(F.col("s") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_key"), li.l_orderkey == F.col("big_key"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            (cents(F.col("o_totalprice")).cast("double") / 100.0).alias("totalprice"),
            "sum_qty",
        )
    )


@q(
    "q22_wealthy_inactive",
    oracle=f"""
    WITH stats AS (
      SELECT sum({_c('c_acctbal')}) AS s, count(*) AS n
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, count(*) AS numcust,
           CAST(sum({_c('c_acctbal')}) AS DOUBLE) / 100.0 AS totacctbal
    FROM customer, stats
    WHERE {_c('c_acctbal')} * n > s
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
)
def q22_wealthy_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar aggregate subquery (broadcast single-row cross join) +
    anti-join; 'above average balance' compared in exact integer math
    (bal·n > sum)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    bc = cents(F.col("c_acctbal"))
    stats = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.sum(bc).alias("s"), F.count("*").alias("n")
    )
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(stats))
        .where(bc * F.col("n") > F.col("s"))
        .join(F.broadcast(urgent), cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(bc).cast("double") / 100.0).alias("totacctbal"),
        )
    )


@q(
    "q7_nation_volume",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           year(l_shipdate) AS l_year,
           CAST(sum({_c('l_extendedprice')} * (100 - {_c('l_discount')})) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation cn ON c_nationkey = cn.n_nationkey
                  JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE ((cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
           OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1'))
    GROUP BY cust_nation, supp_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation-pair shipping volume: the same dimension table joined
    twice under different roles (both broadcast)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))
    sn = nation.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    pc, dc = cents(F.col("l_extendedprice")), cents(F.col("l_discount"))
    pair = (
        (F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2")
    ) | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cnk"))
        .join(F.broadcast(sn), supp.s_nationkey == F.col("snk"))
        .where(pair)
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(pc * (100 - dc)).cast("double") / 10000.0).alias("revenue"))
    )


@q(
    "q8_market_share",
    oracle=f"""
    SELECT year(o_orderdate) AS o_year,
           CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
                         THEN {_c('l_extendedprice')} * (100 - {_c('l_discount')})
                         ELSE 0 END) AS DOUBLE)
           / CAST(sum({_c('l_extendedprice')} * (100 - {_c('l_discount')})) AS DOUBLE) AS mkt_share
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation cn ON c_nationkey = cn.n_nationkey
                  JOIN region ON cn.n_regionkey = r_regionkey
                  JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE r_name = 'AMERICA'
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    cn = nation.select(F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk"))
    sn = nation.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    pc, dc = cents(F.col("l_extendedprice")), cents(F.col("l_discount"))
    rev = pc * (100 - dc)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cnk"))
        .join(F.broadcast(region), F.col("crk") == region.r_regionkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("snk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0))).cast("double")
                / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
    )


@q(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum({_c('l_extendedprice')} * (100 - {_c('l_discount')})) AS total
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total AS DOUBLE) / 10000.0 AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total = (SELECT max(total) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar MAX subquery against a derived revenue view — exact
    integer totals so the max comparison has no float ambiguity."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier")
    pc, dc = cents(F.col("l_extendedprice")), cents(F.col("l_discount"))
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(pc * (100 - dc)).alias("total")
    )
    max_total = revenue.agg(F.max("total").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(max_total))
        .where(F.col("total") == F.col("mx"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name", (F.col("total").cast("double") / 10000.0).alias("total_revenue")
        )
    )


@q(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT CAST(sum({_c('l_extendedprice')} * (100 - {_c('l_discount')})) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs across both join sides — Catalyst extracts the
    common single-side conjuncts and pushes them below the join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pc, dc = cents(F.col("l_extendedprice")), cents(F.col("l_discount"))
    cond = (
        (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(cond)
        .agg((F.sum(pc * (100 - dc)).cast("double") / 10000.0).alias("revenue"))
    )


@q(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH cost AS (
      SELECT p_partkey, l_suppkey, sum({_c('l_extendedprice')}) AS cost_c
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_size <= 10
      GROUP BY p_partkey, l_suppkey
    )
    SELECT c.p_partkey, s_name, n_name,
           CAST(cost_c AS DOUBLE) / 100.0 AS min_cost
    FROM cost c JOIN supplier ON c.l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
    JOIN (SELECT p_partkey AS mk, min(cost_c) AS min_c
          FROM cost GROUP BY p_partkey) m
      ON c.p_partkey = m.mk AND c.cost_c = m.min_c
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier per part) adapted to the
    testdata's schema: lineitem stands in for partsupp (no partsupp
    table ships; reference users write the same correlated-min against
    whatever relationship table they have).  Spark side resolves the
    correlated min with a single window pass over the grouped frame —
    one shuffle on (partkey, suppkey), one on partkey — instead of the
    oracle's group-then-self-join, which would scan the agg twice."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cost = (
        li.join(F.broadcast(part.where(F.col("p_size") <= 10).select("p_partkey")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.sum(cents(F.col("l_extendedprice"))).alias("cost_c"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        cost.withColumn("min_c", F.min("cost_c").over(w))
        .where(F.col("cost_c") == F.col("min_c"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "p_partkey", "s_name", "n_name",
            (F.col("cost_c").cast("double") / 100.0).alias("min_cost"),
        )
    )


@q(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(sum({_c('l_extendedprice')} * (100 - {_c('l_discount')})
                    - {_c('p_retailprice')} * 100 * CAST(l_quantity AS BIGINT)) AS DOUBLE)
             / 10000.0 AS profit
    FROM lineitem JOIN part ON l_partkey = p_partkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN orders ON l_orderkey = o_orderkey
                  JOIN nation ON s_nationkey = n_nationkey
    WHERE p_type = 'PROMO'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (nation/year profit over a 5-way join) with
    p_retailprice standing in for ps_supplycost.  All dimension sides
    broadcast; the only shuffle is the final (nation, year) agg with
    map-side partials; profit stays in integer 1/100-cent units until
    the final division."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    # both terms in 1/10000-dollar units: revenue = cents × percent;
    # cost = cents × qty, scaled by 100 to match before the shared /10000
    profit_c = cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount"))) - cents(
        F.col("p_retailprice")
    ) * F.lit(100) * F.col("l_quantity").cast("bigint")
    return (
        li.join(F.broadcast(part.where(F.col("p_type") == "PROMO").select("p_partkey", "p_retailprice")),
                li.l_partkey == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(profit_c).cast("double") / 10000.0).alias("profit"))
    )


@q_retired(
    "q11_important_parts",
    oracle=f"""
    WITH val AS (
      SELECT l_partkey, sum({_c('l_extendedprice')} * (100 - {_c('l_discount')})) AS value_c
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2')
      GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, CAST(value_c AS DOUBLE) / 10000.0 AS value
    FROM val, (SELECT sum(value_c) AS total_c FROM val) t
    WHERE value_c * 500 > total_c
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group value filtered against a scalar
    aggregate of the same derived table (value > 0.2% of total).  The
    grouped frame is computed once; the scalar total is a single-row
    broadcast cross join; the threshold compare is exact integer math
    (value·500 > total) so both engines agree bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    nk = nation.where(F.col("n_name").isin("NATION_1", "NATION_2")).select("n_nationkey")
    val = (
        li.join(F.broadcast(supp.join(F.broadcast(nk), supp.s_nationkey == nk.n_nationkey)
                            .select("s_suppkey")),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))).alias("value_c"))
    )
    total = val.agg(F.sum("value_c").alias("total_c"))
    return (
        val.crossJoin(F.broadcast(total))
        .where(F.col("value_c") * 500 > F.col("total_c"))
        .select(F.col("l_partkey").alias("partkey"),
                (F.col("value_c").cast("double") / 10000.0).alias("value"))
    )


@q(
    "q20_part_shippers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#12' AND l_shipdate >= TIMESTAMP '1997-01-01'
            GROUP BY l_suppkey
            HAVING sum(CAST(l_quantity AS BIGINT)) > 50)
      AND s_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3'))
    """,
)
def q20_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-join chain — suppliers filtered by
    a grouped-HAVING subquery over a part-filtered lineitem slice, then
    by a nation membership list.  Both IN-lists become left-semi joins;
    the part filter is broadcast below the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    shippers = (
        li.where(F.col("l_shipdate") >= "1997-01-01")
        .join(F.broadcast(part.where(F.col("p_brand") == "Brand#12").select("p_partkey")),
              li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
    )
    nk = nation.where(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")).select("n_nationkey")
    return (
        supp.join(F.broadcast(shippers), supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nk), supp.s_nationkey == nk.n_nationkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


@q(
    "q21_sole_returner",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
)
def q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (EXISTS + NOT EXISTS correlated self-joins on
    lineitem) with l_returnflag = 'R' standing in for the missing
    receipt-after-commit predicate.  The correlated subqueries become
    a left-semi and a left-anti join on (orderkey, suppkey<>suppkey);
    the self-join sides are pre-deduplicated to distinct pairs so the
    semi/anti probes stay small at 100 TB.

    Double-scan audit (round 5): lineitem is scanned twice (l1 +
    pair_flags).  Isolated re-measure at sf0.1: 1.5-1.9 s steady state
    (vs 3.15 s in the round-4 bench — that number was same-JVM/host
    contention, which bench.py documents at 2-3x).  Serving both sides
    from one cached scan was therefore not taken: at 100 TB the two
    scans are column-pruned differently (l1 reads 3 cols post-filter)
    and a cache would spill far more than the second scan costs."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    l1 = li.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    # EXISTS(other supplier) ⟺ the order has ≥2 distinct suppliers;
    # NOT EXISTS(other returning supplier) ⟺ exactly 1 distinct
    # returning supplier (the l1 row's own).  Two-step aggregate: dedup
    # (orderkey, suppkey) pairs once WITH a returning flag (map-side
    # partial combine — no Expand, unlike a dual countDistinct), then a
    # cheap per-order rollup; one orderkey-co-partitioned join replaces
    # the two distinct+self-join shuffles of the textbook semi/anti
    # formulation.
    pair_flags = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r")
    )
    per_order = pair_flags.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("has_r").alias("n_r_supp"),
    )
    fo = orders.where(F.col("o_orderstatus") == "F").select("o_orderkey")
    return (
        l1.join(F.broadcast(fo), l1.l_orderkey == fo.o_orderkey, "left_semi")
        .join(
            per_order.where((F.col("n_supp") > 1) & (F.col("n_r_supp") == 1)),
            "l_orderkey",
        )
        .join(F.broadcast(supp), l1.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@q_retired(
    "pivot_returnflag_status",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS BIGINT) AS "F",
           CAST(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS BIGINT) AS "O"
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("bigint")))
    )


@q(
    "grouping_sets_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid,
               sum(CAST(l_quantity AS BIGINT)) AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# ===========================================================================
# dedup (extensions)
# ===========================================================================

@q(
    "dedup_exact_docs",
    oracle="""
    SELECT min(doc_id) AS doc_id
    FROM documents
    GROUP BY trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
    """,
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_exact(load_table(spark, sf_dir, "documents")).select("doc_id")


_MINHASH_MINS = ", ".join(
    f"min((({2 * i + 1} * h32 + {i}) % 2147483647))" for i in range(16)
)

# shared CTE prefix for every minhash-based oracle (pairs, clusters,
# incremental index) — ONE copy so a parameter change can't drift
_MINHASH_CTES = f"""ex AS (
  SELECT doc_id, unnest(list_distinct({_ngrams_sql(_TOK, 3)})) AS s FROM documents
), hashed AS (
  SELECT doc_id, {_H64.format(s="s")} % 4294967296 AS h32 FROM ex
), docs AS (
  SELECT doc_id, [{_MINHASH_MINS}] AS sig, list(DISTINCT h32) AS sh
  FROM hashed GROUP BY doc_id
), buckets AS (
  SELECT doc_id, band,
         {_H64.format(s="array_to_string(list_slice(sig, band * 4 + 1, band * 4 + 4), ',')")} AS bucket
  FROM docs, (SELECT unnest(range(0, 4)) AS band)
)"""

_JACCARD_DA_DB = jaccard_sql("da.sh", "db.sh")

_MINHASH_ORACLE = f"""
WITH {_MINHASH_CTES}, cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM buckets x JOIN buckets y ON x.band = y.band AND x.bucket = y.bucket
  WHERE x.doc_id < y.doc_id
)
SELECT a, b, jaccard FROM (
  SELECT c.a, c.b, {_JACCARD_DA_DB} AS jaccard
  FROM cand c JOIN docs da ON c.a = da.doc_id JOIN docs db ON c.b = db.doc_id
) WHERE jaccard >= 0.5
"""


@q_retired("dedup_minhash_lsh_pairs", oracle=_MINHASH_ORACLE)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(load_table(spark, sf_dir, "documents"), threshold=0.5)


_SIMHASH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOK}) AS t FROM documents
), h AS (
  SELECT doc_id, {_H64.format(s="t")} AS hv FROM toks
), bits AS (
  SELECT doc_id, b, sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h, (SELECT unnest(range(0, 32)) AS b) GROUP BY doc_id, b
), sh AS (
  SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
)
SELECT a, b, hamming FROM (
  SELECT x.doc_id AS a, y.doc_id AS b, bit_count(xor(x.simhash, y.simhash)) AS hamming
  FROM sh x JOIN sh y ON x.doc_id < y.doc_id
) WHERE hamming <= 3
"""


@q_retired("dedup_simhash_pairs", oracle=_SIMHASH_ORACLE)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_pairs(load_table(spark, sf_dir, "documents"), max_hamming=3).select(
        "a", "b", F.col("hamming").cast("bigint").alias("hamming")
    )


_NGRAM_ORACLE = f"""
WITH docs AS (
  SELECT doc_id,
         list_distinct(list_transform({_ngrams_sql(_TOK, 3)},
                                      g -> {_H64.format(s="g")} % 4294967296)) AS sh
  FROM documents
)
SELECT a, b, jaccard FROM (
  SELECT x.doc_id AS a, y.doc_id AS b,
         CASE WHEN len(list_distinct(list_concat(x.sh, y.sh))) > 0
              THEN CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                   / CAST(len(list_distinct(list_concat(x.sh, y.sh))) AS DOUBLE)
              ELSE 0.0 END AS jaccard
  FROM docs x JOIN docs y ON x.doc_id < y.doc_id
) WHERE jaccard >= 0.5
"""


# Retired r8 (the staged window plan, executed): the quadratic
# all-pairs verification twin — the 100 TB operator is the LSH-blocked
# variant behind dedup_minhash_lsh_pairs / the blocked=True sibling,
# which holds the official row.  Parity stays live through
# tests/test_retired_oracles.py and scripts/check_oracle.py --retired.
@q_retired("dedup_ngram_jaccard_pairs", oracle=_NGRAM_ORACLE)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.5, blocked=False
    )


# Retired r7 (VERDICT r6 ask #1): the quadratic all-pairs verification
# twin of dedup_embedding_blocked (officially certified r6) — the
# 100 TB operator is the blocked variant; the all-pairs twin exists to
# verify it, which tests/test_retired_oracles.py keeps doing.
@q_retired(
    "dedup_embedding_pairs",
    oracle=f"""
    SELECT a, b, round(cos, 6) AS cos_r FROM (
      SELECT x.vec_id AS a, y.vec_id AS b,
             {_cos_sql('x.embedding', 'y.embedding')} AS cos
      FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
    ) WHERE cos >= 0.4
    """,
)
def dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # testdata embeddings are near-orthogonal (max pairwise cos ≈ 0.51);
    # 0.4 keeps the check non-trivial (~60 pairs at sf0.01)
    return embedding_dup_pairs(load_table(spark, sf_dir, "embeddings"), threshold=0.4)


# ===========================================================================
# similarity search (extensions)
# ===========================================================================

# Retired r8 (the staged window plan, executed): the brute-force
# cosine baseline — every approximate-ANN oracle embeds this exact
# computation as its rerank/ground-truth stage, and all approximate
# variants (LSH / IVF / IVF-persisted / IVF-PQ / k-means) hold
# official rows.  Parity stays live in test_retired_oracles.py.
@q_retired(
    "ann_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, rank, round(cos, 6) AS cos_r FROM (
      SELECT vec_id, {_cos_sql('embedding', 'qv')} AS cos,
             row_number() OVER (ORDER BY {_cos_sql('embedding', 'qv')} DESC, vec_id) AS rank
      FROM embeddings, q WHERE vec_id != 0
    ) WHERE rank <= 10
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk(load_table(spark, sf_dir, "embeddings"), query_id=0, k=10).select(
        "vec_id", F.col("rank").cast("bigint").alias("rank"), "cos_r"
    )


def _plane_sql_literal(nbits: int, dim: int) -> list[str]:
    planes = []
    for i in range(nbits):
        vals = [
            "1.0" if int(hashlib.md5(f"{i}:{d}".encode()).hexdigest()[:15], 16) & 1 else "-1.0"
            for d in range(dim)
        ]
        # parenthesized so the literal can be indexed: ([...]::DOUBLE[])[i]
        planes.append("([" + ", ".join(vals) + "]::DOUBLE[])")
    return planes


def _ann_lsh_oracle(nbits: int = 4, dim: int = 64, k: int = 10) -> str:
    planes = _plane_sql_literal(nbits, dim)
    bucket_terms = " + ".join(
        f"(CASE WHEN {_dot_sql('embedding', p)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
    WITH b AS (
      SELECT vec_id, embedding, CAST({bucket_terms} AS BIGINT) AS bucket FROM embeddings
    ), q AS (SELECT embedding AS qv, bucket AS qb FROM b WHERE vec_id = 0)
    SELECT vec_id, rank, round(cos, 6) AS cos_r FROM (
      SELECT vec_id, {_cos_sql('embedding', 'qv')} AS cos,
             row_number() OVER (ORDER BY {_cos_sql('embedding', 'qv')} DESC, vec_id) AS rank
      FROM b, q WHERE bucket = qb AND vec_id != 0
    ) WHERE rank <= {k}
    """


@q("ann_lsh_topk", oracle=_ann_lsh_oracle())
def ann_lsh_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_lsh_topk(
        load_table(spark, sf_dir, "embeddings"), query_id=0, k=10, nbits=4, dim=64
    ).select("vec_id", F.col("rank").cast("bigint").alias("rank"), "cos_r")


def _blocked_embedding_oracle(tables: int = 4, nbits: int = 4, dim: int = 64,
                              threshold: float = 0.4) -> str:
    """Rebuild the multi-table LSH candidate set + rerank in SQL: one
    UNION ALL branch per table, each with its slice of the md5 plane
    matrix, then bucket-equijoin + exact cosine.

    The cos value is dot(a,b) / (sqrt(dot(a,a)) · sqrt(dot(b,b))) with
    left-fold dots — the Spark operator carries the per-row sqrt as a
    scalar and multiplies the two at rerank, which is the identical FP
    sequence, so the 6-decimal rounding agrees bit-for-bit."""
    all_planes = _plane_sql_literal(tables * nbits, dim)
    branches = []
    for t in range(tables):
        terms = " + ".join(
            f"(CASE WHEN {_dot_sql('embedding', p)} > 0 THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(all_planes[t * nbits:(t + 1) * nbits])
        )
        branches.append(
            f"SELECT vec_id, embedding, {t} AS t, CAST({terms} AS BIGINT) AS sig FROM embeddings"
        )
    union = "\n      UNION ALL ".join(branches)
    return f"""
    WITH e AS (
      {union}
    ), cand AS (
      SELECT x.vec_id AS a, y.vec_id AS b,
             {_cos_sql('x.embedding', 'y.embedding')} AS cos
      FROM e x JOIN e y ON x.t = y.t AND x.sig = y.sig AND x.vec_id < y.vec_id
    )
    SELECT DISTINCT a, b, round(cos, 6) AS cos_r FROM cand WHERE cos >= {threshold}
    """


@q_retired("dedup_embedding_blocked", oracle=_blocked_embedding_oracle())
def dedup_embedding_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB embedding near-dup path: LSH-blocked candidates, no
    cartesian node in the plan (asserted in test_plan_quality)."""
    return embedding_dup_pairs_blocked(
        load_table(spark, sf_dir, "embeddings"),
        threshold=0.4, tables=4, nbits=4, dim=64,
    )


_IVF_ORACLE = f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cv
  FROM embeddings
  ORDER BY {_H64.format(s="CAST(vec_id AS VARCHAR)")}, vec_id LIMIT 16
), assigned AS (
  SELECT vec_id, embedding, cid AS cell FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cos_sql('e.embedding', 'c.cv')} DESC, c.cid) AS rn
    FROM embeddings e, cents c
  ) WHERE rn = 1
), q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
probes AS (
  SELECT cid FROM cents, q
  ORDER BY {_cos_sql('cv', 'qv')} DESC, cid LIMIT 4
)
SELECT vec_id, rank, round(cos, 6) AS cos_r FROM (
  SELECT a.vec_id, {_cos_sql('a.embedding', 'qv')} AS cos,
         row_number() OVER (ORDER BY {_cos_sql('a.embedding', 'qv')} DESC, a.vec_id) AS rank
  FROM assigned a JOIN probes p ON a.cell = p.cid, q
  WHERE a.vec_id != 0
) WHERE rank <= 10
"""


@q("ann_ivf_topk", oracle=_IVF_ORACLE)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbors: hash-sampled centroids,
    max-cosine cell assignment, n_probe nearest cells scanned, exact
    rerank (operators/similarity.py ivf_topk)."""
    from rheoceros_spark.operators.similarity import ivf_topk

    return ivf_topk(
        load_table(spark, sf_dir, "embeddings"), query_id=0, k=10, n_centroids=16, n_probe=4
    ).select("vec_id", F.col("rank").cast("bigint").alias("rank"), "cos_r")


# PQ: 16-dim subspace L2² as an order-fixed fold (left fold from 0.0,
# square via self-multiplication — matches the Spark zip_with/aggregate
# and the Python ADC table builder bit-for-bit)
def _pq_subdist_sql(vec: str, cv: str, s: str, sub: int) -> str:
    # both operands are already DOUBLE[] (normalized) — no casts needed
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {sub} + 1), j -> "
        f"({vec}[{s} * {sub} + j] - {cv}[{s} * {sub} + j])"
        f" * ({vec}[{s} * {sub} + j] - {cv}[{s} * {sub} + j])"
        f")), (acc, x) -> acc + x)"
    )


_PQ_ORACLE = f"""
WITH emb_n AS (
  SELECT vec_id, embedding,
         CASE WHEN nsq > 0
              THEN list_transform(embedding, x -> CAST(x AS DOUBLE) / sqrt(nsq))
              ELSE list_transform(embedding, x -> 0.0) END AS vn
  FROM (SELECT vec_id, embedding,
               list_reduce(list_prepend(0.0, list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (acc, x) -> acc + x) AS nsq
        FROM embeddings)
), cents AS (
  SELECT vec_id AS cid, vn AS cv,
         row_number() OVER (ORDER BY {_H64.format(s="CAST(vec_id AS VARCHAR)")}, vec_id) AS ord
  FROM emb_n
  ORDER BY {_H64.format(s="CAST(vec_id AS VARCHAR)")}, vec_id LIMIT 16
), q AS (SELECT embedding AS qv, vn AS qn FROM emb_n WHERE vec_id = 0),
subs AS (SELECT unnest(range(0, 4)) AS s),
codes AS (
  SELECT vec_id, s, ord AS code FROM (
    SELECT e.vec_id, sb.s, c.ord,
           row_number() OVER (PARTITION BY e.vec_id, sb.s
                              ORDER BY {_pq_subdist_sql('e.vn', 'c.cv', 'sb.s', 16)}, c.ord) AS rn
    FROM emb_n e, cents c, subs sb
  ) WHERE rn = 1
), codes_p AS (
  SELECT vec_id,
         max(CASE WHEN s = 0 THEN code END) AS c0,
         max(CASE WHEN s = 1 THEN code END) AS c1,
         max(CASE WHEN s = 2 THEN code END) AS c2,
         max(CASE WHEN s = 3 THEN code END) AS c3
  FROM codes GROUP BY vec_id
), qdist AS (
  SELECT sb.s, c.ord, {_pq_subdist_sql('qn', 'c.cv', 'sb.s', 16)} AS d
  FROM cents c, subs sb, q
), cand AS (
  SELECT cp.vec_id
  FROM codes_p cp
  JOIN qdist q0 ON q0.s = 0 AND q0.ord = cp.c0
  JOIN qdist q1 ON q1.s = 1 AND q1.ord = cp.c1
  JOIN qdist q2 ON q2.s = 2 AND q2.ord = cp.c2
  JOIN qdist q3 ON q3.s = 3 AND q3.ord = cp.c3
  WHERE cp.vec_id != 0
  ORDER BY ((q0.d + q1.d) + q2.d) + q3.d, cp.vec_id LIMIT 50
)
SELECT vec_id, rank, round(cos, 6) AS cos_r FROM (
  SELECT e.vec_id, {_cos_sql('e.embedding', 'qv')} AS cos,
         row_number() OVER (ORDER BY {_cos_sql('e.embedding', 'qv')} DESC, e.vec_id) AS rank
  FROM embeddings e JOIN cand USING (vec_id), q
) WHERE rank <= 10
"""


_IVF_APPEND_CACHE: dict[str, str] = {}


# Retired r7: exhaustive-probe (brute-force-oracle) verification of
# ivf_append integration — the persisted/pruned IVF shape holds
# official rows via ann_ivf_persisted (r6) and incremental APPEND via
# dedup_incremental_index (r6); parity stays in tests/test_retired_oracles.py.
@q_retired(
    "ann_ivf_appended",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, rank, round(cos, 6) AS cos_r FROM (
      SELECT vec_id, {_cos_sql('embedding', 'qv')} AS cos,
             row_number() OVER (ORDER BY {_cos_sql('embedding', 'qv')} DESC, vec_id) AS rank
      FROM embeddings, q WHERE vec_id != 0
    ) WHERE rank <= 10
    """,
)
def ann_ivf_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF: index built on half the corpus, the other half
    appended batch-wise (operators/similarity.py ivf_append), then an
    exhaustive probe (n_probe = all cells).  Exhaustive probing makes
    the result the exact cosine top-k — the oracle is brute force — so
    the gate proves the appended batch is fully integrated (a dropped
    or mis-assigned append surfaces as a missing neighbor)."""
    import tempfile

    from rheoceros_spark.operators.similarity import ivf_append, ivf_probe, ivf_write

    path = _IVF_APPEND_CACHE.get(sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    if path is None:
        path = tempfile.mkdtemp(prefix="rheoceros_ivf_app_")
        ivf_write(emb.where(F.col("vec_id") % 2 == 0), path, n_centroids=16)
        ivf_append(spark, emb.where(F.col("vec_id") % 2 == 1), path)
        _IVF_APPEND_CACHE[sf_dir] = path
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]
    return ivf_probe(spark, path, qv, k=10, n_probe=16, exclude_id=0).select(
        "vec_id", F.col("rank").cast("bigint").alias("rank"), "cos_r"
    )


@q_retired(
    "text_unigram_nll",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOK}) AS token FROM documents
    ), tk AS (
      SELECT doc_id, token FROM toks WHERE token <> ''
    ), model AS (
      SELECT token, count(*) AS cnt FROM tk GROUP BY token
    ), tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS N FROM model
    ), per_doc AS (
      SELECT doc_id, token, count(*) AS n FROM tk GROUP BY doc_id, token
    ), scored AS (
      SELECT d.doc_id, d.n,
             CAST(round(-ln(CAST(m.cnt AS DOUBLE) / CAST(t.N AS DOUBLE)) * 1e7)
                  AS BIGINT) AS lpq
      FROM per_doc d JOIN model m USING (token), tot t
    ), agg AS (
      SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_scored,
             round(CAST(sum(n * lpq) AS DOUBLE) / (1e7 * CAST(sum(n) AS DOUBLE)), 6) AS nll
      FROM scored GROUP BY doc_id
    )
    SELECT documents.doc_id, coalesce(a.n_scored, 0) AS n_scored, a.nll
    FROM documents LEFT JOIN agg a ON documents.doc_id = a.doc_id
    """,
)
def text_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained unigram LM fluency score per document (CCNet-style
    filter signal; operators/text_analysis.py unigram_nll)."""
    from rheoceros_spark.operators.text_analysis import unigram_nll

    return unigram_nll(load_table(spark, sf_dir, "documents"))


def _semantic_contamination_oracle(nbits: int = 8, dim: int = 64, thr: float = 0.1) -> str:
    planes = _plane_sql_literal(nbits, dim)
    bucket_terms = " + ".join(
        f"(CASE WHEN {_dot_sql('embedding', p)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
    WITH b AS (
      SELECT vec_id, embedding, CAST({bucket_terms} AS BIGINT) AS bucket FROM embeddings
    ), bench AS (
      SELECT vec_id AS bench_id, embedding AS bv, bucket FROM b WHERE vec_id % 97 = 0
    ), corp AS (
      SELECT vec_id, embedding, bucket FROM b WHERE vec_id % 97 <> 0
    )
    SELECT vec_id, bench_id, cos_r FROM (
      SELECT c.vec_id, bench.bench_id,
             round({_cos_sql('c.embedding', 'bench.bv')}, 6) AS cos_r
      FROM corp c JOIN bench ON c.bucket = bench.bucket
    ) WHERE cos_r >= {thr}
    """


@q("curation_semantic_decon", oracle=_semantic_contamination_oracle())
def curation_semantic_decon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level decontamination: corpus vectors cosine-close to
    any held-out benchmark vector, LSH-bucket-blocked with the bench
    side broadcast (operators/curation.py semantic_contamination).
    Benchmark = vec_id % 97 == 0, mirroring contamination_ngrams."""
    from rheoceros_spark.operators.curation import semantic_contamination

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_contamination(
        emb.where(F.col("vec_id") % 97 != 0),
        emb.where(F.col("vec_id") % 97 == 0),
        threshold=0.1,
    )


# Retired r7: whole-corpus ADC scan — the verification baseline for
# ann_ivfpq_topk (registered r7), which certifies the same PQ codebook
# + ADC path plus cell pruning; parity stays in tests/test_retired_oracles.py.
@q_retired("ann_pq_topk", oracle=_PQ_ORACLE)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: per-subspace codes from a deterministic
    sampled codebook, asymmetric-distance candidate scan, exact cosine
    rerank (operators/similarity.py pq_topk)."""
    from rheoceros_spark.operators.similarity import pq_topk

    return pq_topk(
        load_table(spark, sf_dir, "embeddings"), query_id=0, k=10, n_codes=16, m=4, rerank=50
    ).select("vec_id", F.col("rank").cast("bigint").alias("rank"), "cos_r")


_IVF_INDEX_CACHE: dict[str, str] = {}


@q("ann_ivf_persisted", oracle=_IVF_ORACLE)
def ann_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB IVF shape: index built ONCE (``ivf_write`` — cell-
    partitioned parquet + codebook), probes read only their n_probe
    cell directories (operators/similarity.py ivf_probe; file pruning
    asserted in tests/test_operators.py).  Same centroids / assignment
    / probe ranking as ``ann_ivf_topk``, so results are identical and
    the oracle is shared."""
    import tempfile

    from rheoceros_spark.operators.similarity import ivf_probe, ivf_write

    path = _IVF_INDEX_CACHE.get(sf_dir)
    if path is None:
        path = tempfile.mkdtemp(prefix="rheoceros_ivf_")
        ivf_write(load_table(spark, sf_dir, "embeddings"), path, n_centroids=16)
        _IVF_INDEX_CACHE[sf_dir] = path
    qv = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == 0)
        .select("embedding")
        .head()[0]
    )
    return ivf_probe(spark, path, list(qv), k=10, n_probe=4, exclude_id=0).select(
        "vec_id", F.col("rank").cast("bigint").alias("rank"), "cos_r"
    )


# ===========================================================================
# curation (extensions): sampling / PII / vocab / decontamination / clusters
# ===========================================================================

_SAMPLE_BUCKET = _H64.format(s="concat('0', ':', CAST(doc_id AS VARCHAR))") + " % 1000000"


@q_retired(
    "curation_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    WHERE {_SAMPLE_BUCKET} < CASE WHEN lang = 'en' THEN 500000
                                  WHEN lang = 'de' THEN 100000
                                  ELSE 50000 END
    """,
)
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language rebalanced sample (50% en, 10% de,
    5% rest) — pure function of doc_id, reproducible across engines."""
    return stratified_hash_sample(
        load_table(spark, sf_dir, "documents"),
        rates={"en": 0.5, "de": 0.1},
        default_rate=0.05,
    ).select("doc_id", "lang")


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_SSN = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
_PII_PHONE = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"
_PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

# testdata has no organic PII, so both sides inject the same synthetic
# spans (derived from doc_id) and the oracle verifies real redaction work
_PII_TXT = (
    "concat(text, ' reach user', CAST(doc_id AS VARCHAR),"
    " '@mail.example.com ssn 123-45-',"
    " lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),"
    " ' ip 10.0.', CAST(doc_id % 256 AS VARCHAR), '.7')"
)


@q(
    "curation_pii_redact",
    oracle=f"""
    WITH t0 AS (SELECT doc_id, {_PII_TXT} AS s0 FROM documents),
    t1 AS (SELECT doc_id, len(regexp_extract_all(s0, '{_PII_EMAIL}')) AS hits_email,
                  regexp_replace(s0, '{_PII_EMAIL}', '<EMAIL>', 'g') AS s1 FROM t0),
    t2 AS (SELECT *, len(regexp_extract_all(s1, '{_PII_SSN}')) AS hits_ssn,
                  regexp_replace(s1, '{_PII_SSN}', '<SSN>', 'g') AS s2 FROM t1),
    t3 AS (SELECT *, len(regexp_extract_all(s2, '{_PII_PHONE}')) AS hits_phone,
                  regexp_replace(s2, '{_PII_PHONE}', '<PHONE>', 'g') AS s3 FROM t2),
    t4 AS (SELECT *, len(regexp_extract_all(s3, '{_PII_IP}')) AS hits_ip,
                  regexp_replace(s3, '{_PII_IP}', '<IP>', 'g') AS s4 FROM t3)
    SELECT doc_id, hits_email, hits_ssn, hits_phone, hits_ip, s4 AS redacted FROM t4
    """,
)
def curation_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" reach user"), F.col("doc_id").cast("string"),
            F.lit("@mail.example.com ssn 123-45-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ip 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".7"),
        ),
    )
    return pii_redact(docs).select(
        "doc_id",
        F.col("hits_email").cast("bigint").alias("hits_email"),
        F.col("hits_ssn").cast("bigint").alias("hits_ssn"),
        F.col("hits_phone").cast("bigint").alias("hits_phone"),
        F.col("hits_ip").cast("bigint").alias("hits_ip"),
        "redacted",
    )


@q(
    "curation_vocab_top_tokens",
    oracle=f"""
    SELECT lang, token, cnt, rank FROM (
      SELECT lang, token, count(*) AS cnt,
             row_number() OVER (PARTITION BY lang
                                ORDER BY count(*) DESC, token ASC) AS rank
      FROM (SELECT lang, unnest({_TOK}) AS token FROM documents)
      WHERE token <> '' GROUP BY lang, token
    ) WHERE rank <= 20
    """,
)
def curation_vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_top_tokens(load_table(spark, sf_dir, "documents"), k=20)


@q_retired(
    "curation_contamination",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id, unnest(list_distinct({_ngrams_sql(_TOK, 8)})) AS g FROM documents
    ), hashed AS (
      SELECT doc_id, {_H64.format(s="g")} AS gh FROM grams
    ), bench AS (
      SELECT DISTINCT gh FROM hashed WHERE doc_id % 97 = 0
    ), corp AS (
      SELECT doc_id, gh FROM hashed WHERE doc_id % 97 <> 0
    )
    SELECT c.doc_id, CAST(count(*) AS BIGINT) AS total_ngrams,
           CAST(sum(CASE WHEN b.gh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS contaminated,
           CAST(sum(CASE WHEN b.gh IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS contamination_ratio
    FROM corp c LEFT JOIN bench b USING (gh) GROUP BY c.doc_id
    """,
)
def curation_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: docs where doc_id % 97 == 0 stand in
    for the benchmark; the rest of the corpus is checked for 8-gram
    overlap against its broadcast gram set."""
    docs = load_table(spark, sf_dir, "documents")
    return contamination_ngrams(
        docs.where(F.col("doc_id") % 97 != 0),
        docs.where(F.col("doc_id") % 97 == 0),
        n=8,
    )


# seeded portable hash of doc_id — the shuffle sort key (seed 7)
_SHUF_KEY = _H64.format(s="concat('7', ':', CAST(doc_id AS VARCHAR))")


@q(
    "curation_shuffle_shards",
    oracle=f"""
    WITH h AS (SELECT doc_id, {_SHUF_KEY} AS sort_key FROM documents)
    SELECT doc_id, CAST(sort_key % 16 AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY sort_key % 16
                                   ORDER BY sort_key, doc_id) AS BIGINT) AS pos
    FROM h
    """,
)
def curation_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-data shuffle: seeded-hash sort key →
    shard assignment + within-shard position.  Assignment is a pure
    projection (no Spark shuffle); the window partitions by shard."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    sh = shuffle_shards(docs, n_shards=16, seed=7)
    w = Window.partitionBy("shard").orderBy("sort_key", "doc_id")
    return sh.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


@q(
    "curation_pack_sequences",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, len({_TOK}) AS n_tokens, {_SHUF_KEY} AS sort_key
      FROM documents
    ), sh AS (
      SELECT doc_id, n_tokens, sort_key, CAST(sort_key % 8 AS INT) AS shard FROM h
    ), packed AS (
      SELECT shard, n_tokens,
             CAST(floor((sum(n_tokens) OVER (PARTITION BY shard
                                             ORDER BY sort_key, doc_id
                                             ROWS UNBOUNDED PRECEDING)
                         - n_tokens) / 512.0) AS BIGINT) AS bin_id
      FROM sh
    )
    SELECT shard, bin_id, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY shard, bin_id
    """,
)
def curation_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy streaming-fill sequence packing into 512-token bins,
    within deterministic shuffle shards: one shard-partitioned window
    pass (no global sort), bins summarized per (shard, bin)."""
    docs = load_table(spark, sf_dir, "documents")
    with_tok = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    sh = shuffle_shards(with_tok, n_shards=8, seed=7)
    packed = pack_sequences(sh, budget=512, token_col="n_tokens")
    return packed.groupBy("shard", "bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
    )


@q(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_MINHASH_ORACLE}),
    edges AS (
      SELECT a AS u, b AS v FROM pairs
      UNION SELECT b AS u, a AS v FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS doc_id, least(u, min(v)) AS cluster_id
    FROM reach GROUP BY u
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → connected components (min-label propagation);
    the oracle computes the same components via transitive closure."""
    pairs = minhash_lsh_pairs(load_table(spark, sf_dir, "documents"), threshold=0.5)
    return dup_clusters(pairs)


# ===========================================================================
# text analysis (extensions)
# ===========================================================================

_LANG_SETS = {
    "en": "['the','and','of','to','a','in','is','that','it','for']",
    "es": "['el','la','de','que','y','en','un','los','se','por']",
    "fr": "['le','la','de','et','les','des','en','un','du','que']",
    "de": "['der','die','und','das','von','zu','mit','den','ist','nicht']",
}
_LANG_SCORES_SQL = ", ".join(
    f"len(list_filter({_TOK}, t -> list_contains({_LANG_SETS[l]}, t))) AS score_{l}"
    for l in ("en", "es", "fr", "de")
)


@q_retired(
    "text_lang_id",
    oracle=f"""
    SELECT doc_id, score_en, score_es, score_fr, score_de,
           CASE
             WHEN greatest(score_en, score_es, score_fr, score_de) = 0 THEN 'und'
             WHEN score_en = greatest(score_en, score_es, score_fr, score_de) THEN 'en'
             WHEN score_es = greatest(score_en, score_es, score_fr, score_de) THEN 'es'
             WHEN score_fr = greatest(score_en, score_es, score_fr, score_de) THEN 'fr'
             ELSE 'de'
           END AS lang_pred
    FROM (SELECT doc_id, {_LANG_SCORES_SQL} FROM documents)
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "score_en", "score_es", "score_fr", "score_de", "lang_pred"
    )


_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@q(
    "text_quality",
    oracle=f"""
    SELECT doc_id,
           round(len_score, 6) AS len_score,
           round(punct_ratio, 6) AS punct_ratio,
           round(stop_ratio, 6) AS stop_ratio,
           round(0.3 * len_score + 0.3 * (1.0 - punct_ratio)
                 + 0.4 * least(5.0 * stop_ratio, 1.0), 6) AS quality
    FROM (
      SELECT doc_id,
             least(CAST(len({_TOK}) AS DOUBLE) / 100.0, 1.0) AS len_score,
             CASE WHEN length({_NORM}) > 0
                  THEN CAST(len(regexp_extract_all({_NORM}, '[^A-Za-z0-9 ]')) AS DOUBLE)
                       / CAST(length({_NORM}) AS DOUBLE) ELSE 0.0 END AS punct_ratio,
             CASE WHEN len({_TOK}) > 0
                  THEN CAST(len(list_filter({_TOK}, t -> list_contains({_LANG_SETS['en']}, t))) AS DOUBLE)
                       / CAST(len({_TOK}) AS DOUBLE) ELSE 0.0 END AS stop_ratio
      FROM documents)
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "len_score", "punct_ratio", "stop_ratio", "quality"
    )


@q_retired(
    "text_token_count",
    oracle=f"""
    SELECT doc_id, len({_TOK}) AS n_tokens,
           len(regexp_extract_all({_NORM}, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS n_bpe
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_count(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_bpe").cast("bigint").alias("n_bpe"),
    )


@q_retired(
    "text_fingerprint",
    oracle=f"""
    WITH hs AS (
      SELECT doc_id, md5({_NORM}) AS fp_md5,
             list_transform({_TOK}, t -> {_H64.format(s="t")} % 2147483647) AS h
      FROM documents
    )
    SELECT doc_id, fp_md5,
           list_min(list_transform(range(1, greatest(1, len(h) - 4) + 1), i ->
             ((({pow(1000003, 4, 2147483647)} * coalesce(h[i], 0)) % 2147483647
             + ({pow(1000003, 3, 2147483647)} * coalesce(h[i + 1], 0)) % 2147483647
             + ({pow(1000003, 2, 2147483647)} * coalesce(h[i + 2], 0)) % 2147483647
             + ({pow(1000003, 1, 2147483647)} * coalesce(h[i + 3], 0)) % 2147483647
             + ({pow(1000003, 0, 2147483647)} * coalesce(h[i + 4], 0)) % 2147483647) % 2147483647)
           )) AS fp_min
    FROM hs
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "fp_md5", "fp_min"
    )


# ===========================================================================
# multimodal (extensions; payload = utf-8 bytes of text as stand-in blob)
# ===========================================================================

@q(
    "multimodal_features",
    oracle="""
    SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           substr(sha256(text), 1, 16) AS sha_prefix,
           CAST(('0x' || substr(sha256(text), 1, 15)) AS BIGINT) AS feat0
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("content"))
    return extract_features(media)


@q_retired(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, octet_length(encode(text)) AS n_bytes, i AS frame_idx,
           CAST(floor(octet_length(encode(text)) * i / 4.0) AS BIGINT) AS byte_offset
    FROM documents, (SELECT unnest(range(0, 4)) AS i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media(
        docs.select("doc_id", F.encode("text", "utf-8").alias("content")), "content", "video"
    )
    return sample_frames(media, n_frames=4).select(
        "doc_id",
        "n_bytes",
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        "byte_offset",
    )


@q(
    "multimodal_audio_stats",
    oracle="""
    SELECT doc_id, 'audio/wav' AS mime, CAST(8000 AS INT) AS sample_rate,
           CAST(1 AS INT) AS n_channels,
           n_chars // 2 AS duration_ms,
           round(CAST(doc_id % 4 + 1 AS DOUBLE) / 8, 6) AS rms,
           round(CAST(doc_id % 4 + 1 AS DOUBLE) / 8, 6) AS peak
    FROM documents
    """,
)
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio pipeline gate: per doc, synthesize a deterministic
    16-bit PCM square-wave WAV (amplitude (doc_id%4+1)/8 of full scale
    — exactly representable, so a square wave's rms == peak == that
    value in closed form; 4·n_chars frames at 8 kHz → n_chars//2 ms),
    then run the real stdlib-wave decode + vectorized stats
    (operators/multimodal.py audio_features).  The oracle predicts
    every stat arithmetically — the WAV bytes round-trip through a
    genuine encoder/decoder, not a stub."""
    import pandas as _pd
    from pyspark.sql import types as _T

    from rheoceros_spark.operators.multimodal import audio_features

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def synth(it):
        import io
        import struct
        import wave

        for pdf in it:
            blobs = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                v = (int(doc_id) % 4 + 1) * 4096  # amplitude/32768 ∈ {1..4}/8
                pattern = struct.pack("<h", v) + struct.pack("<h", -v)
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(pattern * (2 * int(n_chars)))  # 4·n_chars frames
                blobs.append(buf.getvalue())
            yield _pd.DataFrame({"doc_id": pdf["doc_id"], "content": blobs})

    media = docs.mapInPandas(
        synth,
        schema=_T.StructType(
            [
                _T.StructField("doc_id", _T.LongType(), False),
                _T.StructField("content", _T.BinaryType(), False),
            ]
        ),
    )
    return audio_features(media)


# concatenated-P6 stream geometry: "P6\n4 2\n255\n" header (11 B) + 24 B
# pixels = 35 B per frame — the oracle predicts every offset from that
_PPM_W, _PPM_H, _PPM_STRIDE = 4, 2, 35


@q(
    "multimodal_video_frames",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, doc_id % 5 + 2 AS total FROM documents
    )
    SELECT DISTINCT doc_id, CAST(total AS INT) AS n_frames_total,
           CAST(pick AS INT) AS frame_idx,
           CAST(pick * {_PPM_STRIDE} AS BIGINT) AS byte_offset,
           CAST({_PPM_W} AS INT) AS width, CAST({_PPM_H} AS INT) AS height
    FROM (
      SELECT doc_id, total, least((i * total) // 3, total - 1) AS pick
      FROM f, (SELECT unnest(range(0, 3)) AS i)
    )
    """,
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-demux gate: per doc, synthesize a concatenated-P6
    stream of ``doc_id % 5 + 2`` fixed-size frames, then demux with the
    actual header/pixel-length parser and sample 3 evenly spaced frames
    (operators/multimodal.py scan_ppm_stream / sample_frames_ppm).  The
    oracle predicts every byte offset arithmetically from the frame
    geometry — the stream round-trips a genuine encoder/parser."""
    import pandas as _pd
    from pyspark.sql import types as _T

    from rheoceros_spark.operators.multimodal import encode_ppm, sample_frames_ppm

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(it):
        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                n = int(doc_id) % 5 + 2
                blob = b"".join(
                    encode_ppm(_PPM_W, _PPM_H, bytes([i % 256]) * (_PPM_W * _PPM_H * 3))
                    for i in range(n)
                )
                blobs.append(blob)
            yield _pd.DataFrame({"doc_id": pdf["doc_id"], "content": blobs})

    media = docs.mapInPandas(
        synth,
        schema=_T.StructType(
            [
                _T.StructField("doc_id", _T.LongType(), False),
                _T.StructField("content", _T.BinaryType(), False),
            ]
        ),
    )
    return sample_frames_ppm(media, n_frames=3).drop("frame")


# ===========================================================================
# incremental dedup (entered the driver window in r6 — official row in
# CORRECTNESS_r06; originally registered past the r5 window)
# ===========================================================================

@q(
    "dedup_incremental_index",
    oracle=f"""
    WITH {_MINHASH_CTES}, cand AS (
      SELECT DISTINCT n.doc_id AS new_id, ix.doc_id AS dup_of
      FROM buckets n JOIN buckets ix ON n.band = ix.band AND n.bucket = ix.bucket
      WHERE n.doc_id % 5 = 0 AND ix.doc_id % 5 <> 0
    )
    SELECT new_id, dup_of, jaccard FROM (
      SELECT c.new_id, c.dup_of, {_JACCARD_DA_DB} AS jaccard
      FROM cand c JOIN docs da ON c.new_id = da.doc_id
                  JOIN docs db ON c.dup_of = db.doc_id
    ) WHERE jaccard >= 0.5
    """,
)
def dedup_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental crawl dedup: docs with doc_id % 5 == 0 play the new
    batch, the rest the already-indexed corpus; the batch probes the
    index's LSH band buckets without rescanning the corpus."""
    from rheoceros_spark.operators.dedup import build_minhash_index, dedup_against_index

    docs = load_table(spark, sf_dir, "documents")
    index = build_minhash_index(docs.where(F.col("doc_id") % 5 != 0))
    return dedup_against_index(docs.where(F.col("doc_id") % 5 == 0), index)


# ===========================================================================
# round-5 additions: repetition quality, count-min heavy hitters,
# data-mixture weights
# ===========================================================================

@q(
    "text_repetition",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN length({_NORM}) = 0 THEN [] ELSE {_TOK} END AS t
      FROM documents
    ), g AS (
      SELECT doc_id, t,
             CASE WHEN len(t) >= 2
                  THEN list_slice({_ngrams_sql('t', 2)}, 1, len(t) - 1)
                  ELSE [] END AS bi,
             CASE WHEN len(t) >= 3
                  THEN list_slice({_ngrams_sql('t', 3)}, 1, len(t) - 2)
                  ELSE [] END AS tri
      FROM base
    ), r AS (
      SELECT doc_id, t, bi, tri,
             list_filter(range(1, len(bi) + 1), i ->
               i = 1 OR list_extract(list_sort(bi), i) <> list_extract(list_sort(bi), i - 1)
             ) AS bounds
      FROM g
    )
    SELECT doc_id,
      round(CASE WHEN len(t) > 0
            THEN (len(t) - len(list_distinct(t))) / CAST(len(t) AS DOUBLE)
            ELSE 0.0 END, 6) AS dup_token_frac,
      round(CASE WHEN len(bi) > 0
            THEN (len(bi) - len(list_distinct(bi))) / CAST(len(bi) AS DOUBLE)
            ELSE 0.0 END, 6) AS dup_bigram_frac,
      round(CASE WHEN len(tri) > 0
            THEN (len(tri) - len(list_distinct(tri))) / CAST(len(tri) AS DOUBLE)
            ELSE 0.0 END, 6) AS dup_trigram_frac,
      round(CASE WHEN len(t) > 0 AND len(bi) > 0 THEN least(2.0 * list_max(
          list_transform(range(1, len(bounds) + 1), j ->
            coalesce(list_extract(bounds, j + 1), len(bi) + 1) - list_extract(bounds, j))
        ) / CAST(len(t) AS DOUBLE), 1.0) ELSE 0.0 END, 6) AS top_bigram_frac
    FROM r
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters over token n-grams — row-local
    array algebra, zero shuffle (operators/text_analysis.py)."""
    from rheoceros_spark.operators.text_analysis import repetition_metrics

    return repetition_metrics(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "dup_token_frac",
        "dup_bigram_frac",
        "dup_trigram_frac",
        "top_bigram_frac",
    )


_CMS_H = "CAST(('0x' || substr(md5(concat(r, ':', token)), 1, 15)) AS BIGINT)"


@q(
    "sketch_cms_topk",
    oracle=f"""
    WITH tk AS (
      SELECT unnest({_TOK}) AS token FROM documents
    ), tk2 AS (
      SELECT token FROM tk WHERE token <> ''
    ), exact AS (
      SELECT token, count(*) AS exact_cnt FROM tk2 GROUP BY token
    ), top AS (
      SELECT token, exact_cnt FROM exact ORDER BY exact_cnt DESC, token LIMIT 20
    ), cells AS (
      SELECT r, {_CMS_H} % 1024 AS c, count(*) AS cnt
      FROM tk2 CROSS JOIN (SELECT unnest(range(0, 4)) AS r)
      GROUP BY r, c
    ), probes AS (
      SELECT t.token, t.exact_cnt, v.r, {_CMS_H} % 1024 AS c
      FROM top t CROSS JOIN (SELECT unnest(range(0, 4)) AS r) v
    )
    SELECT p.token, CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(min(s.cnt) AS BIGINT) AS cms_est
    FROM probes p JOIN cells s ON p.r = s.r AND p.c = s.c
    GROUP BY p.token, p.exact_cnt
    """,
)
def sketch_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters: exact top-20 tokens with their
    CMS estimates (operators/sketches.py cms_top_tokens)."""
    from rheoceros_spark.operators.sketches import cms_top_tokens

    return cms_top_tokens(load_table(spark, sf_dir, "documents"), k=20)


@q(
    "curation_source_mix",
    oracle=f"""
    WITH perdoc AS (
      SELECT source,
             CASE WHEN length({_NORM}) = 0 THEN 0 ELSE len({_TOK}) END AS n_tokens
      FROM documents
    ), per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS n_tokens
      FROM perdoc GROUP BY source
    ), tot AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM per
    ), w AS (
      SELECT source, n_docs, n_tokens,
             CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
             CAST(round(sqrt(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e12)
                  AS BIGINT) AS wq
      FROM per, tot
    ), ws AS (
      SELECT CAST(sum(wq) AS BIGINT) AS wsum FROM w
    )
    SELECT source, n_docs, n_tokens, round(share, 6) AS share,
           round(CAST(wq AS DOUBLE) / CAST(wsum AS DOUBLE), 6) AS mix_weight
    FROM w, ws
    """,
)
def curation_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alpha-sampling mixture weights per source (alpha=0.5) over
    token-count totals (operators/curation.py source_mixture_weights)."""
    from rheoceros_spark.operators.curation import source_mixture_weights
    from rheoceros_spark.operators.text_analysis import token_count

    docs = token_count(load_table(spark, sf_dir, "documents"))
    return source_mixture_weights(docs, source_col="source", token_col="n_tokens", alpha=0.5)


@q(
    "curation_filter_funnel",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id, md5({_NORM}) AS fp, {_LANG_SCORES_SQL},
             least(CAST(len({_TOK}) AS DOUBLE) / 100.0, 1.0) AS len_score,
             CASE WHEN length({_NORM}) > 0
                  THEN CAST(len(regexp_extract_all({_NORM}, '[^A-Za-z0-9 ]')) AS DOUBLE)
                       / CAST(length({_NORM}) AS DOUBLE) ELSE 0.0 END AS punct_ratio,
             CASE WHEN len({_TOK}) > 0
                  THEN CAST(len(list_filter({_TOK}, t -> list_contains({_LANG_SETS['en']}, t))) AS DOUBLE)
                       / CAST(len({_TOK}) AS DOUBLE) ELSE 0.0 END AS stop_ratio,
             round(CASE WHEN length({_NORM}) > 0
                   THEN (len({_TOK}) - len(list_distinct({_TOK})))
                        / CAST(len({_TOK}) AS DOUBLE)
                   ELSE 0.0 END, 6) AS dup_token_frac
      FROM documents
    ), flags AS (
      SELECT doc_id, fp,
             (CASE
               WHEN greatest(score_en, score_es, score_fr, score_de) = 0 THEN 'und'
               WHEN score_en = greatest(score_en, score_es, score_fr, score_de) THEN 'en'
               WHEN score_es = greatest(score_en, score_es, score_fr, score_de) THEN 'es'
               WHEN score_fr = greatest(score_en, score_es, score_fr, score_de) THEN 'fr'
               ELSE 'de'
             END = 'en') AS p1,
             round(0.3 * len_score + 0.3 * (1.0 - punct_ratio)
                   + 0.4 * least(5.0 * stop_ratio, 1.0), 6) AS quality,
             dup_token_frac
      FROM feat
    ), gated AS (
      SELECT doc_id, fp, p1,
             p1 AND quality >= 0.55 AS p2,
             p1 AND quality >= 0.55 AND dup_token_frac <= 0.5 AS p3
      FROM flags
    ), dedup AS (
      SELECT *,
             p3 AND doc_id = min(CASE WHEN p3 THEN doc_id END)
                             OVER (PARTITION BY fp) AS p4
      FROM gated
    ), agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN p2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN p3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             CAST(sum(CASE WHEN p4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
      FROM dedup
    )
    SELECT CAST(0 AS BIGINT) AS stage, 'ingest' AS stage_name, n0 AS n_docs FROM agg
    UNION ALL SELECT 1, 'lang', n1 FROM agg
    UNION ALL SELECT 2, 'quality', n2 FROM agg
    UNION ALL SELECT 3, 'repetition', n3 FROM agg
    UNION ALL SELECT 4, 'dedup', n4 FROM agg
    """,
)
def curation_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed pretraining filter funnel — lang-ID → quality →
    repetition → exact dedup — with per-stage survivor counts
    (operators/curation.py filter_funnel)."""
    from rheoceros_spark.operators.curation import filter_funnel

    return filter_funnel(load_table(spark, sf_dir, "documents"))


@q(
    "dedup_substring_spans",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_TOK} AS t FROM documents
    ), el AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) - 14),
               i -> {_H64.format(s="array_to_string(list_slice(t, i, i + 15), ' ')")})) AS gh
      FROM tk WHERE doc_id IS NOT NULL AND len(t) >= 16
    ), cnt AS (
      SELECT gh, count(*) AS c FROM el GROUP BY gh
    ), pd AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
             CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
             round(CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE), 6) AS dup_window_frac
      FROM el JOIN cnt USING (gh) GROUP BY doc_id
    )
    SELECT d.doc_id, coalesce(p.n_windows, 0) AS n_windows,
           coalesce(p.n_dup_windows, 0) AS n_dup_windows, p.dup_window_frac
    FROM documents d LEFT JOIN pd p USING (doc_id)
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate-span coverage per document (16-token
    windows, corpus-wide span-hash counts; operators/dedup.py
    substring_dup_spans — the scalable ExactSubstr stand-in)."""
    from rheoceros_spark.operators.dedup import substring_dup_spans

    return substring_dup_spans(load_table(spark, sf_dir, "documents"), window=16)


# BM25: corpus = docs outside the query slice; queries = every 101st doc
_BM25_K1, _BM25_B = 1.2, 0.75


@q(
    "text_bm25_topk",
    oracle=f"""
    WITH corp AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 101 <> 0
    ), qry AS (
      SELECT doc_id AS query_id, text FROM documents WHERE doc_id % 101 = 0
    ), postings AS (
      SELECT doc_id, token, count(*) AS tf
      FROM (SELECT doc_id, unnest({_TOK}) AS token FROM corp)
      WHERE token <> '' GROUP BY doc_id, token
    ), dls AS (
      SELECT doc_id,
             CASE WHEN length({_NORM}) = 0 THEN 0 ELSE len({_TOK}) END AS dl
      FROM corp
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dls
    ), qt AS (
      SELECT DISTINCT query_id, token
      FROM (SELECT query_id, unnest({_TOK}) AS token FROM qry)
      WHERE token <> ''
    ), m AS (
      SELECT p.doc_id, p.token, p.tf FROM postings p
      JOIN (SELECT DISTINCT token FROM qt) USING (token)
    ), dfreq AS (
      SELECT token, CAST(count(*) AS DOUBLE) AS df FROM m GROUP BY token
    ), contrib AS (
      SELECT q.query_id, m.doc_id,
             CAST(round(
               ln(1.0 + (s.n - f.df + 0.5) / (f.df + 0.5))
               * (CAST(m.tf AS DOUBLE) * ({_BM25_K1} + 1.0))
               / (CAST(m.tf AS DOUBLE)
                  + {_BM25_K1} * (1.0 - {_BM25_B}
                                  + {_BM25_B} * CAST(d.dl AS DOUBLE) / s.avgdl))
               * 1e7) AS BIGINT) AS c
      FROM m JOIN qt q USING (token) JOIN dfreq f USING (token)
             JOIN dls d ON m.doc_id = d.doc_id, stats s
    ), scored AS (
      SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_q
      FROM contrib GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, score, rank FROM (
      SELECT query_id, doc_id, CAST(score_q AS DOUBLE) / 1e7 AS score,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY score_q DESC, doc_id ASC) AS INT) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 sparse retrieval: top-5 corpus docs per query (every 101st
    doc plays the query; operators/text_analysis.py bm25_topk)."""
    from rheoceros_spark.operators.text_analysis import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 101 != 0)
    queries_df = docs.where(F.col("doc_id") % 101 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    # single-query-batch entry point: "cache" opt-in is safe here (the
    # bench/driver harness clears the catalog cache between runs) and
    # keeps the measured fresh-JVM win (sf1 10.96 s vs 13.23 s re-exec)
    return bm25_topk(
        corpus, queries_df, k1=_BM25_K1, b=_BM25_B, k=5,
        materialize_matched="cache",
    )


def _dsir_bucket_sql(nb: int) -> str:
    gram = _ngrams_sql("t", 2)
    h = _H64.format(s="g")
    return f"unnest(list_transform({gram}, g -> {h} % {nb}))"


# shared CTE chain for both DSIR queries (weights + resample)
_DSIR_CTES = f"""tgt AS (
      SELECT doc_id, {_TOK} AS t FROM documents WHERE lang = 'en'
    ), rw AS (
      SELECT doc_id, {_TOK} AS t FROM documents WHERE lang <> 'en'
    ), tc AS (
      SELECT bkt, count(*) AS tc
      FROM (SELECT {_dsir_bucket_sql(1024)} AS bkt FROM tgt) GROUP BY bkt
    ), pd AS (
      SELECT doc_id, bkt, count(*) AS n
      FROM (SELECT doc_id, {_dsir_bucket_sql(1024)} AS bkt FROM rw)
      GROUP BY doc_id, bkt
    ), rc AS (
      SELECT bkt, CAST(sum(n) AS BIGINT) AS rc FROM pd GROUP BY bkt
    ), tt AS (
      SELECT CAST(sum(tc) AS BIGINT) AS T FROM tc
    ), rt AS (
      SELECT CAST(sum(rc) AS BIGINT) AS R FROM rc
    ), model AS (
      SELECT bkt,
             CAST(round((
               ln(CAST(coalesce(tc, 0) + 1 AS DOUBLE) / CAST(T + 1024 AS DOUBLE))
               - ln(CAST(coalesce(rc, 0) + 1 AS DOUBLE) / CAST(R + 1024 AS DOUBLE))
             ) * 1e7) AS BIGINT) AS lr
      FROM tc FULL JOIN rc USING (bkt), tt, rt
    ), scored AS (
      -- NOT re-rounded to 6dp: integer sum / 1e7 is bit-identical on
      -- both engines, while round() at a decimal half-way point splits
      -- between BigDecimal HALF_UP (Spark) and double rounding (here)
      SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_feats,
             CAST(sum(n * lr) AS DOUBLE) / 1e7 AS dsir_logw
      FROM pd JOIN model USING (bkt) GROUP BY doc_id
    )"""


@q_retired(
    "curation_dsir_weights",
    oracle=f"""
    WITH {_DSIR_CTES}
    SELECT rw.doc_id, coalesce(s.n_feats, 0) AS n_feats, s.dsir_logw
    FROM rw LEFT JOIN scored s ON rw.doc_id = s.doc_id
    """,
)
def curation_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR hashed-bigram importance weights for non-English docs
    against the English slice as target distribution
    (operators/curation.py dsir_weights)."""
    from rheoceros_spark.operators.curation import dsir_weights

    docs = load_table(spark, sf_dir, "documents")
    return dsir_weights(
        docs.where(F.col("lang") != "en"),
        docs.where(F.col("lang") == "en"),
        n_buckets=1024,
        ngram=2,
    )


# seeded portable uniform for the Gumbel draw (seed 0)
_GUMBEL_H = _H64.format(s="concat('0', ':', CAST(doc_id AS VARCHAR))")


@q(
    "curation_dsir_resample",
    oracle=f"""
    WITH {_DSIR_CTES}, keyed AS (
      SELECT doc_id, dsir_logw,
             CAST(round(dsir_logw * 1e7) AS BIGINT)
             + CAST(round(-ln(-ln((CAST({_GUMBEL_H} AS DOUBLE) + 0.5)
                                  / 1152921504606846976.0)) * 1e7) AS BIGINT)
               AS key_q
      FROM scored
    )
    SELECT doc_id, dsir_logw,
           CAST(key_q AS DOUBLE) / 1e7 AS gumbel_key
    FROM keyed ORDER BY key_q DESC, doc_id ASC LIMIT 60
    """,
)
def curation_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection step: Gumbel-top-k importance resampling of the
    non-English slice by its DSIR log-weights (operators/curation.py
    gumbel_topk_resample — seeded portable noise, integer-quantized
    perturbed keys)."""
    from rheoceros_spark.operators.curation import dsir_weights, gumbel_topk_resample

    docs = load_table(spark, sf_dir, "documents")
    w = dsir_weights(
        docs.where(F.col("lang") != "en"),
        docs.where(F.col("lang") == "en"),
        n_buckets=1024,
        ngram=2,
    )
    return gumbel_topk_resample(w, "dsir_logw", k=60, seed=0)


# ===========================================================================
# corpus shaping (round 6): domain caps, leakage-safe splits, negative
# mining, per-source boilerplate, tf-idf keywords
# ===========================================================================

@q(
    "curation_domain_cap",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {_H64.format(s="concat('0', ':', CAST(doc_id AS VARCHAR))")},
                        doc_id
             ) AS src_rank
      FROM documents
    )
    SELECT doc_id, source, CAST(src_rank AS BIGINT) AS src_rank
    FROM ranked WHERE src_rank <= 12
    """,
)
def curation_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (RefinedWeb-style anti-domination):
    seeded-hash rank within source, keep the first 12
    (operators/curation.py domain_cap — WindowGroupLimit plan shape)."""
    from rheoceros_spark.operators.curation import domain_cap

    return domain_cap(
        load_table(spark, sf_dir, "documents"), cap=12, seed=0
    ).select("doc_id", "source", F.col("src_rank").cast("bigint").alias("src_rank"))


@q(
    "curation_group_split",
    oracle=f"""
    SELECT doc_id, source,
           CASE
             -- NULL-propagating ||, NOT concat() (which skips NULLs and
             -- would hash '0:'): a NULL source must fall through to the
             -- last split, matching the operator's explicit NULL routing
             WHEN ({_H64.format(s="'0' || ':' || source")}) % 1000000 < 800000
               THEN 'train'
             WHEN ({_H64.format(s="'0' || ':' || source")}) % 1000000 < 900000
               THEN 'val'
             ELSE 'test'
           END AS split
    FROM documents
    """,
)
def curation_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment: whole sources land in one
    split via portable hash buckets — near-dups can't straddle the
    train/eval boundary (operators/curation.py group_split)."""
    from rheoceros_spark.operators.curation import group_split

    return group_split(
        load_table(spark, sf_dir, "documents"),
        group_col="source",
        splits=(("train", 0.8), ("val", 0.1), ("test", 0.1)),
        seed=0,
    ).select("doc_id", "source", "split")


@q(
    "curation_negative_samples",
    oracle=f"""
    WITH cand AS (
      SELECT doc_id AS neg_id, source AS neg_source,
             ({_H64.format(s="concat('0', ':', CAST(doc_id AS VARCHAR))")}) % 8 AS b
      FROM documents
    ), qry AS (
      SELECT doc_id AS query_id, source AS qsrc,
             ({_H64.format(s="concat('1', ':', CAST(doc_id AS VARCHAR))")}) % 8 AS b
      FROM documents WHERE doc_id % 101 = 0
    ), ranked AS (
      SELECT query_id, neg_id, neg_source,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY {_H64.format(s="concat('2', ':', CAST(query_id AS VARCHAR), ':', CAST(neg_id AS VARCHAR))")},
                        neg_id
             ) AS neg_rank
      FROM cand JOIN qry USING (b)
      WHERE neg_source <> qsrc
    )
    SELECT query_id, neg_id, neg_source, CAST(neg_rank AS BIGINT) AS neg_rank
    FROM ranked WHERE neg_rank <= 4
    """,
)
def curation_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bucketed negative mining for contrastive training:
    each query (doc_id % 101 == 0) draws 4 different-source negatives
    from one hash pool — equi-join on the bucket, never a crossJoin
    (operators/curation.py negative_samples)."""
    from rheoceros_spark.operators.curation import negative_samples

    docs = load_table(spark, sf_dir, "documents")
    qry = docs.where(F.col("doc_id") % 101 == 0).select(
        F.col("doc_id").alias("query_id"), "source"
    )
    return negative_samples(docs, qry, k=4, n_buckets=8, seed=0).select(
        "query_id", "neg_id", "neg_source",
        F.col("neg_rank").cast("bigint").alias("neg_rank"),
    )


@q(
    "curation_boilerplate",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, source, {_TOK} AS t FROM documents
      WHERE doc_id IS NOT NULL AND text IS NOT NULL
    ), grams AS (
      SELECT doc_id, source, unnest(list_distinct({_ngrams_sql('t', 3)})) AS gram
      FROM tk
    ), cnt AS (
      SELECT source, gram, count(*) AS dfq FROM grams GROUP BY source, gram
    ), per AS (
      SELECT doc_id, source,
             CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(CASE WHEN dfq >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
             round(CAST(sum(CASE WHEN dfq >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE), 6) AS boiler_frac
      FROM grams JOIN cnt USING (source, gram)
      GROUP BY doc_id, source
    )
    SELECT d.doc_id, d.source,
           coalesce(p.n_grams, 0) AS n_grams,
           coalesce(p.n_boiler, 0) AS n_boiler,
           p.boiler_frac
    FROM documents d LEFT JOIN per p USING (doc_id, source)
    """,
)
def curation_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate fraction: trigrams shared by ≥3 documents
    of the same source are site chrome; per doc, the fraction of its
    distinct trigrams that are boilerplate (operators/curation.py
    boilerplate_ngrams)."""
    from rheoceros_spark.operators.curation import boilerplate_ngrams

    return boilerplate_ngrams(
        load_table(spark, sf_dir, "documents"), n=3, min_docs=3
    )


@q_retired(
    "text_tfidf_terms",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, unnest({_TOK}) AS token
      FROM documents WHERE doc_id IS NOT NULL
    ), tk2 AS (
      SELECT doc_id, token FROM tk WHERE token <> ''
    ), pdt AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      FROM tk2 GROUP BY doc_id, token
    ), dfq AS (
      SELECT token, CAST(count(*) AS DOUBLE) AS dfv FROM pdt GROUP BY token
    ), nd AS (
      SELECT CAST(count(*) AS DOUBLE) AS n
      FROM documents WHERE doc_id IS NOT NULL
    ), sc AS (
      SELECT doc_id, token, tf,
             tf * CAST(round(ln(n / dfv) * 1e7) AS BIGINT) AS sq
      FROM pdt JOIN dfq USING (token), nd
    ), ranked AS (
      SELECT doc_id, token, tf, sq,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY sq DESC, token ASC
             ) AS term_rank
      FROM sc
    )
    SELECT doc_id, token, tf, CAST(sq AS DOUBLE) / 1e7 AS score,
           CAST(term_rank AS BIGINT) AS term_rank
    FROM ranked WHERE term_rank <= 3
    """,
)
def text_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document, integer-quantized IDF and
    WindowGroupLimit top-k (operators/text_analysis.py
    tfidf_topk_terms)."""
    from rheoceros_spark.operators.text_analysis import tfidf_topk_terms

    return tfidf_topk_terms(load_table(spark, sf_dir, "documents"), k=3).select(
        "doc_id", "token", "tf", "score",
        F.col("term_rank").cast("bigint").alias("term_rank"),
    )


def _bpe_oracle() -> str:
    from rheoceros_spark.operators.text_analysis import (
        BPE_DEMO_MERGES,
        bpe_word_fold_duckdb,
    )

    fold = bpe_word_fold_duckdb(BPE_DEMO_MERGES)
    return f"""
    WITH b AS (
      SELECT doc_id,
             CASE WHEN text IS NULL OR length({_NORM}) = 0
                  THEN CAST([] AS VARCHAR[])
                  ELSE flatten(list_transform(
                         regexp_extract_all({_NORM}, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'),
                         w -> {fold})) END AS bpe
      FROM documents WHERE doc_id IS NOT NULL
    )
    SELECT doc_id, CAST(len(bpe) AS BIGINT) AS n_bpe_tokens,
           array_to_string(bpe[1:8], ' ') AS bpe_head
    FROM b
    """


@q_retired("text_bpe_tokens", oracle=_bpe_oracle())
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-2-style BPE subword tokenization: BPE_REGEX pre-tokens
    merged bottom-up from characters under a rank-ordered merge table.
    Default impl is the production-tokenizer shape — Arrow-batched
    Pandas UDF, merge ranks shipped in the closure, per-worker
    word-memo cache (~57× the pure-HOF fold twin, which stays as the
    oracle-shaped parity fallback).  The n_bpe_tokens column is the
    real model-token counter chunk/pack/budget compose with
    (operators/text_analysis.py bpe_encode)."""
    from rheoceros_spark.operators.text_analysis import bpe_encode

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    return bpe_encode(docs).select(
        "doc_id",
        "n_bpe_tokens",
        F.concat_ws(" ", F.slice("bpe_tokens", 1, 8)).alias("bpe_head"),
    )


# ===========================================================================
# k-means codebook training, KL drift, dedup keep-list (round 6 depth)
# ===========================================================================

def _lloyd_ctes(k: int = 8, iters: int = 2) -> tuple[list[str], str]:
    """Lloyd k-means as SQL CTEs: hash-sampled seeds, then ``iters``
    assign→update rounds with 1e-7-grid quantized component means (the
    determinism contract of operators/similarity.py kmeans_refine).
    Returns (cte_list, final_centroid_cte_name); shared by the
    ann_kmeans_refine and ann_ivfpq_topk oracles."""
    seeds = f"""
    SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
    FROM emb ORDER BY {_H64.format(s="CAST(vec_id AS VARCHAR)")}, vec_id LIMIT {k}
    """
    ctes = [f"emb AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id IS NOT NULL)",
            f"c0 AS ({seeds})"]
    prev = "c0"
    for i in range(1, iters + 1):
        a, m, c = f"a{i}", f"m{i}", f"c{i}"
        ctes.append(f"""{a} AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_cos_sql('e.embedding', 'c.cv')} DESC, c.cid) AS rn
        FROM emb e, {prev} c
      ) WHERE rn = 1
    )""")
        ctes.append(f"""{m} AS (
      SELECT cell, list(mean ORDER BY pos) AS cv_new FROM (
        SELECT cell, pos,
               CAST(sum(CAST(round(CAST(embedding[pos + 1] AS DOUBLE) * 1e7) AS BIGINT)) AS DOUBLE)
               / (CAST(count(*) AS DOUBLE) * 1e7) AS mean
        FROM {a} CROSS JOIN (SELECT unnest(range(0, 64)) AS pos)
        GROUP BY cell, pos
      ) GROUP BY cell
    )""")
        ctes.append(f"""{c} AS (
      SELECT p.cid, coalesce(m.cv_new, p.cv) AS cv
      FROM {prev} p LEFT JOIN {m} m ON p.cid = m.cell
    )""")
        prev = c
    return ctes, prev


def _kmeans_oracle(k: int = 8, iters: int = 2) -> str:
    ctes, prev = _lloyd_ctes(k, iters)
    return f"""
    WITH {', '.join(ctes)}
    SELECT vec_id, cid AS cell FROM (
      SELECT e.vec_id, c.cid,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {_cos_sql('e.embedding', 'c.cv')} DESC, c.cid) AS rn
      FROM emb e, {prev} c
    ) WHERE rn = 1
    """


def _ivfpq_oracle(
    n_cells: int = 8,
    iters: int = 2,
    n_codes: int = 16,
    m: int = 4,
    dim: int = 64,
    n_probe: int = 3,
    rerank: int = 50,
    k: int = 10,
) -> str:
    """IVFADC end-to-end in SQL: the trained Lloyd coarse codebook
    (shared CTEs), max-cos cell assignment, per-vector residuals,
    hash-sampled residual PQ codebook, per-subspace argmin codes,
    per-probed-cell query-residual ADC tables, ADC candidate rank,
    exact cosine rerank — every float step an order-fixed fold, so it
    reproduces operators/similarity.py ivfpq_write + ivfpq_probe
    bit-for-bit."""
    sub = dim // m
    ctes, cfinal = _lloyd_ctes(n_cells, iters)
    hk = _H64.format(s="CAST(vec_id AS VARCHAR)")
    code_cols = ",\n         ".join(
        f"max(CASE WHEN s = {s} THEN code END) AS c{s}" for s in range(m)
    )
    cand_joins = "\n  ".join(
        f"JOIN qdist q{s} ON q{s}.cell = cp.cell AND q{s}.s = {s} AND q{s}.ord = cp.c{s}"
        for s in range(m)
    )
    adist = "q0.d"
    for s in range(1, m):
        adist = f"({adist} + q{s}.d)"
    ctes.append(f"""assigned AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_cos_sql('e.embedding', 'c.cv')} DESC, c.cid) AS rn
        FROM emb e, {cfinal} c
      ) WHERE rn = 1
    )""")
    ctes.append(f"""resid AS (
      SELECT a.vec_id, a.cell,
             list_transform(range(1, {dim} + 1),
                            j -> CAST(a.embedding[j] AS DOUBLE) - c.cv[j]) AS res
      FROM assigned a JOIN {cfinal} c ON a.cell = c.cid
    )""")
    ctes.append(f"""cb AS (
      SELECT res AS cv, row_number() OVER (ORDER BY {hk}, vec_id) AS ord
      FROM resid ORDER BY {hk}, vec_id LIMIT {n_codes}
    )""")
    ctes.append(f"subs AS (SELECT unnest(range(0, {m})) AS s)")
    ctes.append(f"""codes AS (
      SELECT vec_id, cell, s, ord AS code FROM (
        SELECT r.vec_id, r.cell, sb.s, c.ord,
               row_number() OVER (PARTITION BY r.vec_id, sb.s
                 ORDER BY {_pq_subdist_sql('r.res', 'c.cv', 'sb.s', sub)}, c.ord) AS rn
        FROM resid r, cb c, subs sb
      ) WHERE rn = 1
    )""")
    ctes.append(f"""codes_p AS (
      SELECT vec_id, cell,
         {code_cols}
      FROM codes GROUP BY vec_id, cell
    )""")
    ctes.append("q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)")
    ctes.append(f"""probes AS (
      SELECT cid, cv FROM {cfinal}, q
      ORDER BY {_cos_sql('cv', 'qv')} DESC, cid LIMIT {n_probe}
    )""")
    ctes.append(f"""qres AS (
      SELECT p.cid AS cell,
             list_transform(range(1, {dim} + 1),
                            j -> CAST(qv[j] AS DOUBLE) - p.cv[j]) AS res
      FROM probes p, q
    )""")
    ctes.append(f"""qdist AS (
      SELECT r.cell, sb.s, c.ord,
             {_pq_subdist_sql('r.res', 'c.cv', 'sb.s', sub)} AS d
      FROM qres r, cb c, subs sb
    )""")
    ctes.append(f"""cand AS (
      SELECT cp.vec_id FROM codes_p cp
  {cand_joins}
      WHERE cp.vec_id != 0
      ORDER BY {adist}, cp.vec_id LIMIT {rerank}
    )""")
    return f"""
    WITH {', '.join(ctes)}
    SELECT vec_id, rank, round(cos, 6) AS cos_r FROM (
      SELECT e.vec_id, {_cos_sql('e.embedding', 'qv')} AS cos,
             row_number() OVER (ORDER BY {_cos_sql('e.embedding', 'qv')} DESC, e.vec_id) AS rank
      FROM embeddings e JOIN cand USING (vec_id), q
    ) WHERE rank <= {k}
    """


_IVFPQ_INDEX_CACHE: dict[str, str] = {}


@q("ann_ivfpq_topk", oracle=_ivfpq_oracle())
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite index — the actual 100 TB ANN architecture
    (IVFADC): trained Lloyd coarse cells (k=8, 2 rounds), per-cell
    PQ-encoded residuals (16 codes × 4 subspaces), persisted
    cell-partitioned layout; the probe reads ONLY its 3 nearest cell
    directories (inputFiles() gate in tests/test_operators.py), ADC-
    scans their codes against per-cell query-residual tables, and
    exactly reranks the 50 best by cosine (operators/similarity.py
    ivfpq_write / ivfpq_probe)."""
    import tempfile

    from rheoceros_spark.operators.similarity import ivfpq_probe, ivfpq_write

    emb = load_table(spark, sf_dir, "embeddings")
    path = _IVFPQ_INDEX_CACHE.get(sf_dir)
    if path is None:
        path = tempfile.mkdtemp(prefix="rheoceros_ivfpq_")
        ivfpq_write(emb, path, n_cells=8, iters=2, n_codes=16, m=4)
        _IVFPQ_INDEX_CACHE[sf_dir] = path
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]
    return ivfpq_probe(spark, path, qv, k=10, n_probe=3, rerank=50, exclude_id=0).select(
        "vec_id", F.col("rank").cast("bigint").alias("rank"), "cos_r"
    )


@q_retired("ann_kmeans_refine", oracle=_kmeans_oracle())
def ann_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means (k=8, 2 rounds): hash-sampled seeds →
    broadcast-assign (max_by argmax) → quantized component-mean update —
    the codebook trainer behind IVF/PQ (operators/similarity.py
    kmeans_refine).  An *iterative float* algorithm made bit-exact
    across engines via 1e-7 integer-grid means."""
    from rheoceros_spark.operators.similarity import kmeans_refine

    return kmeans_refine(load_table(spark, sf_dir, "embeddings"), k=8, iters=2)


@q(
    "text_source_kl",
    oracle=f"""
    WITH tk AS (
      SELECT source, unnest({_TOK}) AS token FROM documents
      WHERE source IS NOT NULL
    ), tk2 AS (
      SELECT source, token FROM tk WHERE token <> ''
    ), ps AS (
      SELECT source, token, count(*) AS cst FROM tk2 GROUP BY source, token
    ), ct AS (
      SELECT token, CAST(sum(cst) AS BIGINT) AS cct FROM ps GROUP BY token
    ), st AS (
      SELECT source, CAST(sum(cst) AS BIGINT) AS ns FROM ps GROUP BY source
    ), g AS (
      SELECT CAST(sum(cct) AS BIGINT) AS nc FROM ct
    ), terms AS (
      SELECT ps.source, st.ns,
             ps.cst * CAST(round(ln(
               (CAST(ps.cst AS DOUBLE) * CAST(g.nc AS DOUBLE))
               / (CAST(ct.cct AS DOUBLE) * CAST(st.ns AS DOUBLE))
             ) * 1e7) AS BIGINT) AS tq
      FROM ps JOIN ct USING (token) JOIN st USING (source), g
    )
    SELECT source, CAST(max(ns) AS BIGINT) AS n_tokens,
           CAST(sum(tq) AS DOUBLE) / (1e7 * CAST(max(ns) AS DOUBLE)) AS kl
    FROM terms GROUP BY source
    """,
)
def text_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL(source ‖ corpus) token-distribution drift —
    corpus monitoring for spammy/shifted sources
    (operators/text_analysis.py source_kl_drift)."""
    from rheoceros_spark.operators.text_analysis import source_kl_drift

    return source_kl_drift(load_table(spark, sf_dir, "documents"))


@q(
    "dedup_keep_list",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_MINHASH_ORACLE}),
    edges AS (
      SELECT a AS u, b AS v FROM pairs
      UNION SELECT b AS u, a AS v FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    clusters AS (
      SELECT u AS doc_id, least(u, min(v)) AS cluster_id
      FROM reach GROUP BY u
    )
    SELECT d.doc_id,
           coalesce(c.cluster_id, d.doc_id) AS keep_id,
           coalesce(c.cluster_id, d.doc_id) <> d.doc_id AS is_dup
    FROM documents d LEFT JOIN clusters c USING (doc_id)
    """,
)
def dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Actionable dedup output: per document, the minhash-cluster
    representative to keep and the purge flag (operators/curation.py
    dedup_keep_list — pairs → auto-escalating CC → corpus left join)."""
    from rheoceros_spark.operators.curation import dedup_keep_list as keep_list
    from rheoceros_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    return keep_list(docs, minhash_lsh_pairs(docs, threshold=0.5))


@q(
    "text_chunk_documents",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_TOK} AS t FROM documents
      WHERE doc_id IS NOT NULL AND length({_NORM}) > 0
    ), st AS (
      SELECT doc_id, t,
             unnest(range(1, greatest(1, len(t) - 8) + 1, 24)) AS s
      FROM tk
    )
    SELECT doc_id,
           CAST((s - 1) / 24 AS BIGINT) AS chunk_id,
           CAST(len(list_slice(t, s, s + 31)) AS BIGINT) AS n_chunk_tokens,
           array_to_string(list_slice(t, s, s + 31), ' ') AS chunk_text
    FROM st
    """,
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-token chunking (32-token chunks, 8-token
    overlap) — the RAG / long-doc context-window prep step
    (operators/text_analysis.py chunk_documents; shuffle-free)."""
    from rheoceros_spark.operators.text_analysis import chunk_documents

    return chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk_tokens=32, overlap=8
    )


@q(
    "curation_budget_mix",
    oracle=f"""
    WITH perdoc AS (
      SELECT doc_id, source,
             CASE WHEN length({_NORM}) = 0 THEN 0 ELSE len({_TOK}) END AS n_tokens
      FROM documents WHERE source IS NOT NULL
    ), per AS (
      SELECT source, CAST(sum(n_tokens) AS BIGINT) AS nt FROM perdoc GROUP BY source
    ), tot AS (
      SELECT CAST(sum(nt) AS BIGINT) AS tot FROM per
    ), wq AS (
      SELECT source,
             CAST(round(sqrt(CAST(nt AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e12)
                  AS BIGINT) AS wq
      FROM per, tot
    ), ws AS (
      SELECT CAST(sum(wq) AS BIGINT) AS wsum FROM wq
    ), quota AS (
      SELECT source,
             CAST(floor((CAST(wq AS DOUBLE) * 20000.0) / CAST(wsum AS DOUBLE))
                  AS BIGINT) AS quota
      FROM wq, ws
    ), ranked AS (
      SELECT d.doc_id, d.source, d.n_tokens, q.quota,
             row_number() OVER w AS sel_rank,
             coalesce(sum(d.n_tokens) OVER (
               w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM perdoc d JOIN quota q USING (source)
      WINDOW w AS (PARTITION BY d.source
                   ORDER BY {_H64.format(s="concat('0', ':', CAST(d.doc_id AS VARCHAR))")},
                            d.doc_id)
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(sel_rank AS BIGINT) AS sel_rank, quota
    FROM ranked WHERE cb < quota
    """,
)
def curation_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture assembly: each source gets its sqrt-share
    of a 20k-token budget, filled in deterministic hash order
    (operators/curation.py budget_mix_select)."""
    from rheoceros_spark.operators.curation import budget_mix_select
    from rheoceros_spark.operators.text_analysis import token_count

    docs = token_count(load_table(spark, sf_dir, "documents"))
    return budget_mix_select(docs, token_budget=20000, alpha=0.5, seed=0).select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "sel_rank",
        "quota",
    )


@q_retired(
    "curation_corpus_diff",
    oracle=f"""
    WITH old AS (
      SELECT doc_id,
             -- normalize AFTER suffixing, exactly like the Spark side
             -- (normalize(concat(...)) — differs on whitespace-only text)
             md5(CASE WHEN doc_id % 5 = 0
                      THEN trim(regexp_replace(lower(text || ' legacy suffix'),
                                               '\\s+', ' ', 'g'))
                      ELSE {_NORM} END) AS old_fp
      FROM documents WHERE doc_id % 11 <> 0
    ), new AS (
      SELECT doc_id, md5({_NORM}) AS new_fp
      FROM documents WHERE doc_id % 13 <> 0
    )
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.old_fp IS DISTINCT FROM n.new_fp THEN 'changed'
                ELSE 'unchanged' END AS status,
           o.old_fp, n.new_fp
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    """,
)
def curation_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two simulated corpus versions: old drops
    doc_id % 11 == 0 (→ 'added' in new) and carries a mutated text for
    doc_id % 5 == 0 (→ 'changed'); new drops doc_id % 13 == 0
    (→ 'removed') (operators/curation.py corpus_diff)."""
    from rheoceros_spark.operators.curation import corpus_diff

    docs = load_table(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 11 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" legacy suffix"))
        ).otherwise(F.col("text")),
    )
    new = docs.where(F.col("doc_id") % 13 != 0)
    return corpus_diff(old, new)


_FP_INDEX_CACHE: dict[str, str] = {}


@q(
    "corpus_diff_indexed",
    oracle=f"""
    WITH old AS (
      SELECT doc_id,
             -- normalize AFTER suffixing, exactly like the Spark side
             md5(CASE WHEN doc_id % 6 = 0
                      THEN trim(regexp_replace(lower(text || ' archival rev'),
                                               '\\s+', ' ', 'g'))
                      ELSE {_NORM} END) AS old_fp
      FROM documents WHERE doc_id % 9 <> 0
    ), new AS (
      SELECT doc_id, md5({_NORM}) AS new_fp
      FROM documents WHERE doc_id % 10 <> 0
    )
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.old_fp IS DISTINCT FROM n.new_fp THEN 'changed'
                ELSE 'unchanged' END AS status,
           o.old_fp, n.new_fp
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    """,
)
def corpus_diff_indexed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus diff against a PERSISTED (id, fp) fingerprint
    index — the managed-pipeline shape where the previous snapshot
    exists only as its index (built once, APPEND-maintained; here built
    in two halves to exercise the append path) and the old corpus text
    is never rescanned.  Old snapshot simulated as doc_id % 9 != 0 with
    a mutated text for doc_id % 6 == 0; new crawl is doc_id % 10 != 0
    (operators/curation.py corpus_diff_indexed /
    fingerprint_index_write)."""
    import tempfile

    from rheoceros_spark.operators.curation import (
        corpus_diff_indexed,
        fingerprint_index_write,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = _FP_INDEX_CACHE.get(sf_dir)
    if path is None:
        old = docs.where(F.col("doc_id") % 9 != 0).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 6 == 0,
                F.concat(F.col("text"), F.lit(" archival rev")),
            ).otherwise(F.col("text")),
        )
        path = tempfile.mkdtemp(prefix="rheoceros_fp_idx_")
        fingerprint_index_write(old.where(F.col("doc_id") % 2 == 0), path)
        fingerprint_index_write(old.where(F.col("doc_id") % 2 == 1), path, mode="append")
        _FP_INDEX_CACHE[sf_dir] = path
    index = spark.read.parquet(path)
    return corpus_diff_indexed(docs.where(F.col("doc_id") % 10 != 0), index)


# Registered r7 (was deferred in r6 by window arithmetic; the slot was
# freed by retiring the dedup_embedding_pairs quadratic twin).
@q(
    "curation_ngram_novelty",
    oracle=f"""
    WITH corp AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0
    ), ref AS (
      SELECT text FROM documents WHERE doc_id % 7 <> 0
    ), cg AS (
      SELECT doc_id, {_H64.format(s="g")} AS gh FROM (
        SELECT doc_id, unnest(list_distinct({_ngrams_sql(_TOK, 8)})) AS g
        FROM corp WHERE doc_id IS NOT NULL AND text IS NOT NULL
      )
    ), rg AS (
      SELECT DISTINCT {_H64.format(s="g")} AS gh FROM (
        SELECT unnest(list_distinct({_ngrams_sql(_TOK, 8)})) AS g
        FROM ref WHERE text IS NOT NULL
      )
    ), per AS (
      SELECT cg.doc_id,
             CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(CASE WHEN rg.gh IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
      FROM cg LEFT JOIN rg ON cg.gh = rg.gh
      GROUP BY cg.doc_id
    )
    SELECT c.doc_id,
           coalesce(p.n_grams, 0) AS n_grams,
           coalesce(p.n_novel, 0) AS n_novel,
           round(CAST(p.n_novel AS DOUBLE) / CAST(p.n_grams AS DOUBLE), 6) AS novelty_ratio
    FROM corp c LEFT JOIN per p USING (doc_id)
    """,
)


def curation_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty of the doc_id % 7 == 0 slice against the rest of the
    corpus as the existing-training-data reference: fraction of each
    document's distinct 8-grams seen nowhere in the reference —
    membership via a gram-hash equi-join, never a broadcast (the
    reference side is corpus-sized; operators/curation.py
    ngram_novelty)."""
    from rheoceros_spark.operators.curation import ngram_novelty

    docs = load_table(spark, sf_dir, "documents")
    return ngram_novelty(
        docs.where(F.col("doc_id") % 7 == 0),
        docs.where(F.col("doc_id") % 7 != 0),
        n=8,
    )


# ===========================================================================
# Round-8 window executed as staged in r7: dedup_ngram_jaccard_pairs and
# ann_cosine_topk retired (verification twins — scalable siblings hold
# official rows), dedup_semantic_pairs + text_quality_classifier
# registered at the window head, followed by the 48 r06-certified
# rotations.  r07 ∪ r08 = 100/100 registered queries.
#
# The staging area below is the standing mechanism for future rounds:
# new operators whose registration must wait for a slot-freeing
# retirement ship here fully implemented, with stashed oracles and
# pytest parity gates (tests/test_staged.py).
#
# ---- Round-9 window: EXECUTED as staged in r8 -----------------------------
# r9 registered pipeline_pretrain_corpus, retrieval_hybrid_rrf,
# ann_int8_topk, dedup_paragraph_spans, text_bigram_nll at the window
# head and retired the five named r7-certified weakest-marginal rows
# (agg_rollup — rollup ⊂ agg_cube's grouping lattice; set_intersect —
# set-op family held by set_except; window_running_total —
# running/sliding frames held by events_sliding_2day +
# metric_period_stats_hourly, rank windows by window_topn_per_group;
# q6_revenue_forecast — single-table filter-agg ⊂ q1/q14/q19 shapes;
# events_funnel_3step — sequential-condition agg ⊂
# events_cohort_retention).  r9 window = 5 new + 45 r7-certified
# rotations = EXACTLY 50; r8 ∪ r9 = 100/100 registered queries.
#
# ---- Round-10 window: EXECUTED as staged in r8/r9 -------------------------
# r10 registered: text_bpe_train, retrieval_mmr_rerank,
#   text_quality_pr_curve, curation_cluster_profile,
#   text_gopher_rules, curation_ppl_buckets, curation_c4_lines,
#   curation_source_overlap.
# r10 retired (from the r8-certified pool — the r10 window is 8 new +
# 42 r8-certified rotations, so exactly these 8 left the registry;
# each is the weakest marginal row of a multiply-certified family):
#   dedup_minhash_lsh_pairs  (pair-emission twin; the MinHash family is
#                             held by dedup_clusters + dedup_keep_list +
#                             dedup_incremental_index, all r8-certified),
#   dedup_simhash_pairs      (Hamming-pair twin; banded/blocked siblings
#                             dedup_embedding_blocked + semantic_pairs hold rows),
#   pivot_returnflag_status  (pivot is grouping-set sugar held by
#                             grouping_sets_revenue),
#   q11_important_parts      (group-HAVING ⊂ q21 + topk_orders shapes),
#   q18_large_volume_orders  (semi-join-on-agg ⊂ q21 + topk_orders),
#   events_tumbling_daily    (tumbling ⊂ the sliding window held by
#                             events_sliding_2day),
#   metric_threshold_alarm   (single-threshold ⊂ the windowed m-of-n
#                             family held by alarm_m_of_n_state +
#                             composite_alarm_rule),
#   curation_corpus_diff     (snapshot twin; the scalable indexed form
#                             corpus_diff_indexed is r9-window-certified).
#
# ---- Round-11 window: EXECUTED as staged in r9/r10 ------------------------
# r11 registers: text_hash_embed_topk, retrieval_quality_metrics,
#   text_bpe_fertility, curation_decon_spans, text_lang_segments,
#   curation_source_overlap_minhash, dedup_exact_best_docs
#   (+ text_lang_classifier and pipeline_ccnet_corpus, staged in r9,
#   slot into r12 with the same weakest-marginal retirement test
#   unless r11 slots free).
# r11 retires (from the r9-certified pool, same weakest-marginal test):
#   json_extract_events      (JSON scalar extraction ⊂ scalar_functions),
#   text_unigram_nll         (unigram LM ⊂ text_bigram_nll, r9-certified),
#   curation_dsir_weights    (⊂ curation_dsir_resample, which composes
#                             the weights with hash-resampling),
#   q4_order_priority        (EXISTS-semi ⊂ q20 + q21 semi/anti shapes),
#   q12_priority_by_linestatus (conditional case-sum ⊂ q8 + q14),
#   q17_small_quantity_revenue (correlated per-group avg ⊂ q2 + q15),
#   q10_returned_revenue     (join+group+sum ⊂ q3 + q5 identical shape).
# Queries staged during round 9 itself (e.g. the trained language
# classifier) join the r11/r12 batches under the same cadence; every
# staged query is already fully oracle-gated in pytest either way, so
# registration remains pure bookkeeping.
#
# ---- Round-12 window: EXECUTED as staged in r9/r11 ------------------------
# r12 registers: text_lang_classifier, pipeline_ccnet_corpus (staged
#   r9), curation_url_canonical, dedup_exact_url, dedup_snapshot_scoped,
#   text_bpe_persisted (staged r11) — six registrations, each paired
#   with a named weakest-marginal retirement from the r10-certified
#   pool (sibling holding an official row in parentheses) so r11 ∪ r12
#   stays 100/100 disjoint:
#   text_token_count        (token counting ⊂ text_quality r10 +
#                            text_bpe_fertility r11 real-token counts),
#   text_fingerprint        (rolling-hash fp; the fingerprint family is
#                            held by dedup_exact_docs r10 +
#                            corpus_diff_indexed r9 +
#                            dedup_substring_spans r9),
#   dedup_embedding_blocked (hyperplane-blocked pair twin; embedding
#                            near-dup held by dedup_semantic_pairs r10),
#   curation_contamination  (n-gram containment ⊂ curation_decon_spans
#                            r11 span-level + curation_semantic_decon),
#   topk_orders             (global top-k ⊂ window_topn_per_group r9;
#                            TakeOrdered shape re-certified by
#                            scale_skew_report in r13),
#   multimodal_frame_sample (same Arrow mapInPandas batch shape as
#                            multimodal_features r10 + audio/video r9).
#
# ---- Round-13 window: EXECUTED as staged in r11 ----------------------------
# r13 registers the corpus-QA + diagnostics family staged in round 11:
#   curation_corpus_datasheet, curation_snapshot_drift,
#   dedup_semantic_keep, scale_skew_report — four registrations, each
#   paired with a named weakest-marginal retirement from the
#   r11-certified pool (sibling holding an official row in
#   parentheses) so r12 ∪ r13 stays 100/100 disjoint:
#   text_bpe_tokens          (encode path ⊂ text_bpe_persisted r12,
#                             the SAME tokenizer applied from the
#                             persisted artifact; merges held by
#                             text_bpe_train r12; real-token counts by
#                             text_bpe_fertility, re-certified r13),
#   text_bigram_nll          (bigram LM NLL is composed VERBATIM as the
#                             LM score inside curation_ppl_buckets r12;
#                             trained-model scoring shape also held by
#                             text_lang_classifier r12),
#   curation_source_overlap_minhash (MinHash-estimate twin of the exact
#                             curation_source_overlap r12 matrix;
#                             MinHash signature machinery held by
#                             dedup_clusters r12 + dedup_semantic_pairs
#                             r12),
#   dedup_paragraph_spans    (span purge + reassembly ⊂
#                             dedup_substring_spans (span-hash counts,
#                             re-certified r13) + curation_decon_spans
#                             (span purge/reassembly, re-certified r13);
#                             within-doc granularity lands with
#                             dedup_intradoc_lines in r16).
#
# ---- Round-14 window: EXECUTED as staged in r11 session 3 -----------------
# r14 registers the mixture/audit family staged in round 11 session 3:
#   curation_temperature_mix, text_sif_embed_topk,
#   dedup_ngram_hotspots, text_char_entropy — four registrations, each
#   paired with a named weakest-marginal retirement from the
#   r12-certified pool (sibling holding an official row in
#   parentheses) so r13 ∪ r14 stays 100/100 disjoint:
#   text_lang_id             (heuristic n-gram lang-id ⊂
#                             text_lang_classifier r12/r14 — the
#                             TRAINED scorer over the same char-gram
#                             machinery — + text_lang_segments r13,
#                             which applies the identical scoring
#                             expression per token window),
#   text_tfidf_terms         (quantized-IDF term ranking ⊂
#                             text_bm25_topk r13 — BM25 composes the
#                             same tf/df statistics with the saturating
#                             generalization — + text_source_kl r12/r14
#                             term-distribution stats; the
#                             WindowGroupLimit top-k-per-group shape is
#                             held by window_topn_per_group r13),
#   curation_stratified_sample (per-group hash-gate sampling ⊂
#                             curation_dsir_resample r13, which draws
#                             through the SAME deterministic bucket
#                             gate with importance weights, +
#                             curation_group_split r12/r14 +
#                             curation_temperature_mix r14 — the new
#                             registration composes plan-driven
#                             per-group rates over that gate),
#   ann_kmeans_refine        (Lloyd codebook training ⊂ ann_ivf_topk
#                             r12/r14 + ann_ivf_persisted r12/r14 +
#                             ann_ivfpq_topk r13, which TRAIN the same
#                             kmeans_centroids to build their indexes;
#                             cell-profile diagnostics held by
#                             curation_cluster_profile r12/r14 and
#                             dedup_semantic_keep r13).
#
# ---- Round-15 certification batch (staged) --------------------------------
# r15 registers the winnowing + composition + planning batch staged in
#   round 11 session 3: dedup_winnow_pairs, dedup_winnow_spans,
#   pipeline_refinedweb_corpus, curation_epoch_plan — each paired with
#   a weakest-marginal retirement from the r13-certified pool so
#   r14 ∪ r15 stays 100/100 disjoint.
#
# ---- Round-16 certification batch (staged) --------------------------------
# r16 registers the crawl stage-0 family built in round 12:
#   text_html_extract, dedup_intradoc_lines, pipeline_refinedweb_html —
#   each paired with a weakest-marginal retirement from the
#   r14-certified pool (provisional candidates, sibling holding an
#   official row in parentheses):
#   curation_ngram_novelty  (novelty ⊂ dedup_ngram_hotspots r14 +
#                            curation_decon_spans r11 gram machinery),
#   text_hash_embed_topk    (unweighted twin of text_sif_embed_topk
#                            r14, which composes the same folds),
#   ann_lsh_topk            (ANN family holds ann_ivf/ivfpq/int8/pq
#                            official rows; LSH buckets re-certified
#                            by the dedup LSH family),
#   so r15 ∪ r16 stays 100/100 disjoint.
#
# ---- Round-17 certification batch (staged) --------------------------------
# r17 registers dedup_bloom_novel (the Dolma-style memory-bounded
#   Bloom dedup gate, built in round 12) — paired with a
#   weakest-marginal retirement from the r15-certified pool
#   (provisional candidate: dedup_exact_docs — exact dedup stays
#   multiply certified via dedup_exact_best_docs r11 +
#   dedup_snapshot_scoped r12 + the bloom gate's exact-verify tier).
#
# ---- Round-18 certification batch (staged) --------------------------------
# r18 registers the round-13 batch: scan_warc_demux (crawl stage-0
#   certified from raw archive bytes — byte offsets recomputed
#   arithmetically by the oracle), curation_icp_order (in-context
#   pretraining ordering, Shi et al. 2024 — integer-edge greedy walk
#   per trained cell), dedup_url_mirrors (Bharat & Broder 1999 fuzzy
#   host mirror detection — per-domain path-set MinHash + exact
#   Jaccard verify).  Each pairs with a weakest-marginal retirement
#   from the r16-certified pool (provisional candidates, sibling
#   holding an official row in parentheses):
#   nearest_partition_asof  (as-of scan ⊂ ts_asof_join r12 — the same
#                            max-≤-key semantics over real timestamps),
#   curation_shuffle_shards (hash-shard assignment ⊂
#                            curation_group_split r12 +
#                            curation_pack_sequences, which consume the
#                            same deterministic bucket gate),
#   retrieval_hybrid_rrf    (rank-fusion arithmetic ⊂
#                            retrieval_mmr_rerank r12 +
#                            retrieval_quality_metrics, which hold the
#                            rank/score join shapes).
# r18 also registers multimodal_image_dedup (perceptual dHash near-dup
#   pairs through the REAL P6 decode — built in round 13), paired with
#   a fourth retirement (provisional candidate:
#   multimodal_video_frames — the multimodal family keeps
#   multimodal_features r12 + multimodal_audio_stats r13 + the image
#   dedup's decode path; video frame sampling stays pytest- and
#   retired-gate-covered like multimodal_frame_sample r12).
#
# ---- Round-19 certification batch (staged) --------------------------------
# r19 registers the round-14 batch — the perceptual-dedup family
#   completed across modalities plus the crawl-consent gate:
#   multimodal_audio_dedup (segmented RMS-band fingerprint through the
#   REAL stdlib-wave decode, Haitsma & Kalker 2002's energy-envelope
#   tier; the banded pair machinery shared with dhash via
#   _rep_banded_pairs, verified by differing-SEGMENT count),
#   multimodal_video_dedup (per-frame dHash sets demuxed+hashed in one
#   Arrow task, Wu et al. 2007 — exact-dup grouping on the sorted
#   frame-hash set key, representative-only Jaccard verify),
#   curation_robots_gate (RFC 9309 longest-match/allow-wins-tie
#   consent verdicts as broadcast array-HOF algebra — zero corpus
#   shuffle).  Each pairs with a weakest-marginal retirement from the
#   r17-certified pool (provisional candidates, sibling holding an
#   official row in parentheses):
#   multimodal_audio_stats  (WAV decode + stats ⊂ the SAME stdlib-wave
#                            decode path multimodal_audio_dedup r19
#                            certifies per-segment — a strictly finer
#                            check of the identical decode),
#   ts_range_join_counts    (range-join counting ⊂ ts_asof_join r12 +
#                            events_sliding_2day r12 window family),
#   curation_pii_redact     (regex column algebra ⊂ curation_c4_lines
#                            r12 + text_lang_segments r13, which hold
#                            the per-row regex extraction shapes).
# ===========================================================================

_STAGED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_STAGED_ORACLES: dict[str, str] = {}


def q_staged(name: str, oracle: str):
    def deco(fn):
        _STAGED_QUERIES[name] = fn
        _STAGED_ORACLES[name] = oracle
        return fn

    return deco


def _semantic_pairs_oracle(k: int = 8, iters: int = 2, threshold: float = 0.4) -> str:
    ctes, cfinal = _lloyd_ctes(k, iters)
    ctes.append(f"""assigned AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_cos_sql('e.embedding', 'c.cv')} DESC, c.cid) AS rn
        FROM emb e, {cfinal} c
      ) WHERE rn = 1
    )""")
    return f"""
    WITH {', '.join(ctes)}
    SELECT a, b, cell, round(cos, 6) AS cos_r FROM (
      SELECT x.vec_id AS a, y.vec_id AS b, x.cell,
             {_cos_sql('x.embedding', 'y.embedding')} AS cos
      FROM assigned x JOIN assigned y ON x.cell = y.cell AND x.vec_id < y.vec_id
    ) WHERE cos >= {threshold}
    """


def _quality_classifier_oracle(
    n_buckets: int = 64, iters: int = 2, lr: float = 0.5
) -> str:
    """The full distributed-LR training loop + linear scorer in SQL:
    hashed-bucket integer features, broadcast-LUT sigmoid (no exp() in
    either engine), exact BIGINT logit/gradient sums, floor-requantized
    updates — reproduces operators/text_analysis.py logreg_train +
    quality_classifier_score bit-for-bit."""
    from rheoceros_spark.functions.portable import h64_sql
    from rheoceros_spark.operators.text_analysis import SIGMOID_CLAMP_Q, sigmoid_lut_q

    lut = "[" + ", ".join(str(v) for v in sigmoid_lut_q()) + "]"
    off = SIGMOID_CLAMP_Q + 1
    hk = h64_sql("t", seed="'0'")
    ctes = [
        """docs0 AS (
      SELECT doc_id, text, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents WHERE doc_id IS NOT NULL
    )""",
        f"""feats AS (
      SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt FROM (
        SELECT doc_id, CAST({hk} % {n_buckets} AS INT) AS bucket FROM (
          SELECT doc_id, unnest({_TOK}) AS t FROM docs0 WHERE text IS NOT NULL
        ) WHERE t <> ''
      ) GROUP BY doc_id, bucket
      UNION ALL
      SELECT doc_id, CAST(-1 AS INT) AS bucket, CAST(1 AS BIGINT) AS cnt FROM docs0
    )""",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM docs0)",
        f"""w0 AS (
      SELECT CAST(unnest(range(-1, {n_buckets})) AS INT) AS bucket,
             CAST(0 AS BIGINT) AS wq
    )""",
    ]
    prev = "w0"
    for i in range(1, iters + 1):
        sig = (
            f"({lut})[CAST(greatest(-{SIGMOID_CLAMP_Q}, least({SIGMOID_CLAMP_Q}, "
            f"CAST(floor((CAST(lq AS DOUBLE) / 1e7) * 100.0) AS BIGINT))) + {off} AS INT)]"
        )
        ctes.append(f"""l{i} AS (
      SELECT f.doc_id, CAST(sum(w.wq * f.cnt) AS BIGINT) AS lq
      FROM feats f JOIN {prev} w USING (bucket) GROUP BY f.doc_id
    )""")
        ctes.append(f"""r{i} AS (
      SELECT l.doc_id, CAST({sig} - d.y * 10000000 AS BIGINT) AS rq
      FROM l{i} l JOIN docs0 d USING (doc_id)
    )""")
        ctes.append(f"""g{i} AS (
      SELECT f.bucket, CAST(sum(r.rq * f.cnt) AS BIGINT) AS gq
      FROM r{i} r JOIN feats f USING (doc_id) GROUP BY f.bucket
    )""")
        ctes.append(f"""w{i} AS (
      SELECT w.bucket,
             CAST(w.wq - CAST(floor((CAST(coalesce(g.gq, 0) AS DOUBLE) * {lr!r}) / nn.n)
                         AS BIGINT) AS BIGINT) AS wq
      FROM {prev} w LEFT JOIN g{i} g USING (bucket) CROSS JOIN nn
    )""")
        prev = f"w{i}"
    return f"""
    WITH {', '.join(ctes)}, lf AS (
      SELECT f.doc_id, CAST(sum(w.wq * f.cnt) AS BIGINT) AS lq
      FROM feats f JOIN {prev} w USING (bucket) GROUP BY f.doc_id
    )
    SELECT doc_id, CAST(lq AS DOUBLE) / 1e7 AS logit,
           CASE WHEN CAST(lq AS DOUBLE) / 1e7 >= 0.0 THEN 1 ELSE 0 END AS keep
    FROM lf
    """


@q("text_quality_classifier", oracle=_quality_classifier_oracle())
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3/CCNet-style learned quality filter: distributed full-batch
    logistic regression over hashed token features (lang='en' as the
    curated-target label at demo scale), then linear scoring with a
    logit-space threshold.  Iterative float training made bit-exact
    across engines: 1e-7-grid weights, exact integer logit/gradient
    sums, broadcast sigmoid LUT instead of libm exp, floor
    re-quantization (operators/text_analysis.py logreg_train /
    quality_classifier_score)."""
    from rheoceros_spark.operators.text_analysis import (
        logreg_train,
        quality_classifier_score,
    )

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    labeled = docs.withColumn(
        "__label", F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0))
    )
    w = logreg_train(labeled, "__label", n_buckets=64, iters=2, lr=0.5)
    return quality_classifier_score(docs, w, n_buckets=64).select(
        "doc_id", "logit", "keep"
    )


@q("dedup_semantic_pairs", oracle=_semantic_pairs_oracle())
def dedup_semantic_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style near-dup pairs: trained Lloyd k-means cells bound
    the candidate set (a pair must share a coarse cluster), exact
    cosine rerank inside — the learned-cluster complement of the
    LSH-blocked path (operators/dedup.py semantic_dup_pairs; Abbas et
    al. 2023)."""
    from rheoceros_spark.operators.dedup import semantic_dup_pairs

    return semantic_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.4, k=8, iters=2
    )


def _paragraph_spans_oracle(span_tokens: int = 4, min_docs: int = 2) -> str:
    S = int(span_tokens)
    return f"""
    WITH docs AS (
      SELECT doc_id, {_TOK} AS t FROM documents
      WHERE doc_id IS NOT NULL AND text IS NOT NULL
        AND len(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) > 0
    ),
    segs AS (
      SELECT doc_id, CAST((s - 1) / {S} AS INT) AS span_id,
             array_to_string(
               t[CAST(s AS INT):CAST(least(s + {S} - 1, len(t)) AS INT)], ' '
             ) AS span_text
      FROM (SELECT doc_id, t, unnest(range(1, len(t)+1, {S})) AS s FROM docs)
    ),
    segs2 AS (SELECT doc_id, span_id, span_text, md5(span_text) AS fp FROM segs),
    dupfp AS (
      SELECT fp FROM segs2 GROUP BY fp HAVING count(DISTINCT doc_id) >= {min_docs}
    ),
    ranked AS (
      SELECT s.doc_id, s.span_id, s.span_text,
             row_number() OVER (PARTITION BY s.fp ORDER BY s.doc_id, s.span_id) AS rn,
             d.fp IS NOT NULL AS is_dup
      FROM segs2 s LEFT JOIN dupfp d USING (fp)
    ),
    marked AS (
      SELECT doc_id, span_id, span_text, (is_dup AND rn > 1) AS purge FROM ranked
    ),
    reb AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(CASE WHEN purge THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
             array_to_string(
               list(span_text ORDER BY span_id) FILTER (WHERE NOT purge), ' '
             ) AS clean_text,
             array_to_string(
               list(CAST(span_id AS VARCHAR) ORDER BY span_id) FILTER (WHERE purge), ','
             ) AS purged_span_ids
      FROM marked GROUP BY doc_id
    )
    SELECT d.doc_id,
           CASE WHEN r.doc_id IS NULL THEN NULL
                ELSE coalesce(r.clean_text, '') END AS clean_text,
           coalesce(r.n_spans, 0) AS n_spans,
           coalesce(r.n_purged, 0) AS n_purged,
           coalesce(r.purged_span_ids, '') AS purged_span_ids
    FROM (SELECT doc_id FROM documents WHERE doc_id IS NOT NULL) d
    LEFT JOIN reb r USING (doc_id)
    """


@q_retired("dedup_paragraph_spans", oracle=_paragraph_spans_oracle())
def dedup_paragraph_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-granular dedup (C4 line dedup / RefinedWeb repeated-span
    removal): purge spans repeated across >= min_docs DISTINCT
    documents while KEEPING the documents, reassembling each text
    minus its purged spans — what document-level dedup cannot express
    (licence blocks, navigation chrome).  Token-window segmentation
    (the synthetic corpus has no paragraph delimiters; real corpora
    pass delim="\\n\\n").  One fp hash-shuffle + one per-doc rollup,
    nothing quadratic (operators/dedup.py paragraph_dedup; Raffel et
    al. 2020 §2.2, Penedo et al. 2023 §3.4; reference slot surface
    api_ext.py:107-190)."""
    from rheoceros_spark.operators.dedup import paragraph_dedup

    return paragraph_dedup(
        load_table(spark, sf_dir, "documents"), span_tokens=4, min_docs=2
    )


def _bigram_nll_sql() -> str:
    """The full self-trained add-k bigram NLL in DuckDB (shared by the
    text_bigram_nll oracle and the ppl-bucket oracle that scores with
    it)."""
    return f"""
    WITH docs AS (
      SELECT doc_id, {_TOK} AS t FROM documents WHERE doc_id IS NOT NULL
    ), pairs AS (
      SELECT doc_id, t[CAST(p AS INT)] AS v, t[CAST(p + 1 AS INT)] AS w
      FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS p
            FROM docs WHERE len(t) >= 2)
      WHERE t[CAST(p AS INT)] <> '' AND t[CAST(p + 1 AS INT)] <> ''
    ), per_doc AS (
      SELECT doc_id, v, w, count(*) AS n FROM pairs GROUP BY doc_id, v, w
    ), model AS (
      SELECT v, w, CAST(sum(n) AS BIGINT) AS cnt FROM per_doc GROUP BY v, w
    ), prefix AS (
      SELECT v, CAST(sum(cnt) AS BIGINT) AS c_v FROM model GROUP BY v
    ), vocab AS (
      SELECT CAST(count(DISTINCT token) AS DOUBLE) AS V
      FROM (SELECT unnest(t) AS token FROM docs) WHERE token <> ''
    ), scored AS (
      SELECT d.doc_id, d.n,
             CAST(round(-ln((CAST(m.cnt AS DOUBLE) + 0.1)
                            / (CAST(p.c_v AS DOUBLE) + 0.1 * vb.V)) * 1e7)
                  AS BIGINT) AS lpq
      FROM per_doc d JOIN model m USING (v, w) JOIN prefix p USING (v), vocab vb
    ), agg AS (
      SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_scored,
             round(CAST(sum(n * lpq) AS DOUBLE)
                   / (1e7 * CAST(sum(n) AS DOUBLE)), 6) AS nll
      FROM scored GROUP BY doc_id
    )
    SELECT documents.doc_id, coalesce(a.n_scored, 0) AS n_scored, a.nll
    FROM documents LEFT JOIN agg a ON documents.doc_id = a.doc_id
    """


@q_retired("text_bigram_nll", oracle=_bigram_nll_sql())
def text_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained add-k bigram LM fluency per document — the CCNet
    KenLM-perplexity fidelity step past unigram_nll: conditioning on
    the previous token separates fluent text from shuffled-word soup.
    Integer-quantized log terms keep the iterative-free float math
    bit-exact across engines (operators/text_analysis.py bigram_nll;
    Wenzek et al. 2020)."""
    from rheoceros_spark.operators.text_analysis import bigram_nll

    return bigram_nll(load_table(spark, sf_dir, "documents"), k=0.1)


def _hybrid_rrf_oracle(k: int = 10, k_rrf: int = 60) -> str:
    """Sparse BM25 (text_bm25_topk's certified chain at k=10) + dense
    brute cosine, fused by reciprocal rank: contribution
    floor(1e7/(k_rrf+rank)) per list — IEEE-exact division + floor, no
    half-way rounding at any k_rrf — integer-summed, ranked
    (sum DESC, doc ASC)."""
    return f"""
    WITH corp AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 101 <> 0
    ), qry AS (
      SELECT doc_id AS query_id, text FROM documents WHERE doc_id % 101 = 0
    ), postings AS (
      SELECT doc_id, token, count(*) AS tf
      FROM (SELECT doc_id, unnest({_TOK}) AS token FROM corp)
      WHERE token <> '' GROUP BY doc_id, token
    ), dls AS (
      SELECT doc_id,
             CASE WHEN length({_NORM}) = 0 THEN 0 ELSE len({_TOK}) END AS dl
      FROM corp
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dls
    ), qt AS (
      SELECT DISTINCT query_id, token
      FROM (SELECT query_id, unnest({_TOK}) AS token FROM qry)
      WHERE token <> ''
    ), m AS (
      SELECT p.doc_id, p.token, p.tf FROM postings p
      JOIN (SELECT DISTINCT token FROM qt) USING (token)
    ), dfreq AS (
      SELECT token, CAST(count(*) AS DOUBLE) AS df FROM m GROUP BY token
    ), bco AS (
      SELECT q.query_id, m.doc_id,
             CAST(round(
               ln(1.0 + (s.n - f.df + 0.5) / (f.df + 0.5))
               * (CAST(m.tf AS DOUBLE) * ({_BM25_K1} + 1.0))
               / (CAST(m.tf AS DOUBLE)
                  + {_BM25_K1} * (1.0 - {_BM25_B}
                                  + {_BM25_B} * CAST(d.dl AS DOUBLE) / s.avgdl))
               * 1e7) AS BIGINT) AS c
      FROM m JOIN qt q USING (token) JOIN dfreq f USING (token)
             JOIN dls d ON m.doc_id = d.doc_id, stats s
    ), bscored AS (
      SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_q
      FROM bco GROUP BY query_id, doc_id
    ), sparse AS (
      SELECT query_id, doc_id, rank FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score_q DESC, doc_id ASC) AS rank
        FROM bscored
      ) WHERE rank <= {k}
    ), emb_c AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id IS NOT NULL AND vec_id % 101 <> 0
    ), emb_q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id IS NOT NULL AND vec_id % 101 = 0
    ), dense AS (
      SELECT query_id, doc_id, rank FROM (
        SELECT q.query_id, c.vec_id AS doc_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY {_cos_sql('c.embedding', 'q.qv')} DESC, c.vec_id ASC) AS rank
        FROM emb_c c CROSS JOIN emb_q q WHERE c.vec_id <> q.query_id
      ) WHERE rank <= {k}
    ), contrib AS (
      SELECT query_id, doc_id,
             CAST(floor(1e7 / ({float(k_rrf)!r} + CAST(rank AS DOUBLE))) AS BIGINT) AS c
      FROM sparse
      UNION ALL
      SELECT query_id, doc_id,
             CAST(floor(1e7 / ({float(k_rrf)!r} + CAST(rank AS DOUBLE))) AS BIGINT) AS c
      FROM dense
    ), fused AS (
      SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_q,
             CAST(count(*) AS BIGINT) AS n_lists
      FROM contrib GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, CAST(rrf_q AS DOUBLE) / 1e7 AS rrf_score,
           n_lists, rank
    FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                        ORDER BY rrf_q DESC, doc_id ASC) AS INT) AS rank
      FROM fused
    ) WHERE rank <= {k}
    """


@q("retrieval_hybrid_rrf", oracle=_hybrid_rrf_oracle())
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — the fusion step every production RAG stack
    runs: BM25 sparse top-10 and exact dense cosine top-10 per query
    (every 101st doc plays the query, the text_bm25_topk convention;
    the embeddings table is doc-aligned), merged by reciprocal-rank
    fusion (Cormack et al. 2009).  Rank-based fusion needs no score
    calibration across the incomparable BM25/cosine scales; the
    quantized contribution discipline keeps the fused ranking
    bit-identical across engines (operators/similarity.py rrf_fuse,
    cosine_topk_multi; text_analysis.py bm25_topk)."""
    from rheoceros_spark.operators.similarity import cosine_topk_multi, rrf_fuse
    from rheoceros_spark.operators.text_analysis import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 101 != 0)
    queries_df = docs.where(F.col("doc_id") % 101 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    sparse = bm25_topk(
        corpus, queries_df, k1=_BM25_K1, b=_BM25_B, k=10,
        materialize_matched="cache",
    )

    emb = load_table(spark, sf_dir, "embeddings")
    dense = cosine_topk_multi(
        emb.where(F.col("vec_id") % 101 != 0),
        emb.where(F.col("vec_id") % 101 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        k=10,
    ).select("query_id", F.col("vec_id").alias("doc_id"), "rank")

    return rrf_fuse(
        [sparse.select("query_id", "doc_id", "rank"), dense], k=10, k_rrf=60
    )


def _hash_embed_topk_oracle(
    dim: int = 32, query_id: int = 0, k: int = 10
) -> str:
    """operators/text_analysis.py hash_embed (normalize=False) + brute
    cosine_topk reproduced: per-token portable h64, per-dim sign-bit
    folds as exact BIGINTs, then the standard ordered-fold cosine
    rank."""
    th = _H64.format(s="'0:' || t")
    hemb = f"""
      SELECT doc_id AS vec_id,
             list_transform(range(0, {dim}), d -> CAST(
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(list_filter({_TOK}, t -> t <> ''),
                   t -> 2 * (({th} >> d) & 1) - 1)),
                 (acc, x) -> acc + x) AS DOUBLE)) AS embedding
      FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
    """
    return f"""
    WITH hemb AS ({hemb}), qv AS (
      SELECT embedding AS qv FROM hemb WHERE vec_id = {query_id}
    )
    SELECT vec_id, CAST(rank AS BIGINT) AS rank, round(cos, 6) AS cos_r
    FROM (
      SELECT h.vec_id, {_cos_sql('h.embedding', 'q.qv')} AS cos,
             row_number() OVER (ORDER BY {_cos_sql('h.embedding', 'q.qv')} DESC,
                                h.vec_id ASC) AS rank
      FROM hemb h, qv q WHERE h.vec_id <> {query_id}
    ) WHERE rank <= {k}
    """


@q("text_hash_embed_topk", oracle=_hash_embed_topk_oracle())
def text_hash_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free dense retrieval: feature-hashing embeddings derived
    from the text itself (operators/text_analysis.py hash_embed — one
    md5 per token, per-dim sign-bit folds, exact integer components),
    fed straight into the ANN family's brute cosine top-k.  Makes the
    text→ANN pipeline self-contained for corpora without an embedding
    column; every similarity operator (IVF/PQ/int8/MMR) composes with
    the derived vectors unchanged."""
    from rheoceros_spark.operators.similarity import cosine_topk
    from rheoceros_spark.operators.text_analysis import hash_embed

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    emb = hash_embed(docs, dim=32, normalize=False)
    return cosine_topk(emb, query_id=0, k=10, id_col="doc_id").select(
        F.col("doc_id").alias("vec_id"),
        F.col("rank").cast("bigint").alias("rank"),
        "cos_r",
    )


def _cluster_profile_oracle(k: int = 8, iters: int = 2) -> str:
    """operators/curation.py cluster_profile: Lloyd cells + assignment
    (the shared _lloyd_ctes), the text_quality oracle's quality
    expression quantized half-up, exact BIGINT cell aggregates,
    dominant source by (count desc, source asc)."""
    ctes, cfinal = _lloyd_ctes(k, iters)
    ctes.append(f"""assigned AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_cos_sql('e.embedding', 'c.cv')} DESC, c.cid) AS rn
        FROM emb e, {cfinal} c
      ) WHERE rn = 1
    )""")
    ctes.append(f"""dq AS (
      SELECT doc_id, source,
             coalesce(CAST(floor(
               round(0.3 * least(CAST(len({_TOK}) AS DOUBLE) / 100.0, 1.0)
                     + 0.3 * (1.0 - CASE WHEN length({_NORM}) > 0
                         THEN CAST(len(regexp_extract_all({_NORM}, '[^A-Za-z0-9 ]')) AS DOUBLE)
                              / CAST(length({_NORM}) AS DOUBLE) ELSE 0.0 END)
                     + 0.4 * least(5.0 * CASE WHEN len({_TOK}) > 0
                         THEN CAST(len(list_filter({_TOK},
                              t -> list_contains({_LANG_SETS['en']}, t))) AS DOUBLE)
                              / CAST(len({_TOK}) AS DOUBLE) ELSE 0.0 END, 1.0), 6)
               * 1e6 + 0.5) AS BIGINT), 0) AS qq,
             coalesce(CAST(len({_TOK}) AS BIGINT), 0) AS ntok
      FROM documents WHERE doc_id IS NOT NULL
    )""")
    ctes.append("""j AS (
      SELECT a.cell, d.doc_id, d.source, d.qq, d.ntok
      FROM dq d JOIN assigned a ON d.doc_id = a.vec_id
    )""")
    ctes.append("""cells AS (
      SELECT cell, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(ntok) AS BIGINT) AS total_tokens,
             CAST(sum(qq) AS BIGINT) AS sq
      FROM j GROUP BY cell
    )""")
    ctes.append("""top AS (
      SELECT cell, source AS top_source, cnt AS top_source_docs FROM (
        SELECT cell, source, CAST(count(*) AS BIGINT) AS cnt,
               row_number() OVER (PARTITION BY cell
                 ORDER BY count(*) DESC, source ASC) AS rn
        FROM j GROUP BY cell, source
      ) WHERE rn = 1
    )""")
    return f"""
    WITH {', '.join(ctes)}
    SELECT c.cell, c.n_docs, c.total_tokens,
           CAST(c.sq // c.n_docs AS BIGINT) AS mean_quality_q,
           t.top_source, t.top_source_docs
    FROM cells c JOIN top t USING (cell)
    """


@q("curation_cluster_profile", oracle=_cluster_profile_oracle())
def curation_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus cartography: per learned-semantic-cluster document
    counts, token totals, mean quality, and dominant source — the
    reporting layer that tells a 100 TB curation run WHICH regions of
    embedding space to keep, cap, or drop (operators/curation.py
    cluster_profile; the SemDeDup clustered-curation recipe's
    companion view)."""
    from rheoceros_spark.operators.curation import cluster_profile

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    prof = cluster_profile(docs, emb, k=8, iters=2)
    return prof.select(
        F.col("cell").cast("bigint").alias("cell"),
        "n_docs",
        "total_tokens",
        "mean_quality_q",
        "top_source",
        "top_source_docs",
    )


def _pr_curve_oracle(grid: int = 100) -> str:
    """operators/text_analysis.py pr_curve over the trained classifier's
    logits: the full LR-training oracle as a subquery, labels rejoined
    from documents, histogram + cumulative sweep in exact BIGINTs with
    integer division (// here, div in Spark)."""
    cls = _quality_classifier_oracle()
    return f"""
    WITH lab AS (
      SELECT c.logit, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
      FROM ({cls}) c JOIN documents d USING (doc_id)
    ), per AS (
      SELECT CAST(floor(logit * {float(grid)!r}) AS BIGINT) AS bucket,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(count(*) - sum(y) AS BIGINT) AS n_neg
      FROM lab GROUP BY 1
    ), cum AS (
      SELECT bucket,
             CAST(sum(n_pos) OVER (ORDER BY bucket DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
             CAST(sum(n_neg) OVER (ORDER BY bucket DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp,
             CAST(sum(n_pos) OVER () AS BIGINT) AS tot
      FROM per
    ), pr AS (
      SELECT bucket, tp, fp, tot - tp AS fn,
             tp * 1000000 // (tp + fp) AS precision_q,
             CASE WHEN tot > 0 THEN tp * 1000000 // tot END AS recall_q
      FROM cum
    )
    SELECT CAST(bucket AS DOUBLE) / {float(grid)!r} AS thr,
           tp, fp, fn, precision_q,
           CAST(coalesce(recall_q, 0) AS BIGINT) AS recall_q,
           CAST(coalesce(2 * precision_q * recall_q
                         // nullif(precision_q + recall_q, 0), 0) AS BIGINT) AS f1_q
    FROM pr
    """


@q("text_quality_pr_curve", oracle=_pr_curve_oracle())
def text_quality_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold calibration for the learned quality filter: train the
    text_quality_classifier LR (same params), score the corpus, then
    sweep precision/recall/F1 over a 0.01-step logit grid — ONE
    corpus-sized histogram shuffle, all subsequent windows run over
    the grid-sized frame (operators/text_analysis.py pr_curve).  This
    is how the classifier's keep-threshold becomes evidence-based
    instead of a hardcoded 0.0."""
    from rheoceros_spark.operators.text_analysis import (
        logreg_train,
        pr_curve,
        quality_classifier_score,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id").isNotNull()
    )
    labeled = docs.withColumn(
        "__label", F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0))
    )
    w = logreg_train(labeled, "__label", n_buckets=64, iters=2, lr=0.5)
    scored = quality_classifier_score(docs, w, n_buckets=64).join(
        labeled.select("doc_id", F.col("__label").alias("y")), on="doc_id"
    )
    return pr_curve(scored, score_col="logit", label_col="y", grid=100)


def _mmr_oracle(
    n_cand: int = 20, k: int = 5, lam_q: int = 700
) -> str:
    """operators/similarity.py mmr_rerank replayed CTE-by-CTE: dense
    top-``n_cand`` candidates per query, floor(cos·1e7)-quantized
    relevance and pairwise sims, then the k greedy rounds unrolled
    (the Lloyd/LR oracle convention for iterative algorithms)."""
    lam, oml = lam_q, 1000 - lam_q
    ctes = [
        """emb_c AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id IS NOT NULL AND vec_id % 101 <> 0
    )""",
        """emb_q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id IS NOT NULL AND vec_id % 101 = 0
    )""",
        f"""dense AS (
      SELECT query_id, doc_id FROM (
        SELECT q.query_id, c.vec_id AS doc_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY {_cos_sql('c.embedding', 'q.qv')} DESC, c.vec_id ASC) AS rn
        FROM emb_c c CROSS JOIN emb_q q WHERE c.vec_id <> q.query_id
      ) WHERE rn <= {n_cand}
    )""",
        f"""cands AS (
      SELECT d.query_id, d.doc_id,
             CAST(floor({_cos_sql('c.embedding', 'q.qv')} * 1e7) AS BIGINT) AS qrel,
             c.embedding
      FROM dense d JOIN emb_c c ON d.doc_id = c.vec_id
                   JOIN emb_q q USING (query_id)
    )""",
        f"""pair AS (
      SELECT x.query_id, x.doc_id AS a, y.doc_id AS b,
             CAST(floor({_cos_sql('x.embedding', 'y.embedding')} * 1e7) AS BIGINT) AS qsim
      FROM cands x JOIN cands y
        ON x.query_id = y.query_id AND x.doc_id <> y.doc_id
    )""",
        f"""sel1 AS (
      SELECT query_id, doc_id, 1 AS step, score FROM (
        SELECT query_id, doc_id, {lam} * qrel AS score,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY {lam} * qrel DESC, doc_id ASC) AS rn
        FROM cands
      ) WHERE rn = 1
    )""",
    ]
    prev = "sel1"
    for step in range(2, k + 1):
        ctes.append(f"""sel{step} AS (
      SELECT * FROM {prev}
      UNION ALL
      SELECT query_id, doc_id, {step} AS step, score FROM (
        SELECT c.query_id, c.doc_id,
               {lam} * c.qrel - {oml} * m.maxsim AS score,
               row_number() OVER (PARTITION BY c.query_id
                 ORDER BY {lam} * c.qrel - {oml} * m.maxsim DESC,
                          c.doc_id ASC) AS rn
        FROM cands c
        JOIN (SELECT p.query_id, p.a AS doc_id, max(p.qsim) AS maxsim
              FROM pair p JOIN {prev} s
                ON p.query_id = s.query_id AND p.b = s.doc_id
              GROUP BY p.query_id, p.a) m
          ON c.query_id = m.query_id AND c.doc_id = m.doc_id
        WHERE NOT EXISTS (SELECT 1 FROM {prev} s
                          WHERE s.query_id = c.query_id
                            AND s.doc_id = c.doc_id)
      ) WHERE rn = 1
    )""")
        prev = f"sel{step}"
    return f"""
    WITH {', '.join(ctes)}
    SELECT query_id, doc_id, CAST(step AS INT) AS step,
           CAST(score AS DOUBLE) / 1e10 AS mmr_score
    FROM {prev}
    """


@q("retrieval_mmr_rerank", oracle=_mmr_oracle())
def retrieval_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified rerank — the step between retrieval and a RAG
    context window: dense top-20 candidates per query (the hybrid-
    retrieval query convention: every 101st vector plays the query),
    then greedy λ=0.7 maximal-marginal-relevance selection of 5, all
    in exact integer arithmetic (operators/similarity.py mmr_rerank).
    Every frame past retrieval is candidate-bounded: c=20 per query,
    so the pairwise-sim self-join is 400 rows per query, never
    corpus-sized."""
    from rheoceros_spark.operators.similarity import (
        cosine_topk_multi,
        mmr_rerank,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") % 101 != 0)
    qdf = emb.where(F.col("vec_id") % 101 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv")
    )
    from rheoceros_spark.functions.portable import cosine

    cand_ids = cosine_topk_multi(
        corpus,
        qdf.select("query_id", F.col("__qv").alias("embedding")),
        k=20,
    ).select("query_id", F.col("vec_id").alias("doc_id"))
    cands = (
        cand_ids.join(
            corpus.select(F.col("vec_id").alias("doc_id"), "embedding"),
            on="doc_id",
        )
        .join(F.broadcast(qdf), on="query_id")
        .select(
            "query_id",
            "doc_id",
            F.floor(cosine(F.col("embedding"), F.col("__qv")) * F.lit(1e7))
            .cast("bigint")
            .alias("qrel"),
            "embedding",
        )
    )
    return mmr_rerank(cands, k=5, lam_q=700)


def _qdot_sql(a: str, b: str) -> str:
    """Integer dot of two BIGINT code lists — exact in any engine."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i] * {b}[i])), (acc, x) -> acc + x)"
    )


def _qcos_sql(a: str, b: str) -> str:
    return (
        f"(CAST({_qdot_sql(a, b)} AS DOUBLE) / "
        f"nullif(sqrt(CAST({_qdot_sql(a, a)} AS DOUBLE)) "
        f"* sqrt(CAST({_qdot_sql(b, b)} AS DOUBLE)), 0))"
    )


def _int8_topk_oracle(query_id: int = 0, k: int = 10, n_cand: int = 40) -> str:
    """operators/similarity.py quantize_embeddings + ann_int8_topk
    reproduced: half-up floor quantization, integer-dot candidate
    ranking, exact fp32 rerank of the candidate set."""
    return f"""
    WITH base AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) AS maxabs
      FROM embeddings WHERE vec_id IS NOT NULL
    ), qz AS (
      SELECT vec_id,
             CASE WHEN maxabs = 0
                  THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / maxabs + 0.5)
                                 AS BIGINT)) END AS qvec
      FROM base
    ), qq AS (
      SELECT qvec AS qq FROM qz WHERE vec_id = {query_id}
    ), cand AS (
      SELECT vec_id FROM (
        SELECT z.vec_id,
               row_number() OVER (ORDER BY {_qcos_sql('z.qvec', 'q.qq')} DESC,
                                  z.vec_id ASC) AS rn
        FROM qz z, qq q WHERE z.vec_id <> {query_id}
      ) WHERE rn <= {n_cand}
    ), qv AS (
      SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_id}
    )
    SELECT vec_id, CAST(rank AS BIGINT) AS rank, round(cos, 6) AS cos_r
    FROM (
      SELECT e.vec_id, {_cos_sql('e.embedding', 'q.qv')} AS cos,
             row_number() OVER (ORDER BY {_cos_sql('e.embedding', 'q.qv')} DESC,
                                e.vec_id ASC) AS rank
      FROM embeddings e JOIN cand USING (vec_id), qv q
    ) WHERE rank <= {k}
    """


@q("ann_int8_topk", oracle=_int8_topk_oracle())
def ann_int8_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-compressed ANN: the hot pass reads int8 codes (4× fewer
    bytes than the fp32 store — at a 100 TB embedding corpus this is
    the difference between an in-page-cache scan and a disk-bound
    one), deterministic integer-dot candidate selection, exact rerank
    of the 4k-candidate set only (operators/similarity.py
    quantize_embeddings / qcosine / ann_int8_topk)."""
    from rheoceros_spark.operators.similarity import ann_int8_topk

    return ann_int8_topk(
        load_table(spark, sf_dir, "embeddings"), query_id=0, k=10
    ).select("vec_id", F.col("rank").cast("bigint").alias("rank"), "cos_r")


def _bpe_train_oracle(n_merges: int = 12) -> str:
    """BPE merge-table TRAINING reproduced in DuckDB: the distinct-word
    count table, then ``n_merges`` rounds of (pair count → integer+
    lexicographic argmax → one merge fold), each round a CTE stage —
    the same generated-iteration pattern as _lloyd_ctes.  The per-round
    merge pair is a 1-row CTE cross-joined into the fold (operators/
    text_analysis.py bpe_train picks it with a 1-row collect)."""
    ctes = [
        f"""w0 AS (
      SELECT list_filter(list_transform(range(1, length(w) + 1), j -> w[j]),
                         x -> x <> '') AS syms,
             CAST(count(*) AS BIGINT) AS cnt
      FROM (
        SELECT unnest(regexp_extract_all({_NORM}, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS w
        FROM documents WHERE doc_id IS NOT NULL
      )
      -- chr(31) is this oracle's internal symbol separator; a U+001F
      -- pre-token (necessarily the single char — the alnum classes
      -- can't contain it) would corrupt the rebuilt symbol arrays in
      -- the merge folds.  Dropping it is parity-neutral: a 1-symbol
      -- word contributes no pairs, and merge operands are
      -- alnum-validated so it can never appear in the output.
      WHERE w <> chr(31)
      GROUP BY w
    )"""
    ]
    for i in range(1, n_merges + 1):
        prev = f"w{i - 1}"
        ctes.append(f"""p{i} AS (
      SELECT a, b, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
        SELECT syms[j] AS a, syms[j + 1] AS b, cnt FROM (
          SELECT syms, cnt, unnest(range(1, len(syms))) AS j
          FROM {prev} WHERE len(syms) >= 2
        )
      )
      WHERE regexp_matches(a, '^[A-Za-z0-9]+$')
        AND regexp_matches(b, '^[A-Za-z0-9]+$')
      GROUP BY a, b
    )""")
        ctes.append(f"""m{i} AS (
      SELECT a, b FROM p{i} WHERE cnt >= 2 ORDER BY cnt DESC, a, b LIMIT 1
    )""")
        ctes.append(f"""w{i} AS (
      SELECT string_split(
               list_reduce(s.syms, (acc, x) -> CASE
                 WHEN (acc = m.a OR ends_with(acc, chr(31) || m.a)) AND x = m.b
                 THEN left(acc, length(acc) - length(m.a)) || m.a || m.b
                 ELSE acc || chr(31) || x END),
               chr(31)) AS syms,
             s.cnt
      FROM {prev} s CROSS JOIN m{i} m
    )""")
    unions = "\n      UNION ALL ".join(
        f"SELECT CAST({i - 1} AS INT) AS rank, a AS lhs, b AS rhs FROM m{i}"
        for i in range(1, n_merges + 1)
    )
    return f"""
    WITH {', '.join(ctes)}
    {unions}
    """


@q("text_bpe_train", oracle=_bpe_train_oracle())
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale BPE tokenizer TRAINING (the other half of
    text_bpe_tokens): one corpus scan into the distinct-word count
    table, then 12 rounds of most-frequent-pair merge with integer
    counts + lexicographic tie-break — every engine learns the
    identical table (operators/text_analysis.py bpe_train; Sennrich et
    al. 2016 §3.2).  The learned table feeds bpe_encode directly
    (training-rank order satisfies _check_merges by construction —
    pytest composes them)."""
    from rheoceros_spark.operators.text_analysis import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=12)
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, lhs string, rhs string",
    )


def _pipeline_oracle(
    budget: int = 20000,
    chunk_tokens: int = 32,
    n_shards: int = 8,
    pack_budget: int = 256,
    cont_max: float = 0.2,
) -> str:
    """The whole pretraining-corpus pipeline as ONE DuckDB query —
    funnel gates → minhash keep-list purge → n-gram decon → BPE →
    sqrt-temperature token-budget mix → BPE-token chunking →
    shard+pack — certifying that the operators COMPOSE, not just that
    each piece matches in isolation.  Every CTE block is the certified
    shape of its standalone oracle (filter_funnel / dedup_keep_list /
    curation_contamination / text_bpe_tokens / curation_budget_mix /
    text_chunk_documents / curation_pack_sequences), re-rooted on the
    previous stage's output instead of the raw table."""
    from rheoceros_spark.operators.text_analysis import (
        BPE_DEMO_MERGES,
        bpe_word_fold_duckdb,
    )

    fold = bpe_word_fold_duckdb(BPE_DEMO_MERGES)
    # minhash pair CTEs re-rooted on the funnel-survivor set ("FROM
    # documents" appears exactly once in the template — the ex scan)
    mh = _MINHASH_CTES.replace("FROM documents", "FROM surv")
    assert "FROM surv" in mh and "FROM documents" not in mh
    mix_key = _H64.format(s="concat('0', ':', CAST(b.doc_id AS VARCHAR))")
    shard_key = _H64.format(s="concat('7', ':', ck)")
    S = int(chunk_tokens)
    return f"""
    WITH RECURSIVE corpus AS (
      SELECT doc_id, text, source FROM documents
      WHERE doc_id IS NOT NULL AND doc_id % 97 <> 0
    ),
    feat AS (
      SELECT doc_id, md5({_NORM}) AS fp, {_LANG_SCORES_SQL},
             least(CAST(len({_TOK}) AS DOUBLE) / 100.0, 1.0) AS len_score,
             CASE WHEN length({_NORM}) > 0
                  THEN CAST(len(regexp_extract_all({_NORM}, '[^A-Za-z0-9 ]')) AS DOUBLE)
                       / CAST(length({_NORM}) AS DOUBLE) ELSE 0.0 END AS punct_ratio,
             CASE WHEN len({_TOK}) > 0
                  THEN CAST(len(list_filter({_TOK}, t -> list_contains({_LANG_SETS['en']}, t))) AS DOUBLE)
                       / CAST(len({_TOK}) AS DOUBLE) ELSE 0.0 END AS stop_ratio,
             round(CASE WHEN length({_NORM}) > 0
                   THEN (len({_TOK}) - len(list_distinct({_TOK})))
                        / CAST(len({_TOK}) AS DOUBLE)
                   ELSE 0.0 END, 6) AS dup_token_frac
      FROM corpus
    ),
    flags AS (
      SELECT doc_id, fp,
             (CASE
               WHEN greatest(score_en, score_es, score_fr, score_de) = 0 THEN 'und'
               WHEN score_en = greatest(score_en, score_es, score_fr, score_de) THEN 'en'
               WHEN score_es = greatest(score_en, score_es, score_fr, score_de) THEN 'es'
               WHEN score_fr = greatest(score_en, score_es, score_fr, score_de) THEN 'fr'
               ELSE 'de'
             END = 'en') AS p1,
             round(0.3 * len_score + 0.3 * (1.0 - punct_ratio)
                   + 0.4 * least(5.0 * stop_ratio, 1.0), 6) AS quality,
             dup_token_frac
      FROM feat
    ),
    gated AS (
      SELECT doc_id, fp,
             p1 AND quality >= 0.55 AND dup_token_frac <= 0.5 AS p3
      FROM flags
    ),
    dedup0 AS (
      SELECT doc_id,
             p3 AND doc_id = min(CASE WHEN p3 THEN doc_id END)
                             OVER (PARTITION BY fp) AS p4
      FROM gated
    ),
    surv AS (
      SELECT c.doc_id, c.text, c.source
      FROM corpus c JOIN dedup0 u USING (doc_id) WHERE u.p4
    ),
    {mh},
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM buckets x JOIN buckets y ON x.band = y.band AND x.bucket = y.bucket
      WHERE x.doc_id < y.doc_id
    ),
    pairs AS (
      SELECT a, b FROM (
        SELECT c.a, c.b, {_JACCARD_DA_DB} AS jaccard
        FROM cand c JOIN docs da ON c.a = da.doc_id JOIN docs db ON c.b = db.doc_id
      ) WHERE jaccard >= 0.5
    ),
    edges AS (
      SELECT a AS u, b AS v FROM pairs
      UNION SELECT b AS u, a AS v FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    clusters AS (
      SELECT u AS doc_id, least(u, min(v)) AS cluster_id
      FROM reach GROUP BY u
    ),
    clean AS (
      SELECT s.doc_id, s.text, s.source
      FROM surv s LEFT JOIN clusters c USING (doc_id)
      WHERE coalesce(c.cluster_id, s.doc_id) = s.doc_id
    ),
    bgrams AS (
      SELECT DISTINCT {_H64.format(s="g")} AS gh FROM (
        SELECT unnest(list_distinct({_ngrams_sql(_TOK, 8)})) AS g
        FROM documents WHERE doc_id IS NOT NULL AND doc_id % 97 = 0
      )
    ),
    cgrams AS (
      SELECT doc_id, {_H64.format(s="g")} AS gh FROM (
        SELECT doc_id, unnest(list_distinct({_ngrams_sql(_TOK, 8)})) AS g FROM clean
      )
    ),
    cont AS (
      SELECT c.doc_id,
             CAST(sum(CASE WHEN b.gh IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS ratio
      FROM cgrams c LEFT JOIN bgrams b USING (gh) GROUP BY c.doc_id
    ),
    bad AS (SELECT doc_id FROM cont WHERE ratio > {cont_max!r}),
    decon AS (
      SELECT c.doc_id, c.text, c.source
      FROM clean c LEFT JOIN bad b USING (doc_id) WHERE b.doc_id IS NULL
    ),
    bt AS (
      SELECT doc_id, source,
             CASE WHEN text IS NULL OR length({_NORM}) = 0
                  THEN CAST([] AS VARCHAR[])
                  ELSE flatten(list_transform(
                         regexp_extract_all({_NORM}, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'),
                         w -> {fold})) END AS bpe
      FROM decon
    ),
    btn AS (
      SELECT doc_id, source, bpe, CAST(len(bpe) AS BIGINT) AS n_bpe FROM bt
      WHERE source IS NOT NULL
    ),
    per AS (SELECT source, CAST(sum(n_bpe) AS BIGINT) AS nt FROM btn GROUP BY source),
    tot AS (SELECT CAST(sum(nt) AS BIGINT) AS tot FROM per),
    wq AS (
      SELECT source,
             CAST(round(sqrt(CAST(nt AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e12)
                  AS BIGINT) AS wq
      FROM per, tot
    ),
    ws AS (SELECT CAST(sum(wq) AS BIGINT) AS wsum FROM wq),
    quota AS (
      SELECT source,
             CAST(floor((CAST(wq AS DOUBLE) * {float(budget)!r}) / CAST(wsum AS DOUBLE))
                  AS BIGINT) AS quota
      FROM wq, ws
    ),
    ranked AS (
      SELECT b.doc_id, b.bpe, b.n_bpe, q.quota,
             coalesce(sum(b.n_bpe) OVER (
               w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM btn b JOIN quota q USING (source)
      WINDOW w AS (PARTITION BY b.source ORDER BY {mix_key}, b.doc_id)
    ),
    picked AS (SELECT doc_id, bpe FROM ranked WHERE cb < quota),
    st AS (
      SELECT doc_id, bpe AS t,
             unnest(range(1, greatest(1, len(bpe)) + 1, {S})) AS s
      FROM picked WHERE len(bpe) > 0
    ),
    chunks AS (
      SELECT doc_id, CAST((s - 1) / {S} AS BIGINT) AS chunk_id,
             CAST(len(list_slice(t, s, s + {S - 1})) AS BIGINT) AS n_chunk_tokens,
             array_to_string(list_slice(t, s, s + {S - 1}), ' ') AS chunk_text
      FROM st
    ),
    keyed AS (
      SELECT *, CAST(doc_id AS VARCHAR) || '#' || CAST(chunk_id AS VARCHAR) AS ck
      FROM chunks
    ),
    shd AS (SELECT *, {shard_key} AS sort_key FROM keyed),
    shd2 AS (SELECT *, CAST(sort_key % {n_shards} AS INT) AS shard FROM shd)
    SELECT doc_id, chunk_id, shard, n_chunk_tokens,
           CAST(floor((sum(n_chunk_tokens) OVER (PARTITION BY shard
                                                 ORDER BY sort_key, ck
                                                 ROWS UNBOUNDED PRECEDING)
                       - n_chunk_tokens) / {float(pack_budget)!r}) AS BIGINT) AS bin_id,
           chunk_text
    FROM shd2
    """


@q("pipeline_pretrain_corpus", oracle=_pipeline_oracle())
def pipeline_pretrain_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end pretraining-corpus build as ONE query — the
    composition certificate for the whole curation surface: filter
    funnel (lang/quality/repetition/exact-dedup) → minhash keep-list
    near-dup purge → 8-gram eval decontamination (doc_id % 97 slice as
    the benchmark, the curation_contamination convention) → BPE
    tokenization → sqrt-temperature 20k-BPE-token budget mix → 32-BPE-
    token chunking → deterministic shard + 256-token greedy packing.
    Output: the packed training manifest (doc, chunk, shard, bin,
    chunk payload).

    Scale shape is the sum of its certified parts: one scan + one fp
    shuffle (funnel), banded LSH join (pairs), broadcast benchmark
    gram probe (decon), Arrow BPE, sources-sized quota broadcast
    (mix), shuffle-free explode (chunk), one shard-partitioned window
    (pack) — nothing quadratic, no corpus-sized broadcast or collect
    anywhere (reference slot surface api_ext.py:107-190 composes the
    same stages imperatively)."""
    from rheoceros_spark.operators.curation import (
        budget_mix_select,
        contamination_ngrams,
        dedup_keep_list,
        funnel_survivors,
        pack_sequences,
        shuffle_shards,
    )
    from rheoceros_spark.operators.dedup import minhash_lsh_pairs
    from rheoceros_spark.operators.text_analysis import bpe_encode, chunk_documents

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)

    # stage materialization at the three frames that feed TWO consumers
    # each (surv → pair-emitter + purge join; clean → decon probe +
    # anti join; bpe → quota ranking + chunk explode): without it every
    # branch recomputes the whole upstream funnel scan — the in-query
    # equivalent of how the Application graph persists each node's
    # output between stages (and dedup_keep_list's own pair
    # checkpoint).  Measured ~9 → ~7 s at sf0.1.
    # lazy checkpoints (r14): materialized by the first downstream
    # action instead of one dedicated driver job per stage frame
    surv = funnel_survivors(corpus).localCheckpoint(eager=False)
    keep = dedup_keep_list(surv, minhash_lsh_pairs(surv, threshold=0.5))
    clean = surv.join(
        keep.where(~F.col("is_dup")).select("doc_id"), "doc_id"
    ).select(*surv.columns)
    cont = contamination_ngrams(clean, bench, n=8)
    bad = cont.where(F.col("contamination_ratio") > 0.2).select("doc_id")
    decon = clean.join(bad, "doc_id", "left_anti").localCheckpoint(eager=False)

    bpe = bpe_encode(decon).localCheckpoint(eager=False)
    sel = budget_mix_select(
        bpe, token_budget=20000, alpha=0.5, token_col="n_bpe_tokens", seed=0
    )
    picked = bpe.join(sel.select("doc_id"), "doc_id")

    chunks = chunk_documents(
        picked, chunk_tokens=32, overlap=0, tokens_col="bpe_tokens"
    )
    keyed = chunks.withColumn(
        "chunk_key",
        F.concat(
            F.col("doc_id").cast("string"), F.lit("#"), F.col("chunk_id").cast("string")
        ),
    )
    sh = shuffle_shards(keyed, id_col="chunk_key", n_shards=8, seed=7)
    packed = pack_sequences(
        sh, budget=256, token_col="n_chunk_tokens", order_col="sort_key",
        id_col="chunk_key",
    )
    return packed.select(
        "doc_id", "chunk_id", "shard", "n_chunk_tokens", "bin_id", "chunk_text"
    )


def _gopher_rules_oracle() -> str:
    """Every Gopher rule replayed in DuckDB on exact integer arithmetic
    — the same ``10·n_sym ≤ n_words`` comparisons and ``·1e6 // n``
    quantized ratios as operators/text_analysis.py gopher_rules."""
    stops = ", ".join(f"'{s}'" for s in ["the", "be", "to", "of", "and", "that", "have", "with"])
    return f"""
    WITH base AS (
      SELECT doc_id, coalesce(text, '') AS raw,
             trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')) AS norm
      FROM documents
    ), feat AS (
      SELECT doc_id, raw, norm,
             CAST(CASE WHEN length(norm) = 0 THEN 0
                  ELSE len(string_split(norm, ' ')) END AS BIGINT) AS n_words,
             string_split(norm, ' ') AS toks,
             string_split(raw, chr(10)) AS lines
      FROM base
    ), cnt AS (
      SELECT doc_id, n_words,
             CASE WHEN n_words > 0
                  THEN CAST(length(norm) AS BIGINT) - (n_words - 1)
                  ELSE 0 END AS wc,
             CAST(length(raw) - length(replace(raw, '#', '')) AS BIGINT) AS n_hsh,
             CAST(length(raw) - length(replace(raw, '…', '')) AS BIGINT)
               + CAST(len(regexp_extract_all(raw, '\\.\\.\\.')) AS BIGINT) AS n_el2,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(list_filter(lines,
               l -> substr(ltrim(l), 1, 1) IN ('-', '*', '•'))) AS BIGINT) AS n_bul,
             CAST(len(list_filter(lines,
               l -> ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…')))
               AS BIGINT) AS n_ell,
             CASE WHEN n_words > 0
                  THEN CAST(len(list_filter(toks,
                       t -> regexp_matches(t, '\\p{{L}}'))) AS BIGINT)
                  ELSE 0 END AS n_alpha,
             CAST(len(list_intersect(toks, [{stops}])) AS BIGINT) AS stop_hits
      FROM feat
    )
    SELECT doc_id, n_words, n_lines, stop_hits,
           CASE WHEN n_words > 0
                THEN CAST(wc * 1000000 // n_words AS DOUBLE) / 1e6 END AS mean_word_len,
           CASE WHEN n_words > 0
                THEN CAST(n_hsh * 1000000 // n_words AS DOUBLE) / 1e6 END AS hash_word_ratio,
           CASE WHEN n_words > 0
                THEN CAST(n_el2 * 1000000 // n_words AS DOUBLE) / 1e6 END AS ellipsis_word_ratio,
           CASE WHEN n_lines > 0
                THEN CAST(n_bul * 1000000 // n_lines AS DOUBLE) / 1e6 END AS bullet_line_frac,
           CASE WHEN n_lines > 0
                THEN CAST(n_ell * 1000000 // n_lines AS DOUBLE) / 1e6 END AS ellipsis_line_frac,
           CASE WHEN n_words > 0
                THEN CAST(n_alpha * 1000000 // n_words AS DOUBLE) / 1e6 END AS alpha_word_frac,
           CAST(n_words >= 50 AND n_words <= 100000 AS INT) AS g_word_count,
           CAST(n_words > 0 AND wc >= 3 * n_words AND wc <= 10 * n_words AS INT)
             AS g_mean_word_len,
           CAST(10 * n_hsh <= n_words AND 10 * n_el2 <= n_words AS INT)
             AS g_symbol_ratio,
           CAST(10 * n_bul <= 9 * n_lines AS INT) AS g_bullet_lines,
           CAST(10 * n_ell <= 3 * n_lines AS INT) AS g_ellipsis_lines,
           CAST(n_words > 0 AND 10 * n_alpha >= 8 * n_words AS INT) AS g_alpha_words,
           CAST(stop_hits >= 2 AS INT) AS g_stop_words,
           CAST(n_words >= 50 AND n_words <= 100000
                AND n_words > 0 AND wc >= 3 * n_words AND wc <= 10 * n_words
                AND 10 * n_hsh <= n_words AND 10 * n_el2 <= n_words
                AND 10 * n_bul <= 9 * n_lines
                AND 10 * n_ell <= 3 * n_lines
                AND 10 * n_alpha >= 8 * n_words
                AND stop_hits >= 2 AS INT) AS gopher_pass
    FROM cnt
    """


@q("text_gopher_rules", oracle=_gopher_rules_oracle())
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-filter rule flags per document (Rae et al. 2021
    §A1.1, the non-repetition half — text_repetition certifies the
    repetition half): word-count / mean-word-length / symbol-ratio /
    bullet-line / ellipsis-line / alpha-word / stop-word rules, every
    threshold an exact integer comparison so the flags carry no float
    seam.  Pure per-row column algebra — one scan at 100 TB, zero
    shuffle (operators/text_analysis.py gopher_rules)."""
    from rheoceros_spark.operators.text_analysis import gopher_rules

    return gopher_rules(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "n_words", "n_lines", "stop_hits", "mean_word_len",
        "hash_word_ratio", "ellipsis_word_ratio", "bullet_line_frac",
        "ellipsis_line_frac",
        "alpha_word_frac", "g_word_count", "g_mean_word_len",
        "g_symbol_ratio", "g_bullet_lines", "g_ellipsis_lines",
        "g_alpha_words", "g_stop_words", "gopher_pass",
    )


def _c4_lines_oracle(min_line_words: int = 5, min_kept_lines: int = 3) -> str:
    """Every C4 line rule replayed in DuckDB, including the byte-exact
    ``clean_text`` reassembly.  The synthetic corpus has no punctuation
    or newlines, so the query first LINE-IFIES it deterministically
    (nested fixed-string replace — identical left-to-right non-overlap
    semantics in both engines): ' table ' → '.\\ntable ' and ' query '
    → '?\\nquery ' give variable line counts, terminal-punct endings,
    and short-line rejects to exercise each rule on real data."""
    lineify = (
        "replace(replace(coalesce(text, ''), ' table ', '.' || chr(10) || 'table '),"
        " ' query ', '?' || chr(10) || 'query ')"
    )
    words = ("CASE WHEN length(trim(regexp_replace(l, '\\s+', ' ', 'g'))) = 0 "
             "THEN 0 ELSE len(string_split(trim(regexp_replace(l, '\\s+', ' ', 'g')), ' ')) END")
    term = ("(ends_with(rtrim(l), '.') OR ends_with(rtrim(l), '!')"
            " OR ends_with(rtrim(l), '?') OR ends_with(rtrim(l), '\"'))")
    return f"""
    WITH base AS (
      SELECT doc_id, {lineify} AS raw FROM documents
    ), feat AS (
      SELECT doc_id, raw, string_split(raw, chr(10)) AS lines FROM base
    ), k AS (
      SELECT doc_id, raw, CAST(len(lines) AS BIGINT) AS n_lines,
             list_filter(lines, l -> {term}
               AND {words} >= {min_line_words}
               AND NOT contains(lower(l), 'javascript')) AS kept
      FROM feat
    )
    SELECT doc_id, n_lines, CAST(len(kept) AS BIGINT) AS n_kept,
           CAST(contains(lower(raw), 'lorem ipsum') AS INT) AS has_lorem,
           CAST(contains(raw, '{{') AS INT) AS has_brace,
           CAST(len(kept) >= {min_kept_lines}
                AND NOT contains(lower(raw), 'lorem ipsum')
                AND NOT contains(raw, '{{') AS INT) AS c4_pass,
           coalesce(array_to_string(kept, chr(10)), '') AS clean_text
    FROM k
    """


@q("curation_c4_lines", oracle=_c4_lines_oracle())
def curation_c4_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2, thresholds per
    the canonical c4_utils reference implementation): keep lines ending
    in terminal punctuation with ≥5 words and no 'javascript'; page
    passes with ≥3 kept lines and no 'lorem ipsum'/brace.  The
    synthetic corpus is line-ified deterministically first (fixed-
    string replaces, engine-identical) so every rule sees real
    variation; clean_text certifies byte-exact reassembly.  Per-row
    array algebra — zero shuffle, one scan at 100 TB
    (operators/text_analysis.py c4_line_filter)."""
    from rheoceros_spark.operators.text_analysis import c4_line_filter

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__lineified",
        F.replace(
            F.replace(
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(" table "),
                F.lit(".\ntable "),
            ),
            F.lit(" query "),
            F.lit("?\nquery "),
        ),
    )
    return c4_line_filter(docs, text_col="__lineified").select(
        "doc_id", "n_lines", "n_kept", "has_lorem", "has_brace", "c4_pass",
        "clean_text",
    )


@q(
    "dedup_exact_best_docs",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars, md5({_NORM}) AS k
      FROM documents WHERE text IS NOT NULL
    ), w AS (
      SELECT doc_id FROM (
        SELECT doc_id, row_number() OVER (
          PARTITION BY k
          ORDER BY coalesce(CAST(n_chars AS DOUBLE), '-infinity'::DOUBLE) DESC,
                   doc_id ASC) AS rn
        FROM keyed
      ) WHERE rn = 1
    )
    SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
    FROM documents d JOIN w USING (doc_id)
    UNION ALL
    SELECT doc_id, text, lang, source, n_chars FROM documents WHERE text IS NULL
    """,
)
def dedup_exact_best_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with the QUALITY survivor rule — keep the copy with
    the most characters per normalized-text group (the RefinedWeb
    keep-longest convention; any score column works, e.g. a trained
    classifier's logit), ties to min id.  Same 32-byte-key shuffle
    shape as dedup_exact; the winner is an order-independent
    max(struct(score, −id)) aggregate
    (operators/dedup.py dedup_exact_best)."""
    from rheoceros_spark.operators.dedup import dedup_exact_best

    return dedup_exact_best(
        load_table(spark, sf_dir, "documents"), score_col="n_chars"
    )


# ---------------------------------------------------------------------------
# URL-level curation (round 11, staged for r12): the crawl-pipeline
# stage upstream of all text processing — CCNet (Wenzek et al. 2020
# §2) dedups by URL first, RefinedWeb (§G.1) canonicalizes + filters
# URLs and caps domains before extraction.  The documents table
# carries no URL column, so a deterministic fixture URL is derived
# from doc_id — IDENTICAL SQL in both engines — exercising every
# canonicalization rule: scheme/host case, userinfo, www, default +
# non-default ports, missing/trailing-slash paths, %-escape case,
# tracker params, param order, fragments, NULLs.
# ---------------------------------------------------------------------------

_URL_FIXTURE = """(CASE WHEN doc_id % 53 = 0 THEN NULL ELSE
    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END) || '://' ||
    (CASE WHEN doc_id % 11 = 0 THEN 'crawler:Pw@' ELSE '' END) ||
    (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
    'Host' || CAST(doc_id % 40 AS STRING) || '.Example.COM' ||
    (CASE WHEN doc_id % 2 = 0 THEN ':443'
          WHEN doc_id % 5 = 0 THEN ':8080'
          WHEN doc_id % 7 = 0 THEN ':80' ELSE '' END) ||
    (CASE WHEN doc_id % 13 = 0 THEN ''
          ELSE '/Dir%2f' || CAST(doc_id % 6 AS STRING) END) ||
    (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
    (CASE WHEN doc_id % 17 = 0 THEN ''
          ELSE '?utm_source=feed&b=' || CAST(doc_id % 3 AS STRING) ||
               (CASE WHEN doc_id % 19 = 0 THEN '&fbclid=x9' ELSE '' END) ||
               '&a=%2f' END) ||
    (CASE WHEN doc_id % 6 = 0 THEN '#Frag' ELSE '' END)
  END)"""

#: suffix-blocked domains for the staged composition (kills the bare
#: AND www. variants of two of the 40 fixture hosts)
_URL_BLOCKED = ("host7.example.com", "host13.example.com")


def _url_canonical_oracle() -> str:
    from rheoceros_spark.operators.urls import (
        canonical_url_duckdb_query,
        url_domain_duckdb_sql,
    )

    blocked = " OR ".join(
        f"(domain = '{b}' OR domain LIKE '%.{b}')" for b in _URL_BLOCKED
    )
    canon = canonical_url_duckdb_query("documents", _URL_FIXTURE, keep=["doc_id"])
    return f"""
    -- MATERIALIZED: DuckDB inlines CTEs by substitution (no cost
    -- guard), and dom/WHERE reference these columns many times — the
    -- inlined form re-expands the 13-level canonicalization pipeline
    -- multiplicatively and hangs the optimizer
    WITH canon AS MATERIALIZED (
      {canon}
    ), dom AS MATERIALIZED (
      SELECT doc_id, canonical_url,
             {url_domain_duckdb_sql('canonical_url')} AS domain
      FROM canon
    )
    -- suffix blocking via an INDEPENDENT mechanism (equality + LIKE),
    -- not the operator's suffix-array expansion; NULL domains are kept
    SELECT doc_id, canonical_url, domain
    FROM dom WHERE domain IS NULL OR NOT ({blocked})
    """


@q("curation_url_canonical", oracle=_url_canonical_oracle())
def curation_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + domain extraction + domain-rule blocking
    (operators/urls.py url_canonicalize / url_domain / domain_filter —
    RFC 3986 syntax normalization + RefinedWeb §G.1-style suffix
    blocklist).  Pure per-row column algebra behind a pushdown
    barrier; zero shuffle at any corpus size."""
    from rheoceros_spark.operators.urls import (
        domain_filter,
        url_canonicalize,
        url_domain,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "url", F.expr(_URL_FIXTURE)
    )
    out = domain_filter(
        url_domain(url_canonicalize(docs), url_col="canonical_url"),
        list(_URL_BLOCKED),
        mode="block",
    )
    return out.select("doc_id", "canonical_url", "domain")


def _dedup_exact_url_oracle() -> str:
    from rheoceros_spark.operators.urls import canonical_url_duckdb_query

    canon = canonical_url_duckdb_query(
        "documents", _URL_FIXTURE, keep=["doc_id", "n_chars"]
    )
    return f"""
    WITH canon AS MATERIALIZED (
      {canon}
    ), ranked AS (
      SELECT doc_id, canonical_url,
             row_number() OVER (
               PARTITION BY canonical_url
               ORDER BY coalesce(CAST(n_chars AS DOUBLE), '-infinity'::DOUBLE) DESC,
                        doc_id ASC) AS rn
      FROM canon WHERE canonical_url IS NOT NULL
    )
    SELECT doc_id, canonical_url FROM ranked WHERE rn = 1
    UNION ALL
    SELECT doc_id, canonical_url FROM canon WHERE canonical_url IS NULL
    """


@q("dedup_exact_url", oracle=_dedup_exact_url_oracle())
def dedup_exact_url_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-exact dedup with the quality-survivor rule (operators/
    urls.py dedup_exact_url — CCNet §2's first dedup stage): one
    survivor per canonical URL, keep the most characters, ties to min
    id; rows that don't canonicalize pass through.  The winner shuffle
    carries (32-byte md5, score, id) — never documents."""
    from rheoceros_spark.operators.urls import dedup_exact_url

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "url", F.expr(_URL_FIXTURE)
    )
    return dedup_exact_url(docs, score_col="n_chars").select(
        "doc_id", "canonical_url"
    )


# ---------------------------------------------------------------------------
# snapshot-scoped dedup + persisted tokenizer artifact (round 11,
# staged for r12)
# ---------------------------------------------------------------------------

#: full corpus texts are unique at the test SFs, so the fixture
#: injects deterministic duplicate groups (~1/7 of docs share one of
#: 20 contents) that straddle the doc_id%3 snapshots — the scoped and
#: cross-snapshot branches both fire; IDENTICAL SQL in both engines
_SNAP_TEXT = (
    "(CASE WHEN doc_id % 7 = 0 "
    "THEN 'shared crawl page ' || CAST(doc_id % 20 AS STRING) "
    "ELSE text END)"
)


def _snapshot_scoped_oracle() -> str:
    normt = f"trim(regexp_replace(lower({_SNAP_TEXT}), '\\s+', ' ', 'g'))"
    return f"""
    WITH keyed AS (
      SELECT doc_id, doc_id % 3 AS snapshot, md5({normt}) AS fp
      FROM documents WHERE {_SNAP_TEXT} IS NOT NULL
    ), within AS (
      SELECT snapshot, fp, min(doc_id) AS doc_id
      FROM keyed GROUP BY snapshot, fp
    ), firstsnap AS (
      SELECT fp, min(snapshot) AS first_snap FROM keyed GROUP BY fp
    )
    SELECT w.doc_id, CAST(w.snapshot AS BIGINT) AS snapshot
    FROM within w JOIN firstsnap f USING (fp)
    WHERE w.snapshot = f.first_snap
    UNION ALL
    SELECT doc_id, CAST(doc_id % 3 AS BIGINT) AS snapshot
    FROM documents WHERE {_SNAP_TEXT} IS NULL
    """


@q("dedup_snapshot_scoped", oracle=_snapshot_scoped_oracle())
def dedup_snapshot_scoped_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-snapshot-scoped exact dedup (operators/dedup.py
    dedup_snapshot_scoped — the FineWeb §4.4 per-snapshot discipline),
    with the cross-snapshot earliest-wins pass on top (what an
    APPEND-maintained fingerprint index yields incrementally; equality
    pinned in tests/test_dedup_scoped.py).  ONE (snapshot, 32-byte md5)
    winner shuffle + one fp-keyed min-snapshot aggregate — text never
    shuffles."""
    from rheoceros_spark.operators.dedup import dedup_snapshot_scoped

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_SNAP_TEXT).alias("text"),
        (F.col("doc_id") % 3).alias("snapshot"),
    )
    return dedup_snapshot_scoped(docs, cross_snapshot=True).select(
        "doc_id", "snapshot"
    )


_BPE_TABLE_CACHE: dict[str, str] = {}


@q("text_bpe_persisted", oracle=_bpe_oracle())
def text_bpe_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenization under a PERSISTED tokenizer artifact — the
    train-once / tokenize-everywhere split (operators/text_analysis.py
    bpe_table_write / bpe_table_read): the merge table round-trips
    through parquet with loud-mismatch validation (scheme tag, rank
    contiguity, training-order operands) before driving the same Arrow
    encoder text_bpe_tokens certifies, so the artifact path must be
    BIT-EQUAL to the in-memory path (shared oracle).  The streaming
    twin stream_bpe_tokenize applies the same artifact per micro-batch
    (parity in tests/test_dedup_scoped.py)."""
    import tempfile

    from rheoceros_spark.operators.text_analysis import (
        BPE_DEMO_MERGES,
        bpe_encode,
        bpe_table_read,
        bpe_table_write,
    )

    path = _BPE_TABLE_CACHE.get(sf_dir)
    if path is None:
        path = tempfile.mkdtemp(prefix="rheoceros_bpe_tbl_")
        bpe_table_write(spark, BPE_DEMO_MERGES, path)
        _BPE_TABLE_CACHE[sf_dir] = path
    merges = bpe_table_read(spark.read.parquet(path))
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    return bpe_encode(docs, merges).select(
        "doc_id",
        "n_bpe_tokens",
        F.concat_ws(" ", F.slice("bpe_tokens", 1, 8)).alias("bpe_head"),
    )


def _source_overlap_minhash_oracle(n: int = 8, num_hashes: int = 64) -> str:
    """Per-source MinHash signatures replayed in DuckDB: same h64 gram
    hashes, same affine permutations, min per permutation per source,
    pairwise component-match count (unrolled CASE sum)."""
    from rheoceros_spark.functions.portable import h64_sql, word_ngrams_sql
    from rheoceros_spark.operators.dedup import MINHASH_P

    grams = word_ngrams_sql(_TOK, n)
    gh = h64_sql("g")
    mins = ",\n             ".join(
        f"min(({2 * i + 1} * h + {i}) % {MINHASH_P}) AS m{i}"
        for i in range(num_hashes)
    )
    match_sum = " + ".join(
        f"CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END" for i in range(num_hashes)
    )
    return f"""
    WITH hashed AS (
      SELECT source AS s, {gh} % 4294967296 AS h FROM (
        SELECT source, unnest(list_distinct({grams})) AS g
        FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
          AND length({_NORM}) > 0
      )
    ), sigs AS (
      SELECT s, {mins}
      FROM hashed GROUP BY s
    )
    SELECT a.s AS source_a, b.s AS source_b,
           CAST({match_sum} AS BIGINT) AS n_matches,
           CAST(CAST({match_sum} AS BIGINT) * 1000000 // {num_hashes}
                AS DOUBLE) / 1e6 AS est_jaccard
    FROM sigs a JOIN sigs b ON a.s < b.s
    """


@q_retired(
    "curation_source_overlap_minhash",
    oracle=_source_overlap_minhash_oracle(),
)
def curation_source_overlap_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash sketch twin of the exact cross-source overlap matrix —
    the 100 TB scale path: per-source 64-component signatures (map-side
    partial mins; sources×64 integers cross the wire instead of the
    gram vocabulary), pairwise Jaccard estimated as the matching-
    component fraction.  Deterministic portable hashes make even the
    ESTIMATE bit-exact across engines
    (operators/curation.py source_overlap_minhash)."""
    from rheoceros_spark.operators.curation import source_overlap_minhash

    return source_overlap_minhash(
        load_table(spark, sf_dir, "documents"), n=8, num_hashes=64
    )


def _lang_segments_oracle(span_tokens: int = 16) -> str:
    """Per-span marker lang-id + document rollup in DuckDB: the
    text_lang_id scoring over token-window spans, modal non-'und'
    language with ascending tie-break."""
    S = int(span_tokens)
    span_toks = (
        "string_split(trim(regexp_replace(lower(span_text), '\\s+', ' ', 'g')), ' ')"
    )
    scores = ", ".join(
        f"len(list_filter({span_toks}, t -> list_contains({_LANG_SETS[l]}, t)))"
        f" AS score_{l}"
        for l in ("en", "es", "fr", "de")
    )
    return f"""
    WITH docs AS (
      SELECT doc_id, {_TOK} AS t FROM documents
      WHERE doc_id IS NOT NULL AND text IS NOT NULL
        AND len(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) > 0
    ), segs AS (
      SELECT doc_id, CAST((s - 1) / {S} AS INT) AS span_id,
             array_to_string(
               t[CAST(s AS INT):CAST(least(s + {S} - 1, len(t)) AS INT)], ' '
             ) AS span_text
      FROM (SELECT doc_id, t, unnest(range(1, len(t)+1, {S})) AS s FROM docs)
    ), sc AS (
      SELECT doc_id, span_id,
             CASE
               WHEN greatest(score_en, score_es, score_fr, score_de) = 0 THEN 'und'
               WHEN score_en = greatest(score_en, score_es, score_fr, score_de) THEN 'en'
               WHEN score_es = greatest(score_en, score_es, score_fr, score_de) THEN 'es'
               WHEN score_fr = greatest(score_en, score_es, score_fr, score_de) THEN 'fr'
               ELSE 'de'
             END AS lang_pred
      FROM (SELECT doc_id, span_id, {scores} FROM segs)
    ), per AS (
      SELECT doc_id, lang_pred, CAST(count(*) AS BIGINT) AS c
      FROM sc GROUP BY doc_id, lang_pred
    ), tot AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_spans FROM per GROUP BY doc_id
    ), dom AS (
      SELECT doc_id, lang_pred AS dominant_lang, c AS dominant_spans FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY c DESC, lang_pred ASC) AS rn
        FROM per WHERE lang_pred <> 'und'
      ) WHERE rn = 1
    ), nl AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_langs
      FROM per WHERE lang_pred <> 'und' GROUP BY doc_id
    )
    SELECT d.doc_id, coalesce(t.n_spans, 0) AS n_spans,
           coalesce(dom.dominant_lang, 'und') AS dominant_lang,
           coalesce(dom.dominant_spans, 0) AS dominant_spans,
           coalesce(nl.n_langs, 0) AS n_langs,
           CAST(coalesce(nl.n_langs, 0) >= 2 AS INT) AS multilingual
    FROM (SELECT doc_id FROM documents WHERE doc_id IS NOT NULL) d
    LEFT JOIN tot t USING (doc_id)
    LEFT JOIN dom USING (doc_id)
    LEFT JOIN nl USING (doc_id)
    """


@q("text_lang_segments", oracle=_lang_segments_oracle())
def text_lang_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granular language profile (Wenzek et al. 2020 §3.2 —
    CCNet runs lang-id per paragraph so mixed-language pages surface
    instead of averaging away): 16-token-span marker lang-id rolled up
    to dominant language / identified-language count / multilingual
    flag per document.  Shuffle-free explode + one (id, lang) count —
    the only bytes on the wire are per-doc language tallies
    (operators/text_analysis.py lang_segments)."""
    from rheoceros_spark.operators.text_analysis import lang_segments

    return lang_segments(
        load_table(spark, sf_dir, "documents"), span_tokens=16
    )


def _decon_spans_oracle(n: int = 8, span_tokens: int = 16) -> str:
    """Span-level decontamination replayed in DuckDB: benchmark gram
    set (all word 8-grams, every offset), token-window segmentation
    (the paragraph-oracle CTE), span-gram ∩ benchmark probe, rebuild."""
    from rheoceros_spark.functions.portable import h64_sql, word_ngrams_sql

    S = int(span_tokens)
    doc_grams = word_ngrams_sql(_TOK, n)
    span_toks = "string_split(trim(regexp_replace(lower(span_text), '\\s+', ' ', 'g')), ' ')"
    span_grams = word_ngrams_sql(span_toks, n)
    gh = h64_sql("g")
    return f"""
    WITH bgrams AS (
      SELECT DISTINCT {gh} AS gh FROM (
        SELECT unnest(list_distinct({doc_grams})) AS g
        FROM documents WHERE doc_id % 97 = 0 AND text IS NOT NULL
      )
    ), docs AS (
      SELECT doc_id, {_TOK} AS t FROM documents
      WHERE doc_id IS NOT NULL AND doc_id % 97 <> 0 AND text IS NOT NULL
        AND len(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) > 0
    ), segs AS (
      SELECT doc_id, CAST((s - 1) / {S} AS INT) AS span_id,
             array_to_string(
               t[CAST(s AS INT):CAST(least(s + {S} - 1, len(t)) AS INT)], ' '
             ) AS span_text
      FROM (SELECT doc_id, t, unnest(range(1, len(t)+1, {S})) AS s FROM docs)
    ), hits AS (
      SELECT DISTINCT doc_id, span_id FROM (
        SELECT doc_id, span_id, unnest(list_distinct({span_grams})) AS g
        FROM segs
        WHERE len(trim(regexp_replace(lower(span_text), '\\s+', ' ', 'g'))) > 0
      ) sg JOIN bgrams ON {gh} = bgrams.gh
    ), marked AS (
      SELECT s.doc_id, s.span_id, s.span_text,
             h.doc_id IS NOT NULL AS purge
      FROM segs s LEFT JOIN hits h
        ON s.doc_id = h.doc_id AND s.span_id = h.span_id
    ), reb AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(CASE WHEN purge THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
             array_to_string(
               list(span_text ORDER BY span_id) FILTER (WHERE NOT purge), ' '
             ) AS clean_text,
             array_to_string(
               list(CAST(span_id AS VARCHAR) ORDER BY span_id) FILTER (WHERE purge), ','
             ) AS purged_span_ids
      FROM marked GROUP BY doc_id
    )
    SELECT d.doc_id,
           CASE WHEN r.doc_id IS NULL THEN NULL
                ELSE coalesce(r.clean_text, '') END AS clean_text,
           coalesce(r.n_spans, 0) AS n_spans,
           coalesce(r.n_purged, 0) AS n_purged,
           coalesce(r.purged_span_ids, '') AS purged_span_ids
    FROM (SELECT doc_id FROM documents
          WHERE doc_id IS NOT NULL AND doc_id % 97 <> 0) d
    LEFT JOIN reb r USING (doc_id)
    """


@q("curation_decon_spans", oracle=_decon_spans_oracle(n=4))
def curation_decon_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level eval decontamination: purge the 16-token spans that
    share any word 4-gram with the benchmark slice (doc_id % 97, the
    curation_contamination convention) while keeping the documents —
    removal, not flagging (GPT-3 appendix C / FLAN-style).  4-grams
    here because the synthetic word-soup corpus shares no 8-gram
    across the benchmark split (real corpora use the n=8 default —
    the operator is n-agnostic); at n=4 the gate certifies REAL purges
    (8 spans across 8 docs at sf0.01), not a no-op.  Benchmark grams
    broadcast; the corpus never shuffles text; reassembly is the
    paragraph_dedup rebuild with its byte invariant
    (operators/dedup.py decontaminate_spans)."""
    from rheoceros_spark.operators.dedup import decontaminate_spans

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    return decontaminate_spans(corpus, bench, n=4, span_tokens=16)


def _bpe_fertility_oracle() -> str:
    """Per-source fertility/compression over the full BPE merge cascade
    (the certified word-fold twin) + token_count word conventions —
    exact BIGINT totals, ·1e6-div-quantized ratios."""
    from rheoceros_spark.operators.text_analysis import (
        BPE_DEMO_MERGES,
        bpe_word_fold_duckdb,
    )

    fold = bpe_word_fold_duckdb(BPE_DEMO_MERGES)
    return f"""
    WITH b AS (
      SELECT doc_id, source,
             CASE WHEN text IS NULL OR length({_NORM}) = 0
                  THEN CAST([] AS VARCHAR[])
                  ELSE flatten(list_transform(
                         regexp_extract_all({_NORM}, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'),
                         w -> {fold})) END AS bpe,
             {_NORM} AS norm
      FROM documents WHERE doc_id IS NOT NULL
    ), f AS (
      SELECT source, CAST(len(bpe) AS BIGINT) AS nb,
             CAST(CASE WHEN length(norm) = 0 THEN 0
                  ELSE len(string_split(norm, ' ')) END AS BIGINT) AS nw,
             CAST(CASE WHEN length(norm) = 0 THEN 0
                  ELSE length(norm) - (len(string_split(norm, ' ')) - 1)
                  END AS BIGINT) AS wc
      FROM b
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nw) AS BIGINT) AS total_words,
           CAST(sum(nb) AS BIGINT) AS total_bpe_tokens,
           CAST(sum(wc) AS BIGINT) AS total_word_chars,
           CASE WHEN sum(nw) > 0
                THEN CAST(sum(nb) * 1000000 // sum(nw) AS DOUBLE) / 1e6
           END AS fertility,
           CASE WHEN sum(nb) > 0
                THEN CAST(sum(wc) * 1000000 // sum(nb) AS DOUBLE) / 1e6
           END AS chars_per_token
    FROM f GROUP BY source
    """


@q("text_bpe_fertility", oracle=_bpe_fertility_oracle())
def text_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (BPE tokens per word) + chars-per-token
    compression per source — the evaluation loop for the trained merge
    table: which corpus slices the tokenizer fragments.  Arrow BPE
    encode is the only corpus-sized stage; the report is one map-side-
    combined groupBy (operators/text_analysis.py bpe_fertility)."""
    from rheoceros_spark.operators.text_analysis import bpe_fertility

    return bpe_fertility(load_table(spark, sf_dir, "documents"))


def _retrieval_metrics_oracle(k: int = 10) -> str:
    """Dense top-k retrieval + the full metric battery in SQL.  The DCG
    position weights and ideal-DCG prefix sums are the SAME Python-
    computed integer literals the Spark plan embeds
    (similarity._dcg_weights_q), so no engine evaluates a log anywhere
    — the one place the house 1e-7-grid-after-round trick is replaced
    by construction-time equality."""
    from rheoceros_spark.operators.similarity import _dcg_weights_q

    w_q = _dcg_weights_q(k)
    prefix = [0]
    for v in w_q:
        prefix.append(prefix[-1] + v)
    wlit = "[" + ", ".join(str(v) for v in w_q) + "]"
    plit = "[" + ", ".join(str(v) for v in prefix) + "]"
    return f"""
    WITH corp AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id IS NOT NULL AND vec_id % 101 <> 0
    ), qry AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id IS NOT NULL AND vec_id % 101 = 0
    ), res AS (
      SELECT query_id, doc_id, rank FROM (
        SELECT q.query_id, c.vec_id AS doc_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY {_cos_sql('c.embedding', 'q.qv')} DESC, c.vec_id ASC) AS rank
        FROM corp c CROSS JOIN qry q WHERE c.vec_id <> q.query_id
      ) WHERE rank <= {k}
    ), qrels AS (
      SELECT q.query_id, c.vec_id AS doc_id FROM qry q, corp c
      WHERE c.vec_id % 7 = q.query_id % 7 AND c.vec_id <> q.query_id
    ), nrel AS (
      SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
      FROM qrels GROUP BY query_id
    ), j AS (
      SELECT r.query_id, r.rank,
             CASE WHEN qr.doc_id IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM res r LEFT JOIN qrels qr
        ON r.query_id = qr.query_id AND r.doc_id = qr.doc_id
    ), per AS (
      SELECT query_id, CAST(sum(hit) AS BIGINT) AS hits_at_k,
             CAST(coalesce(min(CASE WHEN hit = 1 THEN rank END), 0) AS INT)
               AS first_rel_rank,
             CAST(sum(CASE WHEN hit = 1 THEN ({wlit})[rank] ELSE 0 END)
                  AS BIGINT) AS dcg_q
      FROM j GROUP BY query_id
    )
    SELECT p.query_id, coalesce(n.n_rel, 0) AS n_rel, p.hits_at_k,
           CAST(p.hits_at_k * 1000000 // {k} AS DOUBLE) / 1e6 AS precision_at_k,
           CASE WHEN coalesce(n.n_rel, 0) > 0
                THEN CAST(p.hits_at_k * 1000000 // n.n_rel AS DOUBLE) / 1e6
           END AS recall_at_k,
           p.first_rel_rank,
           coalesce(CAST(1000000 // nullif(p.first_rel_rank, 0) AS DOUBLE) / 1e6,
                    0.0) AS mrr,
           CASE WHEN coalesce(n.n_rel, 0) > 0
                THEN CAST(p.dcg_q * 1000000
                          // ({plit})[least({k}, CAST(n.n_rel AS INT)) + 1]
                     AS DOUBLE) / 1e6
           END AS ndcg
    FROM per p LEFT JOIN nrel n USING (query_id)
    """


@q("retrieval_quality_metrics", oracle=_retrieval_metrics_oracle())
def retrieval_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-evaluation battery (nDCG@10 / MRR / precision / recall
    / first-hit rank) over the dense top-10 results, against a
    deterministic synthetic qrels table (relevant ⇔ same vec_id mod-7
    bucket as the query — a stand-in for externally supplied judgment
    labels).  DCG log weights are Python-computed integer literals
    embedded in both engines, so the metric layer has no libm seam;
    everything downstream of retrieval is query-batch-sized
    (operators/similarity.py retrieval_metrics)."""
    from rheoceros_spark.operators.similarity import (
        cosine_topk_multi,
        retrieval_metrics,
    )

    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id").isNotNull())
    corpus = emb.where(F.col("vec_id") % 101 != 0)
    queries = emb.where(F.col("vec_id") % 101 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    results = cosine_topk_multi(corpus, queries, k=10).select(
        "query_id", F.col("vec_id").alias("doc_id"), "rank"
    )
    qrels = (
        F.broadcast(queries.select("query_id"))
        .crossJoin(corpus.select(F.col("vec_id").alias("doc_id")))
        .where(
            (F.col("doc_id") % 7 == F.col("query_id") % 7)
            & (F.col("doc_id") != F.col("query_id"))
        )
    )
    return retrieval_metrics(results, qrels, k=10)


def _source_overlap_oracle(n: int = 8) -> str:
    """The overlap matrix via the straightforward gram×gram self-join
    (fine single-node; the engine uses per-gram source-sets instead) —
    same distinct-gram hashing, same integer-quantized ratios."""
    from rheoceros_spark.functions.portable import h64_sql, word_ngrams_sql

    grams = word_ngrams_sql(_TOK, n)
    gh = h64_sql("g")
    return f"""
    WITH d AS (
      SELECT DISTINCT source AS s, {gh} AS gh FROM (
        SELECT source, unnest(list_distinct({grams})) AS g
        FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
          AND length({_NORM}) > 0
      )
    ), per AS (
      SELECT s, CAST(count(*) AS BIGINT) AS ng FROM d GROUP BY s
    ), com AS (
      SELECT x.s AS source_a, y.s AS source_b, CAST(count(*) AS BIGINT) AS c
      FROM d x JOIN d y ON x.gh = y.gh AND x.s < y.s
      GROUP BY x.s, y.s
    )
    SELECT pa.s AS source_a, pb.s AS source_b,
           pa.ng AS n_grams_a, pb.ng AS n_grams_b,
           coalesce(c, 0) AS n_common,
           CAST(coalesce(c, 0) * 1000000 // pa.ng AS DOUBLE) / 1e6 AS containment_a,
           CAST(coalesce(c, 0) * 1000000 // pb.ng AS DOUBLE) / 1e6 AS containment_b,
           CAST(coalesce(c, 0) * 1000000
                // (pa.ng + pb.ng - coalesce(c, 0)) AS DOUBLE) / 1e6 AS jaccard
    FROM per pa JOIN per pb ON pa.s < pb.s
    LEFT JOIN com ON com.source_a = pa.s AND com.source_b = pb.s
    """


@q("curation_source_overlap", oracle=_source_overlap_oracle())
def curation_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cross-source 8-gram overlap matrix (containments +
    Jaccard, integer-quantized): which sources in a multi-source mix
    are near-copies of each other — mirror crawls and shared
    boilerplate contribute less marginal data than their token counts
    suggest.  Per-gram sorted source-sets bound pair generation by the
    source count, so the work is vocabulary-linear — no corpus-sized
    self-join (operators/curation.py source_overlap)."""
    from rheoceros_spark.operators.curation import source_overlap

    return source_overlap(load_table(spark, sf_dir, "documents"), n=8)


def _ppl_cut_sql(group_col: str, head_pct: int, tail_pct: int) -> str:
    """The value-granular head/middle/tail percentile cut as shared
    CTE text (hist + lab over a ``scored`` CTE carrying
    (doc_id, {group_col}, n_scored, nll, sq)): ONE copy of the
    exact-integer ``100·cum ≤ pct·n`` boundary rule, so the two
    certified oracles that replay it (`curation_ppl_buckets` per
    source, `pipeline_ccnet_corpus` per predicted language) cannot
    drift apart on a future quantization or boundary change."""
    mid_pct = 100 - tail_pct
    g = group_col
    return f"""hist AS (
      SELECT {g}, sq, CAST(count(*) AS BIGINT) AS c
      FROM scored WHERE sq IS NOT NULL GROUP BY {g}, sq
    ), lab AS (
      SELECT {g}, sq,
             CASE WHEN 100 * cum <= {head_pct} * n THEN 'head'
                  WHEN 100 * cum <= {mid_pct} * n THEN 'middle'
                  ELSE 'tail' END AS ppl_bucket
      FROM (
        SELECT {g}, sq,
               sum(c) OVER (PARTITION BY {g} ORDER BY sq
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(c) OVER (PARTITION BY {g}) AS n
        FROM hist
      )
    )"""


def _ppl_buckets_oracle(head_pct: int = 30, tail_pct: int = 30) -> str:
    """Bigram-NLL scoring (the certified _bigram_nll_sql chain as a
    subquery) + the shared value-granular head/middle/tail cut
    (_ppl_cut_sql) — operators/curation.py ppl_buckets replayed."""
    bigram = _bigram_nll_sql().strip().rstrip()
    return f"""
    WITH bn AS ({bigram}
    ), scored AS (
      SELECT d.doc_id, d.source, b.n_scored, b.nll,
             CAST(round(b.nll * 1e6) AS BIGINT) AS sq
      FROM documents d JOIN bn b ON d.doc_id = b.doc_id
    ), {_ppl_cut_sql("source", head_pct, tail_pct)}
    SELECT s.doc_id, s.source, s.n_scored, s.nll, l.ppl_bucket
    FROM scored s LEFT JOIN lab l ON s.source = l.source AND s.sq = l.sq
    """


@q("curation_ppl_buckets", oracle=_ppl_buckets_oracle())
def curation_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing per source (Wenzek
    et al. 2020 §3.3): self-trained bigram NLL as the LM score, then a
    value-granular 30/40/30 percentile cut per source — the corpus-
    sized work is one histogram groupBy; the cumulative pass runs on
    the histogram only and labels return by broadcast join
    (operators/curation.py ppl_buckets)."""
    from rheoceros_spark.operators.curation import ppl_buckets
    from rheoceros_spark.operators.text_analysis import bigram_nll

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    nll = bigram_nll(docs, k=0.1)
    scored = (
        docs.select("doc_id", "source").join(nll, "doc_id").localCheckpoint(eager=False)
    )
    return ppl_buckets(scored, score_col="nll", group_col="source").select(
        "doc_id", "source", "n_scored", "nll", "ppl_bucket"
    )


def _lang_classifier_oracle(
    n_buckets: int = 64,
    iters: int = 2,
    lr: float = 2.0,
    train_frac: float | None = None,
    sample_seed: int = 0,
    ngram_range: tuple[int, int] | None = None,
) -> str:
    """The full multiclass softmax-LR training loop + argmax scorer in
    SQL: L1-normalized hashed integer features, broadcast-LUT exp (no
    libm ``exp``), exact BIGINT logit/gradient sums on the 1e-11 grid,
    integer softmax ratios (all operands non-negative, so Spark ``div``
    ≡ DuckDB ``//``), floor-requantized updates — reproduces
    operators/text_analysis.py lang_classifier_train +
    lang_classifier_score bit-for-bit.  ``train_frac`` replays the
    deterministic-hash training-sample gate (_train_sample_gate) on
    the training CTE only — the scoring pass below stays corpus-wide,
    mirroring the CCNet train-on-sample/score-the-crawl split."""
    from rheoceros_spark.functions.portable import h64_sql
    from rheoceros_spark.operators.curation import SAMPLE_BUCKETS
    from rheoceros_spark.operators.text_analysis import (
        EXP_CLAMP_Q,
        FEAT_NORM_SCALE,
        exp_lut_q,
    )

    lut = "[" + ", ".join(str(v) for v in exp_lut_q()) + "]"
    off = EXP_CLAMP_Q + 1
    hk = h64_sql("t", seed="'0'")
    # word tokens, or the fastText subword feature-string list — the
    # SAME strings text_analysis._feature_strings hashes on the Spark
    # side, so subword mode changes what is hashed and nothing else
    tsrc = (
        _TOK
        if ngram_range is None
        else _subword_feats_sql(_TOK, ngram_range[0], ngram_range[1])
    )
    gate = ""
    if train_frac is not None:
        hs = h64_sql("CAST(doc_id AS VARCHAR)", seed=f"'{sample_seed}'")
        thr = round(train_frac * SAMPLE_BUCKETS)
        gate = f" AND {hs} % {SAMPLE_BUCKETS} < {thr}"
    ctes = [
        f"""docs0 AS (
      SELECT doc_id, text, lang FROM documents
      WHERE doc_id IS NOT NULL AND lang IS NOT NULL{gate}
    )""",
        f"""rawf AS (
      SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt FROM (
        SELECT doc_id, CAST({hk} % {n_buckets} AS INT) AS bucket FROM (
          SELECT doc_id, unnest({tsrc}) AS t FROM docs0 WHERE text IS NOT NULL
        ) WHERE t <> ''
      ) GROUP BY doc_id, bucket
    )""",
        f"""feats AS (
      SELECT doc_id, bucket,
             CAST(cnt * {FEAT_NORM_SCALE} // sum(cnt) OVER (PARTITION BY doc_id)
                  AS BIGINT) AS cnt_q
      FROM rawf
      UNION ALL
      SELECT doc_id, CAST(-1 AS INT) AS bucket,
             CAST({FEAT_NORM_SCALE} AS BIGINT) AS cnt_q
      FROM docs0
    )""",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM docs0)",
        """cls AS (SELECT DISTINCT lang AS class FROM docs0)""",
        f"""w0 AS (
      SELECT c.class, CAST(unnest(range(-1, {n_buckets})) AS INT) AS bucket,
             CAST(0 AS BIGINT) AS wq
      FROM cls c
    )""",
    ]
    prev = "w0"
    eq = (
        f"({lut})[CAST(greatest(-{EXP_CLAMP_Q}, least({EXP_CLAMP_Q}, "
        f"CAST(floor((CAST(lq AS DOUBLE) / 1e11) * 100.0) AS BIGINT))) + {off} AS INT)]"
    )
    for i in range(1, iters + 1):
        ctes.append(f"""l{i} AS (
      SELECT f.doc_id, w.class, CAST(sum(w.wq * f.cnt_q) AS BIGINT) AS lq
      FROM feats f JOIN {prev} w USING (bucket) GROUP BY f.doc_id, w.class
    )""")
        ctes.append(f"""p{i} AS (
      SELECT doc_id, class,
             CAST(eq * 10000000 // sum(eq) OVER (PARTITION BY doc_id)
                  AS BIGINT) AS pq
      FROM (SELECT doc_id, class, {eq} AS eq FROM l{i})
    )""")
        ctes.append(f"""r{i} AS (
      SELECT p.doc_id, p.class,
             CAST(p.pq - CASE WHEN d.lang = p.class THEN 10000000 ELSE 0 END
                  AS BIGINT) AS rq
      FROM p{i} p JOIN docs0 d USING (doc_id)
    )""")
        ctes.append(f"""g{i} AS (
      SELECT r.class, f.bucket, CAST(sum(r.rq * f.cnt_q) AS BIGINT) AS gq
      FROM r{i} r JOIN feats f USING (doc_id) GROUP BY r.class, f.bucket
    )""")
        ctes.append(f"""w{i} AS (
      SELECT w.class, w.bucket,
             CAST(w.wq - CAST(floor((CAST(coalesce(g.gq, 0) AS DOUBLE) * {lr!r})
                              / (nn.n * {FEAT_NORM_SCALE}))
                         AS BIGINT) AS BIGINT) AS wq
      FROM {prev} w LEFT JOIN g{i} g USING (class, bucket) CROSS JOIN nn
    )""")
        prev = f"w{i}"
    return f"""
    WITH {', '.join(ctes)}, alldocs AS (
      SELECT doc_id, text FROM documents WHERE doc_id IS NOT NULL
    ), rawall AS (
      SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt FROM (
        SELECT doc_id, CAST({hk} % {n_buckets} AS INT) AS bucket FROM (
          SELECT doc_id, unnest({tsrc}) AS t FROM alldocs WHERE text IS NOT NULL
        ) WHERE t <> ''
      ) GROUP BY doc_id, bucket
    ), featall AS (
      SELECT doc_id, bucket,
             CAST(cnt * {FEAT_NORM_SCALE} // sum(cnt) OVER (PARTITION BY doc_id)
                  AS BIGINT) AS cnt_q
      FROM rawall
      UNION ALL
      SELECT doc_id, CAST(-1 AS INT) AS bucket,
             CAST({FEAT_NORM_SCALE} AS BIGINT) AS cnt_q
      FROM alldocs
    ), sf AS (
      SELECT f.doc_id, w.class, CAST(sum(w.wq * f.cnt_q) AS BIGINT) AS lq
      FROM featall f JOIN {prev} w USING (bucket) GROUP BY f.doc_id, w.class
    )
    SELECT doc_id, class AS pred_lang, lq AS logit_q FROM (
      SELECT doc_id, class, lq,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY lq DESC, class ASC) AS rn
      FROM sf
    ) WHERE rn = 1
    """


#: subword feature range for the trained lang classifier — fastText
#: lang-id's accuracy on short/agglutinative text comes from char
#: n-grams (Bojanowski et al. 2017; lid.176 uses 2–4); (2, 3) keeps
#: the feature stream ~12× words, bounded further by sampled training
_LANG_CLF_NGRAMS = (2, 3)
_LANG_CLF_TRAIN_FRAC = 0.5


@q(
    "text_lang_classifier",
    oracle=_lang_classifier_oracle(
        train_frac=_LANG_CLF_TRAIN_FRAC, ngram_range=_LANG_CLF_NGRAMS
    ),
)
def text_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED language identification (CCNet replaces marker
    heuristics with a learned fastText classifier, Wenzek et al. 2020
    §3.2): distributed multiclass softmax LR over L1-normalized hashed
    SUBWORD features (word tokens + boundary-marked char 2–3-grams,
    the fastText scheme — word hashes alone under-detect short text),
    trained on the deterministic-hash 50% sample and argmax-scored
    corpus-wide — the same broadcast-LUT / exact-integer discipline
    that made the binary quality classifier and k-means bit-exact
    across engines (operators/text_analysis.py lang_classifier_train /
    lang_classifier_score).  r10 upgraded this staged query from
    word-features/full-corpus training; BASELINE.md §2b re-records its
    baseline accordingly."""
    from rheoceros_spark.operators.text_analysis import (
        lang_classifier_score,
        lang_classifier_train,
    )

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    w = lang_classifier_train(
        docs, "lang", n_buckets=64, iters=2, lr=2.0,
        train_frac=_LANG_CLF_TRAIN_FRAC, ngram_range=_LANG_CLF_NGRAMS,
    )
    return lang_classifier_score(
        docs, w, n_buckets=64, ngram_range=_LANG_CLF_NGRAMS
    )


#: training-sample fraction for the CCNet pipeline's classifier stage —
#: the Wenzek et al. §3.2 shape (train on a fixed sample, score the
#: crawl); 50% keeps every sf0.01 language class populated while
#: exercising the deterministic-hash gate in both engines
_CCNET_TRAIN_FRAC = 0.5


def _ccnet_pipeline_oracle(head_pct: int = 30, tail_pct: int = 30) -> str:
    """The CCNet §3 composition replayed end-to-end in DuckDB: the
    SAMPLED-training trained-lang-classifier oracle (softmax LR trained
    on the deterministic-hash _CCNET_TRAIN_FRAC slice, argmax scoring
    corpus-wide) as one subquery, the self-trained bigram-NLL chain as
    another, then the value-granular head/middle/tail percentile cut
    PER PREDICTED LANGUAGE and the head+middle keep — every stage the
    already-certified oracle of its standalone query, plus the sample
    gate replayed bit-exactly."""
    lc = _lang_classifier_oracle(train_frac=_CCNET_TRAIN_FRAC).strip()
    bn = _bigram_nll_sql().strip()
    return f"""
    WITH lc AS ({lc}
    ), bn AS ({bn}
    ), scored AS (
      SELECT c.doc_id, c.pred_lang, b.n_scored, b.nll,
             CAST(round(b.nll * 1e6) AS BIGINT) AS sq
      FROM lc c JOIN bn b USING (doc_id)
    ), {_ppl_cut_sql("pred_lang", head_pct, tail_pct)}
    SELECT s.doc_id, s.pred_lang, s.n_scored, s.nll, l.ppl_bucket
    FROM scored s JOIN lab l ON s.pred_lang = l.pred_lang AND s.sq = l.sq
    WHERE l.ppl_bucket IN ('head', 'middle')
    """


@q("pipeline_ccnet_corpus", oracle=_ccnet_pipeline_oracle())
def pipeline_ccnet_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet monolingual-corpus pipeline (Wenzek et al. 2020 §3) as
    ONE query: trained language classification (multiclass softmax LR,
    §3.2's fastText role) → self-trained bigram-LM fluency scoring →
    head/middle/tail perplexity cut PER PREDICTED LANGUAGE (§3.3) →
    keep head+middle.  The composition certificate for the trained-
    model curation path, the way pipeline_pretrain_corpus certifies
    the heuristic-gate path.

    Scale shape is the sum of certified parts, with the training stage
    BOUNDED: the classifier trains on the deterministic-hash
    _CCNET_TRAIN_FRAC sample (broadcast weight joins + two
    sample-linear shuffles per round — the Wenzek §3.2
    train-on-sample/score-the-crawl split; at a real 100 TB run the
    fraction is set to budget_rows/corpus_rows so the training read is
    a fixed absolute budget), one corpus-wide
    argmax scoring pass, the wordcount-shaped bigram chain, ONE
    (lang, score) histogram groupBy for the cut — nothing quadratic,
    nothing corpus-sized on the driver."""
    from rheoceros_spark.operators.curation import ppl_buckets
    from rheoceros_spark.operators.text_analysis import (
        bigram_nll,
        lang_classifier_score,
        lang_classifier_train,
    )

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    w = lang_classifier_train(
        docs, "lang", n_buckets=64, iters=2, lr=2.0,
        train_frac=_CCNET_TRAIN_FRAC,
    )
    pred = lang_classifier_score(docs, w, n_buckets=64).select(
        "doc_id", "pred_lang"
    )
    nll = bigram_nll(docs, k=0.1)
    # one checkpoint at the dual-consumer frame (histogram + label
    # join), the pipeline_pretrain_corpus convention
    scored = pred.join(nll, "doc_id").localCheckpoint(eager=False)
    return (
        ppl_buckets(scored, score_col="nll", group_col="pred_lang")
        .where(F.col("ppl_bucket").isin("head", "middle"))
        .select("doc_id", "pred_lang", "n_scored", "nll", "ppl_bucket")
    )


# ---------------------------------------------------------------------------
# corpus-QA + diagnostics family (round 11 session 2, staged for r13):
# the datasheet rollup, snapshot drift monitoring, the SemDeDup
# keep-list, and the join-key skew profiler
# ---------------------------------------------------------------------------


def _corpus_datasheet_oracle() -> str:
    return f"""
    WITH d AS (
      SELECT coalesce(CAST(source AS VARCHAR), '(null)') AS source,
             coalesce(lang, '(null)') AS lang2,
             md5({_NORM}) AS fp,
             CASE WHEN text IS NULL OR length({_NORM}) = 0 THEN 0 ELSE 1 END AS ne,
             CASE WHEN text IS NULL OR length({_NORM}) = 0
                  THEN 0 ELSE len({_TOK}) END AS ntok,
             coalesce(length(text), 0) AS nchars
      FROM documents
    ), base AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(1 - ne) AS BIGINT) AS n_empty,
             CAST(sum(ntok) AS BIGINT) AS total_tokens,
             CAST(sum(nchars) AS BIGINT) AS total_chars,
             CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct
      FROM d GROUP BY source
    ), langs AS (
      SELECT source, lang2, CAST(count(*) AS BIGINT) AS cnt
      FROM d GROUP BY source, lang2
    ), nl AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_langs FROM langs GROUP BY source
    ), top AS (
      SELECT source, lang2 AS top_lang, cnt AS top_lang_docs FROM (
        SELECT source, lang2, cnt,
               row_number() OVER (PARTITION BY source
                 ORDER BY cnt DESC, lang2 ASC) AS rn
        FROM langs
      ) WHERE rn = 1
    )
    SELECT b.source, b.n_docs, b.n_empty, b.total_tokens, b.total_chars,
           b.n_distinct,
           CAST(CAST(b.n_docs - b.n_distinct AS HUGEINT) * 1000000
                // b.n_docs AS BIGINT) AS dup_rate_q,
           nl.n_langs, t.top_lang, t.top_lang_docs
    FROM base b JOIN nl USING (source) JOIN top t USING (source)
    """


@q("curation_corpus_datasheet", oracle=_corpus_datasheet_oracle())
def curation_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasheet-for-the-corpus rollup (Gebru et al. 2021): per-source
    composition stats — doc/empty counts, token and char volume, exact
    dedup survivor count with quantized dup rate, language mix and the
    dominant language (operators/curation.py corpus_datasheet; three
    map-side-combined corpus-linear aggregates, 32-byte fingerprints
    shuffle but text never does)."""
    from rheoceros_spark.operators.curation import corpus_datasheet

    return corpus_datasheet(load_table(spark, sf_dir, "documents"))


def _snapshot_drift_oracle(bucket_width: int = 10, max_bucket: int = 20) -> str:
    return f"""
    WITH d AS (
      SELECT doc_id % 3 AS snap,
             CAST(least(CASE WHEN text IS NULL OR length({_NORM}) = 0
                             THEN 0 ELSE len({_TOK}) END
                        // {bucket_width}, {max_bucket}) AS VARCHAR) AS len_bucket,
             coalesce(lang, '(null)') AS lang2
      FROM documents WHERE doc_id IS NOT NULL
    ), unp AS (
      SELECT snap, 'len_bucket' AS feature, len_bucket AS value FROM d
      UNION ALL SELECT snap, 'lang' AS feature, lang2 AS value FROM d
    ), hist AS (
      SELECT snap, feature, value, CAST(count(*) AS BIGINT) AS cnt
      FROM unp GROUP BY snap, feature, value
    ), j AS (
      SELECT coalesce(a.snap, b.snap - 1) AS snap_a,
             coalesce(a.feature, b.feature) AS feature,
             coalesce(a.cnt, 0) AS a, coalesce(b.cnt, 0) AS b
      FROM hist a FULL OUTER JOIN hist b
        ON a.snap = b.snap - 1 AND a.feature = b.feature AND a.value = b.value
    )
    SELECT snap_a, CAST(snap_a + 1 AS BIGINT) AS snap_b, feature,
           CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b,
           CAST(sum(CASE WHEN a > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_values_a,
           CAST(sum(CASE WHEN b > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_values_b,
           CAST(sum(CAST(a - b AS HUGEINT) * (a - b) * 1000000
                    // (a + b)) AS BIGINT) AS chi2_q
    FROM j
    WHERE snap_a IN (SELECT snap FROM d)
      AND snap_a + 1 IN (SELECT snap FROM d)
    GROUP BY snap_a, feature
    """


@q("curation_snapshot_drift", oracle=_snapshot_drift_oracle())
def curation_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between consecutive crawl snapshots (doc_id%3
    as the snapshot key, the dedup_snapshot_scoped fixture convention):
    per (snapshot pair, feature) the ×1e6-quantized chi-square drift
    statistic over the length-bucket and language histograms — the
    corpus-QA gate a rolling pipeline runs before admitting a new
    crawl (operators/curation.py snapshot_drift; ONE corpus-linear
    unpivoted groupBy, everything after is histogram-sized; the
    polynomial chi-square form avoids the data-dependent-log libm seam
    PSI/KL would open)."""
    from rheoceros_spark.operators.curation import snapshot_drift

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id").isNotNull())
        .withColumn("snapshot", F.col("doc_id") % 3)
    )
    return snapshot_drift(docs)


def _semantic_keep_oracle(k: int = 8, iters: int = 2, threshold: float = 0.4) -> str:
    ctes, cfinal = _lloyd_ctes(k, iters)
    ctes.append(f"""assigned AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_cos_sql('e.embedding', 'c.cv')} DESC, c.cid) AS rn
        FROM emb e, {cfinal} c
      ) WHERE rn = 1
    )""")
    ctes.append(f"""pairs AS (
      SELECT a, b FROM (
        SELECT x.vec_id AS a, y.vec_id AS b,
               {_cos_sql('x.embedding', 'y.embedding')} AS cos
        FROM assigned x JOIN assigned y
          ON x.cell = y.cell AND x.vec_id < y.vec_id
      ) WHERE cos >= {threshold}
    )""")
    ctes.append("""edges AS (
      SELECT a AS u, b AS v FROM pairs
      UNION SELECT b AS u, a AS v FROM pairs
    )""")
    ctes.append("""reach(u, v) AS (
      SELECT u, v FROM edges
      UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )""")
    ctes.append("""clusters AS (
      SELECT u AS vec_id, least(u, min(v)) AS cluster_id
      FROM reach GROUP BY u
    )""")
    return f"""
    WITH RECURSIVE {', '.join(ctes)}
    SELECT e.vec_id,
           coalesce(c.cluster_id, e.vec_id) AS keep_id,
           coalesce(c.cluster_id, e.vec_id) <> e.vec_id AS is_dup
    FROM emb e LEFT JOIN clusters c USING (vec_id)
    """


@q("dedup_semantic_keep", oracle=_semantic_keep_oracle())
def dedup_semantic_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup's actionable output (Abbas et al. 2023 §3): semantic
    near-dup pairs from trained k-means cells → connected components →
    one exemplar per cluster, as a per-document (keep_id, is_dup)
    frame — the learned-cell complement of dedup_keep_list's
    MinHash-blocked pipeline (operators/dedup.py semantic_keep_list)."""
    from rheoceros_spark.operators.dedup import semantic_keep_list

    return semantic_keep_list(
        load_table(spark, sf_dir, "embeddings"), threshold=0.4, k=8, iters=2
    )


def _skew_report_oracle(top: int = 10) -> str:
    return f"""
    WITH counts AS (
      SELECT CAST(l_suppkey AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1
    ), totals AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(cnt) AS BIGINT) AS max_cnt
      FROM counts
    ), head AS (
      SELECT key, cnt, CAST(rn AS INT) AS rank FROM (
        SELECT key, cnt,
               row_number() OVER (ORDER BY cnt DESC, key ASC NULLS FIRST) AS rn
        FROM counts
      ) WHERE rn <= {top}
    )
    SELECT h.key, h.cnt, h.rank,
           CAST(h.cnt * 1000000 // t.n_rows AS BIGINT) AS share_q,
           t.n_rows, t.n_keys,
           CAST(CAST(t.max_cnt AS HUGEINT) * t.n_keys * 1000000
                // t.n_rows AS BIGINT) AS skew_q
    FROM head h CROSS JOIN totals t
    """


@q("scale_skew_report", oracle=_skew_report_oracle())
def scale_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler over lineitem's supplier key — the
    measurement that decides whether salting / AQE skew-split pays
    BEFORE the shuffle hits one reducer (operators/scale.py
    skew_report; one map-side-combined count shuffle, the head via
    TakeOrderedAndProject so a near-unique key never funnels the keys
    frame through one reducer)."""
    from rheoceros_spark.operators.scale import skew_report

    return skew_report(load_table(spark, sf_dir, "lineitem"), "l_suppkey", top=10)


# ---------------------------------------------------------------------------
# mixture / audit family (round 11 session 3, staged for r14):
# temperature-smoothed multilingual sampling, SIF-weighted hash
# embeddings, the cross-document n-gram memorization audit, and the
# character-entropy gibberish gate
# ---------------------------------------------------------------------------


def _temperature_mix_oracle(
    alpha: float = 0.3125, target_frac: float = 0.5
) -> str:
    """operators/curation.py temperature_mix_plan + the hash gate
    reproduced: n_g^α as the identical sqrt composition (α on the 1/16
    grid — libm pow is refused per the source_mixture_weights rule),
    quantized to exact 1e-6 BIGINTs BEFORE the normalization sum
    (addition-order free), the rate expression in the identical IEEE
    order, the shared _SAMPLE_BUCKET gate."""
    from rheoceros_spark.operators.curation import sqrt_pow_sql

    pa = sqrt_pow_sql("CAST(n_docs AS DOUBLE)", round(alpha * 16))
    return f"""
    WITH c AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL
      GROUP BY source
    ), p AS (
      SELECT source, n_docs,
             CAST(floor(({pa}) * 1000000 + 0.5)
                  AS BIGINT) AS pa_q
      FROM c
    ), t AS (
      SELECT sum(pa_q) AS sa, sum(n_docs) AS nn FROM p
    ), plan AS (
      SELECT p.source, p.n_docs,
             CAST(floor(least(1.0,
               {target_frac} * CAST(t.nn AS DOUBLE) * CAST(p.pa_q AS DOUBLE)
               / CAST(t.sa AS DOUBLE) / CAST(p.n_docs AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT) AS rate_q
      FROM p, t
    ), s AS (
      SELECT d.source, CAST(count(*) AS BIGINT) AS n_sampled
      FROM documents d JOIN plan ON d.source = plan.source
      WHERE d.doc_id IS NOT NULL AND ({_SAMPLE_BUCKET}) < plan.rate_q
      GROUP BY d.source
    )
    SELECT plan.source, plan.n_docs, plan.rate_q,
           coalesce(s.n_sampled, 0) AS n_sampled
    FROM plan LEFT JOIN s USING (source)
    """


@q("curation_temperature_mix", oracle=_temperature_mix_oracle())
def curation_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed mixture sampling (XLM-R §3.1 / mT5 §3.2's
    q_g ∝ p_g^α — the low-resource upsampling every multilingual
    pretraining mix applies): the per-source keep-rate plan from ONE
    groups-sized count aggregate, then the deterministic hash gate
    drawn through a broadcast of that plan (operators/curation.py
    temperature_mix).  Output: the plan plus the achieved per-group
    sample counts — corpus scanned twice, shuffled never."""
    from rheoceros_spark.operators.curation import (
        temperature_mix,
        temperature_mix_plan,
        trust_mix_plan,
    )

    docs = load_table(spark, sf_dir, "documents")
    # the checkpoint wrapper is a new frame, so by-construction trust
    # doesn't carry over — assert provenance explicitly (plan built
    # one line up with one parameter set) to skip the one-time
    # mixed-stamp validation job
    plan = trust_mix_plan(
        temperature_mix_plan(
            docs, group_col="source", alpha=0.3125, target_frac=0.5
        ).localCheckpoint(eager=False)
    )
    sampled = temperature_mix(docs, group_col="source", seed=0, plan=plan)
    achieved = sampled.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sampled")
    )
    return plan.join(achieved, "source", "left").select(
        "source",
        "n_docs",
        "rate_q",
        F.coalesce(F.col("n_sampled"), F.lit(0).cast("bigint")).alias("n_sampled"),
    )


def _sif_embed_topk_oracle(
    dim: int = 32, vocab_size: int = 32, query_id: int = 0, k: int = 10
) -> str:
    """operators/text_analysis.py sif_embed (normalize=False) + brute
    cosine_topk reproduced: wordcount → top-V head by (count desc,
    token asc) → SIF weights a/(a+p) quantized to micro-unit BIGINTs in
    the identical IEEE expression order, tail weight exactly 1e6, then
    the hash_embed sign folds with each token's contribution scaled by
    its weight, and the standard ordered-fold cosine rank."""
    th = _H64.format(s="'0:' || t")
    return f"""
    WITH cn AS (
      SELECT t AS token, CAST(count(*) AS BIGINT) AS cnt
      FROM documents, unnest(list_filter({_TOK}, t -> t <> '')) AS u(t)
      WHERE doc_id IS NOT NULL AND text IS NOT NULL
      GROUP BY t
    ), tot AS (
      SELECT sum(cnt) AS total FROM cn
    ), head AS (
      SELECT token, cnt FROM (
        SELECT token, cnt,
               row_number() OVER (ORDER BY cnt DESC, token ASC) AS rn
        FROM cn
      ) WHERE rn <= {vocab_size}
    ), wm AS (
      SELECT map(list(h.token ORDER BY h.token),
                 list(CAST(floor(1e6 * (1e-3 / (1e-3 +
                        CAST(h.cnt AS DOUBLE) / CAST(t.total AS DOUBLE)))
                        + 0.5) AS BIGINT) ORDER BY h.token)) AS mp
      FROM head h, tot t
    ), hemb AS (
      SELECT doc_id AS vec_id,
        list_transform(range(0, {dim}), d -> CAST(
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(list_filter({_TOK}, t -> t <> ''),
              t -> coalesce(list_extract(map_extract(w.mp, t), 1), 1000000) *
                   (2 * (({th} >> d) & 1) - 1))),
            (acc, x) -> acc + x) AS DOUBLE)) AS embedding
      FROM documents, wm w WHERE doc_id IS NOT NULL AND text IS NOT NULL
    ), qv AS (
      SELECT embedding AS qv FROM hemb WHERE vec_id = {query_id}
    )
    SELECT vec_id, CAST(rank AS BIGINT) AS rank, round(cos, 6) AS cos_r
    FROM (
      SELECT h.vec_id, {_cos_sql('h.embedding', 'q.qv')} AS cos,
             row_number() OVER (ORDER BY {_cos_sql('h.embedding', 'q.qv')} DESC,
                                h.vec_id ASC) AS rank
      FROM hemb h, qv q WHERE h.vec_id <> {query_id}
    ) WHERE rank <= {k}
    """


@q("text_sif_embed_topk", oracle=_sif_embed_topk_oracle())
def text_sif_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIF-weighted model-free dense retrieval (Arora et al. 2017's
    a/(a+p) smooth-inverse-frequency weighting over the hash_embed sign
    projection — operators/text_analysis.py sif_embed): frequent tokens
    are downweighted from ONE wordcount aggregate (head table a plan
    literal, tail weight exactly 1.0), so the derived vectors track
    content terms instead of stopword mass, then the ANN family's brute
    cosine top-k ranks them unchanged."""
    from rheoceros_spark.operators.similarity import cosine_topk
    from rheoceros_spark.operators.text_analysis import sif_embed

    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    emb = sif_embed(docs, dim=32, vocab_size=32, a=1e-3, normalize=False)
    return cosine_topk(emb, query_id=0, k=10, id_col="doc_id").select(
        F.col("doc_id").alias("vec_id"),
        F.col("rank").cast("bigint").alias("rank"),
        "cos_r",
    )


def _ngram_hotspots_oracle(n: int = 8, min_df: int = 2, top: int = 50) -> str:
    """operators/dedup.py ngram_hotspots reproduced: per-doc DISTINCT
    full-length word n-grams (short docs contribute nothing), document
    frequency per gram, (n_docs desc, gram asc) rank cut at top."""
    tokf = f"list_filter({_TOK}, t -> t <> '')"
    grams = (
        f"CASE WHEN len({tokf}) >= {n} THEN "
        f"list_distinct(list_transform("
        f"range(1, greatest(1, len({tokf}) - {n - 1}) + 1), "
        f"i -> array_to_string(list_slice({tokf}, i, i + {n - 1}), ' '))) "
        f"ELSE [] END"
    )
    return f"""
    WITH g AS (
      SELECT doc_id, unnest({grams}) AS gram
      FROM documents WHERE doc_id IS NOT NULL
    ), c AS (
      SELECT gram, CAST(count(*) AS BIGINT) AS n_docs,
             min(doc_id) AS first_doc
      FROM g GROUP BY gram HAVING count(*) >= {min_df}
    )
    SELECT CAST(rank AS BIGINT) AS rank, gram, n_docs, first_doc FROM (
      SELECT gram, n_docs, first_doc,
             row_number() OVER (ORDER BY n_docs DESC, gram ASC) AS rank
      FROM c
    ) WHERE rank <= {top}
    """


@q("dedup_ngram_hotspots", oracle=_ngram_hotspots_oracle())
def dedup_ngram_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document n-gram memorization audit (Lee et al. 2022 /
    Carlini et al. 2022: verbatim LM memorization tracks exactly these
    repeated sequences): the word 8-grams recurring in the most
    documents, ranked — the report-side counterpart of the span-dedup
    rewriters (operators/dedup.py ngram_hotspots; the same corpus-
    linear gram shuffle shape as dedup_substring_spans)."""
    from rheoceros_spark.operators.dedup import ngram_hotspots

    return ngram_hotspots(
        load_table(spark, sf_dir, "documents"), n=8, min_df=2, top=50
    )


def _char_entropy_oracle(min_entropy_q: int = 1_500_000) -> str:
    """operators/text_analysis.py char_entropy reproduced: per-char
    histogram of the normalized text, each ln(count) quantized to an
    exact 1e-7 BIGINT before the (order-free) sum, one final 1e-6
    rounding; NULL text propagates NULL stats and keep=false."""
    return f"""
    WITH c AS (
      SELECT doc_id, {_NORM} AS s,
             list_transform(range(1, length({_NORM}) + 1),
                            i -> substr({_NORM}, i, 1)) AS chars
      FROM documents WHERE doc_id IS NOT NULL
    ), e AS (
      SELECT doc_id, length(s) AS L, chars, list_distinct(chars) AS dist
      FROM c
    ), f AS (
      SELECT doc_id, L, dist,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(
                 list_transform(dist, ch -> len(list_filter(chars, x -> x = ch))),
                 n -> CAST(n AS BIGINT) *
                      CAST(floor(ln(CAST(n AS DOUBLE)) * 1e7 + 0.5) AS BIGINT))),
               (acc, x) -> acc + x) AS sq
      FROM e
    )
    SELECT doc_id,
           CAST(L AS BIGINT) AS doc_len,
           CAST(CASE WHEN L = 0 THEN 0 ELSE len(dist) END AS BIGINT)
             AS n_char_classes,
           CASE WHEN L = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(floor((ln(CAST(L AS DOUBLE))
                       - CAST(sq AS DOUBLE) / (1e7 * CAST(L AS DOUBLE)))
                       * 1e6 + 0.5) AS BIGINT) END AS entropy_q,
           coalesce(CASE WHEN L = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(floor((ln(CAST(L AS DOUBLE))
                       - CAST(sq AS DOUBLE) / (1e7 * CAST(L AS DOUBLE)))
                       * 1e6 + 0.5) AS BIGINT) END >= {min_entropy_q},
             false) AS keep
    FROM f
    """


@q("text_char_entropy", oracle=_char_entropy_oracle())
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy gibberish gate (the crawl screen that catches
    repeated-char spam at the low end and base64/hex blobs at the high
    end — signals the word-level Gopher/C4 rules can't see): per-doc
    Shannon entropy over the normalized char histogram in exact
    quantized arithmetic, plus the keep verdict
    (operators/text_analysis.py char_entropy; pure per-row column
    algebra, zero shuffle)."""
    from rheoceros_spark.operators.text_analysis import char_entropy

    return char_entropy(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "doc_len", "n_char_classes", "entropy_q", "keep"
    )


# ---------------------------------------------------------------------------
# winnowing fingerprints + the RefinedWeb macro composition (round 11
# session 3, staged for r15)
# ---------------------------------------------------------------------------


def _winnow_pairs_oracle(
    n: int = 3, w: int = 4, min_shared: int = 2, max_bucket: int = 50
) -> str:
    """operators/dedup.py winnow_fingerprints + winnow_pairs
    reproduced: per-window gram-hash minima (position tiebreaks are
    value-irrelevant — see the operator docstring), short-doc global
    minimum, the 2..max_bucket stop-fingerprint gate, shared-count
    pair join."""
    tokf = f"list_filter({_TOK}, t -> t <> '')"
    gh = _H64.format(s="g")
    return f"""
    WITH base AS (
      SELECT doc_id, {tokf} AS tk FROM documents WHERE doc_id IS NOT NULL
    ), hs AS (
      SELECT doc_id, list_transform(
        CASE WHEN len(tk) >= {n}
          THEN list_transform(range(1, greatest(1, len(tk) - {n - 1}) + 1),
                 i -> array_to_string(list_slice(tk, i, i + {n - 1}), ' '))
          ELSE [] END,
        g -> {gh}) AS h
      FROM base
    ), sel AS (
      SELECT doc_id, unnest(
        CASE WHEN len(h) >= {w}
          THEN list_distinct(list_transform(range(1, len(h) - {w} + 2),
                 i -> list_min(list_slice(h, i, i + {w} - 1))))
          WHEN len(h) > 0 THEN [list_min(h)]
          ELSE [] END) AS fp
      FROM hs
    ), keepfp AS (
      SELECT fp FROM sel GROUP BY fp HAVING count(*) BETWEEN 2 AND {max_bucket}
    ), bounded AS (
      SELECT s.doc_id, s.fp FROM sel s JOIN keepfp USING (fp)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS shared
    FROM bounded a JOIN bounded b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= {min_shared}
    """


@q_staged("dedup_winnow_pairs", oracle=_winnow_pairs_oracle())
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing near-dup pairs (Schleimer et al. 2003, the MOSS
    fingerprinting algorithm): per-window minima of word-3-gram hashes
    — any shared run of ≥ w+n−1 = 6 words guarantees a shared
    fingerprint at ~2/(w+1) the density of the keep-every-window
    substring stream — then documents sharing ≥ 2 selected
    fingerprints, stop-fingerprints (> 50 docs) dropped before the
    join (operators/dedup.py winnow_fingerprints / winnow_pairs)."""
    from rheoceros_spark.operators.dedup import winnow_pairs

    return winnow_pairs(
        load_table(spark, sf_dir, "documents"),
        n=3, w=4, min_shared=2, max_bucket=50,
    )


def _refinedweb_pipeline_oracle() -> str:
    """The RefinedWeb-shaped macro pipeline composed from FIVE
    independently-certified stage oracles in one DuckDB statement:
    URL canonicalize + quality-survivor URL dedup
    (_dedup_exact_url_oracle's ranked CTE), domain suffix blocking
    (_url_canonical_oracle's rule), the Gopher word-count +
    symbol-ratio gates (_gopher_rules_oracle — the stop-word rule is
    certified there but never fires on the synthetic vocabulary, so
    the composition uses the gates that discriminate), the
    char-entropy keep (_char_entropy_oracle), and the temperature
    sampler (_temperature_mix_oracle's plan at α = 1/4)."""
    from rheoceros_spark.operators.curation import sqrt_pow_sql
    from rheoceros_spark.operators.urls import (
        canonical_url_duckdb_query,
        url_domain_duckdb_sql,
    )

    canon = canonical_url_duckdb_query(
        "documents", _URL_FIXTURE, keep=["doc_id", "n_chars", "source"]
    )
    blocked = " OR ".join(
        f"(domain = '{b}' OR domain LIKE '%.{b}')" for b in _URL_BLOCKED
    )
    pa = sqrt_pow_sql("CAST(n_docs AS DOUBLE)", 4)  # alpha = 1/4
    return f"""
    WITH canon AS MATERIALIZED ({canon}),
    ranked AS (
      SELECT doc_id, canonical_url, source,
             row_number() OVER (PARTITION BY canonical_url
               ORDER BY coalesce(CAST(n_chars AS DOUBLE), '-infinity'::DOUBLE) DESC,
                        doc_id ASC) AS rn
      FROM canon WHERE canonical_url IS NOT NULL),
    surv AS MATERIALIZED (
      SELECT doc_id, canonical_url, source FROM ranked WHERE rn = 1
      UNION ALL
      SELECT doc_id, canonical_url, source FROM canon WHERE canonical_url IS NULL),
    dom AS (
      SELECT s.*, {url_domain_duckdb_sql('canonical_url')} AS domain FROM surv s),
    unblocked AS (
      SELECT doc_id, source FROM dom WHERE domain IS NULL OR NOT ({blocked})),
    gop AS ({_gopher_rules_oracle()}),
    ent AS ({_char_entropy_oracle()}),
    gated AS (
      SELECT u.doc_id, u.source, ent.entropy_q
      FROM unblocked u
      JOIN gop ON u.doc_id = gop.doc_id
      JOIN ent ON u.doc_id = ent.doc_id
      WHERE gop.g_word_count = 1 AND gop.g_symbol_ratio = 1 AND ent.keep),
    c AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM gated
      WHERE source IS NOT NULL GROUP BY source),
    p AS (
      SELECT source, n_docs,
             CAST(floor(({pa}) * 1000000 + 0.5) AS BIGINT) AS pa_q FROM c),
    t AS (SELECT sum(pa_q) AS sa, sum(n_docs) AS nn FROM p),
    plan AS (
      SELECT p.source,
             CAST(floor(least(1.0,
               0.5 * CAST(t.nn AS DOUBLE) * CAST(p.pa_q AS DOUBLE)
               / CAST(t.sa AS DOUBLE) / CAST(p.n_docs AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT) AS rate_q
      FROM p, t)
    SELECT d.doc_id, d.source, d.entropy_q
    FROM gated d JOIN plan ON d.source = plan.source
    WHERE ({_SAMPLE_BUCKET}) < plan.rate_q
    """


@q_staged("pipeline_refinedweb_corpus", oracle=_refinedweb_pipeline_oracle())
def pipeline_refinedweb_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-shaped macro pipeline (Penedo et al. 2023: URL-first
    filtering, then document-wise quality rules, then sampling): URL
    canonicalize → quality-survivor URL-exact dedup → domain suffix
    blocking → Gopher word-count + symbol-ratio gates → char-entropy
    gate → temperature-mixture sampling (α = 1/4) — every stage an
    independently-certified operator, the whole chain one composed
    DuckDB oracle.

    Scale shape: the URL stage shuffles 32-byte md5 keys only; every
    quality gate is per-row column algebra in the scan stage; the
    sampler adds ONE groups-sized count aggregate and a broadcast
    plan — corpus text never shuffles anywhere in the pipeline."""
    from rheoceros_spark.operators.curation import (
        temperature_mix,
        temperature_mix_plan,
        trust_mix_plan,
    )
    from rheoceros_spark.operators.text_analysis import char_entropy, gopher_rules
    from rheoceros_spark.operators.urls import (
        dedup_exact_url,
        domain_filter,
        url_domain,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "url", F.expr(_URL_FIXTURE)
    )
    surv = url_domain(
        dedup_exact_url(docs, score_col="n_chars"), url_col="canonical_url"
    )
    unblocked = domain_filter(surv, _URL_BLOCKED)
    gated = (
        char_entropy(gopher_rules(unblocked))
        .where(
            (F.col("g_word_count") == 1)
            & (F.col("g_symbol_ratio") == 1)
            & F.col("keep")
        )
        .select("doc_id", "source", "entropy_q")
    )
    plan = trust_mix_plan(
        temperature_mix_plan(
            gated, group_col="source", alpha=0.25, target_frac=0.5
        ).localCheckpoint(eager=False)
    )
    kept = temperature_mix(gated, group_col="source", seed=0, plan=plan)
    return kept.select("doc_id", "source", "entropy_q")


def _winnow_spans_oracle(n: int = 3, min_run: int = 2) -> str:
    """operators/dedup.py winnow_match_spans reproduced over the
    certified winnow_pairs candidates: positioned grams for pair
    members only, per-pair gram equi-join, gaps-and-islands on each
    alignment diagonal, ≥min_run maximal runs."""
    tokf = f"list_filter({_TOK}, t -> t <> '')"
    return f"""
    WITH pairs AS ({_winnow_pairs_oracle()}),
    p AS (SELECT DISTINCT doc_a, doc_b FROM pairs),
    members AS (SELECT doc_a AS m FROM p UNION SELECT doc_b FROM p),
    gp AS (
      SELECT doc_id, i - 1 AS pos,
             {_H64.format(s="array_to_string(list_slice(tk, i, i + " + str(n - 1) + "), ' ')")} AS gh
      FROM (SELECT doc_id, {tokf} AS tk FROM documents
            WHERE doc_id IS NOT NULL AND doc_id IN (SELECT m FROM members)),
           unnest(range(1, greatest(1, len(tk) - {n - 1}) + 1)) AS u(i)
      WHERE len(tk) >= {n}
    ), m AS (
      SELECT p.doc_a, p.doc_b, ga.pos AS pos_a, gb.pos AS pos_b
      FROM p JOIN gp ga ON ga.doc_id = p.doc_a
             JOIN gp gb ON gb.doc_id = p.doc_b AND gb.gh = ga.gh
    ), isl AS (
      SELECT doc_a, doc_b, pos_a - pos_b AS diag,
             pos_a - row_number() OVER (
               PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a)
               AS island,
             pos_a, pos_b
      FROM m
    )
    SELECT doc_a, doc_b, CAST(min(pos_a) AS BIGINT) AS start_a,
           CAST(min(pos_b) AS BIGINT) AS start_b,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(*) + {n - 1} AS BIGINT) AS n_words
    FROM isl GROUP BY doc_a, doc_b, diag, island
    HAVING count(*) >= {min_run}
    """


@q_staged("dedup_winnow_spans", oracle=_winnow_spans_oracle())
def dedup_winnow_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHAT the matched near-dup pairs actually share — the MOSS
    user-facing report: maximal runs of consecutive identical word
    3-grams per candidate pair (diagonal gaps-and-islands over a
    per-pair gram equi-join; the corpus scan prunes to pair members,
    so alignment cost is bounded by the matches, never corpus-sized)
    (operators/dedup.py winnow_match_spans over winnow_pairs'
    candidates)."""
    from rheoceros_spark.operators.dedup import winnow_match_spans, winnow_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = winnow_pairs(docs, n=3, w=4, min_shared=2, max_bucket=50)
    return winnow_match_spans(docs, pairs, n=3, min_run=2)


def _epoch_plan_oracle(
    budget: int = 45_000, k16: int = 2, max_epochs_q: int = 2_000_000
) -> str:
    """operators/curation.py epoch_plan reproduced: exact per-group
    token sums, share^α as the identical sqrt composition (α = k16/16)
    quantized to 1e-12 BIGINTs before the normalization sum, targets /
    epochs / cap / drawn in the same fixed IEEE order."""
    from rheoceros_spark.operators.curation import sqrt_pow_sql

    pa = sqrt_pow_sql("share", k16)
    return f"""
    WITH perdoc AS (
      SELECT lang AS grp,
             CASE WHEN length({_NORM}) = 0 THEN 0 ELSE len({_TOK}) END AS n_tokens
      FROM documents WHERE lang IS NOT NULL),
    per AS (
      SELECT grp, CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM perdoc
      GROUP BY grp HAVING sum(n_tokens) > 0),
    t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM per),
    s AS (SELECT grp, n_tokens,
                 CAST(n_tokens AS DOUBLE) / CAST(t.tot AS DOUBLE) AS share
          FROM per, t),
    wq AS (SELECT grp, n_tokens,
                  CAST(floor(({pa}) * 1e12 + 0.5) AS BIGINT) AS wq FROM s),
    ws AS (SELECT sum(wq) AS wsum FROM wq),
    plan AS (
      SELECT grp, n_tokens, wq, ws.wsum,
             CAST(floor({float(budget)} *
               (CAST(wq AS DOUBLE) / CAST(ws.wsum AS DOUBLE))) AS BIGINT)
               AS target_tokens
      FROM wq, ws),
    e AS (
      SELECT *, CAST(floor(CAST(target_tokens AS DOUBLE) * 1e6
                 / CAST(n_tokens AS DOUBLE)) AS BIGINT) AS eq
      FROM plan)
    SELECT grp AS lang, n_tokens,
           round(CAST(wq AS DOUBLE) / CAST(wsum AS DOUBLE), 6) AS mix_weight,
           target_tokens,
           least(eq, {max_epochs_q}) AS epochs_q,
           eq > {max_epochs_q} AS capped,
           CASE WHEN eq > {max_epochs_q}
                THEN CAST(floor(CAST(n_tokens AS DOUBLE) * {float(max_epochs_q)}
                          / 1e6) AS BIGINT)
                ELSE target_tokens END AS drawn_tokens
    FROM e
    """


@q_staged("curation_epoch_plan", oracle=_epoch_plan_oracle())
def curation_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language epoch table for a fixed token budget (The Pile
    Table 1 / LLaMA Table 1 / MassiveText A3.1 — the published
    planning artifact of every pretraining mix): α = 1/8 temperature
    weights (sqrt-composed, engine-exact) over exact per-group token
    sums, targets and micro-epochs with the ≤2-epoch repeat cap
    (Muennighoff et al. 2023), capped groups reporting their
    actually-drawn tokens (operators/curation.py epoch_plan; ONE
    groups-sized aggregate, zero corpus shuffle)."""
    from rheoceros_spark.functions.portable import normalize_text, tokens
    from rheoceros_spark.operators.curation import epoch_plan

    docs = load_table(spark, sf_dir, "documents")
    ntok = F.when(F.length(normalize_text(F.col("text"))) == 0, F.lit(0)).otherwise(
        F.size(tokens(F.col("text")))
    )
    perdoc = docs.select("lang", ntok.alias("n_tokens"))
    return epoch_plan(
        perdoc,
        budget_tokens=45_000,
        group_col="lang",
        alpha=2 / 16,
        max_epochs_q=2_000_000,
    )


# ---------------------------------------------------------------------------
# HTML extraction family (round 12, staged for r16): the crawl
# pipeline's true stage 0 — WARC record demux (sources/warc.py, tested
# on real byte streams) feeds HTML→main-content extraction
# (operators/html.py, jusText-style block rules as pure column
# algebra).  The documents table carries no markup, so a deterministic
# HTML page is derived from (doc_id, text) — IDENTICAL SQL in both
# engines, the _URL_FIXTURE discipline — exercising every rule:
# script/style/comment subtrees, uppercase tags, a link-dense nav and
# footer, entity soup, multi-paragraph segmentation from the text, a
# prose-embedded anchor, NULL pages.
# ---------------------------------------------------------------------------

_HTML_FIXTURE = """(CASE WHEN doc_id % 59 = 0 THEN NULL ELSE
  '<!DOCTYPE html><HTML><head><title>Doc ' || CAST(doc_id AS STRING) || '</title>'
  || '<style>body { color: #333; }</style>'
  || '<script>var tracker = "' || CAST(doc_id % 97 AS STRING) || '";</script></head><body>'
  || '<div id="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></div>'
  || (CASE WHEN doc_id % 7 = 0 THEN '<!-- build ' || CAST(doc_id AS STRING) || ' -->' ELSE '' END)
  || '<h1>Doc ' || CAST(doc_id % 100 AS STRING) || '</h1>'
  || '<p>' || replace(coalesce(text, ''), ' table ', ' table</p><p>') || '</p>'
  || (CASE WHEN doc_id % 5 = 0 THEN '<p>Q &amp; A &lt;markup&gt;&nbsp;entities decode inside this extra paragraph block.</p>' ELSE '' END)
  || (CASE WHEN doc_id % 3 = 0 THEN '<p>Continue reading <a href="/more">the full archived story</a> with extra surrounding words here.</p>' ELSE '' END)
  || (CASE WHEN doc_id % 11 = 0 THEN '<pre>code sample block</pre>' ELSE '' END)
  || '<footer><a href="/terms">Terms</a> | <a href="/privacy">Privacy</a></footer></body></HTML>'
END)"""


def _html_extract_oracle() -> str:
    from rheoceros_spark.operators.html import html_extract_duckdb_sql

    e = html_extract_duckdb_sql("html")
    return f"""
    -- MATERIALIZED: the block-stats expression references __blocks
    -- repeatedly; DuckDB CTE inlining would re-expand the whole regex
    -- chain per reference (the canonical-URL oracle lesson)
    WITH src AS MATERIALIZED (
      SELECT doc_id, {_HTML_FIXTURE} AS html FROM documents
    ), s AS MATERIALIZED (
      SELECT doc_id, {e['blocks']} AS __blocks FROM src
    ), k AS MATERIALIZED (
      SELECT doc_id, __blocks, {e['kept']} AS __kept FROM s
    )
    SELECT doc_id, {e['text']} AS text,
           CAST(len(__blocks) AS BIGINT) AS n_blocks,
           CAST(len(__kept) AS BIGINT) AS n_kept,
           CAST(length({e['text']}) AS BIGINT) AS n_chars
    FROM k
    """


@q_staged("text_html_extract", oracle=_html_extract_oracle())
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → main-content text (operators/html.py html_extract_text —
    jusText-style block classification: subtree drops, sentinel-marked
    link density, block segmentation, entity decode, integer-exact
    prose rules).  Entirely row-local — zero shuffle at any corpus
    size; extraction is the dominant-cost stage of a real crawl
    pipeline (RefinedWeb §3) and this plan scales embarrassingly."""
    from rheoceros_spark.operators.html import html_extract_text

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "html", F.expr(_HTML_FIXTURE)
    )
    return html_extract_text(docs.select("doc_id", "html")).select(
        "doc_id", "text", "n_blocks", "n_kept", "n_chars"
    )


#: deterministic repeated-line fixture: a nav line bracketing the
#: line-ified text (guaranteed duplicate), a whitespace variant every
#: 6th doc (same match key — must drop), blank tail lines every 9th
_LINES_FIXTURE = """('Nav Home About Contact' || chr(10) ||
  replace(replace(coalesce(text, ''), ' table ', '.' || chr(10) || 'table '),
          ' query ', '?' || chr(10) || 'query ')
  || chr(10) || 'Nav Home About Contact'
  || (CASE WHEN doc_id % 6 = 0 THEN chr(10) || 'Nav  Home About Contact' ELSE '' END)
  || (CASE WHEN doc_id % 9 = 0 THEN chr(10) || chr(10) || '   ' ELSE '' END))"""


def _intradoc_lines_oracle() -> str:
    from rheoceros_spark.operators.dedup import intradoc_line_dedup_duckdb_sql

    e = intradoc_line_dedup_duckdb_sql("page")
    return f"""
    WITH src AS MATERIALIZED (
      SELECT doc_id, {_LINES_FIXTURE} AS page FROM documents
    ), a AS MATERIALIZED (
      SELECT doc_id, {e['lines']} AS __lines FROM src
    ), b AS MATERIALIZED (
      SELECT doc_id, __lines, {e['keys']} AS __keys FROM a
    ), c AS MATERIALIZED (
      SELECT doc_id, __lines, __keys, {e['kept_idx']} AS __kept_idx FROM b
    )
    SELECT doc_id, {e['clean_text']} AS clean_text,
           CAST({e['n_lines']} AS BIGINT) AS n_lines,
           CAST({e['n_kept']} AS BIGINT) AS n_kept,
           CAST({e['n_lines']} - {e['n_kept']} AS BIGINT) AS n_dup_lines
    FROM c
    """


@q_staged("dedup_intradoc_lines", oracle=_intradoc_lines_oracle())
def dedup_intradoc_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document repeated-line removal (operators/dedup.py
    intradoc_line_dedup — the intra-document complement of the
    cross-document paragraph dedup; C4-style self-cleaning applied
    before page rules).  First-occurrence winner per whitespace-
    normalized line key, byte-exact survivor reassembly.  Row-local
    array HOFs, zero shuffle at 100 TB."""
    from rheoceros_spark.operators.dedup import intradoc_line_dedup

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "page", F.expr(_LINES_FIXTURE)
    )
    return intradoc_line_dedup(
        docs.select("doc_id", "page"), text_col="page"
    ).select("doc_id", "clean_text", "n_lines", "n_kept", "n_dup_lines")


def _refinedweb_html_oracle(min_words: int = 20) -> str:
    from rheoceros_spark.operators.dedup import intradoc_line_dedup_duckdb_sql
    from rheoceros_spark.operators.html import html_extract_duckdb_sql

    e = html_extract_duckdb_sql("html")
    d = intradoc_line_dedup_duckdb_sql("etext")
    words = (
        "CASE WHEN length(trim(regexp_replace(clean_text, '[ \\n]+', ' ', 'g'))) = 0 "
        "THEN 0 ELSE len(string_split(trim(regexp_replace(clean_text, "
        "'[ \\n]+', ' ', 'g')), ' ')) END"
    )
    return f"""
    WITH src AS MATERIALIZED (
      SELECT doc_id, {_HTML_FIXTURE} AS html FROM documents
    ), s AS MATERIALIZED (
      SELECT doc_id, {e['blocks']} AS __blocks FROM src
    ), k AS MATERIALIZED (
      SELECT doc_id, __blocks, {e['kept']} AS __kept FROM s
    ), ex AS MATERIALIZED (
      SELECT doc_id, {e['text']} AS etext,
             CAST(len(__kept) AS BIGINT) AS n_kept_blocks
      FROM k
    ), a AS MATERIALIZED (
      SELECT doc_id, n_kept_blocks, {d['lines']} AS __lines FROM ex
    ), b AS MATERIALIZED (
      SELECT doc_id, n_kept_blocks, __lines, {d['keys']} AS __keys FROM a
    ), c AS MATERIALIZED (
      SELECT doc_id, n_kept_blocks, __lines, __keys,
             {d['kept_idx']} AS __kept_idx FROM b
    ), fin AS MATERIALIZED (
      SELECT doc_id, n_kept_blocks,
             {d['clean_text']} AS clean_text,
             CAST({d['n_lines']} - {d['n_kept']} AS BIGINT) AS n_dup_lines
      FROM c
    )
    SELECT doc_id, clean_text AS text, n_kept_blocks, n_dup_lines,
           CAST({words} AS BIGINT) AS n_words
    FROM fin WHERE {words} >= {min_words}
    """


@q_staged("pipeline_refinedweb_html", oracle=_refinedweb_html_oracle())
def pipeline_refinedweb_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RefinedWeb composition FROM MARKUP — what
    pipeline_refinedweb_corpus assumes already happened: HTML →
    main-content extraction (jusText block rules) → within-document
    repeated-line self-dedup → minimum-content word gate, three
    certified stage oracles composed in ONE DuckDB statement.  Every
    stage is row-local column algebra: the whole pipeline is ZERO
    shuffles — one codegen'd scan pass over the crawl at 100 TB."""
    from rheoceros_spark.operators.dedup import intradoc_line_dedup
    from rheoceros_spark.operators.html import html_extract_text

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "html", F.expr(_HTML_FIXTURE)
    )
    extracted = html_extract_text(docs.select("doc_id", "html")).select(
        "doc_id",
        F.col("text").alias("etext"),
        F.col("n_kept").alias("n_kept_blocks"),
    )
    deduped = intradoc_line_dedup(extracted, text_col="etext").select(
        "doc_id", "n_kept_blocks", "clean_text", "n_dup_lines"
    )
    norm = F.trim(F.regexp_replace(F.col("clean_text"), "[ \n]+", " "))
    n_words = F.when(F.length(norm) == 0, F.lit(0)).otherwise(
        F.size(F.split(norm, " "))
    ).cast("long")
    return (
        deduped.withColumn("n_words", n_words)
        .where(F.col("n_words") >= 20)
        .select(
            "doc_id",
            F.col("clean_text").alias("text"),
            "n_kept_blocks",
            "n_dup_lines",
            "n_words",
        )
    )


def _bloom_novel_oracle(m_bits: int = 1 << 20, k: int = 4) -> str:
    from rheoceros_spark.operators.dedup import bloom_duckdb_sql

    b = bloom_duckdb_sql("fp", m_bits, k)
    return f"""
    WITH corpus AS MATERIALIZED (
      -- the %30 slice overlaps the probe set: those probes were
      -- INSERTED, so the no-false-negative branch provably fires
      SELECT doc_id, md5({_NORM}) AS fp FROM documents
      WHERE doc_id % 10 <> 0 OR doc_id % 30 = 0
    ), probe AS MATERIALIZED (
      SELECT doc_id, md5({_NORM}) AS fp FROM documents WHERE doc_id % 10 = 0
    ), pos AS (
      SELECT unnest({b['positions']}) AS p FROM corpus WHERE fp IS NOT NULL
    ), words AS MATERIALIZED (
      {b['word_bits']}
    ), ppos AS (
      SELECT doc_id, fp, unnest({b['positions']}) AS p FROM probe
    ), hits AS (
      SELECT x.doc_id, x.fp,
             sum(CASE WHEN (coalesce(w.bits, 0) &
                   (CAST(1 AS BIGINT) << CAST(x.p % 32 AS INT))) <> 0
                 THEN 1 ELSE 0 END) AS h
      FROM (SELECT doc_id, fp, p, CAST(p // 32 AS BIGINT) AS word_idx
            FROM ppos) x
      LEFT JOIN words w USING (word_idx)
      GROUP BY x.doc_id, x.fp
    )
    SELECT doc_id, fp, CAST(h = {k} AS INT) AS maybe_dup FROM hits
    """


@q_staged("dedup_bloom_novel", oracle=_bloom_novel_oracle())
def dedup_bloom_novel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter dedup gate (operators/dedup.py bloom_build /
    dedup_bloom_gate — the Dolma/DataComp memory-bounded dedup state):
    build a deterministic md5-derived Bloom filter over 90% of the
    corpus's text fingerprints (one position explode + bit_or onto a
    256 KB word table), probe the other 10% — maybe_dup=0 is the
    Bloom DEFINITELY-NOVEL guarantee, so only the fpp-sized maybe set
    ever touches exact state.  At 100 TB the filter is megabytes of
    broadcast state where the exact index is terabytes; the corpus
    text never shuffles and is never rescanned.  m=2^20, k=4 keeps the
    sf1 probe at ~17% fill (the gate REFUSES a saturated filter)."""
    from rheoceros_spark.functions.portable import normalize_text
    from rheoceros_spark.operators.dedup import bloom_build, dedup_bloom_gate

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "fp", F.md5(normalize_text(F.col("text")))
    )
    filt = bloom_build(
        docs.where((F.col("doc_id") % 10 != 0) | (F.col("doc_id") % 30 == 0)),
        fp_col="fp",
        m_bits=1 << 20,
        k=4,
    ).localCheckpoint(eager=False)
    return dedup_bloom_gate(
        docs.where(F.col("doc_id") % 10 == 0).select("doc_id", "fp"), filt
    ).select("doc_id", "fp", "maybe_dup")


def _warc_demux_oracle() -> str:
    """Exact DuckDB twin of the WARC demux over a DETERMINISTIC
    in-memory archive set built from ``documents`` (the URL-fixture
    pattern): because the fixture encoder is plain string algebra, the
    oracle reproduces every byte offset ARITHMETICALLY — header bytes +
    Content-Length + the 4-byte record separator, cumulatively summed
    in record order — and the payload by value (md5 of the HTTP entity
    body), without ever materializing the stream.  A demux offset that
    drifts by even one byte breaks the cumulative sum for every later
    record in the archive, so the check is unforgiving by design."""
    return """
    WITH d AS (
      SELECT doc_id, CAST(doc_id % 8 AS VARCHAR) AS source_id,
             'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS uri,
             '<html><body>' || text || '</body></html>' AS body
      FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
    ), r AS (
      SELECT *,
        CAST(strlen('HTTP/1.1 200 OK' || chr(13) || chr(10) ||
             'Content-Type: text/html' || chr(13) || chr(10) ||
             chr(13) || chr(10) || body) AS BIGINT) AS content_length,
        CAST(strlen('WARC/1.0' || chr(13) || chr(10) ||
             'WARC-Type: response' || chr(13) || chr(10) ||
             'WARC-Target-URI: ' || uri || chr(13) || chr(10) ||
             'Content-Length: ' ||
             CAST(strlen('HTTP/1.1 200 OK' || chr(13) || chr(10) ||
                  'Content-Type: text/html' || chr(13) || chr(10) ||
                  chr(13) || chr(10) || body) AS VARCHAR) ||
             chr(13) || chr(10) || chr(13) || chr(10)) AS BIGINT) AS header_len
      FROM d
    )
    SELECT source_id,
           CAST(row_number() OVER w - 1 AS INT) AS rec_idx,
           CAST(coalesce(sum(header_len + content_length + 4) OVER (
               PARTITION BY source_id ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS byte_offset,
           'response' AS warc_type,
           uri AS target_uri,
           content_length,
           200 AS http_status,
           md5(body) AS payload_md5
    FROM r WINDOW w AS (PARTITION BY source_id ORDER BY doc_id)
    """


@q_staged("scan_warc_demux", oracle=_warc_demux_oracle())
def scan_warc_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl stage-0 certified FROM RAW ARCHIVE BYTES: build
    deterministic in-memory WARC archives from ``documents`` (8
    archives, each document one ISO-28500 ``response`` record wrapping
    an HTTP message, records concatenated in doc_id order — the
    fixture construction is string algebra, NOT the operator under
    test), then demux with ``sources/warc.py warc_records`` — strict
    header scan, REAL byte offsets, HTTP header strip — and emit
    (source_id, rec_idx, byte_offset, warc_type, target_uri,
    content_length, http_status, payload_md5).  The DuckDB twin
    recomputes every offset arithmetically, so a one-byte framing
    error anywhere poisons all later offsets in that archive.

    Scale shape: the demux is Arrow-batched ``mapInPandas`` over
    file-granular rows (Common Crawl ships ~1 GB archives — task =
    archive, records fan out downstream); the fixture groupBy exists
    only to synthesize test bytes (reference: Common Crawl WARC
    layout; cites sources/warc.py:55,169)."""
    from rheoceros_spark.sources.warc import warc_records

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    )
    uri = F.concat(F.lit("https://example.org/doc/"), F.col("doc_id").cast("string"))
    body = F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>"))
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), body
    )
    header = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        uri,
        F.lit("\r\nContent-Length: "),
        F.octet_length(http).cast("string"),
        F.lit("\r\n\r\n"),
    )
    rec = F.concat(header, http, F.lit("\r\n\r\n"))
    archives = (
        docs.select(
            (F.col("doc_id") % 8).cast("string").alias("source_id"),
            F.struct(F.col("doc_id"), rec.alias("rec")).alias("r"),
        )
        .groupBy("source_id")
        .agg(
            F.encode(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list("r")), lambda s: s["rec"]
                    ),
                    "",
                ),
                "UTF-8",
            ).alias("content")
        )
    )
    return warc_records(archives, content_col="content", id_col="source_id").select(
        "source_id",
        "rec_idx",
        "byte_offset",
        "warc_type",
        "target_uri",
        "content_length",
        "http_status",
        F.md5("payload").alias("payload_md5"),
    )


def _icp_order_oracle(k: int = 8, iters: int = 2, m: int = 4) -> str:
    """operators/curation.py icp_order reproduced: the Lloyd CTEs +
    max-cosine assignment shared with the semantic-pairs oracle, the
    within-cell top-m quantized-integer neighbor graph, then the
    greedy walk as a recursive CTE — every hop picks (pri=0) the
    unvisited neighbor with the largest sim_q (ties to the smallest
    id), else (pri=1) restarts at the smallest unvisited id with a
    NULL link.  All walk comparisons are BIGINT, so the two engines
    cannot diverge on a float tie."""
    ctes, cfinal = _lloyd_ctes(k, iters)
    ctes.append(f"""assigned AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_cos_sql('e.embedding', 'c.cv')} DESC, c.cid) AS rn
        FROM emb e, {cfinal} c
      ) WHERE rn = 1
    )""")
    ctes.append(f"""edges AS (
      SELECT cell, a, b, simq FROM (
        SELECT x.cell, x.vec_id AS a, y.vec_id AS b,
               CAST(round({_cos_sql('x.embedding', 'y.embedding')} * 1e6)
                 AS BIGINT) AS simq,
               row_number() OVER (PARTITION BY x.cell, x.vec_id
                 ORDER BY CAST(round({_cos_sql('x.embedding', 'y.embedding')} * 1e6)
                   AS BIGINT) DESC, y.vec_id ASC) AS rn
        FROM assigned x JOIN assigned y
          ON x.cell = y.cell AND x.vec_id <> y.vec_id
      ) WHERE rn <= {m}
    )""")
    ctes.append("ids AS (SELECT cell, vec_id FROM assigned)")
    ctes.append("""walk(cell, pos, vec_id, visited, link_sim_q) AS (
      SELECT cell, CAST(0 AS BIGINT) AS pos, min(vec_id) AS vec_id,
             [min(vec_id)] AS visited, CAST(NULL AS BIGINT) AS link_sim_q
      FROM ids GROUP BY cell
      UNION ALL
      SELECT w.cell, w.pos + 1, nxt.vec_id,
             list_append(w.visited, nxt.vec_id), nxt.simq
      FROM walk w, LATERAL (
        SELECT vec_id, simq FROM (
          SELECT e.b AS vec_id, e.simq, 0 AS pri
          FROM edges e
          WHERE e.cell = w.cell AND e.a = w.vec_id
            AND NOT list_contains(w.visited, e.b)
          UNION ALL
          SELECT i.vec_id, CAST(NULL AS BIGINT) AS simq, 1 AS pri
          FROM ids i
          WHERE i.cell = w.cell AND NOT list_contains(w.visited, i.vec_id)
        ) ORDER BY pri ASC, simq DESC, vec_id ASC LIMIT 1
      ) nxt
    )""")
    return f"""
    WITH RECURSIVE {', '.join(ctes)}
    SELECT vec_id, cell, pos,
           CAST(link_sim_q AS DOUBLE) AS link_sim_q
    FROM walk
    """


@q_staged("curation_icp_order", oracle=_icp_order_oracle())
def curation_icp_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-context pretraining ordering (Shi et al. 2024): greedy walk
    over the within-cell top-m semantic neighbor graph so documents
    that retrieve each other land ADJACENT in the packed training
    stream — the serving-side complement of chunk/pack/shuffle-shards
    (operators/curation.py icp_order; cells via the same trained
    k-means the SemDeDup family certifies, edges as micro-unit BIGINT
    cosines, the walk itself pure integer algebra in one Arrow
    cogrouped task per cell).  Output (vec_id, cell, pos, link_sim_q);
    global order = (cell, pos)."""
    from rheoceros_spark.operators.curation import icp_order

    return icp_order(
        load_table(spark, sf_dir, "embeddings"), k=8, iters=2, m=4
    ).select(
        "vec_id",
        "cell",
        "pos",
        # nullable BIGINT surfaces as float64 through the oracle's
        # pandas frame — compare in DOUBLE on both engines (micro-unit
        # sims are integers ≤ 1e6, exact in a double)
        F.col("link_sim_q").cast("double").alias("link_sim_q"),
    )


def _url_mirrors_oracle(
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
    threshold: float = 0.5,
) -> str:
    """operators/urls.py url_mirror_pairs reproduced end-to-end: the
    certified canonicalization query, domain/path split, FULL 60-bit
    path ids (32-bit reduction only inside the signature mins — the
    r14 verify-width fix), the default max_hosts=64 df-cap (a no-op
    on the 40-host fixture, mirrored for twin fidelity), per-domain
    affine-permutation MinHash mins, banded md5 buckets, candidate
    pairs, and the exact path-id-join Jaccard verify — every step
    integer algebra or the already-pinned canonicalization strings."""
    from rheoceros_spark.functions.portable import h64_sql
    from rheoceros_spark.operators.dedup import MINHASH_P
    from rheoceros_spark.operators.urls import (
        canonical_url_duckdb_query,
        url_domain_duckdb_sql,
    )

    canon = canonical_url_duckdb_query("documents", _URL_FIXTURE, keep=["doc_id"])
    mins = ", ".join(
        f"min(({2 * i + 1} * (ph % 4294967296) + {i}) % {MINHASH_P})"
        for i in range(num_hashes)
    )
    jac = (
        "round(CAST(i.n_shared AS DOUBLE) / "
        "CAST(sa.n_paths + sb.n_paths - i.n_shared AS DOUBLE), 6)"
    )
    return f"""
    WITH c AS MATERIALIZED ({canon}),
    d0 AS MATERIALIZED (
      SELECT {url_domain_duckdb_sql('canonical_url')} AS domain,
             regexp_extract(canonical_url, '^[a-z0-9+.-]+://[^/]*(/.*)$', 1) AS p
      FROM c WHERE canonical_url IS NOT NULL
    ),
    paths0 AS MATERIALIZED (
      SELECT DISTINCT domain, {h64_sql('p')} AS ph
      FROM d0 WHERE domain IS NOT NULL
    ),
    paths AS MATERIALIZED (
      SELECT * FROM paths0
      WHERE ph NOT IN (
        SELECT ph FROM paths0 GROUP BY ph HAVING count(*) > 64
      )
    ),
    sigs AS MATERIALIZED (
      SELECT domain, [{mins}] AS sig, CAST(count(*) AS BIGINT) AS n_paths
      FROM paths GROUP BY domain
    ),
    bucketed AS MATERIALIZED (
      SELECT domain, b.band,
             CAST(('0x' || substr(md5(array_to_string(
               list_slice(sig, b.band * {rows_per_band} + 1,
                          b.band * {rows_per_band} + {rows_per_band}), ',')),
               1, 15)) AS BIGINT) AS bucket
      FROM sigs, (SELECT unnest(range(0, {bands})) AS band) b
    ),
    cands AS MATERIALIZED (
      SELECT DISTINCT x.domain AS domain_a, y.domain AS domain_b
      FROM bucketed x JOIN bucketed y
        ON x.band = y.band AND x.bucket = y.bucket AND x.domain < y.domain
    ),
    cd AS (
      SELECT domain_a AS domain FROM cands
      UNION SELECT domain_b FROM cands
    ),
    cp AS MATERIALIZED (SELECT p.* FROM paths p JOIN cd USING (domain)),
    inter AS (
      SELECT a.domain AS domain_a, b.domain AS domain_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM cp a JOIN cp b ON a.ph = b.ph AND a.domain < b.domain
      GROUP BY 1, 2
    )
    SELECT c.domain_a, c.domain_b, sa.n_paths AS n_paths_a,
           sb.n_paths AS n_paths_b, i.n_shared, {jac} AS jaccard_r
    FROM cands c
    JOIN inter i USING (domain_a, domain_b)
    JOIN sigs sa ON sa.domain = c.domain_a
    JOIN sigs sb ON sb.domain = c.domain_b
    WHERE {jac} >= {threshold}
    """


@q_staged("dedup_url_mirrors", oracle=_url_mirrors_oracle())
def dedup_url_mirrors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy host-level mirror detection (Bharat & Broder 1999) over
    the certified URL fixture: canonical path sets per domain, MinHash
    band buckets for candidates, exact path-id Jaccard verify
    (operators/urls.py url_mirror_pairs).  The fixture's 40 hosts
    share structured path families, so real mirror pairs exist at
    every Jaccard level from 0.6 to 1.0 — URL-exact dedup
    (dedup_exact_url r12) cannot see any of them because the canonical
    URLs differ in host."""
    from rheoceros_spark.operators.urls import url_mirror_pairs

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "url", F.expr(_URL_FIXTURE)
    )
    return url_mirror_pairs(docs, threshold=0.5)


#: robots-rules fixture over the 40 URL-fixture hosts: one Python
#: literal list serialized into BOTH engines (Spark createDataFrame /
#: DuckDB VALUES), exercising every RFC 9309 verdict shape — blanket
#: '/' disallow (h%5), directory disallow (h%2), longer-allow
#: re-admission (h%4, paths under /Dir%2F1), equal-length
#: allow-vs-disallow tie where allow wins (h%7 ∧ h%2), explicit allow
#: (h%7 alone), and the no-rules default for the remaining hosts.
def _robots_rules_rows() -> list[tuple[str, str, int]]:
    rows = []
    for h in range(40):
        d = f"host{h}.example.com"
        if h % 2 == 0:
            rows.append((d, "/Dir", 0))
        if h % 4 == 0:
            rows.append((d, "/Dir%2F1", 1))
        if h % 5 == 0:
            rows.append((d, "/", 0))
        if h % 7 == 0:
            rows.append((d, "/Dir", 1))
    return rows


def _robots_gate_oracle(default_allow: bool = True) -> str:
    """operators/urls.py robots_gate reproduced end-to-end: the
    certified canonicalization query, domain/path split with the
    empty-path → '/' normalization, the literal rules VALUES table,
    and the RFC 9309 winner as pure integer algebra — the most
    specific rule is max(2·len(prefix) + allow), so longest wins and
    allow beats disallow on a length tie; unmatched docs (no rules,
    all rules miss, NULL URL) take the default."""
    from rheoceros_spark.operators.urls import (
        canonical_url_duckdb_query,
        url_domain_duckdb_sql,
    )

    canon = canonical_url_duckdb_query("documents", _URL_FIXTURE, keep=["doc_id"])
    vals = ", ".join(
        f"('{d}', '{p}', {a})" for d, p, a in _robots_rules_rows()
    )
    return f"""
    WITH c AS MATERIALIZED ({canon}),
    d0 AS MATERIALIZED (
      SELECT doc_id, {url_domain_duckdb_sql('canonical_url')} AS domain,
             CASE WHEN p IS NULL OR p = '' THEN '/' ELSE p END AS path
      FROM (
        SELECT doc_id, canonical_url,
               regexp_extract(canonical_url, '^[a-z0-9+.-]+://[^/]*(/.*)$', 1) AS p
        FROM c
      )
    ),
    rules(domain, prefix, allow) AS (VALUES {vals}),
    m AS (
      SELECT d.doc_id, max(2 * length(r.prefix) + r.allow) AS wk
      FROM d0 d JOIN rules r
        ON d.domain = r.domain AND starts_with(d.path, r.prefix)
      GROUP BY d.doc_id
    )
    SELECT d.doc_id, d.domain,
           CAST(coalesce(m.wk % 2, {1 if default_allow else 0}) AS BIGINT)
             AS allowed,
           CAST(coalesce(m.wk // 2, -1) AS BIGINT) AS matched_len
    FROM d0 d LEFT JOIN m USING (doc_id)
    """


@q_staged("curation_robots_gate", oracle=_robots_gate_oracle())
def curation_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 crawl-consent gate over the certified URL fixture:
    canonical URL → (domain, path), longest-prefix rule resolution
    with the allow-wins tiebreak, per-rules-table defaults
    (operators/urls.py robots_gate).  The 40-host rules fixture
    exercises blanket disallows, longer-allow re-admission, the
    equal-length tie, explicit allows, and the no-rules default; the
    corpus never shuffles — rules aggregate per domain, broadcast,
    and resolve with array HOFs in the scan stage."""
    from rheoceros_spark.operators.urls import robots_gate

    docs = load_table(spark, sf_dir, "documents").select("doc_id").withColumn(
        "url", F.expr(_URL_FIXTURE)
    )
    rules = spark.createDataFrame(
        _robots_rules_rows(), "domain string, path_prefix string, allow int"
    )
    out = robots_gate(docs, rules)
    return out.select(
        "doc_id",
        "domain",
        "allowed",
        F.coalesce(F.col("matched_len"), F.lit(-1)).cast("bigint").alias("matched_len"),
    )


# image-dedup fixture: 18×16 P6 images, pixels CONSTANT within each
# 2×2 block of the 9×8 mean grid, so the dHash block means equal the
# block values and the oracle computes them in closed form.  16 base
# classes (doc_id % 16); the variant half (doc_id % 32 >= 16) perturbs
# ONE block (i=3, j=2) by +128, flipping at most the two adjacent
# comparisons — variants of a class are near-dups (Hamming ≤ 2),
# same-(doc_id%32) docs are exact dups (Hamming 0).
_DHASH_GRID_W, _DHASH_GRID_H = 8, 8  # 9×8 means from 2×2 blocks


def _dhash_block_value(cls: str, var: str, i: str, j: str, c: str) -> str:
    """Block pixel value as a SQL expression (engine-neutral integer
    algebra) — shared verbatim by the Spark fixture synthesizer's
    Python twin and the DuckDB oracle."""
    base = (
        f"((17 * {cls} + 13 * {i} + 11 * {j} + 7 * {i} * {j} + 5 * {c} "
        f"+ {i} * {i} * ({cls} + 1)) % 256)"
    )
    return (
        f"CASE WHEN {var} = 1 AND {i} = 3 AND {j} = 2 "
        f"THEN ({base} + 128) % 256 ELSE {base} END"
    )


def _image_dedup_oracle(max_hamming: int = 2) -> str:
    """operators/multimodal.py image_dhash + dhash_pairs reproduced in
    closed form: the block-constant fixture makes every 2×2 floor
    block mean equal the BT.601 luma of the block's (r,g,b) triple, so
    the oracle builds the 72-entry mean list per doc, packs the 64
    adjacent-comparison bits into (hi, lo) 32-bit halves, bands them
    into four 16-bit keys, and verifies candidates with
    bit_count(xor) — the identical integer algebra the engine runs
    after a REAL P6 decode."""
    # Pair semantics mirror dhash_pairs' r14 exact-dup grouping: each
    # distinct 64-bit hash keeps min(doc_id) as representative; members
    # star-pair with their rep at hamming 0, and only DISTINCT hashes
    # enter the banded near-dup join (rep-to-rep pairs).  At fixture
    # scale no band bucket exceeds max_bucket=256, so the engine's
    # hot-bucket star cap never fires and the uncapped twin below is
    # exact (the _capped_candidates oracle convention).
    r = _dhash_block_value("cls", "var", "(p % 9)", "(p // 9)", "0")
    g = _dhash_block_value("cls", "var", "(p % 9)", "(p // 9)", "1")
    b = _dhash_block_value("cls", "var", "(p % 9)", "(p // 9)", "2")
    return f"""
    WITH docs AS (
      SELECT doc_id, CAST(doc_id % 16 AS BIGINT) AS cls,
             CAST((doc_id % 32) // 16 AS BIGINT) AS var
      FROM documents WHERE doc_id IS NOT NULL
    ),
    means AS MATERIALIZED (
      SELECT doc_id,
        list_transform(range(0, 72), p ->
          (299 * ({r}) + 587 * ({g}) + 114 * ({b})) // 1000
        ) AS ms
      FROM docs
    ),
    hashes AS MATERIALIZED (
      SELECT doc_id,
        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(0, 32), k ->
            CASE WHEN ms[(k // 8) * 9 + (k % 8) + 2] > ms[(k // 8) * 9 + (k % 8) + 1]
                 THEN CAST(1 AS BIGINT) << CAST(k AS INT) ELSE CAST(0 AS BIGINT) END)),
          (acc, x) -> acc + x) AS BIGINT) AS lo,
        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(32, 64), k ->
            CASE WHEN ms[(k // 8) * 9 + (k % 8) + 2] > ms[(k // 8) * 9 + (k % 8) + 1]
                 THEN CAST(1 AS BIGINT) << CAST(k - 32 AS INT) ELSE CAST(0 AS BIGINT) END)),
          (acc, x) -> acc + x) AS BIGINT) AS hi
      FROM means
    ),
    grp AS MATERIALIZED (
      SELECT hi, lo, min(doc_id) AS rep FROM hashes GROUP BY hi, lo
    ),
    exact_pairs AS (
      SELECT g.rep AS a, h.doc_id AS b, CAST(0 AS BIGINT) AS hamming
      FROM hashes h JOIN grp g ON h.hi = g.hi AND h.lo = g.lo
      WHERE h.doc_id <> g.rep
    ),
    banded AS MATERIALIZED (
      SELECT rep, hi, lo, b.bidx,
        CASE b.bidx WHEN 0 THEN lo & 65535 WHEN 1 THEN (lo >> 16) & 65535
                    WHEN 2 THEN hi & 65535 ELSE (hi >> 16) & 65535 END AS band
      FROM grp, (SELECT unnest(range(0, 4)) AS bidx) b
    ),
    near AS (
      SELECT DISTINCT x.rep AS a, y.rep AS b,
             CAST(bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi))
               AS BIGINT) AS hamming
      FROM banded x JOIN banded y
        ON x.bidx = y.bidx AND x.band = y.band AND x.rep < y.rep
      WHERE bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi)) <= {max_hamming}
    )
    SELECT a, b, hamming FROM exact_pairs
    UNION ALL
    SELECT a, b, hamming FROM near
    """


@q_staged("multimodal_image_dedup", oracle=_image_dedup_oracle())
def multimodal_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup pairs through the REAL decode path:
    synthesize a deterministic 18×16 P6 image per document (16 base
    classes + a one-block perturbed variant half), run the genuine
    binary PPM decoder + integer dHash (operators/multimodal.py
    image_dhash — BT.601 luma, exact 2×2 floor block means, 64
    adjacent-mean bits as two 32-bit halves), then banded
    guaranteed-detection candidate pairs with exact bit_count(xor)
    Hamming verify (dhash_pairs).  The oracle never sees the image
    bytes — it predicts every hash in closed form from the fixture's
    block function, so a single mis-decoded pixel anywhere flips a
    mean and fails the hash."""
    from rheoceros_spark.operators.multimodal import dhash_pairs, image_dhash

    media = dhash_fixture_media(spark, sf_dir)
    hashes = image_dhash(media, grid_w=_DHASH_GRID_W, grid_h=_DHASH_GRID_H)
    return dhash_pairs(hashes, max_hamming=2)


def dhash_fixture_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic P6 image corpus behind multimodal_image_dedup
    (shared with the scale probe's hash-stage timing): one 18×16
    block-constant image per document, synthesized Arrow-batched from
    doc_id alone."""
    import pandas as _pd
    from pyspark.sql import types as _T

    from rheoceros_spark.operators.multimodal import encode_ppm

    docs = load_table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id").isNotNull()
    )

    def synth(it):
        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                cls, var = d % 16, (d % 32) // 16
                px = bytearray()
                for y in range(16):
                    j = y // 2
                    for x in range(18):
                        i = x // 2
                        for c in range(3):
                            v = (
                                17 * cls + 13 * i + 11 * j + 7 * i * j
                                + 5 * c + i * i * (cls + 1)
                            ) % 256
                            if var == 1 and i == 3 and j == 2:
                                v = (v + 128) % 256
                            px.append(v)
                blobs.append(encode_ppm(18, 16, bytes(px)))
            yield _pd.DataFrame({"doc_id": pdf["doc_id"], "content": blobs})

    return docs.mapInPandas(
        synth,
        schema=_T.StructType(
            [
                _T.StructField("doc_id", _T.LongType(), False),
                _T.StructField("content", _T.BinaryType(), False),
            ]
        ),
    )


# audio-dedup fixture: 16 base classes (doc_id % 16) of square-wave
# WAVs whose per-segment amplitude encodes a 4-bit band in closed
# form; the variant half (doc_id % 32 >= 16) shifts segment 5's band
# by +8 mod 16, so base↔variant reps are near-dups at seg_diff 1 and
# same-(doc_id%32) docs are exact dups.  Amplitude band·2048 + 1024
# puts 16·rms exactly at band + 0.5, so the floor quantizer can never
# straddle a boundary — every fingerprint is engine-exact.
def _audio_band_value(cls: str, var: str, s: str) -> str:
    """Segment band as a SQL expression (engine-neutral integer
    algebra) — shared by the Spark fixture synthesizer's Python twin
    and the DuckDB oracle (the _dhash_block_value convention)."""
    base = f"((7 * {cls} + 3 * {s} + {s} * {s} * ({cls} + 1)) % 16)"
    return f"CASE WHEN {var} = 1 AND {s} = 5 THEN ({base} + 8) % 16 ELSE {base} END"


def _audio_dedup_oracle(max_seg_diff: int = 2) -> str:
    """operators/multimodal.py audio_phash + audio_phash_pairs in
    closed form: the square-wave fixture makes every segment RMS equal
    its amplitude, so the oracle computes the 16 4-bit bands
    arithmetically, packs them into (hi, lo) 32-bit halves, bands them
    into four 16-bit pigeonhole keys over distinct fingerprints, and
    verifies candidates with the differing-nibble count — the
    identical integer algebra the engine runs after a REAL stdlib-wave
    decode.  At fixture scale no band bucket exceeds max_bucket=256
    (measured max 2), so the hot-bucket star cap never fires and the
    uncapped twin is exact (the _capped_candidates oracle
    convention)."""
    bexpr = _audio_band_value("cls", "var", "s")
    nib = (
        "CAST(len(list_filter(range(0, 8), k -> "
        "((xor(x.lo, y.lo) >> CAST(4 * k AS INT)) & 15) <> 0)) "
        "+ len(list_filter(range(0, 8), k -> "
        "((xor(x.hi, y.hi) >> CAST(4 * k AS INT)) & 15) <> 0)) AS BIGINT)"
    )
    return f"""
    WITH docs AS (
      SELECT doc_id, CAST(doc_id % 16 AS BIGINT) AS cls,
             CAST((doc_id % 32) // 16 AS BIGINT) AS var
      FROM documents WHERE doc_id IS NOT NULL
    ),
    bands AS MATERIALIZED (
      SELECT doc_id, list_transform(range(0, 16), s -> {bexpr}) AS bs
      FROM docs
    ),
    hashes AS MATERIALIZED (
      SELECT doc_id,
        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(0, 8), s -> bs[s + 1] << CAST(4 * s AS INT))),
          (acc, v) -> acc + v) AS BIGINT) AS lo,
        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(8, 16), s -> bs[s + 1] << CAST(4 * (s - 8) AS INT))),
          (acc, v) -> acc + v) AS BIGINT) AS hi
      FROM bands
    ),
    grp AS MATERIALIZED (
      SELECT hi, lo, min(doc_id) AS rep FROM hashes GROUP BY hi, lo
    ),
    exact_pairs AS (
      SELECT g.rep AS a, h.doc_id AS b, CAST(0 AS BIGINT) AS seg_diff
      FROM hashes h JOIN grp g ON h.hi = g.hi AND h.lo = g.lo
      WHERE h.doc_id <> g.rep
    ),
    banded AS MATERIALIZED (
      SELECT rep, hi, lo, b.bidx,
        CASE b.bidx WHEN 0 THEN lo & 65535 WHEN 1 THEN (lo >> 16) & 65535
                    WHEN 2 THEN hi & 65535 ELSE (hi >> 16) & 65535 END AS band
      FROM grp, (SELECT unnest(range(0, 4)) AS bidx) b
    ),
    near AS (
      SELECT DISTINCT x.rep AS a, y.rep AS b, {nib} AS seg_diff
      FROM banded x JOIN banded y
        ON x.bidx = y.bidx AND x.band = y.band AND x.rep < y.rep
      WHERE {nib} <= {max_seg_diff}
    )
    SELECT a, b, seg_diff FROM exact_pairs
    UNION ALL
    SELECT a, b, seg_diff FROM near
    """


@q_staged("multimodal_audio_dedup", oracle=_audio_dedup_oracle())
def multimodal_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual audio near-dup pairs through the REAL decode path:
    synthesize a deterministic 16-segment square-wave WAV per document
    (16 base classes + a one-segment band-shifted variant half), run
    the genuine stdlib-wave decode + vectorized per-segment RMS-band
    fingerprint (operators/multimodal.py audio_phash — 16 4-bit bands
    as two 32-bit halves), then the banded guaranteed-detection pair
    machinery with the differing-segment verify (audio_phash_pairs).
    The oracle never sees the WAV bytes — it predicts every band in
    closed form from the fixture's amplitude function, so a single
    mis-decoded sample anywhere shifts a segment RMS and fails the
    fingerprint."""
    from rheoceros_spark.operators.multimodal import audio_phash, audio_phash_pairs

    media = audio_dedup_fixture_media(spark, sf_dir)
    return audio_phash_pairs(audio_phash(media), max_seg_diff=2)


def audio_dedup_fixture_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic WAV corpus behind multimodal_audio_dedup
    (shared with the scale probe's fingerprint-stage timing): one
    1024-frame 8 kHz 16-bit mono square wave per document, segment s
    at amplitude band(cls, var, s)·2048 + 1024, synthesized
    Arrow-batched from doc_id alone."""
    import io as _io
    import struct as _struct
    import wave as _wave

    import pandas as _pd
    from pyspark.sql import types as _T

    docs = load_table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id").isNotNull()
    )

    def synth(it):
        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                cls, var = d % 16, (d % 32) // 16
                frames = b""
                for s in range(16):
                    b = (7 * cls + 3 * s + s * s * (cls + 1)) % 16
                    if var == 1 and s == 5:
                        b = (b + 8) % 16
                    v = b * 2048 + 1024
                    frames += (
                        _struct.pack("<h", v) + _struct.pack("<h", -v)
                    ) * 32  # 64 frames per segment, 1024 total
                buf = _io.BytesIO()
                with _wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(frames)
                blobs.append(buf.getvalue())
            yield _pd.DataFrame({"doc_id": pdf["doc_id"], "content": blobs})

    return docs.mapInPandas(
        synth,
        schema=_T.StructType(
            [
                _T.StructField("doc_id", _T.LongType(), False),
                _T.StructField("content", _T.BinaryType(), False),
            ]
        ),
    )


# video-dedup fixture: families of four videos (fam = doc_id // 4) —
# two exact copies of a base cut and two of a variant cut whose frame
# 2 is REPLACED (a re-edit, not a perturbation).  Frame pixels are
# 2x2-block-constant with block values derived from md5("vd:fam:seed")
# bytes, so frame hashes are distinct across families w.h.p. AND both
# engines derive them from the same 16 hex-pair bytes; group sizes are
# constant (2 exact copies, 4-video families) at EVERY scale factor,
# so the max_videos cap never fires and outputs stay corpus-linear.
def _video_block_value(hx: str, p: str, c: str) -> str:
    """Block value as a SQL expression over the frame's md5 hex string
    ``hx`` — shared algebra with the Spark synthesizer's Python twin."""
    byte = f"CAST(('0x' || substr({hx}, 2 * ((3 * {p} + {c}) % 16) + 1, 2)) AS BIGINT)"
    return f"(({byte} + 13 * ({p} % 9) + 11 * ({p} // 9)) % 256)"


def _video_dedup_oracle(threshold: float = 0.5) -> str:
    """operators/multimodal.py video_frame_dhash + video_dedup_pairs
    in closed form: per-frame block means from the md5-byte fixture,
    the 64 adjacent-comparison bits packed as (hi, lo), per-video
    sorted distinct frame-hash set keys, exact-dup star pairs through
    the min-id representative, and the representative-only
    shared-frame Jaccard verify.  At fixture scale no frame hash is
    on more than 4 videos, so the engine's max_videos=64 cap never
    fires and the uncapped twin is exact."""
    r = _video_block_value("hx", "p", "0")
    g = _video_block_value("hx", "p", "1")
    b = _video_block_value("hx", "p", "2")
    return f"""
    WITH vids AS (
      SELECT doc_id, CAST(doc_id // 4 AS BIGINT) AS fam,
             CAST((doc_id % 4) // 2 AS BIGINT) AS var
      FROM documents WHERE doc_id IS NOT NULL
    ),
    fr AS (
      SELECT doc_id, fam, f,
             md5('vd:' || fam || ':' ||
                 CASE WHEN var = 1 AND f = 2 THEN 'v' ELSE CAST(f AS VARCHAR) END)
               AS hx
      FROM vids, (SELECT unnest(range(0, 4)) AS f) ff
    ),
    means AS MATERIALIZED (
      SELECT doc_id, f,
        list_transform(range(0, 72), p ->
          (299 * ({r}) + 587 * ({g}) + 114 * ({b})) // 1000
        ) AS ms
      FROM fr
    ),
    hashes AS MATERIALIZED (
      SELECT doc_id,
        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(0, 32), k ->
            CASE WHEN ms[(k // 8) * 9 + (k % 8) + 2] > ms[(k // 8) * 9 + (k % 8) + 1]
                 THEN CAST(1 AS BIGINT) << CAST(k AS INT) ELSE CAST(0 AS BIGINT) END)),
          (acc, x) -> acc + x) AS BIGINT) AS lo,
        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(32, 64), k ->
            CASE WHEN ms[(k // 8) * 9 + (k % 8) + 2] > ms[(k // 8) * 9 + (k % 8) + 1]
                 THEN CAST(1 AS BIGINT) << CAST(k - 32 AS INT) ELSE CAST(0 AS BIGINT) END)),
          (acc, x) -> acc + x) AS BIGINT) AS hi
      FROM means
    ),
    fh AS MATERIALIZED (SELECT DISTINCT doc_id, hi, lo FROM hashes),
    sets AS MATERIALIZED (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
             string_agg(CAST(hi AS VARCHAR) || ':' || CAST(lo AS VARCHAR), ','
                        ORDER BY CAST(hi AS VARCHAR) || ':' || CAST(lo AS VARCHAR))
               AS setkey
      FROM fh GROUP BY doc_id
    ),
    grp AS MATERIALIZED (
      SELECT setkey, min(doc_id) AS rep, any_value(n) AS n
      FROM sets GROUP BY setkey
    ),
    star AS (
      SELECT g.rep AS video_a, s.doc_id AS video_b, s.n AS n_frames_a,
             s.n AS n_frames_b, s.n AS n_shared, CAST(1.0 AS DOUBLE) AS jaccard_r
      FROM sets s JOIN grp g ON s.setkey = g.setkey
      WHERE s.doc_id <> g.rep
    ),
    rframes AS MATERIALIZED (
      SELECT p.* FROM fh p JOIN grp g ON p.doc_id = g.rep
    ),
    inter AS (
      SELECT a.doc_id AS video_a, b.doc_id AS video_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM rframes a JOIN rframes b
        ON a.hi = b.hi AND a.lo = b.lo AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    near AS (
      SELECT i.video_a, i.video_b, sa.n AS n_frames_a, sb.n AS n_frames_b,
             i.n_shared,
             round(CAST(i.n_shared AS DOUBLE)
                   / CAST(sa.n + sb.n - i.n_shared AS DOUBLE), 6) AS jaccard_r
      FROM inter i
      JOIN grp sa ON sa.rep = i.video_a
      JOIN grp sb ON sb.rep = i.video_b
      WHERE round(CAST(i.n_shared AS DOUBLE)
                  / CAST(sa.n + sb.n - i.n_shared AS DOUBLE), 6) >= {threshold}
    )
    SELECT * FROM star UNION ALL SELECT * FROM near
    """


@q_staged("multimodal_video_dedup", oracle=_video_dedup_oracle())
def multimodal_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup pairs through the REAL demux + hash path:
    synthesize a deterministic 4-frame concatenated-P6 video per
    document (families of two exact copies of a base cut and two of a
    one-frame re-edit), demux and dHash every frame inside one Arrow
    task (operators/multimodal.py video_frame_dhash — frame bytes
    never leave the task), then set-level dedup: exact-dup grouping on
    the sorted frame-hash set, star pairs through the min-id
    representative, and the representative-only shared-frame Jaccard
    verify (video_dedup_pairs).  The oracle never sees the video bytes
    — it derives every frame hash from the fixture's md5-byte block
    function, so one mis-demuxed offset or mis-decoded pixel anywhere
    fails a set key."""
    from rheoceros_spark.operators.multimodal import (
        video_dedup_pairs,
        video_frame_dhash,
    )

    media = video_dedup_fixture_media(spark, sf_dir)
    return video_dedup_pairs(video_frame_dhash(media), threshold=0.5)


def video_dedup_fixture_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic concatenated-P6 video corpus behind
    multimodal_video_dedup (shared with the scale probe): four
    18×16 block-constant frames per document, block values from
    md5("vd:<fam>:<seed>") bytes, synthesized Arrow-batched from
    doc_id alone."""
    import hashlib as _hashlib

    import numpy as _np
    import pandas as _pd
    from pyspark.sql import types as _T

    from rheoceros_spark.operators.multimodal import encode_ppm

    docs = load_table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id").isNotNull()
    )
    # static per-frame index/offset matrices (block grid is 8x9x3:
    # j, i, c) — the per-frame work is then one vectorized gather
    p_grid = _np.arange(72).reshape(8, 9)  # p = j*9 + i
    idx = (3 * p_grid[:, :, None] + _np.arange(3)[None, None, :]) % 16
    off = 13 * (p_grid % 9)[:, :, None] + 11 * (p_grid // 9)[:, :, None]

    def synth(it):
        frame_cache: dict[str, bytes] = {}

        def frame(fam: int, seed: str) -> bytes:
            key = f"vd:{fam}:{seed}"
            got = frame_cache.get(key)
            if got is None:
                hx = _hashlib.md5(key.encode()).hexdigest()
                bts = _np.frombuffer(bytes.fromhex(hx), dtype=_np.uint8)
                blocks = (bts[idx].astype(_np.int32) + off) % 256
                px = blocks.astype(_np.uint8).repeat(2, axis=0).repeat(2, axis=1)
                got = frame_cache[key] = encode_ppm(18, 16, px.tobytes())
            return got

        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                fam, var = d // 4, (d % 4) // 2
                blobs.append(
                    b"".join(
                        frame(fam, "v" if (var == 1 and f == 2) else str(f))
                        for f in range(4)
                    )
                )
            yield _pd.DataFrame({"doc_id": pdf["doc_id"], "content": blobs})

    return docs.mapInPandas(
        synth,
        schema=_T.StructType(
            [
                _T.StructField("doc_id", _T.LongType(), False),
                _T.StructField("content", _T.BinaryType(), False),
            ]
        ),
    )


# ===========================================================================
# driver contract
# ===========================================================================

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q3_shipping_priority(spark, SF001)


#: The driver's correctness harness checks the FIRST 50 queries()
#: entries only (CORRECTNESS_r01 covered positions 0-49 exactly).
#: Rotation discipline (round 15): the registry is capped at 100
#: queries — the 50-slot window plus the consecutive-round-coverage
#: invariant (r14 ∪ r15 must certify everything) admits no more.  No
#: new registrations this round (optimization round); the window
#: rotates back to EXACTLY the r13-certified set so the queries whose
#: code changed in r14 while outside its window (text_bm25_topk,
#: retrieval_hybrid_rrf, the IVF family, ...) are driver-certified
#: post-change, as the r14 verdict required.  Enforced by
#: tests/test_plan_quality.py
#: test_cross_round_official_coverage_is_total.  All queries — retired
#: ones included — stay continuously gated by the local DuckDB oracle,
#: scripts/check_oracle.py.
_HEAD = [
    # round 15: the window rotates BACK to exactly the r13-certified
    # set (CORRECTNESS_r13.json key order), so every query touched in
    # the r14 optimization round while outside the r14 window
    # (text_bm25_topk, retrieval_hybrid_rrf, the IVF family, ...) gets
    # driver-certified POST-change, and r14 ∪ r15 covers all 100
    # registered queries (VERDICT r14 next-round #8).  Enforced by
    # tests/test_plan_quality.py::test_cross_round_official_coverage_is_total.
    "curation_corpus_datasheet",
    "curation_snapshot_drift",
    "dedup_semantic_keep",
    "scale_skew_report",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q13_customer_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q16_supplier_count",
    "q19_disjunctive_predicates",
    "q20_part_shippers",
    "q22_wealthy_inactive",
    "agg_cube",
    "window_topn_per_group",
    "set_except",
    "scalar_functions",
    "scan_pruned_projection",
    "nearest_partition_asof",
    "partition_ranged_union",
    "events_cohort_retention",
    "sketch_cms_topk",
    "ann_int8_topk",
    "ann_ivfpq_topk",
    "retrieval_hybrid_rrf",
    "retrieval_quality_metrics",
    "text_hash_embed_topk",
    "text_bm25_topk",
    "text_bpe_fertility",
    "text_lang_segments",
    "text_repetition",
    "dedup_exact_best_docs",
    "dedup_substring_spans",
    "corpus_diff_indexed",
    "curation_decon_spans",
    "curation_semantic_decon",
    "curation_dsir_resample",
    "curation_filter_funnel",
    "curation_ngram_novelty",
    "curation_pack_sequences",
    "curation_shuffle_shards",
    "curation_source_mix",
    "multimodal_audio_stats",
    "multimodal_video_frames",
    "pipeline_pretrain_corpus",
]



def _ordered(d: dict) -> dict:
    return {k: d[k] for k in _HEAD if k in d} | {k: d[k] for k in d if k not in _HEAD}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(_ORACLES)


def retired_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Verification twins no longer in the driver window (see
    _RETIRED_QUERIES).  Still oracle-gated: tests/test_retired_oracles.py
    and ``scripts/check_oracle.py --retired`` run the same Spark-vs-
    DuckDB parity the driver harness would."""
    return dict(_RETIRED_QUERIES)


def retired_oracle_sql() -> dict[str, str]:
    return dict(_RETIRED_ORACLES)
