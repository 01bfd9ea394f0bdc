"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 (plus the LLM-data extension operators), each with a
DuckDB-equivalent ``oracle_sql()`` entry.  Column names and value
scales are pinned on both sides so the driver's order-insensitive
value-hash comparison is exact.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet")) for n in names]


def _views(spark: SparkSession, sf_dir: str) -> None:
    for n in TABLES:
        spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet")).createOrReplaceTempView(n)


# =====================================================================
# §2.4 aggregations / §2.2 filters — TPC-H-style core
# =====================================================================

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filter + groupBy + decimal-cast aggregates (A2-style)."""
    (l,) = _load(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + deterministic top-k (limit with total tiebreak)."""
    c, o, l = _load(spark, sf_dir, "customer", "orders", "lineitem")
    dec = lambda c_: F.col(c_).cast("decimal(18,2)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"), "revenue")
    )


ORACLE_TOPK = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join with broadcast dims (§2.3 J-family, §4.8)."""
    r, n, c, s, o, l = _load(
        spark, sf_dir, "region", "nation", "customer", "supplier", "orders", "lineitem"
    )
    dec = lambda c_: F.col(c_).cast("decimal(18,2)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


ORACLE_LOCAL_SUPPLIER = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name
"""


def q_left_join_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-style left join where misses must survive as NULLs."""
    e, s = _load(spark, sf_dir, "events", "supplier")
    return (
        e.join(F.broadcast(s), e.user_id == s.s_suppkey, "left")
        .groupBy("s_name")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


ORACLE_LEFT_JOIN = """
SELECT s_name, count(*)::BIGINT AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events LEFT JOIN supplier ON user_id = s_suppkey
GROUP BY s_name
"""


def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti joins (coverage beyond the reference's join set)."""
    c, o = _load(spark, sf_dir, "customer", "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(
        F.lit("with_orders").alias("kind"), F.count("*").cast("long").alias("n")
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.lit("without_orders").alias("kind"), F.count("*").cast("long").alias("n")
    )
    return semi.unionByName(anti)


ORACLE_SEMI_ANTI = """
SELECT 'with_orders' AS kind, count(*)::BIGINT AS n FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT 'without_orders' AS kind, count(*)::BIGINT AS n FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# =====================================================================
# §2.2 P12 + §2.3 J2 — positional index & adjacency join
# =====================================================================

def q_positional_adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 + J2: per-(user) row_number index, then self-join on index+1
    to pair each event with the next one (the reference's swap→transfer
    adjacency pairing re-expressed)."""
    (e,) = _load(spark, sf_dir, "events")
    from cherry_pipelines_spark.operators.positional import with_positional_index

    # ts is epoch-nanos (long) — same ordering as the timestamp itself
    idx = with_positional_index(
        e.select("user_id", "event_id", "event_type", "ts"),
        group_cols=("user_id",),
        order_cols=("ts", "event_id"),
        index_col="idx",
    )
    nxt = idx.select(
        F.col("user_id").alias("n_user_id"),
        (F.col("idx") - 1).alias("n_idx"),
        F.col("event_id").alias("next_event_id"),
        F.col("event_type").alias("next_event_type"),
    )
    return (
        idx.join(
            nxt,
            (F.col("user_id") == F.col("n_user_id")) & (F.col("idx") == F.col("n_idx")),
            "left",
        )
        .select("user_id", "event_id", "next_event_id", "next_event_type")
    )


ORACLE_ADJACENCY = """
SELECT user_id, event_id,
       lead(event_id) OVER w AS next_event_id,
       lead(event_type) OVER w AS next_event_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# =====================================================================
# §2.3 J5 / §2.4 A2-A4 — trailing range window
# =====================================================================

def q_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5→rangeBetween rewrite: per-user trailing 600-second sum/count."""
    (e,) = _load(spark, sf_dir, "events")
    from cherry_pipelines_spark.operators.windows import trailing_range_agg

    # ts arrives as epoch-nanos (long); integer-div to whole seconds
    base = e.select(
        "event_id",
        "user_id",
        F.expr("ts div 1000000000").alias("secs"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    out = trailing_range_agg(
        base,
        range_col="secs",
        width=600,
        aggs={"w_sum": F.sum("v"), "w_cnt": F.count("v")},
        partition_cols=("user_id",),
    )
    return out.select(
        "event_id",
        "user_id",
        "secs",
        F.col("w_sum").cast("double").alias("w_sum"),
        F.col("w_cnt").cast("long").alias("w_cnt"),
    )


ORACLE_TRAILING = """
SELECT event_id, user_id, epoch_us(ts) // 1000000 AS secs,
       CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS w_sum,
       (count(value) OVER w)::BIGINT AS w_cnt
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY (epoch_us(ts) // 1000000)
             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
"""


# =====================================================================
# §2.5 O2-O4 — typed-NULL union, range generator, constant frames
# =====================================================================

def q_union_typed_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2+P2: union heterogeneous tables after typed-NULL padding."""
    o, l = _load(spark, sf_dir, "orders", "lineitem")
    a = o.select(
        F.lit("order").alias("kind"),
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price"),
        F.col("o_orderstatus").alias("flag"),
        F.lit(None).cast("double").alias("qty"),
    )
    b = l.select(
        F.lit("lineitem").alias("kind"),
        F.col("l_orderkey").alias("key"),
        F.lit(None).cast("double").alias("price"),
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("decimal(18,2)").cast("double").alias("qty"),
    )
    return a.unionByName(b)


ORACLE_UNION = """
SELECT 'order' AS kind, o_orderkey AS key, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
       o_orderstatus AS flag, CAST(NULL AS DOUBLE) AS qty
FROM orders
UNION ALL
SELECT 'lineitem' AS kind, l_orderkey AS key, CAST(NULL AS DOUBLE) AS price,
       l_returnflag AS flag, CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS qty
FROM lineitem
"""


def q_range_const_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3+O4: integer range generator + constant USD-price frames,
    unioned (the reference's constant-price block, swap_prices.py:221-250)."""
    frames = []
    for coin in ("USDC", "USDT"):
        frames.append(
            spark.range(0, 1000)
            .select(
                F.col("id").alias("slot"),
                F.lit(coin).alias("mint"),
                F.lit(1.0).cast("double").alias("price"),
            )
        )
    out = frames[0].unionByName(frames[1])
    return out


ORACLE_RANGE_CONST = """
SELECT g.slot::BIGINT AS slot, c.mint, CAST(1.0 AS DOUBLE) AS price
FROM generate_series(0, 999) AS g(slot)
CROSS JOIN (SELECT 'USDC' AS mint UNION ALL SELECT 'USDT') c
"""


def q_window_rownum_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 customers per nation by balance (window + row_number)."""
    (c,) = _load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            F.col("c_acctbal").cast("decimal(18,2)").alias("acctbal_dec"),
        )
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("c_nationkey").orderBy(
                F.col("acctbal_dec").desc(), F.col("c_custkey")
            )
        ))
        .filter(F.col("rn") <= 2)
        .select(
            "c_nationkey",
            "c_custkey",
            F.col("acctbal_dec").cast("double").alias("acctbal"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


ORACLE_ROWNUM = """
SELECT c_nationkey, c_custkey, acctbal, rn FROM (
  SELECT c_nationkey, c_custkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey)::BIGINT AS rn
  FROM customer) t
WHERE rn <= 2
"""


def q_boolean_split_swap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11+P3: boolean two-way split with role-swapped column renames,
    re-unioned — done in a single pass with F.when (same semantics,
    one scan instead of two)."""
    (e,) = _load(spark, sf_dir, "events")
    is_in = F.col("event_type").isin("click", "view")
    v = F.col("value").cast("decimal(18,6)")
    return e.select(
        "event_id",
        F.when(is_in, F.lit("in")).otherwise(F.lit("out")).alias("direction"),
        F.when(is_in, v).otherwise(F.lit(0).cast("decimal(18,6)")).cast("double").alias("input_value"),
        F.when(is_in, F.lit(0).cast("decimal(18,6)")).otherwise(v).cast("double").alias("output_value"),
    )


ORACLE_BOOL_SPLIT = """
SELECT event_id,
       CASE WHEN event_type IN ('click','view') THEN 'in' ELSE 'out' END AS direction,
       CAST(CASE WHEN event_type IN ('click','view') THEN CAST(value AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END AS DOUBLE) AS input_value,
       CAST(CASE WHEN event_type IN ('click','view') THEN CAST(0 AS DECIMAL(18,6)) ELSE CAST(value AS DECIMAL(18,6)) END AS DOUBLE) AS output_value
FROM events
"""


def q_minmax_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/S7 checkpoint reads: MIN/MAX high-water marks."""
    o, e = _load(spark, sf_dir, "orders", "events")
    a = o.agg(
        F.lit("orders").alias("table_name"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
    )
    b = e.agg(
        F.lit("events").alias("table_name"),
        F.min("event_id").cast("long").alias("min_key"),
        F.max("event_id").cast("long").alias("max_key"),
    )
    return a.unionByName(b)


ORACLE_MINMAX = """
SELECT 'orders' AS table_name, min(o_orderkey)::BIGINT AS min_key, max(o_orderkey)::BIGINT AS max_key FROM orders
UNION ALL
SELECT 'events', min(event_id)::BIGINT, max(event_id)::BIGINT FROM events
"""


# =====================================================================
# public contract
# =====================================================================

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pricing_summary": q_pricing_summary,
    "topk_revenue": q_topk_revenue,
    "local_supplier_volume": q_local_supplier_volume,
    "left_join_null": q_left_join_null,
    "semi_anti": q_semi_anti,
    "positional_adjacency": q_positional_adjacency,
    "trailing_window": q_trailing_window,
    "union_typed_null": q_union_typed_null,
    "range_const_frames": q_range_const_frames,
    "window_rownum_topk": q_window_rownum_topk,
    "boolean_split_swap": q_boolean_split_swap,
    "minmax_checkpoint": q_minmax_checkpoint,
}

_ORACLES: dict[str, str] = {
    "pricing_summary": ORACLE_PRICING,
    "topk_revenue": ORACLE_TOPK,
    "local_supplier_volume": ORACLE_LOCAL_SUPPLIER,
    "left_join_null": ORACLE_LEFT_JOIN,
    "semi_anti": ORACLE_SEMI_ANTI,
    "positional_adjacency": ORACLE_ADJACENCY,
    "trailing_window": ORACLE_TRAILING,
    "union_typed_null": ORACLE_UNION,
    "range_const_frames": ORACLE_RANGE_CONST,
    "window_rownum_topk": ORACLE_ROWNUM,
    "boolean_split_swap": ORACLE_BOOL_SPLIT,
    "minmax_checkpoint": ORACLE_MINMAX,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_local_supplier_volume(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
