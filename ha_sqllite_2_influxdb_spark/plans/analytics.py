"""General analytics surface (SURVEY §7.2 M3): joins, aggregations, windows,
set ops, pivot, rollup, top-k on the TPC-H-ish tables.

The reference delegates all of this to SQLite/Flux (SURVEY §4); here the
same declarative role is played by Catalyst — every query below is pure
DataFrame API, no UDFs, fully whole-stage-codegen'd.

Float-determinism design: money columns are exact 2-decimal values, so all
aggregates run on integer cents (``CAST(round(x*100) AS BIGINT)``) and
divide back at the end. Integer sums are associative → Spark's
partition-order-dependent summation and DuckDB's sequential summation give
bit-identical results, which makes the oracle value-hash exact rather than
tolerance-based. (At true 100 TB production scale the same pattern holds —
use DECIMAL columns; doubles-summation is the thing to avoid.)

Every ORDER BY feeding a LIMIT carries a unique tiebreaker so top-k is
deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table


def _cents(col):
    return F.round(col * 100).cast("long")


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------- queries

def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: the canonical wide aggregate.

    Map-side partial aggregation (hash agg) → single shuffle on the tiny
    (returnflag, linestatus) key space; no skew possible.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("2000-09-02"))
    )
    ep, d, t = _cents(F.col("l_extendedprice")), _cents(F.col("l_discount")), _cents(F.col("l_tax"))
    qty = F.col("l_quantity").cast("long")
    agg = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("_sq"),
            F.sum(ep).alias("_sbp"),
            F.sum(ep * (100 - d)).alias("_sdp"),
            F.sum(ep * (100 - d) * (100 + t)).alias("_sc"),
            F.sum(d).alias("_sd"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    n = F.col("count_order").cast("double")
    return agg.select(
        "l_returnflag", "l_linestatus",
        F.col("_sq").alias("sum_qty"),
        (F.col("_sbp") / 100.0).alias("sum_base_price"),
        (F.col("_sdp") / 10000.0).alias("sum_disc_price"),
        (F.col("_sc") / 1000000.0).alias("sum_charge"),
        (F.col("_sq").cast("double") / n).alias("avg_qty"),
        (F.col("_sbp").cast("double") / n / 100.0).alias("avg_price"),
        (F.col("_sd").cast("double") / n / 100.0).alias("avg_disc"),
        "count_order",
    )


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: 3-way join + agg + deterministic top-10.

    customer is the small side → broadcast; lineitem (the 100 TB side)
    never shuffles for the join, only for the final groupBy on o_orderkey.
    """
    cutoff = F.to_timestamp(F.lit("1998-03-15"))
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    rev = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("_r"))
        .select(
            "l_orderkey",
            (F.col("_r") / 10000.0).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: 6-way join, dims all broadcast."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    li = _t(spark, sf_dir, "lineitem")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust),
              (orders.o_custkey == cust.c_custkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg((F.sum(rev) / 10000.0).alias("revenue"))
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast revenue: pure scan-filter-agg (predicate pushdown)."""
    li = _t(spark, sf_dir, "lineitem")
    d = _cents(F.col("l_discount"))
    filtered = li.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
        & (F.col("l_quantity") < 24)
    ).filter((d >= 5) & (d <= 7))
    return filtered.agg(
        (F.sum(_cents(F.col("l_extendedprice")) * d) / 10000.0).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-style: top 20 customers by returned-item revenue, with nation."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(rev) / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 orders per customer by price (deterministic)."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.desc(_cents(F.col("o_totalprice"))), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-sum window: cumulative quantity per supplier over time.

    Integer quantities → exact running sums; full ordering tiebreaker
    (shipdate, orderkey, linenumber) makes every prefix deterministic.
    """
    li = _t(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return li.select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        F.sum(F.col("l_quantity").cast("long")).over(w).alias("running_qty"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (lag + cumulative flag sum): the classic
    streaming-ish window pattern run as batch. 30-minute inactivity gap."""
    ev = _t(spark, sf_dir, "events")
    us = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(us))
    with_sess = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    ).withColumn("session_id", F.sum("new_sess").over(
        us.rowsBetween(W.unboundedPreceding, 0)
    ))
    return (
        with_sess.groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION (distinct semantics, SURVEY §2.7)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey"))
    machinery = cust.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_custkey").alias("custkey"))
    big = orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey"))
    return (
        building.intersect(big)
        .union(machinery.exceptAll(machinery.intersect(big)))
        .distinct()
    )


def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type counts as fixed columns."""
    ev = _t(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .na.fill(0, kinds)
    )


def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets with exact money sums."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(_cents(F.col("o_totalprice"))) / 100.0).alias("total_price"),
        )
    )


def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate stats per segment; stddev hand-rolled from integer sums so
    both engines evaluate the identical double expression."""
    cust = _t(spark, sf_dir, "customer")
    c = _cents(F.col("c_acctbal"))
    agg = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        F.sum(c).alias("_s"),
        F.sum(c * c).alias("_ss"),
    )
    n = F.col("n_cust").cast("double")
    s, ss = F.col("_s").cast("double"), F.col("_ss").cast("double")
    return agg.select(
        "c_mktsegment", "n_cust", "n_nations", "min_bal", "max_bal",
        (s / n / 100.0).alias("avg_bal"),
        (F.sqrt((ss - s * s / n) / (n - 1)) / 100.0).alias("std_bal"),
    )


QUERIES = {
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
    "tpch_q6": q_tpch_q6,
    "top_customers": q_top_customers,
    "window_topk": q_window_topk,
    "window_running": q_window_running,
    "sessionize": q_sessionize,
    "set_ops": q_set_ops,
    "pivot_events": q_pivot_events,
    "rollup_orders": q_rollup_orders,
    "agg_stats": q_agg_stats,
}

# ---------------------------------------------------------------- oracles

_REV = "CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))"

ORACLES = {
    "tpch_q1": """
WITH c AS (
  SELECT l_returnflag, l_linestatus,
    CAST(l_quantity AS BIGINT) AS qty,
    CAST(round(l_extendedprice*100) AS BIGINT) AS ep,
    CAST(round(l_discount*100) AS BIGINT) AS d,
    CAST(round(l_tax*100) AS BIGINT) AS t
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
)
SELECT l_returnflag, l_linestatus,
  sum(qty) AS sum_qty,
  sum(ep) / 100.0 AS sum_base_price,
  sum(ep*(100-d)) / 10000.0 AS sum_disc_price,
  sum(ep*(100-d)*(100+t)) / 1000000.0 AS sum_charge,
  CAST(sum(qty) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
  CAST(sum(ep) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100.0 AS avg_price,
  CAST(sum(d) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100.0 AS avg_disc,
  count(*) AS count_order
FROM c GROUP BY l_returnflag, l_linestatus
""",
    "tpch_q3": f"""
SELECT l_orderkey,
  sum({_REV}) / 10000.0 AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
  o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
    "tpch_q5": f"""
SELECT n_name, sum({_REV}) / 10000.0 AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
    "tpch_q6": """
SELECT
  sum(CAST(round(l_extendedprice*100) AS BIGINT)
      * CAST(round(l_discount*100) AS BIGINT)) / 10000.0 AS revenue,
  count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_quantity < 24
  AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
""",
    "top_customers": f"""
SELECT c_custkey, c_name, n_name, sum({_REV}) / 10000.0 AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
    "window_topk": """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (
      PARTITION BY o_custkey
      ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC, o_orderkey ASC
    ) AS rk
  FROM orders
) t WHERE rk <= 3
""",
    "window_running": """
SELECT l_suppkey, l_orderkey, l_linenumber,
  sum(CAST(l_quantity AS BIGINT)) OVER (
    PARTITION BY l_suppkey
    ORDER BY l_shipdate, l_orderkey, l_linenumber
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS running_qty
FROM lineitem
""",
    "sessionize": """
WITH g AS (
  SELECT user_id, event_id, ts,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
),
s AS (
  SELECT user_id,
    sum(CASE WHEN gap IS NULL OR gap > 30*60*1000000 THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g
)
SELECT user_id, max(session_id) AS n_sessions, count(*) AS n_events
FROM s GROUP BY user_id
""",
    "set_ops": """
SELECT custkey FROM (
  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_totalprice > 300000
  UNION
  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
   EXCEPT
   (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000))
) t
""",
    "pivot_events": """
SELECT user_id,
  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
FROM events GROUP BY user_id
""",
    "rollup_orders": """
SELECT o_orderstatus, o_orderpriority,
  count(*) AS n_orders,
  sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    "agg_stats": """
WITH c AS (
  SELECT c_mktsegment, c_nationkey, c_acctbal,
    CAST(round(c_acctbal*100) AS BIGINT) AS cb
  FROM customer
),
a AS (
  SELECT c_mktsegment,
    count(*) AS n_cust,
    count(DISTINCT c_nationkey) AS n_nations,
    min(c_acctbal) AS min_bal,
    max(c_acctbal) AS max_bal,
    sum(cb) AS s, sum(cb*cb) AS ss
  FROM c GROUP BY c_mktsegment
)
SELECT c_mktsegment, n_cust, n_nations, min_bal, max_bal,
  CAST(s AS DOUBLE) / CAST(n_cust AS DOUBLE) / 100.0 AS avg_bal,
  sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/CAST(n_cust AS DOUBLE))
       / (CAST(n_cust AS DOUBLE) - 1)) / 100.0 AS std_bal
FROM a
""",
}
