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

# One-parse SQL texts for the three TPC-H headliners (r14, guide §5:
# the driver should do almost no work). The chained DataFrame builds
# below remain as the sameResult-pinned references
# (tests/test_plans.py::test_tpch_text_plans_equal_dataframe_builds);
# each build cost 0.16-0.26 s of eager per-call Catalyst analysis +
# py4j expression construction at ANY data size, the text parses once
# (measured min-of-10 in one JVM: q1 0.263→0.048, q3 0.189→0.057,
# q5 0.159→0.085 s). `100.0D`-style suffixes matter: a bare SQL float
# literal parses as DECIMAL, the DataFrame builds use Python doubles.
_CENTS_SQL = "CAST(round({c} * 100, 0) AS BIGINT)"
_EP = _CENTS_SQL.format(c="l_extendedprice")
_D = _CENTS_SQL.format(c="l_discount")
_TAX = _CENTS_SQL.format(c="l_tax")
_REV_SQL = f"{_EP} * (100 - {_D})"

_TPCH_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       _sq AS sum_qty,
       _sbp / 100.0D AS sum_base_price,
       _sdp / 10000.0D AS sum_disc_price,
       _sc / 1000000.0D AS sum_charge,
       CAST(_sq AS DOUBLE) / CAST(count_order AS DOUBLE) AS avg_qty,
       CAST(_sbp AS DOUBLE) / CAST(count_order AS DOUBLE) / 100.0D AS avg_price,
       CAST(_sd AS DOUBLE) / CAST(count_order AS DOUBLE) / 100.0D AS avg_disc,
       count_order
FROM (
  SELECT l_returnflag, l_linestatus,
         sum(FLOOR(l_quantity)) AS _sq,
         sum({_EP}) AS _sbp,
         sum({_EP} * (100 - {_D})) AS _sdp,
         sum({_EP} * (100 - {_D}) * (100 + {_TAX})) AS _sc,
         sum({_D}) AS _sd,
         count(1) AS count_order
  FROM {{lineitem}}
  WHERE l_shipdate <= to_timestamp('2000-09-02')
  GROUP BY l_returnflag, l_linestatus
)
"""


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: the canonical wide aggregate.

    Map-side partial aggregation (hash agg) → single shuffle on the tiny
    (returnflag, linestatus) key space; no skew possible. Ships as one
    SQL parse (plan-identical to `_q_tpch_q1_df`, sameResult-pinned).
    """
    from ..functions.sqlsplice import sql_with_plans

    return sql_with_plans(spark, _TPCH_Q1_SQL,
                          lineitem=_t(spark, sf_dir, "lineitem"))


def _q_tpch_q1_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained-DataFrame reference for the Q1 text above."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("2000-09-02"))
    )
    ep, d, t = _cents(F.col("l_extendedprice")), _cents(F.col("l_discount")), _cents(F.col("l_tax"))
    qty = F.floor("l_quantity")
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


_TPCH_Q3_SQL = f"""
SELECT l_orderkey,
       _r / 10000.0D AS revenue,
       date_format(o_orderdate, 'yyyy-MM-dd') AS o_orderdate,
       o_orderpriority
FROM (
  SELECT /*+ BROADCAST(c) */ l_orderkey, o_orderdate, o_orderpriority,
         sum({_REV_SQL}) AS _r
  FROM {{lineitem}}
  JOIN {{orders}} ON l_orderkey = o_orderkey
  JOIN (SELECT * FROM {{customer}} WHERE c_mktsegment = 'BUILDING') c
    ON o_custkey = c_custkey
  WHERE l_shipdate > to_timestamp('1998-03-15')
    AND o_orderdate < to_timestamp('1998-03-15')
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: 3-way join + agg + deterministic top-10.

    customer is the small side → broadcast; lineitem (the 100 TB side)
    never shuffles for the join, only for the final groupBy on o_orderkey.
    Ships as one SQL parse (plan-identical to `_q_tpch_q3_df`).
    """
    from ..functions.sqlsplice import sql_with_plans

    return sql_with_plans(spark, _TPCH_Q3_SQL,
                          lineitem=_t(spark, sf_dir, "lineitem"),
                          orders=_t(spark, sf_dir, "orders"),
                          customer=_t(spark, sf_dir, "customer"))


def _q_tpch_q3_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained-DataFrame reference for the Q3 text above."""
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


_TPCH_Q5_SQL = f"""
SELECT /*+ BROADCAST(s), BROADCAST(c), BROADCAST(n), BROADCAST(r) */ n_name,
       sum({_REV_SQL}) / 10000.0D AS revenue
FROM {{lineitem}}
JOIN (SELECT * FROM {{orders}}
      WHERE o_orderdate >= to_timestamp('1996-01-01')
        AND o_orderdate < to_timestamp('1997-01-01')) o
  ON l_orderkey = o_orderkey
JOIN {{supplier}} s ON l_suppkey = s_suppkey
JOIN {{customer}} c ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN {{nation}} n ON s_nationkey = n_nationkey
JOIN (SELECT * FROM {{region}} WHERE r_name = 'ASIA') r
  ON n_regionkey = r_regionkey
GROUP BY n_name
"""


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: 6-way join, dims all broadcast.
    Ships as one SQL parse (plan-identical to `_q_tpch_q5_df`)."""
    from ..functions.sqlsplice import sql_with_plans

    return sql_with_plans(spark, _TPCH_Q5_SQL,
                          lineitem=_t(spark, sf_dir, "lineitem"),
                          orders=_t(spark, sf_dir, "orders"),
                          supplier=_t(spark, sf_dir, "supplier"),
                          customer=_t(spark, sf_dir, "customer"),
                          nation=_t(spark, sf_dir, "nation"),
                          region=_t(spark, sf_dir, "region"))


def _q_tpch_q5_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained-DataFrame reference for the Q5 text above."""
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
        F.sum(F.floor("l_quantity")).over(w).alias("running_qty"),
    )


def q_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (vs `window_running`'s ROWS frame): per
    user, the trailing-1-hour event count and value sum at every event.

    A RANGE frame is defined by the ORDER-BY VALUE interval, so peers
    (equal timestamps) share one frame and no tiebreaker is needed for
    determinism — semantics a ROWS frame cannot express. Spark plans it
    as a single window over one (user) shuffle with a sliding frame
    pointer, not a self-join; integer-cents sums keep the oracle exact.
    """
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)  # trailing 1 h in µs, inclusive
    )
    return ev.select(
        "event_id", "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        (F.sum(F.round(F.col("value") * 100).cast("long")).over(w) / 100.0)
        .alias("sum_trailing_1h"),
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


def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — the one join type the surface didn't yet carry:
    per-nation supplier and customer account totals, nations appearing
    on either side surviving with NULL-filled partners.

    Both inputs pre-aggregate to nation-level BEFORE the join (two
    small-key shuffles + a join of ~25-row relations), never a full
    outer join of raw fact tables — the order-of-operations that matters
    at 100 TB. Full outer cannot broadcast (both sides must surface
    unmatched rows), so Spark plans a sort-merge join; the tiny key
    domain makes that cheap here and AQE handles it at scale."""
    supp = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            (F.sum(_cents(F.col("s_acctbal"))) / 100.0).alias("supp_acctbal"),
        )
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum(_cents(F.col("c_acctbal"))) / 100.0).alias("cust_acctbal"),
        )
    )
    return supp.join(cust, "nationkey", "full_outer").select(
        "nationkey", "n_suppliers", "supp_acctbal",
        "n_customers", "cust_acctbal",
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


def q_semi_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style EXISTS -> LEFT SEMI join: orders with at least one
    lineitem shipped >60 days after the order date, counted by priority.

    The semi join never materializes matched lineitems (probe-side
    short-circuit); lineitem, the 100 TB side, streams through the join
    without duplication. Catalyst plans the non-equi conjunct as a join
    residual on the equi-key join.
    """
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def q_anti_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS -> LEFT ANTI join: customers who never ordered, by
    segment. Anti join on the broadcastable key set of o_custkey."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum(_cents(F.col("c_acctbal"))) / 100.0).alias("total_acctbal"),
        )
    )


def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style conditional aggregation: monthly revenue share of
    PROMO parts in 1997. part is the dimension -> broadcast; one shuffle
    on the 12-key month space."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    part = _t(spark, sf_dir, "part")
    rev = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("month"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
            .alias("_pr"),
            F.sum(rev).alias("_r"),
        )
    )
    return agg.select(
        "month",
        (F.col("_pr") / 10000.0).alias("promo_revenue"),
        (F.lit(100.0) * F.col("_pr").cast("double")
         / F.col("_r").cast("double")).alias("promo_share_pct"),
    )


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style decorrelated scalar subquery: revenue of lineitems
    with quantity below 20% of their part's average, for one brand.

    The correlated `avg(l_quantity) per part` becomes a pre-aggregation
    joined back on l_partkey — the standard decorrelation Catalyst would
    also produce; the brand filter broadcasts, and the per-part agg
    shuffles only (partkey, sum, count), not rows.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    per_part = li.groupBy("l_partkey").agg(
        F.avg(F.floor("l_quantity")).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, "l_partkey")
        .filter(F.col("l_quantity").cast("double") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(_cents(F.col("l_extendedprice"))).cast("double")
             / 100.0 / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume orders: HAVING on a per-order qty sum,
    joined back to customer; deterministic top-20."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    per_order = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.floor("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.desc(_cents(F.col("o_totalprice"))), F.asc("o_orderkey"))
        .limit(20)
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN: for every purchase event, the most recent view by the
    same user at or before the purchase time (SURVEY 2.3 names as-of as
    the robust form of the reference's backfill boundary).

    Spark-first formulation: UNION both sides tagged, ONE window pass per
    user ordered by (ts, kind) with `last(..., ignorenulls)` carrying the
    latest view struct forward. Single shuffle on user_id, sorted once —
    at 100 TB this beats any inequality join (no range explosion, no
    per-row probe); it is the standard distributed as-of shape.
    DuckDB oracle: native ASOF JOIN.
    """
    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value", F.lit(0).alias("kind")
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value", F.lit(1).alias("kind")
    )
    # views sort before purchases at equal ts -> `>=` (inclusive) as-of
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    matched = F.last(
        F.when(F.col("kind") == 0, F.struct("ts", "value")), ignorenulls=True
    ).over(w)
    return (
        views.unionByName(purch)
        .withColumn("m", matched)
        .filter((F.col("kind") == 1) & F.col("m").isNotNull())
        .select(
            "event_id", "user_id",
            F.unix_micros("ts").alias("purchase_us"),
            F.unix_micros("m.ts").alias("view_us"),
            F.col("m.value").alias("view_value"),
        )
    )


#: non-uniform price bands for the range join (lo inclusive, hi exclusive)
PRICE_BANDS = [
    ("nano", 0, 1_000), ("micro", 1_000, 5_000), ("small", 5_000, 20_000),
    ("mid", 20_000, 60_000), ("large", 60_000, 150_000),
    ("jumbo", 150_000, 600_000),
]


def q_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join: orders binned into non-uniform price bands.

    The band table is tiny -> broadcast nested-loop join IS the right
    physical plan (6 comparisons per row, zero shuffle). For a large
    band relation the scale path is bucket decomposition: explode each
    band into fixed-width buckets, equi-join on bucket, re-filter exact
    bounds — same results, shuffle on bucket keys.
    """
    orders = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        PRICE_BANDS, "band string, lo long, hi long"
    )
    cents = _cents(F.col("o_totalprice"))
    return (
        orders.join(
            F.broadcast(bands),
            (cents >= F.col("lo") * 100) & (cents < F.col("hi") * 100),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents) / 100.0).alias("total_price"),
        )
    )


def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) of account balance per
    segment, computed on integer cents so both engines interpolate the
    same integers. At 100 TB the scale path is approx_percentile
    (t-digest sketch, one pass, mergeable) — exact percentile requires a
    per-group sort and is the deliberate precision tier here."""
    cust = _t(spark, sf_dir, "customer")
    c = _cents(F.col("c_acctbal"))
    agg = cust.groupBy("c_mktsegment").agg(
        F.expr(
            "percentile(CAST(round(c_acctbal*100) AS BIGINT),"
            " array(0.25D, 0.5D, 0.9D))"
        ).alias("q")
    )
    return agg.select(
        "c_mktsegment",
        (F.col("q")[0] / 100.0).alias("p25"),
        (F.col("q")[1] / 100.0).alias("p50"),
        (F.col("q")[2] / 100.0).alias("p90"),
    )


def q_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user counts per event type — the 100 TB
    tier of countDistinct: one pass, fixed-size mergeable sketch per
    group, no second shuffle for dedup. rsd=0.01 ≈ 1.1 KB of state per
    group vs a hash set of every user id. No SQL oracle (estimates are
    implementation-specific); tests assert the error bound vs exact.
    """
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01)
            .alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def q_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna) of order price per priority —
    the sketch tier of `quantiles`: mergeable, bounded-memory, one pass.
    accuracy=10000 bounds rank error at n/10000. Rows-only check; the
    exact-percentile counterpart (`quantiles`) is the oracle-checked tier.
    """
    orders = _t(spark, sf_dir, "orders")
    c = _cents(F.col("o_totalprice"))
    agg = orders.groupBy("o_orderpriority").agg(
        F.percentile_approx(c, [0.5, 0.95], 10000).alias("q"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return agg.select(
        "o_orderpriority",
        (F.col("q")[0] / 100.0).alias("p50"),
        (F.col("q")[1] / 100.0).alias("p95"),
        "n_orders",
    )


def q_distinct_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type via the skew-safe two-phase
    shape (dedup on the composite key, then count) — see operators.skew."""
    from ..operators.skew import two_phase_distinct

    return two_phase_distinct(
        _t(spark, sf_dir, "events"), "event_type", "user_id"
    )


def q_unpivot_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long melt): part's numeric attributes to
    (attribute, value) rows. Spark plans df.unpivot as Expand — one
    narrow pass, rows×n_attrs out, no shuffle at all; the oracle uses
    the dialect-portable UNION ALL formulation."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    ).unpivot(
        "p_partkey", ["p_size", "p_retailprice"], "attribute", "value"
    )


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostics on events.event_type — measure
    before you salt (operators.skew.skew_report): top-5 keys by row
    count + a summary row with n_keys and the max/mean straggler
    ratio. The global rank window runs on the already-aggregated
    |distinct keys| relation, never the raw table."""
    from ..operators.skew import skew_report

    return skew_report(load_table(spark, sf_dir, "events"),
                       ["event_type"])


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient join (operators.skew.salted_join): lineitem×supplier
    on a salted composite key, then per-nation totals. Salting must be
    RESULT-INVISIBLE — the oracle is the plain unsalted join, so any
    salt-induced row loss/duplication hash-mismatches immediately."""
    from ..operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", F.floor("l_quantity").alias("qty")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    return (
        salted_join(li, supp, "l_suppkey", n_salts=8)
        .groupBy("s_nationkey")
        .agg(F.sum("qty").alias("total_qty"),
             F.count(F.lit(1)).alias("n_lineitems"))
    )


def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-function battery over one window spec: lag/lead, ntile,
    percent_rank, and a RANGE frame min — one sort per partition serves
    all five functions (Spark evaluates same-spec windows in one pass)."""
    orders = _t(spark, sf_dir, "orders")
    cents = _cents(F.col("o_totalprice"))
    w = W.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"),
                                           F.asc("o_orderkey"))
    wr = (
        W.partitionBy("o_custkey")
        .orderBy(cents)
        .rangeBetween(-1_000_00, 0)
    )
    return orders.select(
        "o_custkey", "o_orderkey",
        F.date_format(F.lag("o_orderdate").over(w), "yyyy-MM-dd")
         .alias("prev_date"),
        F.date_format(F.lead("o_orderdate").over(w), "yyyy-MM-dd")
         .alias("next_date"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        (F.min(cents).over(wr) / 100.0).alias("min_price_within_1k"),
    )


def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets + grouping_id: all 4 rollup combinations of
    (status, priority) in one pass (Expand + single shuffle)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(_cents(F.col("o_totalprice"))) / 100.0)
            .alias("total_price"),
        )
    )


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping: 4-way fact join + two nation lookups.

    The two nation joins are the same tiny table under different roles —
    explicitly broadcast twice (alias per role); the symmetric nation-pair
    predicate filters AFTER both lookups resolve. Fact-side joins shuffle
    on their natural keys; AQE broadcasts supplier when it fits."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"),
                       F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    ep, d = _cents(F.col("l_extendedprice")), _cents(F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(ep * (100 - d)) / 10000.0).alias("revenue"))
    )


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned items: who returned the most revenue in a
    quarter. Aggregate BEFORE the wide output projection; top-20 via
    TakeOrderedAndProject on the cents sum with custkey tiebreak."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-04-01")))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    ep, d = _cents(F.col("l_extendedprice")), _cents(F.col("l_discount"))
    agg = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(ep * (100 - d)).alias("_rev"))
    )
    return (
        agg.orderBy(F.desc("_rev"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey", "c_name",
            (F.col("_rev") / 10000.0).alias("revenue"),
            "c_acctbal", "n_name",
        )
    )


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue: OR-of-ANDs across both join sides.

    Catalyst extracts the common l_partkey=p_partkey conjunct so this
    stays ONE equi-join (not a nested-loop theta join); the disjunction
    evaluates post-join. Single-row exact-cents result."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#24") & F.col("p_size").between(1, 15)
           & q.between(20, 30))
    )
    ep, d = _cents(F.col("l_extendedprice")), _cents(F.col("l_discount"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(band)
        .agg((F.sum(ep * (100 - d)) / 10000.0).alias("revenue"))
    )


def _views(spark, sf_dir, *names):
    """Register parquet tables as temp views for the SQL-surface queries."""
    for n in names:
        _t(spark, sf_dir, n).createOrReplaceTempView(f"sq_{n}")


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (adapted: EXISTS condition is l_shipdate > o_orderdate —
    the fixture has no l_commitdate/l_receiptdate): correlated EXISTS via
    the SQL surface. Catalyst decorrelates it into a LEFT SEMI hash join
    on l_orderkey — no per-row subquery execution; at scale this is one
    shuffle on the join key (or broadcast if the filtered orders side is
    small). Reference has no subqueries (SURVEY §2.3), beyond-reference.
    """
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql("""
        SELECT o_orderpriority, count(*) AS order_count
        FROM sq_orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM sq_lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """)


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (adapted: p_size <= 15 stands in for p_container):
    correlated SCALAR subquery — avg quantity per part. Catalyst
    decorrelates into an aggregate on l_partkey joined back to lineitem;
    both sides shuffle on partkey once. Quantities are integral doubles,
    so 0.2*avg is bit-deterministic across engines (exact integer sums
    below 2^53). Beyond-reference (SURVEY §2.3: no subqueries)."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql("""
        -- CAST to DOUBLE: Spark parses the 700.0 literal as DECIMAL(4,1)
        -- and long/decimal yields decimal, while the oracle emits double
        SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)
               / 700.0 AS avg_yearly
        FROM sq_lineitem JOIN sq_part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23' AND p_size <= 15
          AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                            FROM sq_lineitem l2
                            WHERE l2.l_partkey = sq_part.p_partkey)
    """)


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: HAVING-filtered aggregate as the
    IN-subquery build side. The per-order qty sum shuffles lineitem once
    on its natural key; the >300 filter makes the surviving set tiny, so
    AQE turns the orders join into a broadcast at any scale. Top-k via
    TakeOrderedAndProject (no global sort), cents tiebreak for
    cross-engine determinism."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.floor("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .orderBy(F.desc(_cents(F.col("o_totalprice"))), F.asc("o_orderkey"))
        .limit(100)
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice", "sum_qty",
        )
    )


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted: segments stand in for phone country codes):
    global-avg SCALAR subquery + NOT EXISTS anti-join against customers
    with no 1999+ orders ("lapsed" — every fixture customer has SOME
    order, so the pure form is vacuous). The 1-row average is broadcast
    (explicitly — never a driver collect); the anti-join shuffles on
    custkey or broadcasts the filtered key projection under AQE.
    All balance math in integer cents → exact cross-engine parity."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    bal = _cents(F.col("c_acctbal"))
    avg_row = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg(bal).alias("avg_bal"))
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("1999-01-01"))
    ).select("o_custkey")
    return (
        cust.withColumn("bal_cents", bal)
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .crossJoin(F.broadcast(avg_row))
        .filter(F.col("bal_cents") > F.col("avg_bal"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("bal_cents") / 100.0).alias("totacctbal"),
        )
    )


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: NATION_1 suppliers' share of
    AMERICA-region PROMO-part revenue per order year.

    The deepest join tree in the suite (lineitem ⋈ orders ⋈ customer ⋈
    nation ⋈ region ⋈ supplier ⋈ nation ⋈ part): every dimension is
    broadcast — lineitem shuffles exactly once, for the 2-key year
    aggregate. The share is a conditional-sum ratio on integer cents, so
    cross-engine parity is exact."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    nc = nation.select(F.col("n_nationkey").alias("c_nk"),
                       F.col("n_regionkey").alias("c_rk"))
    ns = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    rev = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    nrev = F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(F.lit(0))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(nrev).cast("double") / F.sum(rev).cast("double"))
            .alias("mkt_share")
        )
    )


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit (adapted: p_retailprice stands in
    for ps_supplycost — the fixture has no partsupp table): per supplier
    nation and order year, profit = discounted revenue minus quantity ×
    cost for parts whose name contains 'green'.

    part/supplier/nation broadcast; lineitem shuffles once for the
    orders join (orders is not broadcastable at scale) and once for the
    (nation, year) aggregate. All money math in integer cents. The
    part-name filter uses 'red' — the fixture's adjective vocabulary has
    no 'green' (the classic parameter)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    ).select("p_partkey", "p_retailprice")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ep, d = _cents(F.col("l_extendedprice")), _cents(F.col("l_discount"))
    cost = _cents(F.col("p_retailprice"))
    qty = F.floor("l_quantity")
    # rev is in cents·100 (price×(100-disc)); scale cost×qty to match
    profit = ep * (100 - d) - cost * qty * 100
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(profit) / 10000.0).alias("sum_profit"))
    )


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution (adapted: the
    order-comment exclusion becomes an o_orderpriority exclusion — the
    fixture has no comment column).

    LEFT join keeps order-less customers (c_count = 0); two cascaded
    aggregations, each one shuffle — the second lands on the tiny count
    domain. count(o_orderkey) counts matches only, exactly the
    outer-join semantics the distribution needs."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    counts = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SQL surface): two independent rollup
    dimensions + grand total in ONE Expand + ONE shuffle — vs three
    separate aggregates unioned (three scans, three shuffles)."""
    _views(spark, sf_dir, "orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               grouping_id(o_orderstatus, o_orderpriority) AS gid,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS total_price
        FROM sq_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


def q_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style merge: a corrections batch (every 5th event, value
    bumped, timestamp one hour later) reconciled into the events table,
    latest version wins. One shuffle on the merge key."""
    from ..operators.merge import upsert_latest

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    updates = (
        ev.filter(F.col("event_id") % 5 == 0)
        .withColumn("value", F.col("value") + 1000.0)
        .withColumn(
            "ts", F.timestamp_micros(F.unix_micros("ts") + 3_600_000_000)
        )
    )
    merged = upsert_latest(ev, updates, keys=["event_id"], version_col="ts")
    return merged.select(
        "event_id", F.unix_micros("ts").alias("ts_us"),
        "user_id", "event_type", "value",
    )


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion (view → click → purchase): per user,
    the earliest time each step completes GIVEN the previous step
    already had — the sequential-dependency analytics pattern.

    Decorrelated into three conditional min-aggregations on the same
    user_id key (step N's filter references step N−1's time via a
    re-join on the key): identical partitioning end-to-end, so Catalyst
    plans one logical key shuffle and two co-partitioned joins — never a
    per-user sort or an ordered array_agg (at scale a user's history
    doesn't need materializing to answer 'first completion time').
    """
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    s1 = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    s2 = (
        ev.join(s1, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.join(s2, "user_id")
        .filter((F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t2")))
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left").join(s3, "user_id", "left")
        .select(
            "user_id",
            F.unix_micros("t1").alias("view_us"),
            F.unix_micros("t2").alias("click_us"),
            F.unix_micros("t3").alias("purchase_us"),
            (F.col("t2").isNotNull().cast("int")
             + F.col("t3").isNotNull().cast("int") + 1).alias("steps_done"),
        )
    )


def q_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with forward fill (last observation
    carried forward) — the canonical sensor-history operator for this
    engine's domain: per user, an hourly grid spanning [first, last]
    event hour, each slot carrying the hour's last reading or the most
    recent prior one, with gap slots flagged.

    Shape: per-hour last-reading dedup (row_number on (user, hour)),
    per-user span agg, `sequence()`+explode for the grid (no
    crossJoin with a calendar table), left join, then ONE ordered
    window for the fill — every stage keys on user_id, and the first
    grid slot always holds a real reading (the span starts at an
    event), so the fill never sees a leading NULL.
    """
    ev = _t(spark, sf_dir, "events")
    b = ev.select("user_id", "ts", "event_id", "value")
    h = F.date_trunc("hour", F.col("ts"))
    wlast = W.partitionBy("user_id", "h").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    hv = (
        b.withColumn("h", h)
        .withColumn("rk", F.row_number().over(wlast))
        .filter(F.col("rk") == 1)
        .select("user_id", "h", "value")
    )
    span = b.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("h"),
    )
    j = grid.join(hv, ["user_id", "h"], "left")
    wfill = W.partitionBy("user_id").orderBy("h").rowsBetween(
        W.unboundedPreceding, 0
    )
    return j.select(
        "user_id",
        F.unix_micros("h").alias("grid_us"),
        F.last("value", ignorenulls=True).over(wfill).alias("value_locf"),
        F.col("value").isNull().alias("gap_filled"),
    )


def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user robust outlier summary via EXACT median + MAD — no
    percentile_approx, no float medians: values quantize to integer
    cents, the median lives in the 2×cents domain (odd n → doubled
    middle element, even n → sum of the two middle elements) and the MAD
    in 4×cents, so every comparison — |value−med| > 3·MAD as
    2·dev2 > 3·mad4 — is integer-exact and engine-reproducible.

    Shape: both order statistics are row_number windows keyed on
    user_id, the same partitioning as every groupBy/join here — ONE key
    shuffle end-to-end at scale; medians-of-groups never touch a global
    sort. (The sketch tier for this is `quantiles`/`sketch_quantiles`;
    this is the exact tier with the robust-statistics application.)
    """
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("cv")
    )
    wo = W.partitionBy("user_id").orderBy("cv")
    wp = W.partitionBy("user_id")
    ranked = base.withColumn("rn", F.row_number().over(wo)).withColumn(
        "cnt", F.count(F.lit(1)).over(wp)
    )
    mid = ranked.filter(
        (F.col("rn") == F.expr("(cnt + 1) div 2"))
        | (F.col("rn") == F.expr("cnt div 2 + 1"))
    )
    med = mid.groupBy("user_id").agg(
        F.sum("cv").alias("_s"), F.count(F.lit(1)).alias("_k"),
        F.max("cnt").alias("n_events"),
    ).select(
        "user_id", "n_events",
        F.when(F.col("_k") == 1, 2 * F.col("_s"))
        .otherwise(F.col("_s")).alias("med2"),
    )
    dev = base.join(med, "user_id").withColumn(
        "dev2", F.abs(2 * F.col("cv") - F.col("med2"))
    )
    wd = W.partitionBy("user_id").orderBy("dev2")
    dranked = dev.withColumn("rn", F.row_number().over(wd))
    dmid = dranked.filter(
        (F.col("rn") == F.expr("(n_events + 1) div 2"))
        | (F.col("rn") == F.expr("n_events div 2 + 1"))
    )
    mad = dmid.groupBy("user_id").agg(
        F.sum("dev2").alias("_s"), F.count(F.lit(1)).alias("_k"),
    ).select(
        "user_id",
        F.when(F.col("_k") == 1, 2 * F.col("_s"))
        .otherwise(F.col("_s")).alias("mad4"),
    )
    flagged = dev.join(mad, "user_id").withColumn(
        "is_out",
        F.when(2 * F.col("dev2") > 3 * F.col("mad4"), 1).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        (F.max("med2") / 200.0).alias("median_value"),
        (F.max("mad4") / 400.0).alias("mad_value"),
        F.sum("is_out").alias("n_outliers"),
    )


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build from a change log:
    collapse consecutive equal values per key, emit validity intervals
    [valid_from, valid_to) with NULL-open current rows.

    The standard warehouse pattern: lag() marks change points, the
    filtered change set gets lead() for interval ends. Both windows key
    on user_id — ONE shuffle; the second window reuses the first's
    partitioning (filter preserves distribution), so Catalyst plans a
    single Exchange. Deterministic under ts ties via the event_id
    tie-break.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    us = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.withColumn("prev_type", F.lag("event_type").over(us)).filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    lead_ts = F.lead("ts").over(us)
    return changes.select(
        "user_id", "event_type",
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(lead_ts).alias("valid_to_us"),
        lead_ts.isNull().alias("is_current"),
    )


def q_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (AS OF) join — the feature-store correctness
    pattern: each purchase fact picks up the user's activity-state
    interval (SCD2 history built from their NON-purchase events) that
    was valid AT the purchase timestamp, never a later one (no leakage
    from the future). Scalable shape: the interval relation is
    change-points only (collapsed, small per user); candidates join on
    user with valid_from <= ts and reduce by arg-max valid_from — a
    max(struct) aggregate on the fact key, no window over raw events.
    Purchases before any state land with NULL state (LEFT join)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    us = W.partitionBy("user_id").orderBy("ts", "event_id")
    nonp = ev.filter(F.col("event_type") != "purchase")
    changes = (
        nonp.withColumn("prev_type", F.lag("event_type").over(us))
        .filter(F.col("prev_type").isNull()
                | (F.col("prev_type") != F.col("event_type")))
        .select("user_id", F.col("event_type").alias("state"),
                F.unix_micros("ts").alias("valid_from_us"))
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    # the temporal predicate must ride IN the left join: filtering after
    # it would erase facts whose states all start in the future, while
    # the PIT contract keeps them with a NULL state. The dimension key
    # is renamed up front — dropping a join-ambiguous column by
    # reference resolves unpredictably.
    dim = changes.withColumnRenamed("user_id", "_c_uid")
    cand = facts.join(
        dim,
        (facts.user_id == dim._c_uid)
        & (dim.valid_from_us <= facts.ts_us),
        "left",
    ).drop("_c_uid")
    return (
        cand.groupBy("event_id")
        .agg(
            F.first("user_id").alias("user_id"),
            F.first("ts_us").alias("ts_us"),
            F.max(F.struct("valid_from_us", "state")).alias("_m"),
        )
        .select(
            "event_id", "user_id", "ts_us",
            F.col("_m.state").alias("state_at_purchase"),
            F.col("_m.valid_from_us").alias("state_from_us"),
        )
    )


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=3) of the co-purchase graph by iterative
    peeling, 5 fixed rounds: drop nodes with degree < k, re-derive the
    induced subgraph, repeat — the density filter under community and
    spam-cluster analysis. Fixed rounds make the iterative operator
    oracle-checkable by unrolled CTEs (pagerank/LPA precedent); each
    round is one degree aggregate + two semi joins on the (persisted)
    edge relation. Returns surviving (node, deg) after round 5."""
    from ..operators.graph import copurchase_edges

    k = 3
    edges = copurchase_edges(
        _t(spark, sf_dir, "lineitem")
    ).localCheckpoint(eager=False)
    sym = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    for _ in range(5):
        deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("u")
        sym = (
            sym.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
    return sym.groupBy("u").agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    ).select(F.col("u").alias("node"), "deg")


def _kcore_oracle(k: int = 3, rounds: int = 5, min_co: int = 2) -> str:
    its = []
    for r in range(1, rounds + 1):
        its.append(f"""
d{r - 1} AS (SELECT u, count(*) AS deg FROM s{r - 1} GROUP BY u),
k{r - 1} AS (SELECT u FROM d{r - 1} WHERE deg >= {k}),
s{r} AS (
  SELECT s.u, s.v FROM s{r - 1} s
  WHERE EXISTS (SELECT 1 FROM k{r - 1} a WHERE a.u = s.u)
    AND EXISTS (SELECT 1 FROM k{r - 1} b WHERE b.u = s.v)
)""")
    return f"""
WITH pr AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a
  JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
e AS (SELECT u, v FROM pr GROUP BY u, v HAVING count(*) >= {min_co}),
s0 AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
{",".join(its)}
SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
FROM s{rounds} GROUP BY u
"""


def q_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-key over (user bucket, minute bucket): the layout key
    `operators.merge.zorder_layout` range-partitions writes by, so
    min/max stats prune scans on either dimension."""
    from ..operators.merge import zorder_key

    ev = _t(spark, sf_dir, "events")
    keyed = ev.select(
        "event_id",
        F.pmod(F.col("user_id"), F.lit(1 << 16)).alias("xdim"),
        F.expr("(unix_micros(ts) div 60000000) % 65536").alias("ydim"),
    )
    return keyed.withColumn(
        "zkey", zorder_key(F.col("xdim"), F.col("ydim"))
    )


def q_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH attribution: each purchase credits its full value to
    the user's most recent prior click/view/signup within a 24 h
    lookback ('direct' when none) — the default attribution model of
    every web-analytics stack. One user_id window (last_value IGNORE
    NULLS over a running frame) on one shuffle; the per-touch rollup
    aggregates map-side onto the tiny touch-type key space. Values
    micro-quantize before the rollup sum, so cross-partition order
    cannot flip bits."""
    return last_touch_attribution(_t(spark, sf_dir, "events"))


def last_touch_attribution(events: DataFrame) -> DataFrame:
    """The attribution plan on an arbitrary events relation (schema:
    user_id, ts, event_id, event_type, value) — split out of
    q_touch_attribution so the 10× scale probe can drive the same code
    path on its replicated corpus."""
    ev = events.select(
        "user_id", "ts", "event_id", "event_type", "value")
    us = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = us.rowsBetween(W.unboundedPreceding, -1)
    touch_t = F.when(
        F.col("event_type").isin("click", "view", "signup"),
        F.col("event_type"))
    touch_ts = F.when(touch_t.isNotNull(), F.unix_micros(F.col("ts")))
    marked = ev.select(
        "user_id", "ts", "event_id", "event_type", "value",
        F.last(touch_t, ignorenulls=True).over(run).alias("_lt"),
        F.last(touch_ts, ignorenulls=True).over(run).alias("_lt_us"),
    )
    day_us = 24 * 3600 * 1_000_000
    attributed = marked.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("_lt").isNotNull()
            & (F.unix_micros(F.col("ts")) - F.col("_lt_us") <= day_us),
            F.col("_lt"),
        ).otherwise(F.lit("direct")).alias("touch"),
        F.round(F.col("value") * 1e6).cast("long").alias("_v_micro"),
    )
    return attributed.groupBy("touch").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        (F.sum("_v_micro") / 1e6).alias("attributed_value"),
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-activity
    week, then distinct-active counts per (cohort, week offset) with the
    retention ratio against cohort size — the standard product-analytics
    triangle the reference's events stream feeds at scale.

    Shape: first-activity and the activity join both key on user_id (one
    logical key shuffle, co-partitioned join); the (cohort, offset)
    aggregate runs on the *distinct* per-user activity relation so hot
    users collapse before the cohort shuffle; cohort sizes are a
    vocabulary-sized relation broadcast back. week_offset is an exact
    multiple of 7 days, so the /7 double is integer-valued and the
    bigint cast is truncation-free in both engines.
    """
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_w")
    )
    sizes = first.groupBy("cohort_w").agg(
        F.count("*").alias("cohort_users")
    )
    act = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_w",
            (F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_w"))
             / 7).cast("bigint").alias("week_offset"),
        )
        .distinct()
    )
    ret = act.groupBy("cohort_w", "week_offset").agg(
        F.count("*").alias("active_users")
    )
    return ret.join(F.broadcast(sizes), "cohort_w").select(
        F.date_format("cohort_w", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "active_users",
        "cohort_users",
        (F.col("active_users").cast("double")
         / F.col("cohort_users").cast("double")).alias("retention"),
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the event stream: for
    each (event_type → next event_type) edge, its count and conditional
    probability — session path analysis / next-action modeling.

    Shape: ONE user_id shuffle for the per-user ordered `lead` (unique
    (ts, event_id) tiebreak makes the successor deterministic), then the
    edge count aggregates map-side onto the tiny type×type key space; the
    out-degree normalization is a window over that vocabulary-sized
    relation, not the corpus. The probability divides the same longs in
    the same order on both engines, so the doubles are bit-identical.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    trans = nxt.groupBy("event_type", "next_type").agg(
        F.count("*").alias("n")
    )
    out = W.partitionBy("event_type")
    return trans.select(
        "event_type",
        "next_type",
        "n",
        F.sum("n").over(out).alias("out_total"),
        (F.col("n").cast("double")
         / F.sum("n").over(out).cast("double")).alias("p"),
    )


#: columns profiled by q_profile_columns — exact-cents money/quantity
#: columns so min/max/sum stay in the integer domain (module docstring)
PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount")


def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of lineitem's numeric columns in ONE scan:
    per column the non-null count, exact distinct count, min/max/sum in
    integer cents — the table-health summary a pipeline runs before
    trusting a new 100 TB drop.

    Shape: a single global aggregate (partial map-side combine, 1-row
    result) followed by a driver-free `stack` unpivot to long format.
    Multiple exact count_distincts expand the scan 3× internally
    (Catalyst's Expand) — still one pass over the files; the
    approximate tier for wider tables is `sketch_distinct`.
    """
    li = _t(spark, sf_dir, "lineitem")
    aggs = []
    for c in PROFILE_COLS:
        x = _cents(F.col(c))
        aggs += [
            F.count(F.col(c)).alias(f"nn_{c}"),
            F.countDistinct(x).alias(f"nd_{c}"),
            F.min(x).alias(f"mn_{c}"),
            F.max(x).alias(f"mx_{c}"),
            F.sum(x).alias(f"sm_{c}"),
        ]
    row = li.agg(F.count("*").alias("n_rows"), *aggs)
    stack = "stack({}, {}) AS (column_name, n_nonnull, n_distinct, min_cents, max_cents, sum_cents)".format(
        len(PROFILE_COLS),
        ", ".join(
            f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}, sm_{c}"
            for c in PROFILE_COLS
        ),
    )
    return row.select("n_rows", F.expr(stack)).select(
        "column_name", "n_rows", "n_nonnull", "n_distinct",
        "min_cents", "max_cents", "sum_cents",
    )


#: anomaly threshold: |value − seasonal mean| > 100.00 units (in cents)
ANOMALY_T_CENTS = 10_000


def q_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly detection over the sensor/event stream:
    flag readings deviating > 100 units from their (user, hour-of-day)
    seasonal mean — the alerting primitive for exactly the sensor-history
    data the reference migrates.

    Exactness: the predicate is the cross-multiplied integer form
    ``|v_cents·n − Σcents| > T·n`` (no float mean in the filter), so the
    flag set is bit-reproducible and engine-identical; the reported
    deviation divides the same longs in the same order on both engines.

    Shape (100 TB): baseline and comparison fuse into ONE window over
    (user_id, hour-of-day) — a single corpus shuffle, no second baseline
    relation and no join-back; the filter then drops 97% of rows before
    anything else happens.
    """
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    vc = F.round(F.col("value") * 100).cast("long")
    base = ev.select(
        "event_id", "user_id",
        F.hour("ts").alias("hod"), vc.alias("vc"),
    )
    w = W.partitionBy("user_id", "hod")
    n = F.count(F.lit(1)).over(w)
    s = F.sum("vc").over(w)
    return (
        base.select(
            "event_id", "user_id", "hod",
            F.col("vc").alias("value_cents"),
            n.alias("n_obs"),
            ((F.col("vc").cast("double")
              - s.cast("double") / n.cast("double"))
             / F.lit(100.0)).alias("deviation"),
            (F.abs(F.col("vc") * n - s)
             > F.lit(ANOMALY_T_CENTS) * n).alias("_flag"),
        )
        .filter(F.col("_flag"))
        .drop("_flag")
    )


def q_path_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path mining: the 25 most common within-session
    event-type sequences (30-min gap sessions, same windows as
    q_sessionize) — the sequence-pattern summary behind funnel design.

    The per-session path is `array_sort(collect_list(struct(ts,
    event_id, event_type)))` — collect_list alone is partition-order
    nondeterministic; sorting on the unique (ts, event_id) prefix
    makes the path reproducible and oracle-equal. Materializing a
    session's events into one array is bounded by session length (the
    30-min gap caps it), never by corpus size; the path-frequency
    groupBy then aggregates a sessions-sized relation with map-side
    combine, and top-25 is TakeOrderedAndProject.
    """
    ev = _t(spark, sf_dir, "events")
    us = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(us))
    ws = (
        ev.withColumn(
            "new_sess",
            F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1)
            .otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_sess").over(us.rowsBetween(W.unboundedPreceding, 0)),
        )
    )
    paths = ws.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            " > ",
        ).alias("path"),
        F.count(F.lit(1)).alias("n_steps"),
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_steps").alias("n_steps"),
        )
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(25)
    )


def q_triangle_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle participation in the co-purchase graph (parts
    bought together in >=2 orders): degree-oriented wedge enumeration +
    one equi-join close — see operators.graph.triangle_counts for why
    this shape survives power-law hubs at 100 TB."""
    from ..operators.graph import copurchase_edges, triangle_counts

    return triangle_counts(
        copurchase_edges(_t(spark, sf_dir, "lineitem"))
    )


def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, the latency from FIRST
    signup to the first purchase at-or-after it, histogrammed by whole
    hours — the activation-funnel timing readout. Latencies are exact
    integer microsecond differences bucketed by integer division (no
    float time math); users who sign up but never purchase afterward
    land in the explicit 'never' bucket (-1) so the funnel loss is in
    the same relation. Two conditional-min aggregations on one user
    shuffle; the histogram is a tiny second aggregate."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.unix_micros("ts"))
        ).alias("s_us"),
    )
    first_purchase = (
        ev.select("user_id", F.unix_micros("ts").alias("p_us"),
                  "event_type")
        .filter(F.col("event_type") == "purchase")
        .join(per_user, "user_id")
        .filter(F.col("p_us") >= F.col("s_us"))
        .groupBy("user_id")
        .agg(F.min("p_us").alias("p_us"), F.first("s_us").alias("s_us"))
    )
    signed = per_user.filter(F.col("s_us").isNotNull())
    latencies = (
        signed.join(first_purchase.select("user_id", "p_us"),
                    "user_id", "left")
        .select(
            F.when(
                F.col("p_us").isNotNull(),
                ((F.col("p_us") - F.col("s_us"))
                 / F.lit(3_600_000_000)).cast("long"),
            ).otherwise(F.lit(-1)).alias("latency_hours")
        )
    )
    return (
        latencies.groupBy("latency_hours")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("latency_hours")
    )


def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type (the finance bar aggregation):
    open/close are selected by a DETERMINISTIC total order (ts,
    event_id) — `first(value)` under a bare groupBy would be
    partition-order-dependent — via one window rank on the same
    (type, hour) shuffle the aggregate itself needs; high/low/volume
    come from integer-cents min/max/sum. One shuffle total."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", "ts").alias("hour"),
        "ts", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("event_type", "hour")
    marked = (
        ev.withColumn(
            "_rn_a",
            F.row_number().over(w.orderBy("ts", "event_id")),
        )
        .withColumn(
            "_rn_d",
            F.row_number().over(
                w.orderBy(F.desc("ts"), F.desc("event_id"))
            ),
        )
    )
    return (
        marked.groupBy("event_type", "hour")
        .agg(
            (F.max(F.when(F.col("_rn_a") == 1, F.col("cents"))) / 100.0)
            .alias("open"),
            (F.max("cents") / 100.0).alias("high"),
            (F.min("cents") / 100.0).alias("low"),
            (F.max(F.when(F.col("_rn_d") == 1, F.col("cents"))) / 100.0)
            .alias("close"),
            F.count(F.lit(1)).alias("n_trades"),
            (F.sum("cents") / 100.0).alias("volume"),
        )
    )


def q_data_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-completeness monitoring: every (event_type, hour) cell of
    the full observation calendar with ZERO events — the missing-feed
    alarm every ingest pipeline needs. The calendar derives from the
    data's own bounds (sequence over the min/max hour — a 1-row
    aggregate, never a collect), crosses the tiny type dimension, and
    anti-joins the observed cells; at 100 TB the observed relation is
    the only big input and it arrives pre-aggregated."""
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    types = ev.select("event_type").distinct()
    observed = ev.select(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).distinct()
    return (
        hours.crossJoin(types)
        .join(observed, ["event_type", "hour"], "left_anti")
        .orderBy("event_type", "hour")
    )


def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap matrix: for every event-type pair, the distinct
    users doing BOTH, plus each side's audience and the overlap Jaccard
    — the segment-intersection question behind every campaign-planning
    tool. Shape: the corpus collapses ONCE to the distinct (type, user)
    relation; the pair overlap is a self-join on user_id (shuffle keyed
    by user, pairs generated inside the join, aggregated map-side) —
    never a distinct-count per pair over raw events."""
    ev = _t(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"),
                      F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"),
                      F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a", "type_b", "n_both", "n_a", "n_b",
            (F.col("n_both").cast("double")
             / (F.col("n_a") + F.col("n_b") - F.col("n_both"))
             .cast("double")).alias("jaccard"),
        )
    )


def q_ab_proportion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on conversion (a purchase over 150) by
    variant (user_id % 2) — the readout that decides an experiment.
    Everything derives from four integer counts; the z statistic's only
    irrational op is sqrt, which IEEE-754 requires CORRECTLY ROUNDED
    (unlike ln/exp), so the double is engine-exact."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when((F.col("event_type") == "purchase")
                   & (F.col("value") > 150), 1).otherwise(0)
        ).alias("converted")
    ).withColumn("variant", F.pmod("user_id", F.lit(2)))
    counts = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    w = counts.groupBy().pivot("variant", [0, 1]).agg(
        F.first("n").alias("n"), F.first("conv").alias("conv")
    )
    n0, c0 = F.col("0_n"), F.col("0_conv")
    n1, c1 = F.col("1_n"), F.col("1_conv")
    p0 = c0.cast("double") / n0.cast("double")
    p1 = c1.cast("double") / n1.cast("double")
    pp = (c0 + c1).cast("double") / (n0 + n1).cast("double")
    se = F.sqrt(
        pp * (F.lit(1.0) - pp)
        * (F.lit(1.0) / n0.cast("double") + F.lit(1.0) / n1.cast("double"))
    )
    return w.select(
        n0.cast("long").alias("n_control"),
        c0.cast("long").alias("conv_control"),
        n1.cast("long").alias("n_treat"),
        c1.cast("long").alias("conv_treat"),
        p0.alias("p_control"), p1.alias("p_treat"),
        ((p1 - p0) / se).alias("z"),
    )


def q_sketch_hll_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGEABLE-sketch storage pattern (Apache DataSketches HLL):
    build one HLL sketch per (day, event_type) — the artifact a 100 TB
    store persists per partition — then answer the month-level distinct
    question by UNIONING sketches, never rescanning events. Rows-only
    (estimates); pytest bounds the estimate against the exact distinct
    and asserts the union-of-sketches estimate equals the
    one-shot-sketch estimate (mergeability)."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
            .cast("long").alias("approx_users_month"),
            F.count(F.lit(1)).cast("long").alias("n_daily_sketches"),
        )
    )


def q_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apriori level-3 market-basket mining: frequent part TRIPLES
    (support >= 2 orders) grown from the frequent-pair relation — the
    candidate join is pair x item WITHIN the same order, so the
    combinatorial space prunes by the downward-closure property instead
    of enumerating all C(basket,3) triples. One pair shuffle (reused
    from copurchase), one candidate shuffle, exact counts."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_partkey").alias("item")
    ).distinct()
    a = li.select("l_orderkey", F.col("item").alias("u"))
    b = li.select("l_orderkey", F.col("item").alias("v"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 2)
        .select("u", "v")
    )
    # candidate triples: frequent pair x third item in the SAME order
    per_order_pairs = (
        a.join(b, "l_orderkey").filter(F.col("u") < F.col("v"))
        .join(pairs, ["u", "v"], "left_semi")
    )
    triples = (
        per_order_pairs
        .join(li.select("l_orderkey", F.col("item").alias("w")),
              "l_orderkey")
        .filter(F.col("w") > F.col("v"))
        .groupBy("u", "v", "w")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )
    return triples


def q_cuped_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B readout with CUPED variance reduction: per-variant adjusted
    post-period mean via theta from five integer sums — no per-row
    float accumulation anywhere (operators/experiment.py)."""
    from ..operators.experiment import cuped_readout

    return cuped_readout(_t(spark, sf_dir, "events"))


def q_behavior_allpairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL user pairs with event-sequence 3-gram Jaccard >= 0.35 —
    exact, via prefix filtering (operators.dedup.allpairs_jaccard):
    behavioral similarity is moderate by nature (max ~0.49 on this
    fixture), where banded MinHash-LSH recall collapses; the
    prefix-filter index finds every pair with zero false negatives."""
    from ..operators.dedup import allpairs_jaccard

    ev = _t(spark, sf_dir, "events")
    corpus = (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda x: x.getField("event_type"),
                ),
                " ",
            ).alias("text")
        )
        .select(F.col("user_id").alias("doc_id"), "text")
    )
    return allpairs_jaccard(corpus, threshold=0.35)


def q_sequence_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral similarity search: top-20 users by event-sequence
    trigram Jaccard vs user 0 (operators/sequence.py — ordered streams,
    broadcast query set, no pairwise join)."""
    from ..operators.sequence import user_sequence_similarity

    return user_sequence_similarity(_t(spark, sf_dir, "events"))


def q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction the typed way: events.props parses
    through `from_json` with an explicit schema (JVM-side, one pass —
    never per-field get_json_object re-parses), malformed documents
    land as NULL and are counted, and the typed column aggregates like
    any other. At 100 TB the schema-first parse is the difference
    between one Jackson pass per row and one per extracted field."""
    ev = _t(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
            .cast("long").alias("n_unparsed"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
    )


def q_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier BFS from the minimum part id over the co-purchase
    graph: every node within 4 hops with its hop distance
    (operators.graph.bfs_distances, unrolled-CTE oracle)."""
    from ..operators.graph import bfs_distances, copurchase_edges

    return bfs_distances(
        copurchase_edges(_t(spark, sf_dir, "lineitem"))
    )


def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 predicted co-purchase links by neighborhood Jaccard over
    non-adjacent distance-2 part pairs (operators.graph.link_prediction
    — the 'also bought' candidate feature, oracle-exact)."""
    from ..operators.graph import copurchase_edges, link_prediction

    return link_prediction(
        copurchase_edges(_t(spark, sf_dir, "lineitem"))
    )


def q_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the co-purchase graph: deterministic
    synchronous label propagation, 5 fixed iterations (neighbors-only
    vote, min-label tie-break) — oracle-checked by unrolled CTEs like
    the PageRank family; see operators.graph.lpa_communities."""
    from ..operators.graph import copurchase_edges, lpa_communities

    return lpa_communities(
        copurchase_edges(_t(spark, sf_dir, "lineitem"))
    )


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: the part↔supplier relation comes from
    DISTINCT lineitem pairs instead of the absent partsupp, and the
    qualifier is a size band instead of region/type): for each
    qualifying part, the supplier(s) with the MINIMUM account balance
    among its shippers — the per-GROUP min correlated subquery,
    decorrelated to a keyed aggregate joined back on the correlation key
    (q15 is the global-scalar cousin; q17 the per-group average).

    Scale shape: the (part, supp) pair relation distincts once (its own
    shuffle), supplier and the filtered part dimension broadcast, the
    per-part min re-joins on the aggregate's own partitioning, and the
    final ordering is TakeOrdered top-100 — lineitem itself never joins
    a second time. Ties on the min balance keep every tying supplier,
    exactly like the spec query."""
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey").distinct()
    )
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_size").between(15, 20)
    ).select("p_partkey", "p_brand", "p_type")
    shippers = ps.join(F.broadcast(supp),
                       F.col("l_suppkey") == F.col("s_suppkey"))
    mins = shippers.groupBy("l_partkey").agg(
        F.min("s_acctbal").alias("_min_bal")
    )
    return (
        shippers.join(mins, "l_partkey")
        .filter(F.col("s_acctbal") == F.col("_min_bal"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_brand", "p_type",
                "s_suppkey", "s_name", "s_acctbal")
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"), F.asc("s_suppkey"))
        .limit(100)
    )


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: the driver schema has no partsupp, so
    the "inventory value" relation is part itself): total retail value
    per p_type, keeping groups above 2% of the GLOBAL value.

    The defining plan: one groupBy, then a filter of groups against a
    BROADCAST 1-row scalar of the whole relation — groups never shuffle
    against groups. The 2% threshold compares exact integers
    (50·value > total ⟺ value > 0.02·total), so the oracle hash is
    exact, not tolerance-based."""
    part = _t(spark, sf_dir, "part")
    v = part.groupBy("p_type").agg(
        F.sum(_cents(F.col("p_retailprice"))).alias("_v")
    )
    total = v.agg(F.sum("_v").alias("_tot"))
    return (
        v.join(F.broadcast(total))
        .filter(F.col("_v") * 50 > F.col("_tot"))
        .select("p_type", (F.col("_v") / 100.0).alias("value"))
    )


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: no l_shipmode/l_receiptdate in the
    driver schema — "late" is shipping >60 days after the order date and
    the grouping key is the ship month of 1997): per month, how many
    late lineitems belonged to high-priority vs other orders.

    orders joins as the dimension side; the CASE-routed double count is
    one pass, one shuffle on the 12-key month space."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: quarterly revenue per supplier, keeping
    the supplier(s) whose revenue EQUALS the maximum (the correlated
    `= (SELECT max(...))` shape, decorrelated to a broadcast 1-row max
    joined back — no second scan of lineitem, no window over the whole
    revenue relation). Ties all surface, exactly like the spec query."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_cents(F.col("l_extendedprice"))
              * (100 - _cents(F.col("l_discount")))).alias("_r")
    )
    mx = rev.agg(F.max("_r").alias("_mx"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("_r") == F.col("_mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name",
                (F.col("_r") / 10000.0).alias("total_revenue"))
    )


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: supplier-per-part relationships come
    from lineitem instead of the absent partsupp): distinct supplier
    count per (p_brand, p_size) for mid-size non-excluded brands.

    part is the broadcast dimension; count(DISTINCT l_suppkey) plans as
    the two-phase expand/partial-agg — the (key, suppkey) pairs shuffle
    deduped, never raw lineitems."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").between(10, 25)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: the part qualifier is p_type = 'PROMO'
    instead of the absent p_name LIKE / partsupp availability check):
    suppliers who shipped more than 150 units of PROMO parts in 1997 —
    a two-level IN chain planned as semi joins.

    Qualifying parts broadcast into lineitem; the per-supplier HAVING
    sum reduces to a small suppkey set that broadcasts into supplier as
    a LEFT SEMI probe — supplier never shuffles."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    promo = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    heavy = (
        li.join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.floor("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 150)
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(heavy),
                  F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: with no commit/receipt dates, "the
    supplier who kept the order waiting" is the strictly-LAST shipper of
    a late multi-supplier finished order): per supplier name, how many
    such orders.

    The spec's EXISTS/NOT EXISTS pair maps to a LEFT SEMI then a LEFT
    ANTI self-join of lineitem, each an equi-join on l_orderkey whose
    inequality conjuncts ride as join residuals — no cross product, and
    the 100 TB side streams through both probes once."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    l2 = li.select(F.col("l_orderkey").alias("_k2"),
                   F.col("l_suppkey").alias("_s2"))
    l3 = li.select(F.col("l_orderkey").alias("_k3"),
                   F.col("l_suppkey").alias("_s3"),
                   F.col("l_shipdate").alias("_d3"))
    waited = (
        l1.join(l2, (F.col("_k2") == F.col("l_orderkey"))
                & (F.col("_s2") != F.col("l_suppkey")), "left_semi")
        .join(l3, (F.col("_k3") == F.col("l_orderkey"))
              & (F.col("_s3") != F.col("l_suppkey"))
              & (F.col("_d3") > F.col("l_shipdate")), "left_anti")
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        waited.join(F.broadcast(supp),
                    F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


#: admission rules for the ingest pipeline — shared between the Spark
#: plan and the generated oracle so the two sides cannot drift
_INGEST_VALUE_LO, _INGEST_VALUE_HI = 0, 95
_INGEST_TYPES = ("click", "view", "purchase", "signup", "error")


def q_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end ingest refresh as ONE composed plan — the production
    loop every 100 TB event store runs per arriving shard: the delta
    (event_id % 10 >= 8) passes a row-local admission gate (value range,
    known event type, non-null user — rows failing any rule are dropped
    to quarantine), and ONLY the admitted rows' partial aggregate state
    monoid-merges with the base shard's state (operators/merge.py) into
    the refreshed per-type stats. The base side is scanned once for its
    state and the gate never touches it; at scale the base state would
    be the PERSISTED artifact of the previous refresh, so the marginal
    cost is one delta scan + a |keys|-row merge. The oracle recomputes
    the same admission set from scratch — composed correctness, the
    curate_pipeline precedent on the analytics side."""
    from ..operators.merge import agg_state, finalize_agg, merge_agg_states

    ev = _t(spark, sf_dir, "events")
    base = ev.filter(F.col("event_id") % 10 < 8)
    delta = ev.filter(F.col("event_id") % 10 >= 8)
    admitted = delta.filter(
        F.coalesce(
            F.col("value").between(_INGEST_VALUE_LO, _INGEST_VALUE_HI)
            & F.col("event_type").isin(*_INGEST_TYPES)
            & F.col("user_id").isNotNull(),
            F.lit(False),
        )
    )
    states = [agg_state(s, ["event_type"], "value")
              for s in (base, admitted)]
    return finalize_agg(merge_agg_states(states, ["event_type"]))


def q_daily_new_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active / new / returning users + cumulative reach — the
    product-analytics staple computed the scalable way: 'new' is derived
    from each user's min-first-day relation (one user-keyed shuffle,
    map-side combined) instead of any day-over-day distinct scan, and
    cumulative reach is the running sum of n_new over the (tiny) daily
    relation — NOT a running count-distinct over events. At 100 TB the
    only corpus-scale work is two user/day aggregations; the window
    runs over |days| rows."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    )
    day_users = ev.distinct()
    first_day = day_users.groupBy("user_id").agg(
        F.min("day").alias("first_day")
    )
    daily = (
        day_users.join(first_day, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(
                F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
            ).cast("long").alias("n_new"),
        )
        .withColumn("n_returning", F.col("n_active") - F.col("n_new"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.withColumn(
        "cum_users", F.sum("n_new").over(w).cast("long")
    )


def q_quarantine_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter routing: every lineitem row tagged with the exact
    rules it violates (fixed order) + quarantined flag — the per-row
    companion of data_expectations (operators/validate.py)."""
    from ..operators.validate import quarantine_rows

    return quarantine_rows(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    )


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: per-event-type stats
    maintained as mergeable partial states. The events relation is split
    deterministically into a 'base' shard (event_id % 10 < 8) and a
    'delta' shard; each shard's state is computed independently
    (operators/merge.py agg_state), monoid-merged, and finalized. The
    oracle is the FULL direct aggregate — proving merged incremental
    state equals a from-scratch recompute, which is what lets a 100 TB
    rolling aggregate refresh scan only the arriving delta."""
    from ..operators.merge import agg_state, finalize_agg, merge_agg_states

    ev = _t(spark, sf_dir, "events")
    base = ev.filter(F.col("event_id") % 10 < 8)
    delta = ev.filter(F.col("event_id") % 10 >= 8)
    states = [agg_state(s, ["event_type"], "value") for s in (base, delta)]
    return finalize_agg(merge_agg_states(states, ["event_type"]))


def q_data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style ingest validation: a 7-rule suite (null / range /
    domain / composite-key uniqueness / referential integrity) over
    lineitem+orders in 2 scans + 1 keyed shuffle + 1 anti join — see
    operators/validate.py for the 100 TB shape."""
    from ..operators.validate import expectations_report

    return expectations_report(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    )


QUERIES = {
    "grouping_sets": q_grouping_sets,
    "tpch_q7": q_tpch_q7,
    "tpch_q10": q_tpch_q10,
    "tpch_q19": q_tpch_q19,
    "tpch_q4": q_tpch_q4,
    "tpch_q17": q_tpch_q17,
    "tpch_q18": q_tpch_q18,
    "tpch_q22": q_tpch_q22,
    "tpch_q8": q_tpch_q8,
    "tpch_q9": q_tpch_q9,
    "tpch_q13": q_tpch_q13,
    "tpch_q2": q_tpch_q2,
    "tpch_q11": q_tpch_q11,
    "tpch_q12": q_tpch_q12,
    "tpch_q15": q_tpch_q15,
    "tpch_q16": q_tpch_q16,
    "tpch_q20": q_tpch_q20,
    "tpch_q21": q_tpch_q21,
    "unpivot_part": q_unpivot_part,
    "salted_join": q_salted_join,
    "skew_report": q_skew_report,
    "window_analytics": q_window_analytics,
    "cube_orders": q_cube_orders,
    "distinct_twophase": q_distinct_twophase,
    "sketch_distinct": q_sketch_distinct,
    "sketch_quantiles": q_sketch_quantiles,
    "semi_late_orders": q_semi_late_orders,
    "anti_no_orders": q_anti_no_orders,
    "promo_share": q_promo_share,
    # TPC-H Q14 IS the promo-share query — registered under both names so
    # the 22/22 TPC-H adaptation coverage is explicit in the registry
    "tpch_q14": q_promo_share,
    "small_qty_revenue": q_small_qty_revenue,
    "big_orders": q_big_orders,
    "asof_join": q_asof_join,
    "range_band_join": q_range_band_join,
    "quantiles": q_quantiles,
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
    "tpch_q6": q_tpch_q6,
    "top_customers": q_top_customers,
    "window_topk": q_window_topk,
    "window_running": q_window_running,
    "window_time_range": q_window_time_range,
    "sessionize": q_sessionize,
    "set_ops": q_set_ops,
    "full_outer_join": q_full_outer_join,
    "pivot_events": q_pivot_events,
    "rollup_orders": q_rollup_orders,
    "agg_stats": q_agg_stats,
    "upsert_latest": q_upsert_latest,
    "scd2_intervals": q_scd2_intervals,
    "robust_outliers": q_robust_outliers,
    "resample_locf": q_resample_locf,
    "funnel_steps": q_funnel_steps,
    "cohort_retention": q_cohort_retention,
    "touch_attribution": q_touch_attribution,
    "event_transitions": q_event_transitions,
    "profile_columns": q_profile_columns,
    "path_mining": q_path_mining,
    "triangle_copurchase": q_triangle_copurchase,
    "lpa_communities": q_lpa_communities,
    "link_prediction": q_link_prediction,
    "bfs_distances": q_bfs_distances,
    "json_props_stats": q_json_props_stats,
    "sequence_similarity": q_sequence_similarity,
    "behavior_allpairs": q_behavior_allpairs,
    "cuped_readout": q_cuped_readout,
    "frequent_triples": q_frequent_triples,
    "audience_overlap": q_audience_overlap,
    "ohlc_bars": q_ohlc_bars,
    "conversion_latency": q_conversion_latency,
    "pit_join": q_pit_join,
    "kcore": q_kcore,
    "data_gaps": q_data_gaps,
    "ab_proportion_test": q_ab_proportion_test,
    "sketch_hll_partitioned": q_sketch_hll_partitioned,
    "seasonal_anomaly": q_seasonal_anomaly,
    "zorder_events": q_zorder_events,
    "data_expectations": q_data_expectations,
    "incremental_agg": q_incremental_agg,
    "daily_new_returning": q_daily_new_returning,
    "quarantine_rows": q_quarantine_rows,
    "ingest_pipeline": q_ingest_pipeline,
}

# ---------------------------------------------------------------- oracles

_REV = "CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))"

ORACLES = {
    "grouping_sets": """
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus, o_orderpriority) AS gid,
       count(*) AS n_orders,
       sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    "tpch_q2": """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
sh AS (
  SELECT l_partkey, s_suppkey, s_name, s_acctbal
  FROM ps JOIN supplier ON l_suppkey = s_suppkey
)
SELECT p_partkey, p_brand, p_type, s_suppkey, s_name, s_acctbal
FROM sh
JOIN part ON l_partkey = p_partkey
WHERE p_size BETWEEN 15 AND 20
  AND s_acctbal = (SELECT min(s2.s_acctbal) FROM sh s2
                   WHERE s2.l_partkey = sh.l_partkey)
ORDER BY s_acctbal DESC, p_partkey ASC, s_suppkey ASC
LIMIT 100
""",
    "tpch_q11": """
WITH v AS (
  SELECT p_type, sum(CAST(round(p_retailprice*100) AS BIGINT)) AS _v
  FROM part GROUP BY p_type
)
SELECT p_type, _v / 100.0 AS value
FROM v WHERE _v * 50 > (SELECT sum(_v) FROM v)
""",
    "tpch_q12": """
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY strftime(l_shipdate, '%Y-%m')
""",
    "tpch_q15": """
WITH rev AS (
  SELECT l_suppkey,
    sum(CAST(round(l_extendedprice*100) AS BIGINT)
        * (100 - CAST(round(l_discount*100) AS BIGINT))) AS _r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, _r / 10000.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE _r = (SELECT max(_r) FROM rev)
""",
    "tpch_q16": """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size BETWEEN 10 AND 25
GROUP BY p_brand, p_size
""",
    "tpch_q20": """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
  HAVING sum(CAST(floor(l_quantity) AS BIGINT)) > 150
)
""",
    "tpch_q21": """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name
""",
    "tpch_q7": """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  year(l_shipdate) AS l_year,
  sum(CAST(round(l_extendedprice*100) AS BIGINT)
      * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
""",
    "tpch_q8": f"""
SELECT year(o_orderdate) AS o_year,
  CAST(sum(CASE WHEN ns.n_name = 'NATION_1' THEN {_REV} ELSE 0 END)
       AS DOUBLE) / CAST(sum({_REV}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region   ON nc.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN part     ON l_partkey = p_partkey
WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY year(o_orderdate)
""",
    "tpch_q9": """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
  sum(CAST(round(l_extendedprice*100) AS BIGINT)
      * (100 - CAST(round(l_discount*100) AS BIGINT))
      - CAST(round(p_retailprice*100) AS BIGINT)
        * CAST(floor(l_quantity) AS BIGINT) * 100) / 10000.0 AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
""",
    "tpch_q13": """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) t
GROUP BY c_count
""",
    "tpch_q10": """
SELECT c_custkey, c_name, _rev / 10000.0 AS revenue, c_acctbal, n_name
FROM (
  SELECT c_custkey, c_name, c_acctbal, n_name,
    sum(CAST(round(l_extendedprice*100) AS BIGINT)
        * (100 - CAST(round(l_discount*100) AS BIGINT))) AS _rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1996-04-01'
    AND l_returnflag = 'R'
  GROUP BY c_custkey, c_name, c_acctbal, n_name
) t
ORDER BY _rev DESC, c_custkey ASC
LIMIT 20
""",
    "tpch_q19": """
SELECT sum(CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0
       AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
    "tpch_q4": """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
    "tpch_q17": """
SELECT sum(CAST(round(l_extendedprice*100) AS BIGINT)) / 700.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23' AND p_size <= 15
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
""",
    "tpch_q18": """
SELECT c_name, c_custkey, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN (SELECT l_orderkey,
             CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(floor(l_quantity) AS BIGINT)) > 300) b
  ON o_orderkey = b.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC, o_orderkey
LIMIT 100
""",
    "tpch_q22": """
SELECT c_mktsegment, count(*) AS numcust,
  sum(CAST(round(c_acctbal*100) AS BIGINT)) / 100.0 AS totacctbal
FROM customer
WHERE CAST(round(c_acctbal*100) AS BIGINT) >
      (SELECT avg(CAST(round(c_acctbal*100) AS BIGINT))
       FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_mktsegment
""",
    "unpivot_part": """
SELECT p_partkey, 'p_size' AS attribute, CAST(p_size AS DOUBLE) AS value
FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice', CAST(p_retailprice AS DOUBLE)
FROM part
""",
    "skew_report": """
WITH counts AS (
  SELECT event_type, count(*) AS cnt FROM events GROUP BY 1
),
ranked AS (
  SELECT CAST(event_type AS VARCHAR) AS key, cnt,
    row_number() OVER (ORDER BY cnt DESC,
                       CAST(event_type AS VARCHAR)) AS rank,
    CAST(sum(cnt) OVER () AS BIGINT) AS total,
    CAST(count(*) OVER () AS BIGINT) AS nkeys,
    CAST(max(cnt) OVER () AS BIGINT) AS mx
  FROM counts
)
SELECT CAST(rank AS INT) AS rank, key, CAST(cnt AS BIGINT) AS cnt,
  CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS share
FROM ranked WHERE rank <= 5
UNION ALL
SELECT 0, '__summary__', nkeys,
  CAST(mx AS DOUBLE) * CAST(nkeys AS DOUBLE) / CAST(total AS DOUBLE)
FROM ranked WHERE rank = 1
""",
    "salted_join": """
SELECT s_nationkey,
       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty,
       count(*) AS n_lineitems
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
""",
    "window_analytics": """
SELECT o_custkey, o_orderkey,
  strftime(lag(o_orderdate) OVER w, '%Y-%m-%d') AS prev_date,
  strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS next_date,
  ntile(4) OVER w AS quartile,
  percent_rank() OVER w AS pr,
  min(CAST(round(o_totalprice*100) AS BIGINT)) OVER (
    PARTITION BY o_custkey ORDER BY CAST(round(o_totalprice*100) AS BIGINT)
    RANGE BETWEEN 100000 PRECEDING AND CURRENT ROW) / 100.0
    AS min_price_within_1k
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
""",
    "cube_orders": """
SELECT o_orderstatus, o_orderpriority,
  GROUPING(o_orderstatus, o_orderpriority) AS gid,
  count(*) AS n_orders,
  sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    "distinct_twophase": """
SELECT event_type, count(DISTINCT user_id) AS n_distinct_user_id
FROM events GROUP BY event_type
""",
    "semi_late_orders": """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
""",
    "anti_no_orders": """
SELECT c_mktsegment, count(*) AS n_customers,
  sum(CAST(round(c_acctbal*100) AS BIGINT)) / 100.0 AS total_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
""",
    "promo_share": f"""
WITH j AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
    CASE WHEN p_type = 'PROMO' THEN {_REV} ELSE 0 END AS pr,
    {_REV} AS r
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
)
SELECT month, sum(pr) / 10000.0 AS promo_revenue,
  100.0 * CAST(sum(pr) AS DOUBLE) / CAST(sum(r) AS DOUBLE)
    AS promo_share_pct
FROM j GROUP BY month
""",
    "small_qty_revenue": """
WITH pp AS (
  SELECT l_partkey, avg(CAST(floor(l_quantity) AS BIGINT)) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT
  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)
    / 100.0 / 7.0 AS avg_yearly,
  count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#23'
JOIN pp USING (l_partkey)
WHERE CAST(l_quantity AS DOUBLE) < 0.2 * avg_qty
""",
    "big_orders": """
WITH po AS (
  SELECT l_orderkey,
         CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 250
)
SELECT c_custkey, c_name, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice, sum_qty
FROM po
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC, o_orderkey ASC
LIMIT 20
""",
    "asof_join": """
SELECT p.event_id, p.user_id,
  epoch_us(p.ts) AS purchase_us,
  epoch_us(v.ts) AS view_us,
  v.value AS view_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
""",
    "range_band_join": """
SELECT band, count(*) AS n_orders,
  sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS total_price
FROM orders
JOIN (VALUES
  ('nano', 0, 1000), ('micro', 1000, 5000), ('small', 5000, 20000),
  ('mid', 20000, 60000), ('large', 60000, 150000),
  ('jumbo', 150000, 600000)
) AS b(band, lo, hi)
  ON CAST(round(o_totalprice*100) AS BIGINT) >= lo * 100
 AND CAST(round(o_totalprice*100) AS BIGINT) < hi * 100
GROUP BY band
""",
    "quantiles": """
SELECT c_mktsegment,
  quantile_cont(CAST(round(c_acctbal*100) AS BIGINT), 0.25) / 100.0 AS p25,
  quantile_cont(CAST(round(c_acctbal*100) AS BIGINT), 0.5) / 100.0 AS p50,
  quantile_cont(CAST(round(c_acctbal*100) AS BIGINT), 0.9) / 100.0 AS p90
FROM customer GROUP BY c_mktsegment
""",
    "tpch_q1": """
WITH c AS (
  SELECT l_returnflag, l_linestatus,
    CAST(floor(l_quantity) AS BIGINT) AS qty,
    CAST(round(l_extendedprice*100) AS BIGINT) AS ep,
    CAST(round(l_discount*100) AS BIGINT) AS d,
    CAST(round(l_tax*100) AS BIGINT) AS t
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
)
SELECT l_returnflag, l_linestatus,
  CAST(sum(qty) AS BIGINT) AS sum_qty,
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
    "full_outer_join": """
WITH s AS (
  SELECT s_nationkey AS nationkey, count(*) AS n_suppliers,
         sum(CAST(round(s_acctbal*100) AS BIGINT)) / 100.0 AS supp_acctbal
  FROM supplier GROUP BY s_nationkey
),
c AS (
  SELECT c_nationkey AS nationkey, count(*) AS n_customers,
         sum(CAST(round(c_acctbal*100) AS BIGINT)) / 100.0 AS cust_acctbal
  FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY c_nationkey
)
SELECT coalesce(s.nationkey, c.nationkey) AS nationkey,
       n_suppliers, supp_acctbal, n_customers, cust_acctbal
FROM s FULL OUTER JOIN c ON s.nationkey = c.nationkey
""",
    "window_time_range": """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
  count(*) OVER w AS n_trailing_1h,
  sum(CAST(round(value*100) AS BIGINT)) OVER w / 100.0 AS sum_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
    "window_running": """
SELECT l_suppkey, l_orderkey, l_linenumber,
  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) OVER (
    PARTITION BY l_suppkey
    ORDER BY l_shipdate, l_orderkey, l_linenumber
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS BIGINT) AS running_qty
FROM lineitem
""",
    "touch_attribution": """
WITH m AS (
  SELECT user_id, ts, event_id, event_type, value,
    last_value(CASE WHEN event_type IN ('click','view','signup')
                    THEN event_type END IGNORE NULLS) OVER run AS lt,
    last_value(CASE WHEN event_type IN ('click','view','signup')
                    THEN epoch_us(ts) END IGNORE NULLS) OVER run AS lt_us
  FROM events
  WINDOW run AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
att AS (
  SELECT CASE WHEN lt IS NOT NULL
               AND epoch_us(ts) - lt_us <= 86400000000
              THEN lt ELSE 'direct' END AS touch,
    CAST(round(value * 1e6) AS BIGINT) AS v_micro
  FROM m WHERE event_type = 'purchase'
)
SELECT touch, count(*)::BIGINT AS n_conversions,
  CAST(sum(v_micro) AS BIGINT) / 1e6 AS attributed_value
FROM att GROUP BY touch
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
    CAST(sum(CASE WHEN gap IS NULL OR gap > 30*60*1000000 THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS BIGINT) AS session_id
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
    "upsert_latest": """
WITH base AS (
  SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value,
         0 AS src
  FROM events
),
upd AS (
  SELECT event_id, epoch_us(ts) + 3600000000 AS ts_us, user_id,
         event_type, value + 1000.0 AS value, 1 AS src
  FROM events WHERE event_id % 5 = 0
),
u AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY event_id ORDER BY ts_us DESC, src DESC) AS rk
  FROM u
)
SELECT event_id, ts_us, user_id, event_type, value FROM r WHERE rk = 1
""",
    "seasonal_anomaly": f"""
WITH w AS (
  SELECT event_id, user_id, hour(ts) AS hod,
    CAST(round(value*100) AS BIGINT) AS vc,
    count(*) OVER (PARTITION BY user_id, hour(ts)) AS n,
    CAST(sum(CAST(round(value*100) AS BIGINT))
         OVER (PARTITION BY user_id, hour(ts)) AS BIGINT) AS s
  FROM events
)
SELECT event_id, user_id, hod, vc AS value_cents,
  CAST(n AS BIGINT) AS n_obs,
  (CAST(vc AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0
    AS deviation
FROM w
WHERE abs(vc * n - s) > {ANOMALY_T_CENTS} * n
""",
    "path_mining": """
WITH g AS (
  SELECT user_id, event_id, ts, event_type,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
),
s AS (
  SELECT user_id, event_id, ts, event_type,
    CAST(sum(CASE WHEN gap IS NULL OR gap > 30*60*1000000 THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS BIGINT) AS session_id
  FROM g
),
p AS (
  SELECT user_id, session_id,
    string_agg(event_type, ' > ' ORDER BY ts, event_id) AS path,
    count(*)::BIGINT AS n_steps
  FROM s GROUP BY user_id, session_id
)
SELECT path, count(*)::BIGINT AS n_sessions, max(n_steps) AS n_steps
FROM p GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT 25
""",
    "cohort_retention": """
WITH f AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_w
  FROM events GROUP BY user_id
),
sizes AS (
  SELECT cohort_w, count(*)::BIGINT AS cohort_users FROM f GROUP BY cohort_w
),
act AS (
  SELECT DISTINCT e.user_id, f.cohort_w,
    CAST(datediff('day', f.cohort_w, date_trunc('week', e.ts)) / 7
         AS BIGINT) AS week_offset
  FROM events e JOIN f ON e.user_id = f.user_id
),
ret AS (
  SELECT cohort_w, week_offset, count(*)::BIGINT AS active_users
  FROM act GROUP BY cohort_w, week_offset
)
SELECT strftime(r.cohort_w, '%Y-%m-%d') AS cohort_week,
  r.week_offset, r.active_users, s.cohort_users,
  CAST(r.active_users AS DOUBLE) / CAST(s.cohort_users AS DOUBLE)
    AS retention
FROM ret r JOIN sizes s ON r.cohort_w = s.cohort_w
""",
    "event_transitions": """
WITH nxt AS (
  SELECT event_type,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS next_type
  FROM events
),
trans AS (
  SELECT event_type, next_type, count(*)::BIGINT AS n
  FROM nxt WHERE next_type IS NOT NULL GROUP BY event_type, next_type
)
SELECT event_type, next_type, n,
  CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS out_total,
  CAST(n AS DOUBLE)
    / CAST(CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS DOUBLE)
    AS p
FROM trans
""",
    "profile_columns": """
WITH c AS (
  SELECT count(*)::BIGINT AS n_rows FROM lineitem
)
SELECT * FROM (
SELECT 'l_quantity' AS column_name, c.n_rows,
  count(l_quantity)::BIGINT AS n_nonnull,
  count(DISTINCT CAST(round(l_quantity*100) AS BIGINT))::BIGINT AS n_distinct,
  min(CAST(round(l_quantity*100) AS BIGINT)) AS min_cents,
  max(CAST(round(l_quantity*100) AS BIGINT)) AS max_cents,
  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM lineitem, c GROUP BY c.n_rows
UNION ALL
SELECT 'l_extendedprice', c.n_rows,
  count(l_extendedprice)::BIGINT,
  count(DISTINCT CAST(round(l_extendedprice*100) AS BIGINT))::BIGINT,
  min(CAST(round(l_extendedprice*100) AS BIGINT)),
  max(CAST(round(l_extendedprice*100) AS BIGINT)),
  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
FROM lineitem, c GROUP BY c.n_rows
UNION ALL
SELECT 'l_discount', c.n_rows,
  count(l_discount)::BIGINT,
  count(DISTINCT CAST(round(l_discount*100) AS BIGINT))::BIGINT,
  min(CAST(round(l_discount*100) AS BIGINT)),
  max(CAST(round(l_discount*100) AS BIGINT)),
  CAST(sum(CAST(round(l_discount*100) AS BIGINT)) AS BIGINT)
FROM lineitem, c GROUP BY c.n_rows
)
""",
    "funnel_steps": """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT s1.user_id,
  epoch_us(t1) AS view_us,
  epoch_us(t2) AS click_us,
  epoch_us(t3) AS purchase_us,
  CAST(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
     + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END + 1 AS INTEGER)
    AS steps_done
FROM s1
LEFT JOIN s2 ON s1.user_id = s2.user_id
LEFT JOIN s3 ON s1.user_id = s3.user_id
""",
    "resample_locf": """
WITH b AS (SELECT user_id, ts, event_id, value FROM events),
hr AS (
  SELECT user_id, date_trunc('hour', ts) AS h, value,
    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                       ORDER BY ts DESC, event_id DESC) AS rk
  FROM b
),
hv AS (SELECT user_id, h, value FROM hr WHERE rk = 1),
span AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS lo,
         date_trunc('hour', max(ts)) AS hi
  FROM b GROUP BY user_id
),
grid AS (
  SELECT user_id,
         unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
  FROM span
),
j AS (
  SELECT g.user_id, g.h, hv.value
  FROM grid g LEFT JOIN hv ON g.user_id = hv.user_id AND g.h = hv.h
)
SELECT user_id, epoch_us(h) AS grid_us,
  last_value(value IGNORE NULLS) OVER (
    PARTITION BY user_id ORDER BY h
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf,
  value IS NULL AS gap_filled
FROM j
""",
    "robust_outliers": """
WITH base AS (
  SELECT user_id, CAST(round(value*100) AS BIGINT) AS cv FROM events
),
ranked AS (
  SELECT user_id, cv,
    row_number() OVER (PARTITION BY user_id ORDER BY cv) AS rn,
    count(*) OVER (PARTITION BY user_id) AS cnt
  FROM base
),
med AS (
  SELECT user_id, CAST(max(cnt) AS BIGINT) AS n_events,
    CASE WHEN count(*) = 1 THEN 2*sum(cv) ELSE sum(cv) END AS med2
  FROM ranked
  WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1
  GROUP BY user_id
),
dev AS (
  SELECT b.user_id, b.cv, m.n_events, m.med2,
         abs(2*b.cv - m.med2) AS dev2
  FROM base b JOIN med m USING (user_id)
),
dranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY dev2) AS rn
  FROM dev
),
mad AS (
  SELECT user_id,
    CASE WHEN count(*) = 1 THEN 2*sum(dev2) ELSE sum(dev2) END AS mad4
  FROM dranked
  WHERE rn = (n_events + 1) // 2 OR rn = n_events // 2 + 1
  GROUP BY user_id
)
SELECT d.user_id, CAST(max(d.n_events) AS BIGINT) AS n_events,
  CAST(max(d.med2) AS BIGINT) / 200.0 AS median_value,
  CAST(max(a.mad4) AS BIGINT) / 400.0 AS mad_value,
  CAST(sum(CASE WHEN 2*d.dev2 > 3*a.mad4 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_outliers
FROM dev d JOIN mad a USING (user_id)
GROUP BY d.user_id
""",
    "scd2_intervals": """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_type
  FROM events
),
c AS (
  SELECT user_id, ts, event_id, event_type FROM o
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type,
  epoch_us(ts) AS valid_from_us,
  epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
    AS valid_to_us,
  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
    AS is_current
FROM c
""",
    "zorder_events": """
WITH d AS (
  SELECT event_id, user_id % 65536 AS xdim,
         (epoch_us(ts) // 60000000) % 65536 AS ydim
  FROM events
)
SELECT event_id, xdim, ydim,
  {ZTERMS} AS zkey
FROM d
""".replace("{ZTERMS}", " + ".join(
        f"(((xdim >> {b}) & 1) << {2 * b})"
        f" + (((ydim >> {b}) & 1) << {2 * b + 1})"
        for b in range(16)
    )),
}

# Q14 == promo_share (same plan fn, same oracle), see QUERIES note
ORACLES["ingest_pipeline"] = f"""
WITH adm AS (
  SELECT event_type, value FROM events WHERE event_id % 10 < 8
  UNION ALL
  SELECT event_type, value FROM events
  WHERE event_id % 10 >= 8
    AND coalesce(value BETWEEN {_INGEST_VALUE_LO} AND {_INGEST_VALUE_HI}
                 AND event_type IN {_INGEST_TYPES}
                 AND user_id IS NOT NULL, FALSE)
),
s AS (
  SELECT event_type,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
    CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_c,
    CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_c
  FROM adm GROUP BY event_type
)
SELECT event_type, n,
  CAST(sum_c AS DOUBLE) / 100 AS sum_value,
  CAST(min_c AS DOUBLE) / 100 AS min_value,
  CAST(max_c AS DOUBLE) / 100 AS max_value,
  CAST(sum_c AS DOUBLE) / 100 / CAST(n AS DOUBLE) AS avg_value
FROM s
"""

ORACLES["quarantine_rows"] = """
WITH f AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
    count(*) OVER (PARTITION BY l_orderkey, l_linenumber) > 1 AS dup,
    EXISTS (SELECT 1 FROM orders o
            WHERE o.o_orderkey = l.l_orderkey) AS hit
  FROM lineitem l
),
r AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
    -- coalesce: DuckDB's array_to_string([]) is NULL, Spark's
    -- concat_ws over an empty array is '' — pin the engine behavior
    coalesce(array_to_string(list_filter([
      CASE WHEN NOT coalesce(l_quantity BETWEEN 1 AND 50, FALSE)
           THEN 'qty_range' END,
      CASE WHEN l_orderkey IS NULL THEN 'null_key' END,
      CASE WHEN NOT coalesce(l_discount BETWEEN 0 AND 0.5, FALSE)
           THEN 'discount_range' END,
      CASE WHEN dup THEN 'dup_key' END,
      CASE WHEN NOT hit THEN 'orphan' END
    ], x -> x IS NOT NULL), ','), '') AS reasons
  FROM f
)
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, reasons,
  reasons <> '' AS quarantined
FROM r
"""

ORACLES["daily_new_returning"] = """
WITH du AS (
  -- CAST: day-granularity date_trunc yields DATE in DuckDB (hour yields
  -- TIMESTAMP); Spark's is always TIMESTAMP, and the driver compares str()
  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
  FROM events
),
fd AS (SELECT user_id, min(day) AS first_day FROM du GROUP BY user_id),
daily AS (
  SELECT du.day,
    CAST(count(*) AS BIGINT) AS n_active,
    CAST(sum(CASE WHEN du.day = fd.first_day THEN 1 ELSE 0 END) AS BIGINT)
      AS n_new
  FROM du JOIN fd ON du.user_id = fd.user_id
  GROUP BY du.day
)
SELECT day, n_active, n_new, n_active - n_new AS n_returning,
  CAST(sum(n_new) OVER (ORDER BY day
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cum_users
FROM daily
"""

ORACLES["incremental_agg"] = """
WITH s AS (
  SELECT event_type,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
    CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_c,
    CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_c
  FROM events GROUP BY event_type
)
SELECT event_type, n,
  CAST(sum_c AS DOUBLE) / 100 AS sum_value,
  CAST(min_c AS DOUBLE) / 100 AS min_value,
  CAST(max_c AS DOUBLE) / 100 AS max_value,
  CAST(sum_c AS DOUBLE) / 100 / CAST(n AS DOUBLE) AS avg_value
FROM s
"""

ORACLES["data_expectations"] = """
WITH li AS (
  SELECT
    CAST(sum(CASE WHEN NOT coalesce(l_quantity BETWEEN 1 AND 50, FALSE)
             THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
    CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS v_null,
    CAST(sum(CASE WHEN NOT coalesce(l_discount BETWEEN 0 AND 0.5, FALSE)
             THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
    CAST(count(*) AS BIGINT) AS n
  FROM lineitem
),
o AS (
  SELECT
    CAST(sum(CASE WHEN NOT coalesce(o_orderstatus IN ('O','F','P'), FALSE)
             THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
    CAST(sum(CASE WHEN NOT coalesce(o_totalprice > 0, FALSE)
             THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
    CAST(count(*) AS BIGINT) AS n
  FROM orders
),
u AS (
  SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS violations,
         CAST(coalesce(sum(c), 0) AS BIGINT) AS n
  FROM (SELECT count(*) AS c FROM lineitem
        GROUP BY l_orderkey, l_linenumber)
),
ri AS (
  SELECT CAST(count(*) AS BIGINT) AS violations,
         (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n
  FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders x
                    WHERE x.o_orderkey = l.l_orderkey)
),
all_rules AS (
  SELECT 'lineitem.l_quantity between 1 and 50' AS rule,
         v_qty AS violations, n FROM li
  UNION ALL SELECT 'lineitem.l_orderkey not null', v_null, n FROM li
  UNION ALL SELECT 'lineitem.l_discount between 0 and 0.5', v_disc, n
            FROM li
  UNION ALL SELECT 'orders.o_orderstatus in (O,F,P)', v_status, n FROM o
  UNION ALL SELECT 'orders.o_totalprice > 0', v_price, n FROM o
  UNION ALL SELECT 'lineitem (l_orderkey, l_linenumber) unique',
            violations, n FROM u
  UNION ALL SELECT 'lineitem.l_orderkey references orders',
            violations, n FROM ri
)
SELECT rule, violations, n AS total, violations = 0 AS passed
FROM all_rules ORDER BY rule
"""

ORACLES["tpch_q14"] = ORACLES["promo_share"]

from ..operators.graph import triangle_oracle_sql as _tri_sql  # noqa: E402

ORACLES["triangle_copurchase"] = _tri_sql()

from ..operators.graph import lpa_oracle_sql as _lpa_sql  # noqa: E402

ORACLES["lpa_communities"] = _lpa_sql()

from ..operators.graph import link_prediction_oracle_sql as _lp_sql  # noqa: E402

ORACLES["link_prediction"] = _lp_sql()

from ..operators.graph import bfs_oracle_sql as _bfs_sql  # noqa: E402

ORACLES["bfs_distances"] = _bfs_sql()

from ..operators.sequence import (  # noqa: E402
    sequence_similarity_oracle_sql as _seq_sql,
)

ORACLES["sequence_similarity"] = _seq_sql()

ORACLES["kcore"] = _kcore_oracle()

ORACLES["pit_join"] = """
WITH ev AS (SELECT user_id, ts, event_id, event_type FROM events),
changes AS (
  SELECT user_id, event_type AS state, epoch_us(ts) AS valid_from_us
  FROM (
    SELECT user_id, ts, event_id, event_type,
      lag(event_type) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS prev_type
    FROM ev WHERE event_type <> 'purchase'
  )
  WHERE prev_type IS NULL OR prev_type <> event_type
),
facts AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us
  FROM ev WHERE event_type = 'purchase'
),
cand AS (
  SELECT f.event_id, f.user_id, f.ts_us, c.state, c.valid_from_us
  FROM facts f LEFT JOIN changes c
    ON f.user_id = c.user_id AND c.valid_from_us <= f.ts_us
),
best AS (
  SELECT event_id, user_id, ts_us, state, valid_from_us,
    row_number() OVER (PARTITION BY event_id
                       ORDER BY valid_from_us DESC NULLS LAST) AS rk
  FROM cand
)
SELECT event_id, user_id, ts_us,
       state AS state_at_purchase,
       valid_from_us AS state_from_us
FROM best WHERE rk = 1
"""

ORACLES["conversion_latency"] = """
WITH pu AS (
  SELECT user_id,
    min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS s_us
  FROM events GROUP BY user_id
),
signed AS (SELECT user_id, s_us FROM pu WHERE s_us IS NOT NULL),
fp AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
  FROM events e JOIN signed s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.s_us
  GROUP BY e.user_id
),
lat AS (
  SELECT CASE WHEN fp.p_us IS NOT NULL
         THEN CAST((fp.p_us - s.s_us) // 3600000000 AS BIGINT)
         ELSE -1 END AS latency_hours
  FROM signed s LEFT JOIN fp ON s.user_id = fp.user_id
)
SELECT latency_hours, CAST(count(*) AS BIGINT) AS n_users
FROM lat GROUP BY latency_hours ORDER BY latency_hours
"""

ORACLES["ohlc_bars"] = """
WITH ev AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
m AS (
  SELECT *,
    row_number() OVER (PARTITION BY event_type, hour
                       ORDER BY ts, event_id) AS rn_a,
    row_number() OVER (PARTITION BY event_type, hour
                       ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM ev
)
SELECT event_type, hour,
  CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) / 100.0
    AS open,
  CAST(max(cents) AS BIGINT) / 100.0 AS high,
  CAST(min(cents) AS BIGINT) / 100.0 AS low,
  CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) / 100.0
    AS close,
  CAST(count(*) AS BIGINT) AS n_trades,
  CAST(sum(cents) AS BIGINT) / 100.0 AS volume
FROM m GROUP BY event_type, hour
"""

ORACLES["data_gaps"] = """
WITH b AS (
  SELECT date_trunc('hour', min(ts)) AS lo,
         date_trunc('hour', max(ts)) AS hi
  FROM events
),
hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b
),
types AS (SELECT DISTINCT event_type FROM events),
observed AS (
  SELECT DISTINCT event_type, date_trunc('hour', ts) AS hour FROM events
)
SELECT t.event_type, h.hour
FROM hours h CROSS JOIN types t
WHERE NOT EXISTS (SELECT 1 FROM observed o
                  WHERE o.event_type = t.event_type AND o.hour = h.hour)
ORDER BY t.event_type, h.hour
"""

ORACLES["audience_overlap"] = """
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
sizes AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
          FROM tu GROUP BY event_type),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM tu a JOIN tu b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_both, sa.n AS n_a, sb.n AS n_b,
  CAST(n_both AS DOUBLE) / CAST(sa.n + sb.n - n_both AS DOUBLE)
    AS jaccard
FROM inter
JOIN sizes sa ON sa.event_type = type_a
JOIN sizes sb ON sb.event_type = type_b
"""

ORACLES["ab_proportion_test"] = """
WITH per_user AS (
  SELECT user_id,
    max(CASE WHEN event_type = 'purchase' AND value > 150
        THEN 1 ELSE 0 END)
      AS converted,
    user_id % 2 AS variant
  FROM events GROUP BY user_id
),
c AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(converted) AS BIGINT) AS conv
  FROM per_user GROUP BY variant
),
w AS (
  SELECT
    max(CASE WHEN variant = 0 THEN n END) AS n0,
    max(CASE WHEN variant = 0 THEN conv END) AS c0,
    max(CASE WHEN variant = 1 THEN n END) AS n1,
    max(CASE WHEN variant = 1 THEN conv END) AS c1
  FROM c
)
SELECT n0 AS n_control, c0 AS conv_control,
       n1 AS n_treat, c1 AS conv_treat,
  CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p_control,
  CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p_treat,
  (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
   - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
  / sqrt(
      (CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
      * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
      * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))
    ) AS z
FROM w
"""

# frequent_triples: exact triple counts over distinct order-items
ORACLES["frequent_triples"] = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey AS item FROM lineitem
),
tr AS (
  SELECT a.item AS u, b.item AS v, c.item AS w,
         CAST(count(*) AS BIGINT) AS support
  FROM li a
  JOIN li b ON a.l_orderkey = b.l_orderkey AND a.item < b.item
  JOIN li c ON a.l_orderkey = c.l_orderkey AND b.item < c.item
  GROUP BY 1, 2, 3
)
SELECT u, v, w, support FROM tr WHERE support >= 2
"""

ORACLES["cuped_readout"] = """
WITH per_user AS (
  SELECT user_id,
    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
             THEN CAST(round(value) AS BIGINT) ELSE 0 END) AS BIGINT)
      AS x,
    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
             THEN CAST(round(value) AS BIGINT) ELSE 0 END) AS BIGINT)
      AS y,
    user_id % 2 AS variant
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM per_user
),
th AS (
  SELECT CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar_all
  FROM m
),
v AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(x) AS BIGINT) AS vx, CAST(sum(y) AS BIGINT) AS vy
  FROM per_user GROUP BY variant
)
SELECT variant, n_users,
  CAST(vx AS DOUBLE) / CAST(n_users AS DOUBLE) AS xbar,
  CAST(vy AS DOUBLE) / CAST(n_users AS DOUBLE) AS ybar,
  theta,
  CAST(vy AS DOUBLE) / CAST(n_users AS DOUBLE)
    - theta * (CAST(vx AS DOUBLE) / CAST(n_users AS DOUBLE) - xbar_all)
    AS adjusted
FROM v CROSS JOIN th
ORDER BY variant
"""

# brute-force oracle: prefix filtering is exact, so the reference is the
# full quadratic pipeline — no need to mirror the index mechanics
ORACLES["behavior_allpairs"] = """
WITH corpus AS (
  SELECT user_id AS doc_id,
         array_to_string(list(event_type ORDER BY ts, event_id), ' ')
           AS text
  FROM events GROUP BY user_id
),
sh0 AS (
  SELECT doc_id,
    unnest(CASE WHEN len(w) >= 3
      THEN list_transform(range(1, len(w) - 1),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
      ELSE [text] END) AS shingle
  FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM corpus) b
),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
          FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_inter, sa.n AS n_a, sb.n AS n_b,
  CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE)
    AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE)
      >= 0.35
"""

ORACLES["json_props_stats"] = """
WITH p AS (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS INTEGER) AS k
  FROM events
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_unparsed,
  CAST(sum(k) AS BIGINT) AS sum_k,
  min(k) AS min_k,
  max(k) AS max_k,
  CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
FROM p GROUP BY event_type
"""
