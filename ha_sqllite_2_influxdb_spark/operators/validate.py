"""Data-quality expectations report (Deequ/Great-Expectations pattern).

A 100 TB ingest pipeline runs a declarative rule suite over every new
partition before it is admitted: null checks, range checks, domain
checks, key uniqueness, referential integrity. This module evaluates a
rule suite in the minimum number of passes and emits one report row per
rule: ``(rule, violations, total, passed)``.

Spark-first shape:
- all ROW-LOCAL rules over one table collapse into a SINGLE scan with
  conditional partial aggregation (`sum(case when …)`) — adding a rule
  adds a column to the aggregate, not a pass over the data;
- key uniqueness is one shuffle on the key (map-side combine does the
  heavy lifting — group sizes, not rows, cross the wire);
- referential integrity is a LEFT ANTI join on the key. Both sides are
  fact-sized here, so the plan is a shuffle anti join — the correct plan
  at 100 TB, where neither side broadcasts; AQE converts it to broadcast
  when a filtered side turns out small.

The report itself is a handful of 1-row aggregates unioned together —
driver-safe by construction.

Reference scope: the reference engine (sqllite2influxdb.py) trusts its
input; this extends the engine surface for production ingest gating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _viol(cond) -> F.Column:
    """Count rows violating ``cond`` (null predicate counts as violation)."""
    return F.sum(
        F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
    ).cast("long")


def expectations_report(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Evaluate the standard order-pipeline rule suite; one row per rule."""
    total_li = F.count(F.lit(1)).cast("long")

    # one scan of lineitem: every row-local rule as a conditional sum
    li_rowlocal = lineitem.agg(
        _viol(F.col("l_quantity").between(1, 50)).alias("v_qty_range"),
        _viol(F.col("l_orderkey").isNotNull()).alias("v_okey_null"),
        _viol(
            F.col("l_discount").between(0.0, 0.5)
        ).alias("v_discount_range"),
        total_li.alias("n"),
    ).select(
        F.expr(
            "stack(3,"
            " 'lineitem.l_quantity between 1 and 50', v_qty_range,"
            " 'lineitem.l_orderkey not null', v_okey_null,"
            " 'lineitem.l_discount between 0 and 0.5', v_discount_range)"
            " as (rule, violations)"
        ),
        "n",
    )

    # one scan of orders: same collapse
    o_rowlocal = orders.agg(
        _viol(
            F.col("o_orderstatus").isin("O", "F", "P")
        ).alias("v_status_domain"),
        _viol(F.col("o_totalprice") > 0).alias("v_price_pos"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).select(
        F.expr(
            "stack(2,"
            " 'orders.o_orderstatus in (O,F,P)', v_status_domain,"
            " 'orders.o_totalprice > 0', v_price_pos)"
            " as (rule, violations)"
        ),
        "n",
    )

    # uniqueness: extra copies beyond the first per composite key
    uniq = (
        lineitem.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.coalesce(F.sum(F.col("c") - 1), F.lit(0))
            .cast("long").alias("violations"),
            F.sum("c").cast("long").alias("n"),
        )
        .select(
            F.lit("lineitem (l_orderkey, l_linenumber) unique").alias("rule"),
            "violations", "n",
        )
    )

    # referential integrity: lineitem orphans vs orders
    ri = (
        lineitem.select("l_orderkey")
        .join(orders.select(F.col("o_orderkey").alias("l_orderkey")),
              "l_orderkey", "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
        .crossJoin(  # 1-row × 1-row: attach the denominator
            lineitem.agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        .select(
            F.lit("lineitem.l_orderkey references orders").alias("rule"),
            "violations", "n",
        )
    )

    report = li_rowlocal.unionByName(o_rowlocal).unionByName(uniq) \
        .unionByName(ri)
    return report.select(
        "rule",
        "violations",
        F.col("n").alias("total"),
        (F.col("violations") == 0).alias("passed"),
    ).orderBy("rule")
