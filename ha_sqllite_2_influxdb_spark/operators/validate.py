"""Data-quality expectations report (Deequ/Great-Expectations pattern).

A 100 TB ingest pipeline runs a declarative rule suite over every new
partition before it is admitted: null checks, range checks, domain
checks, key uniqueness, referential integrity. This module evaluates a
rule suite in the minimum number of passes and emits one report row per
rule: ``(rule, violations, total, passed)``.

Spark-first shape — the fact table is scanned ONCE:
- lineitem collapses to a per-(l_orderkey, l_linenumber) grouped
  relation carrying the group size AND per-group conditional violation
  sums. Every row-local rule is then a second-level sum over the grouped
  relation (Σ per-group conditional sums ≡ the global conditional sum),
  uniqueness is Σ(group_size − 1), and referential integrity consumes
  the grouped relation's keys (orphan ROWS = Σ group sizes of orphan
  keys) — so the single grouped pipeline feeds all seven lineitem-side
  numbers. Spark's ReuseExchange collapses the branch re-reads of the
  grouped relation; adding a rule adds a column, not a pass.
- orders' row-local rules collapse into one conditional-sum scan.
- the RI check is a LEFT ANTI join of grouped keys vs orders. Both
  sides are fact-sized at 100 TB, so the shuffle anti join is the right
  plan; AQE converts it to broadcast when a filtered side turns small.

The report itself is a handful of 1-row aggregates unioned together —
driver-safe by construction.

Reference scope: the reference engine (sqllite2influxdb.py) trusts its
input; this extends the engine surface for production ingest gating.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _viol(cond: Column) -> Column:
    """Per-row violation indicator (null predicate counts as violation)."""
    return F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)


def quarantine_rows(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Per-row routing with violation lineage — the dead-letter pattern:
    every fact row is tagged with the exact rules it violates and a
    quarantined flag, so the clean subset proceeds and the quarantine
    carries WHY (not just that the batch-level report failed).

    Same rule suite as `expectations_report`, evaluated per row: the
    row-local rules are free column expressions; duplicate-key detection
    is one window count over the key shuffle; referential integrity is a
    broadcast-eligible LEFT join marking unmatched keys (shuffle join at
    100 TB — the same plan the report's anti join uses). Reasons render
    in fixed rule order, so the output is deterministic.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey", "l_linenumber")
    matched = orders.select(
        F.col("o_orderkey").alias("l_orderkey"), F.lit(1).alias("_hit")
    )
    flagged = (
        lineitem.select("l_orderkey", "l_linenumber", "l_quantity",
                        "l_discount")
        .withColumn("_dup", F.count(F.lit(1)).over(w) > 1)
        .join(matched, "l_orderkey", "left")
        .withColumn(
            "reasons",
            F.concat_ws(
                ",",
                F.filter(
                    F.array(
                        F.when(_viol(F.col("l_quantity").between(1, 50))
                               == 1, F.lit("qty_range")),
                        F.when(F.col("l_orderkey").isNull(),
                               F.lit("null_key")),
                        F.when(_viol(F.col("l_discount").between(0.0, 0.5))
                               == 1, F.lit("discount_range")),
                        F.when(F.col("_dup"), F.lit("dup_key")),
                        F.when(F.col("_hit").isNull(), F.lit("orphan")),
                    ),
                    lambda r: r.isNotNull(),
                ),
            ),
        )
    )
    return flagged.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "reasons",
        (F.col("reasons") != "").alias("quarantined"),
    )


def expectations_report(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Evaluate the standard order-pipeline rule suite; one row per rule."""
    # ONE lineitem scan: per-key group sizes + per-group violation sums
    grouped = lineitem.groupBy("l_orderkey", "l_linenumber").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(_viol(F.col("l_quantity").between(1, 50))).alias("g_qty"),
        F.sum(_viol(F.col("l_discount").between(0.0, 0.5))).alias("g_disc"),
    )

    li_totals = grouped.agg(
        F.sum("g_qty").cast("long").alias("v_qty_range"),
        F.sum(
            F.when(F.col("l_orderkey").isNull(), F.col("c")).otherwise(0)
        ).cast("long").alias("v_okey_null"),
        F.sum("g_disc").cast("long").alias("v_discount_range"),
        F.sum(F.col("c") - 1).cast("long").alias("v_dup_key"),
        F.sum("c").cast("long").alias("n"),
    )

    # one scan of orders: same collapse
    o_rules = orders.agg(
        F.sum(
            _viol(F.col("o_orderstatus").isin("O", "F", "P"))
        ).cast("long").alias("v_status_domain"),
        F.sum(_viol(F.col("o_totalprice") > 0)).cast("long")
        .alias("v_price_pos"),
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

    # referential integrity over the GROUPED keys: orphan rows = Σ c
    ri_viol = (
        grouped.select("l_orderkey", "c")
        .join(orders.select(F.col("o_orderkey").alias("l_orderkey")),
              "l_orderkey", "left_anti")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("v_ri"))
    )

    # ONE 1-row relation carries every lineitem-side number (violations
    # AND the shared denominator), so lineitem contributes exactly two
    # scan subtrees to the plan: the stats aggregate and the RI anti
    # join — the floor without materializing the grouped relation
    li_rules = li_totals.crossJoin(ri_viol).select(
        F.expr(
            "stack(5,"
            " 'lineitem.l_quantity between 1 and 50', v_qty_range,"
            " 'lineitem.l_orderkey not null', v_okey_null,"
            " 'lineitem.l_discount between 0 and 0.5', v_discount_range,"
            " 'lineitem (l_orderkey, l_linenumber) unique', v_dup_key,"
            " 'lineitem.l_orderkey references orders', v_ri)"
            " as (rule, violations)"
        ),
        "n",
    )

    report = li_rules.unionByName(o_rules)
    return report.select(
        "rule",
        "violations",
        F.col("n").alias("total"),
        (F.col("violations") == 0).alias("passed"),
    ).orderBy("rule")
