"""Sketch-tier aggregates: assert the approximation error bounds that the
rows-only driver check cannot see."""

from pyspark.sql import functions as F

from ha_sqllite_2_influxdb_spark.plans.analytics import (
    q_sketch_distinct,
    q_sketch_quantiles,
    q_quantiles,
)
from ha_sqllite_2_influxdb_spark.sources.tables import load_table


def test_hll_within_rsd(spark, sf_dir):
    got = {r.event_type: r.approx_users
           for r in q_sketch_distinct(spark, sf_dir).collect()}
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for et, approx in got.items():
        # rsd=0.01 -> generous 5% envelope (small-cardinality correction
        # makes tiny groups near-exact anyway)
        assert abs(approx - exact[et]) <= max(2, 0.05 * exact[et]), et


def test_gk_quantiles_close_to_exact(spark, sf_dir):
    approx = {r.o_orderpriority: (r.p50, r.p95)
              for r in q_sketch_quantiles(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders")
    exact = {
        r.o_orderpriority: (r.p50, r.p95)
        for r in orders.groupBy("o_orderpriority")
        .agg(F.expr(
            "percentile(CAST(round(o_totalprice*100) AS BIGINT),"
            " array(0.5D, 0.95D))").alias("q"))
        .select("o_orderpriority",
                (F.col("q")[0] / 100.0).alias("p50"),
                (F.col("q")[1] / 100.0).alias("p95"))
        .collect()
    }
    for pr, (a50, a95) in approx.items():
        e50, e95 = exact[pr]
        assert abs(a50 - e50) / e50 < 0.05, (pr, a50, e50)
        assert abs(a95 - e95) / e95 < 0.05, (pr, a95, e95)
