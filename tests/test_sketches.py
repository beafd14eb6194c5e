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


def test_misra_gries_guarantee_under_decrements(spark):
    """Adversarial corpus where m < vocab (the decrement path actually
    runs): a zipf-ish stream of 500 distinct tokens with 10 planted
    heavy hitters, m=32. MG guarantees every token with count > n/(m+1)
    reaches the candidate set; the exact recount then makes the top-k
    true — asserted against a plain groupBy."""
    from ha_sqllite_2_influxdb_spark.operators.sketches import heavy_hitters

    rows = []
    # 10 heavy tokens × 400 occurrences, 490 tail tokens × ~8 each
    for h in range(10):
        rows += [(f"hot_{h}",)] * 400
    for t in range(490):
        rows += [(f"tail_{t}",)] * 8
    # deterministic interleave so heavy tokens span partitions
    rows = [rows[i] for i in range(0, len(rows), 7)] + [
        rows[i] for i in range(len(rows)) if i % 7 != 0
    ]
    tokens = spark.createDataFrame(rows, "token string").repartition(8)
    n = len(rows)
    m = 32
    got = heavy_hitters(tokens, m=m, k=10).collect()
    exact = (
        tokens.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token")).limit(10).collect()
    )
    # the guarantee's precondition holds: 10th true count > n/(m+1)
    assert exact[-1].n > n / (m + 1)
    assert [(r.token, r.n) for r in got] == [(r.token, r.n) for r in exact]
    assert [r.rank for r in got] == list(range(1, 11))


def test_misra_gries_summary_state_bounded(spark):
    """Each partition summary must respect the m-counter cap even when
    the stream has far more distinct tokens than m."""
    from ha_sqllite_2_influxdb_spark.operators.sketches import (
        _mg_partition_summaries,
    )

    tokens = spark.createDataFrame(
        [(f"t{i % 700}",) for i in range(10_000)], "token string"
    ).coalesce(1)
    m = 16
    summary = tokens.mapInPandas(
        _mg_partition_summaries("token", m), "token string, est long"
    ).collect()
    assert 0 < len(summary) <= m


def test_hll_union_of_partition_sketches_equals_one_shot(spark, sf_dir):
    """The mergeable-artifact property the partitioned-sketch pattern
    rests on: unioning per-day sketches must estimate the same as one
    sketch built over the whole range, and both must sit within the
    HLL error envelope of the exact distinct."""
    ev = load_table(spark, sf_dir, "events")
    merged = {
        r.event_type: r.est for r in
        ev.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
             .cast("long").alias("est"))
        .collect()
    }
    one_shot = {
        r.event_type: r.est for r in
        ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
             .cast("long").alias("est"))
        .collect()
    }
    exact = {
        r.event_type: r.n for r in
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert merged == one_shot
    for et, est in merged.items():
        assert abs(est - exact[et]) <= max(2, 0.05 * exact[et]), et
