"""Plan pins for the statistics family: every batch compiler pays
exactly ONE series-key exchange — the lead()/lag() window's shuffle,
which the (series, bucket) aggregation then consumes directly (its
grouping keys are a superset of the partitioning, so rows of each group
are already co-located; no re-exchange). A join or a second series
shuffle regressing in would double the 100 TB volume and fails here."""

from tests.test_plans import explain_str


def _series_exchanges(plan: str) -> int:
    return sum(1 for ln in plan.splitlines()
               if ln.strip().startswith("Arguments: hashpartitioning(")
               and "measurement" in ln)


def test_statistics_compilers_one_series_exchange(spark, sf_dir):
    from ha_sqllite_2_influxdb_spark.plans import ha_stats

    # r14: hourly and the cascade pay TWO series exchanges BY DESIGN —
    # the boundary/interior split's second union branch re-windows the
    # points relation (column pruning differentiates the two branches'
    # subtrees below the exchange, so Spark's exchange reuse cannot
    # canonicalize-match them). The trade is one extra shuffle of the
    # CHEAPEST relation in the plan (raw points) against eliminating
    # the ~2M-entry twin hash maps of the old single-agg formulation —
    # measured −67% on both queries at sf0.1; at 100 TB the segment
    # relation is the documented cache/exchange-reuse point. The other
    # five compilers keep the single-exchange floor.
    budget = {"ha_statistics_hourly": 2, "ha_statistics_cascade": 2}
    for name in ("ha_statistics_hourly", "ha_statistics_cascade",
                 "ha_statistics_sum", "ha_statistics_daily",
                 "ha_utility_meter", "ha_energy_cost",
                 "ha_statistics_monthly"):
        plan = explain_str(ha_stats.QUERIES[name](spark, sf_dir))
        want = budget.get(name, 1)
        assert _series_exchanges(plan) == want, f"{name}\n{plan}"
        assert "SortMergeJoin" not in plan, name
        assert "BatchEvalPython" not in plan, name


def test_history_stats_one_entity_exchange(spark, sf_dir):
    """history_stats folds durations, ratio denominator AND the turn-on
    count into the one exploded relation, so the whole sensor costs a
    single (domain, entity_id) exchange — a join between separate
    duration/count aggs regressing in would double it."""
    from ha_sqllite_2_influxdb_spark.plans import ha_stats

    plan = explain_str(ha_stats.QUERIES["ha_history_stats"](spark, sf_dir))
    n = sum(1 for ln in plan.splitlines()
            if ln.strip().startswith("Arguments: hashpartitioning(")
            and "entity_id" in ln)
    assert n == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


# r14 (guide §1.1/§7.3): hourly_statistics ships as ONE SQL parse
# because every chained DataFrame call is eagerly analyzed (~8-10 ms
# fixed even on trivial trees) and the ~10-call split build cost
# ~0.23 s of pure driver-side analysis per invocation (measured 232 ->
# 68 ms with the text). The text must stay plan-identical to the
# DataFrame build it replaced: optimizer-level sameResult, equal
# executed Exchange counts, identical values — the simhash/neardup
# SQL-text precedent.
def test_hourly_sql_text_plan_equals_dataframe_build(spark, sf_dir):
    from ha_sqllite_2_influxdb_spark.plans import ha_stats
    from ha_sqllite_2_influxdb_spark.plans.influxql import _numeric_points

    pts = _numeric_points(spark, sf_dir)
    sql_b = ha_stats.hourly_statistics(pts)
    df_b = ha_stats._hourly_statistics_df(pts)
    assert (sql_b._jdf.queryExecution().optimizedPlan().sameResult(
            df_b._jdf.queryExecution().optimizedPlan()))
    n_sql = (sql_b._jdf.queryExecution().executedPlan()
             .toString().count("Exchange"))
    n_df = (df_b._jdf.queryExecution().executedPlan()
            .toString().count("Exchange"))
    assert n_sql == n_df
    got_sql = sorted(map(tuple, sql_b.collect()))
    got_df = sorted(map(tuple, df_b.collect()))
    assert got_sql == got_df and got_sql
