"""Physical-plan assertions: the design claims in the operator docstrings
(broadcast joins, pushdown, pruning, top-k, partial agg, decorrelation)
are checked against `.explain` output so a regression that silently
reintroduces a shuffle or a full-scan fails CI, not the 100 TB run.
"""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from ha_sqllite_2_influxdb_spark.plans import analytics, ha_pipeline
from ha_sqllite_2_influxdb_spark.sources.tables import load_table


def explain_str(df, mode="formatted"):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_ha_points_joins_are_broadcast(spark, sf_dir):
    """Both dims broadcast: the states fact side must not shuffle for a
    join (SURVEY §2.3 J1/J2)."""
    plan = explain_str(ha_pipeline.q_points(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_tpch_q6_pushdown_and_pruning(spark, sf_dir):
    """Filters reach the parquet scan; the scan reads ONLY the columns the
    query needs (P1/P2 analog: pushdown + pruning are free when the plan
    is declarative)."""
    plan = explain_str(analytics.q_tpch_q6(spark, sf_dir))
    assert "PushedFilters: [" in plan, plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_shipdate" in pushed, plan
    read = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "l_extendedprice" in read and "l_orderkey" not in read, plan


def test_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject (per-
    partition heap + merge), never a full range-shuffle sort (O2)."""
    plan = explain_str(analytics.q_tpch_q18(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_tpch_q1_partial_aggregation(spark, sf_dir):
    """Map-side combine: two HashAggregates (partial, final) around one
    exchange — the shuffle moves pre-aggregated groups, not rows."""
    plan = explain_str(analytics.q_tpch_q1(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2, plan


def test_exists_subquery_decorrelates_to_semi_join(spark, sf_dir):
    """Catalyst must rewrite the correlated EXISTS into a semi join — no
    per-row subquery execution survives in the physical plan."""
    plan = explain_str(analytics.q_tpch_q4(spark, sf_dir))
    assert "LeftSemi" in plan, plan


def test_scalar_subquery_decorrelates_to_aggregate_join(spark, sf_dir):
    """The correlated scalar subquery (per-part avg) becomes an aggregate
    joined back on the correlation key."""
    plan = explain_str(analytics.q_tpch_q17(spark, sf_dir))
    assert "Subquery" not in plan.split("== Physical Plan ==")[-1], plan
    assert plan.count("HashAggregate") >= 2, plan


def test_events_scan_prunes_columns(spark, sf_dir):
    """A 2-column projection over events must not read props/users."""
    df = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    plan = explain_str(df)
    read = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "event_type" in read and "props" not in read, plan


def test_whole_stage_codegen_covers_hot_path(spark, sf_dir):
    """The TPC-H Q1 pipeline (filter → project → agg) stays inside
    whole-stage codegen spans; no interpreted row-at-a-time operators."""
    df = analytics.q_tpch_q1(spark, sf_dir)
    df.collect()  # AQE finalizes (and codegens) the plan on execution
    plan = explain_str(df, mode="formatted")
    final = plan.split("== Initial Plan ==")[0]
    assert "== Final Plan ==" in final, plan
    # '*' prefixes mark operators inside WholeStageCodegen spans
    for op in ("* Filter", "* HashAggregate", "* Project"):
        assert op in final, plan


def test_broadcast_hint_respected_in_q22(spark, sf_dir):
    """The 1-row scalar-average side must be a broadcast nested loop /
    broadcast exchange, never a shuffle of the customer side."""
    plan = explain_str(analytics.q_tpch_q22(spark, sf_dir))
    assert "BroadcastExchange" in plan, plan


def test_tpch_q8_dims_broadcast_single_agg_shuffle(spark, sf_dir):
    """Q8's six hinted dimension joins must all broadcast — lineitem
    never shuffles for a dim lookup, only for the (AQE-sized) orders
    join and the final per-year aggregate. At 100 TB that is the
    difference between one pass over the fact table and seven."""
    plan = explain_str(analytics.q_tpch_q8(spark, sf_dir))
    physical = plan.split("== Physical Plan ==")[-1]
    assert physical.count("BroadcastHashJoin") >= 6, plan
    # worst admissible shape: li + orders each shuffle for their join,
    # plus the aggregate exchange; the dims must contribute NONE
    assert physical.count("Exchange hashpartitioning") <= 3, plan


def test_simhash_signature_stage_partial_agg_doc_level_shuffle(spark, sf_dir):
    """The signature computation stays codegen'd: one partial/final
    HashAggregate pair around ONE doc-keyed Exchange (map-side combine
    collapses words to per-doc vote counters before the wire) and no
    Catalyst-interpreted higher-order functions in the vote path."""
    from ha_sqllite_2_influxdb_spark.operators.dedup import (
        recrawl_corpus, simhash_signatures,
    )
    sig = simhash_signatures(recrawl_corpus(load_table(spark, sf_dir, "documents")))
    plan = explain_str(sig)
    import re

    physical = plan.split("== Physical Plan ==")[-1]
    # formatted mode prints each operator in the tree AND a detail block;
    # count distinct operator ids
    assert len(re.findall(r"\(\d+\) Exchange", physical)) == 1, plan
    assert "hashpartitioning(doc_id" in physical, plan
    assert len(re.findall(r"\(\d+\) HashAggregate", physical)) >= 2, plan
    for hof in ("zip_with(", "transform("):
        assert hof not in physical, plan


def test_bucket_cap_adds_no_extra_exchange(spark, sf_dir):
    """The hot-bucket window count must reuse the band groupBy's hash
    partitioning: capped and uncapped candidate pipelines have the same
    Exchange count (dedup._cap_buckets design claim)."""
    from ha_sqllite_2_influxdb_spark.operators.dedup import (
        lsh_candidate_pairs, recrawl_corpus,
    )
    corpus = recrawl_corpus(load_table(spark, sf_dir, "documents"))
    capped = explain_str(lsh_candidate_pairs(corpus))
    uncapped = explain_str(lsh_candidate_pairs(corpus, bucket_cap=None))
    assert capped.count("Exchange") == uncapped.count("Exchange"), capped


def test_tpch_q21_plans_semi_then_anti_no_cross(spark, sf_dir):
    """The EXISTS/NOT EXISTS pair must become LeftSemi + LeftAnti
    equi-joins on l_orderkey (inequalities as residuals) — never a
    cartesian/nested-loop product of lineitem with itself."""
    plan = explain_str(analytics.q_tpch_q21(spark, sf_dir))
    physical = plan.split("== Physical Plan ==")[-1]
    assert "LeftSemi" in physical, plan
    assert "LeftAnti" in physical, plan
    assert "CartesianProduct" not in physical, plan
    assert "BroadcastNestedLoopJoin" not in physical.replace(
        "BroadcastNestedLoopJoin BuildRight, LeftSemi", ""), plan


def test_tpch_q15_max_is_broadcast_scalar(spark, sf_dir):
    """The `= max(revenue)` subquery must join back as a broadcast 1-row
    scalar — revenue groups must not shuffle a second time for a window
    or a self-join."""
    plan = explain_str(analytics.q_tpch_q15(spark, sf_dir))
    physical = plan.split("== Physical Plan ==")[-1]
    assert "BroadcastExchange" in physical, plan
    assert "Window" not in physical, plan


def test_simhash_rotated_three_exchange_pipeline(spark, sf_dir):
    """The rotated-bucketing scale tier must keep exactly THREE
    exchanges end-to-end: the doc-keyed signature aggregate, ONE bucket
    shuffle shared by the hot-bucket cap window AND the in-bucket
    collect (the cap must not add its own), and the final distinct of
    true-neighbor pairs. A fourth exchange means either the cap or a
    rotation started shuffling on its own."""
    import re

    from ha_sqllite_2_influxdb_spark.operators.dedup import (
        recrawl_corpus, simhash_neighbors_rotated,
    )

    df = simhash_neighbors_rotated(
        recrawl_corpus(load_table(spark, sf_dir, "documents")),
        portable=False,
    )
    plan = explain_str(df)
    physical = plan.split("== Physical Plan ==")[-1]
    assert len(re.findall(r"\(\d+\) Exchange", physical)) == 3, plan
    parts = re.findall(r"hashpartitioning\((\w+)#", physical)
    assert parts == ["doc_id", "bucket", "doc_a"], plan
    assert len(re.findall(r"\(\d+\) Window", physical)) == 1, plan


def test_scd2_intervals_crafted_and_single_exchange(spark, sf_dir):
    """SCD2 semantics on crafted input: consecutive equal values collapse,
    re-appearing values reopen, intervals chain [from, to) with a
    NULL-open current row — and the whole plan pays ONE shuffle (the
    second window reuses the first's user_id partitioning)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from ha_sqllite_2_influxdb_spark.plans.analytics import q_scd2_intervals

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    rows = [
        # user 1: A A B A  -> intervals A@0, B@20, A@30(open)
        (1, ts(0), 100, "A"), (1, ts(10), 101, "A"),
        (1, ts(20), 102, "B"), (1, ts(30), 103, "A"),
        # user 2: single event -> one open interval
        (2, ts(5), 200, "X"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    df.createOrReplaceTempView("_scd2_src")

    import ha_sqllite_2_influxdb_spark.plans.analytics as an
    orig = an._t
    an._t = lambda s, d, name: df if name == "events" else orig(s, d, name)
    try:
        out = sorted(
            map(tuple, q_scd2_intervals(spark, sf_dir).collect())
        )
    finally:
        an._t = orig

    us = lambda s: int(dt.datetime(  # noqa: E731
        2024, 1, 1, 0, 0, s, tzinfo=dt.timezone.utc).timestamp() * 1e6)
    assert out == sorted([
        (1, "A", us(0), us(20), False),
        (1, "B", us(20), us(30), False),
        (1, "A", us(30), None, True),
        (2, "X", us(5), None, True),
    ])

    plan = q_scd2_intervals(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """Spark's runtime row-level bloom filter: with a selective dimension
    filter, the optimizer injects might_contain(bloom(dim keys)) onto the
    fact scan BEFORE the shuffle join — the semi-join pruning that cuts
    shuffle volume at 100 TB. Size thresholds are lowered to make the
    sf0.001 fixture eligible (production defaults trip on real sizes);
    the assertion is that OUR loader/join shapes are bloom-eligible, not
    tuned-away."""
    from pyspark.sql import functions as F

    from ha_sqllite_2_influxdb_spark.sources.tables import load_table

    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "1GB",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
    }
    saved = {}
    for k, v in overrides.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 - unset conf
            saved[k] = None
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_orderpriority"
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in opt.lower()
        # and it actually executes (the filter is not planned away)
        assert j.count() > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_robust_outliers_exact_median_mad_crafted(spark, sf_dir):
    """Exact median/MAD outlier summary on crafted values: odd and even
    group sizes, an unambiguous 3-MAD outlier, and integer-exact halves
    (median 2.5 on even n)."""
    import datetime as dt

    from pyspark.sql import functions as F

    import ha_sqllite_2_influxdb_spark.plans.analytics as an

    rows = [
        # user 1 (n=5, odd): values 1..4 + outlier 100 -> median 3.0,
        # deviations {2,1,0,1,97} -> MAD 1.0; |100-3|=97 > 3 -> 1 outlier
        (1, 1.0), (1, 2.0), (1, 3.0), (1, 4.0), (1, 100.0),
        # user 2 (n=4, even): 1,2,3,4 -> median 2.5, devs {1.5,0.5} x2
        # -> MAD 1.0; max dev 1.5 <= 3 -> 0 outliers
        (2, 1.0), (2, 2.0), (2, 3.0), (2, 4.0),
    ]
    df = spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1), i, "t", v, "{}")
         for i, (u, v) in enumerate(rows)],
        "user_id long, ts timestamp, event_id long, event_type string, "
        "value double, props string",
    )
    orig = an._t
    an._t = lambda s, d, name: df if name == "events" else orig(s, d, name)
    try:
        out = {r["user_id"]: r
               for r in an.q_robust_outliers(spark, sf_dir).collect()}
    finally:
        an._t = orig
    assert out[1]["median_value"] == 3.0 and out[1]["mad_value"] == 1.0
    assert out[1]["n_outliers"] == 1 and out[1]["n_events"] == 5
    assert out[2]["median_value"] == 2.5 and out[2]["mad_value"] == 1.0
    assert out[2]["n_outliers"] == 0 and out[2]["n_events"] == 4


def test_resample_locf_fills_gaps_crafted(spark, sf_dir):
    """Hourly LOCF grid: a 3-hour silence carries the last reading
    forward and flags exactly the silent slots."""
    import datetime as dt

    from pyspark.sql import functions as F

    import ha_sqllite_2_influxdb_spark.plans.analytics as an

    def ts(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    rows = [
        # hours 0 (two readings: last wins), 1, then silence 2-4, then 5
        (1, ts(0, 10), 1, 5.0), (1, ts(0, 50), 2, 7.0),
        (1, ts(1, 30), 3, 9.0), (1, ts(5, 0), 4, 11.0),
    ]
    df = spark.createDataFrame(
        [(u, t, e, "t", v, "{}") for (u, t, e, v) in rows],
        "user_id long, ts timestamp, event_id long, event_type string, "
        "value double, props string",
    )
    orig = an._t
    an._t = lambda s, d, name: df if name == "events" else orig(s, d, name)
    try:
        out = sorted(
            (r["grid_us"], r["value_locf"], r["gap_filled"])
            for r in an.q_resample_locf(spark, sf_dir).collect()
        )
    finally:
        an._t = orig

    def us(h):
        return int(dt.datetime(
            2024, 1, 1, h, tzinfo=dt.timezone.utc).timestamp() * 1e6)

    assert out == [
        (us(0), 7.0, False),   # last reading of hour 0
        (us(1), 9.0, False),
        (us(2), 9.0, True),    # carried forward
        (us(3), 9.0, True),
        (us(4), 9.0, True),
        (us(5), 11.0, False),
    ]


def test_cohort_retention_invariants_and_plan(spark, sf_dir):
    """Offset-0 of every cohort has retention exactly 1.0 (the first-
    activity week is by construction an active week for every member);
    actives never exceed cohort size; cohort sizes join back broadcast."""
    df = analytics.q_cohort_retention(spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0 < r["active_users"] <= r["cohort_users"]
        if r["week_offset"] == 0:
            assert r["active_users"] == r["cohort_users"]
            assert r["retention"] == 1.0
    assert "BroadcastHashJoin" in explain_str(df)


def test_event_transitions_rows_sum_to_one(spark, sf_dir):
    """Per source event_type the conditional probabilities partition the
    outgoing mass: sum(p) == 1 within float-sum tolerance, and out_total
    equals the sum of its edge counts."""
    rows = analytics.q_event_transitions(spark, sf_dir).collect()
    assert rows
    by_src = {}
    for r in rows:
        by_src.setdefault(r["event_type"], []).append(r)
    for src, edges in by_src.items():
        tot = edges[0]["out_total"]
        assert all(e["out_total"] == tot for e in edges)
        assert sum(e["n"] for e in edges) == tot
        assert abs(sum(e["p"] for e in edges) - 1.0) < 1e-9


def test_profile_columns_single_scan_consistency(spark, sf_dir):
    """One row per profiled column; bounds are consistent (nn <= n_rows,
    distinct <= nn, min <= max) and quantity cents are integral 100s."""
    rows = {r["column_name"]: r
            for r in analytics.q_profile_columns(spark, sf_dir).collect()}
    assert set(rows) == set(analytics.PROFILE_COLS)
    for r in rows.values():
        assert 0 < r["n_nonnull"] <= r["n_rows"]
        assert 0 < r["n_distinct"] <= r["n_nonnull"]
        assert r["min_cents"] <= r["max_cents"]
    assert rows["l_quantity"]["min_cents"] % 100 == 0


def test_triangle_counts_k4_and_no_nested_loop(spark, sf_dir):
    """K4 has 4 triangles, every node in 3 of them with degree 3; a node
    hanging off one corner joins no triangle and must not appear. The
    fixture plan must close wedges with hash equi-joins — a nested-loop
    (OR-condition) close would be the 100 TB killer."""
    from ha_sqllite_2_influxdb_spark.operators.graph import (
        copurchase_edges, triangle_counts,
    )

    k4 = [(u, v) for u in range(4) for v in range(4) if u < v]
    edges = spark.createDataFrame(k4 + [(3, 9)], "u long, v long")
    rows = {r["part_key"]: r for r in triangle_counts(edges).collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert all(r["n_tri"] == 3 for r in rows.values())
    assert rows[0]["deg"] == 3 and rows[3]["deg"] == 4  # 3 has the pendant
    plan = explain_str(
        analytics.q_triangle_copurchase(spark, sf_dir)
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_path_mining_crafted_sessions(spark):
    """Two users, one with a 30-min gap split: paths reflect the split
    and the per-path session counts aggregate across users."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    mk = lambda m: t0 + dt.timedelta(minutes=m)
    rows = [
        # user 1: view>click then (gap 40min) view
        (1, mk(0), 1, "view", 0.0, None),
        (2, mk(5), 1, "click", 0.0, None),
        (3, mk(45), 1, "view", 0.0, None),
        # user 2: view>click in one session
        (4, mk(0), 2, "view", 0.0, None),
        (5, mk(1), 2, "click", 0.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import ha_sqllite_2_influxdb_spark.plans.analytics as A
    orig = A._t
    A._t = lambda s, d, n: ev
    try:
        out = {r["path"]: r for r in A.q_path_mining(spark, "x").collect()}
    finally:
        A._t = orig
    assert out["view > click"]["n_sessions"] == 2
    assert out["view > click"]["n_steps"] == 2
    assert out["view"]["n_sessions"] == 1


def test_seasonal_anomaly_crafted_outlier(spark):
    """A (user, hour) group with mean 50 and one 250-reading: only the
    outlier flags; its deviation is value − group mean (computed WITH the
    outlier in the baseline); a tight group flags nothing."""
    import datetime as dt

    t = lambda h, i: dt.datetime(2024, 1, 1 + i, h, 0, 0)
    rows = (
        [(i, t(9, i), 1, "view", 50.0, None) for i in range(4)]
        + [(9, t(9, 4), 1, "view", 250.0, None)]
        + [(20 + i, t(11, i), 2, "view", 50.0 + i, None) for i in range(4)]
    )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import ha_sqllite_2_influxdb_spark.plans.analytics as A
    orig = A._t
    A._t = lambda s, d, n: ev
    try:
        out = A.q_seasonal_anomaly(spark, "x").collect()
    finally:
        A._t = orig
    assert len(out) == 1
    r = out[0]
    assert r["event_id"] == 9 and r["hod"] == 9 and r["n_obs"] == 5
    # group mean = (4*50 + 250)/5 = 90 -> deviation = 250 - 90 = 160
    assert r["deviation"] == 160.0


def test_pmi_bigrams_marginals_broadcast(spark, sf_dir):
    """The vocabulary-sized marginal/total relations must join back onto
    the bigram counts as broadcasts — a sort-merge there would re-shuffle
    the corpus-scale count relation twice more at 100 TB."""
    from ha_sqllite_2_influxdb_spark.plans import llm_ops

    plan = explain_str(llm_ops.QUERIES["pmi_bigrams"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_lpa_two_cliques_converge_and_deterministic(spark):
    """Two 4-cliques joined by one bridge edge: after 5 synchronous
    iterations every clique collapses onto its min node id, the bridge
    does not merge them, and the result is identical under a different
    partitioning (partition-order independence)."""
    from ha_sqllite_2_influxdb_spark.operators.graph import lpa_communities

    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges += [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges += [(3, 10)]  # bridge
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: (r.community, r.csize)
           for r in lpa_communities(df).collect()}
    assert {n for n, (c, _) in got.items() if c == 0} == {0, 1, 2, 3}
    assert {n for n, (c, _) in got.items() if c == 10} == {10, 11, 12, 13}
    assert all(s == 4 for _, s in got.values())
    again = {r.node: (r.community, r.csize)
             for r in lpa_communities(df.repartition(7)).collect()}
    assert again == got


def test_link_prediction_known_graph(spark):
    """4-cycle a-b-c-d: both diagonals score Jaccard 1.0 (two common
    neighbors, degree 2 each); existing edges must NOT appear."""
    from ha_sqllite_2_influxdb_spark.operators.graph import link_prediction

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "u long, v long"
    )
    rows = link_prediction(edges).collect()
    got = {(r.a, r.b): (r.common, r.deg_a, r.deg_b, r.jaccard)
           for r in rows}
    assert got == {(1, 3): (2, 2, 2, 1.0), (2, 4): (2, 2, 2, 1.0)}


def test_bfs_distances_path_graph(spark):
    """Path 1-2-3-4-5-6 plus isolated pair 10-11: from source 1 the
    distances are hop counts, depth 4 truncates node 6, and the
    disconnected component never appears."""
    from ha_sqllite_2_influxdb_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11)],
        "u long, v long",
    )
    got = {r.node: r.dist for r in bfs_distances(edges, depth=4).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_sequence_similarity_is_order_sensitive(spark):
    """Users with identical event BAGS but different orders must not be
    identical: user 1 repeats the query user's order (jaccard 1.0),
    user 2 reverses it (disjoint trigrams, jaccard 0.0)."""
    import datetime as dt

    from ha_sqllite_2_influxdb_spark.operators.sequence import (
        user_sequence_similarity,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    fwd = ["a", "b", "c", "d", "e"]
    for uid, seq in [(0, fwd), (1, fwd), (2, list(reversed(fwd)))]:
        for i, et in enumerate(seq):
            rows.append((uid * 100 + i, t0 + dt.timedelta(minutes=i),
                         uid, et))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {r.user_id: r.jaccard
           for r in user_sequence_similarity(ev, query_user=0).collect()}
    assert got == {1: 1.0, 2: 0.0}


def test_influxql_windows_ride_one_series_exchange(spark, sf_dir):
    """Every InfluxQL-layer query pays exactly ONE series-key shuffle:
    the lag/row_number windows, the second (descending) window in
    series_stats, and the per-series groupBy aggregates must all reuse
    the same (measurement, domain, entity_id) hashpartitioning — a
    second series exchange would double the 100 TB shuffle volume.
    (The HA-fixture derivation's internal exchanges sit under a cached
    InMemoryTableScan and partition on other keys, so they can't match.)"""
    from ha_sqllite_2_influxdb_spark.plans import influxql

    # downsample (and fill_linear, its interpolating sibling)
    # legitimately pay two: the (series, hour) bucket agg plus the
    # series window the gap expansion and fill share
    # mode/distinct pay two by design: the (series, value) pre-agg
    # keyed on series+value, then the series agg on the collapsed
    # relation (two-phase distinct — both exchanges start with the
    # series columns so both match the count)
    # state_mode pays two: the (series, state) freq agg cannot serve the
    # series-only rank window. state_durations pays ONE: the (series,
    # state) agg consumes the lead-window's series partitioning directly
    # (a subset of the grouping keys clusters every group)
    budget = {"influx_downsample": 2, "influx_holt_winters": 2,
              "influx_mode": 2, "influx_fill_linear": 2,
              "influx_distinct": 2, "influx_state_mode": 2,
              # rollup cascade: one exchange per tier BY DESIGN —
              # hourly partial agg, then daily over the hourly output
              "influx_rollup_cascade": 2}
    for name, fn in influxql.QUERIES.items():
        physical = explain_str(fn(spark, sf_dir))
        n = physical.count("hashpartitioning(measurement")
        want = budget.get(name, 1)
        assert n == want, f"{name}: {n} series exchanges\n{physical}"


def test_influx_integral_trapezoid_crafted(spark):
    """Trapezoidal integral on a hand-computed series: values 0→10 over
    10 s (area 50), then constant 10 for 5 s (area 50) ⇒ 100 value·s;
    a second 1-point series produces no trapezoids and must be absent
    (InfluxDB emits nothing for it either)."""
    from ha_sqllite_2_influxdb_spark.plans.influxql import (
        q_influx_integral, q_influx_derivative)
    from ha_sqllite_2_influxdb_spark.sources import ha_fixture

    rows = [
        # (state_id, measurement, domain, entity_id, ts_epoch, value)
        (1, "W", "sensor", "power", 100.0, 0.0),
        (2, "W", "sensor", "power", 110.0, 10.0),
        (3, "W", "sensor", "power", 115.0, 10.0),
        (4, "C", "sensor", "temp", 50.0, 21.5),
        # downsample gap series: hours 0 and 2 observed, hour 1 empty
        (5, "kWh", "sensor", "energy", 10.0, 0.5),
        (6, "kWh", "sensor", "energy", 20.0, 1.5),
        (7, "kWh", "sensor", "energy", 7300.0, 4.0),
    ]
    pts = spark.createDataFrame(
        rows, "state_id long, measurement string, domain string, "
              "entity_id string, ts_epoch double, value double")

    import ha_sqllite_2_influxdb_spark.plans.influxql as iq
    orig = iq._numeric_points
    iq._numeric_points = lambda spark, sf_dir: pts
    try:
        got = {(r.measurement, r.entity_id): (r.integral_vs, r.n_points)
               for r in q_influx_integral(spark, "unused").collect()
               if r.measurement == "W"}
        deriv = {r.state_id: r.deriv_per_s
                 for r in q_influx_derivative(spark, "unused").collect()
                 if r.measurement == "W"}
        ds = {(r.measurement, r.bucket_epoch):
              (r.mean_locf, r.n_points, r.gap_filled)
              for r in iq.q_influx_downsample(spark, "unused").collect()
              if r.measurement == "kWh"}
    finally:
        iq._numeric_points = orig
    assert got == {("W", "power"): (100.0, 3)}
    assert deriv == {2: 1.0, 3: 0.0}
    # downsample gap fill: observations in hours 0 and 2 (7200 s apart)
    # ⇒ the empty hour-1 bucket materializes, carries the hour-0 mean,
    # and is flagged; real buckets keep their own means
    assert ds == {
        ("kWh", 0): (1.0, 2, False),      # mean(0.5, 1.5)
        ("kWh", 3600): (1.0, 0, True),    # LOCF-filled gap
        ("kWh", 7200): (4.0, 1, False),
    }


def test_holt_winters_recurrence_pinned_and_sane(spark):
    """The additive Holt-Winters recurrence is pinned BIT-EXACTLY
    against an independent scalar reimplementation (so a future
    vectorization cannot silently reassociate the float ops), and on a
    clean trend+season series the forecast must track the ground truth
    closely; series shorter than two seasons yield no rows."""
    import math

    from ha_sqllite_2_influxdb_spark.operators.forecast import (
        hw_additive, holt_winters_forecast)

    m, h, a, b, g = 24, 12, 0.5, 0.1, 0.1
    pattern = [math.sin(2 * math.pi * i / 24) * 10 for i in range(24)]
    vals = [0.25 * t + pattern[t % 24] for t in range(24 * 8)]

    # independent reference loop (same classic formulation, written out)
    lvl = sum(vals[:m]) / m
    tr = (sum(vals[m:2 * m]) / m - lvl) / m
    sea = [vals[i] - (lvl + (i - (m - 1) / 2.0) * tr) for i in range(m)]
    for t in range(m, len(vals)):
        old = lvl
        lvl = a * (vals[t] - sea[t % m]) + (1 - a) * (lvl + tr)
        tr = b * (lvl - old) + (1 - b) * tr
        sea[t % m] = g * (vals[t] - lvl) + (1 - g) * sea[t % m]
    ref = [lvl + (k + 1) * tr + sea[(len(vals) + k) % m] for k in range(h)]

    got = hw_additive(vals, m, h, a, b, g)
    assert got == ref  # bit-exact

    truth = [0.25 * (len(vals) + k) + pattern[(len(vals) + k) % 24]
             for k in range(h)]
    assert max(abs(x - y) for x, y in zip(got, truth)) < 1.0

    rows = [("W", "sensor", "power", i, v) for i, v in enumerate(vals)]
    rows += [("C", "sensor", "temp", i, 1.0) for i in range(30)]  # < 2m
    hourly = spark.createDataFrame(
        rows, "measurement string, domain string, entity_id string, "
              "hour_idx long, mean_val double")
    out = holt_winters_forecast(hourly, season_len=m, horizon=h,
                                alpha=a, beta=b, gamma=g).collect()
    assert {r.measurement for r in out} == {"W"}  # short series dropped
    assert [r.forecast for r in sorted(out, key=lambda r: r.step)] == got


def test_influx_percentile_approx_brackets_exact(spark, sf_dir):
    """The sketch tier must return a REAL sample of each series, bracketed
    between the series' exact p90 and p99 rank values (rows-only tier
    contract — Spark's GK sketch is not DuckDB-checkable)."""
    from ha_sqllite_2_influxdb_spark.plans.influxql import (
        _numeric_points, q_influx_percentile_approx)

    raw = _numeric_points(spark, sf_dir).collect()
    series: dict = {}
    for r in raw:
        series.setdefault(
            (r.measurement, r.domain, r.entity_id), []).append(r.value)
    approx = q_influx_percentile_approx(spark, sf_dir).collect()
    assert len(approx) == len(series)
    import math
    for r in approx:
        vals = sorted(series[(r.measurement, r.domain, r.entity_id)])
        assert r.n_points == len(vals)
        assert r.p95_approx in vals, "not a real sample"
        lo = vals[max(1, math.ceil(0.90 * len(vals))) - 1]
        hi = vals[max(1, math.ceil(0.99 * len(vals))) - 1]
        assert lo <= r.p95_approx <= hi, (r, lo, hi)


def test_influx_ema_bit_pinned(spark):
    """EMA recurrence: hand-pinned goldens on a crafted series, exact
    agreement between the Spark applyInPandas tier and the pure-Python
    reference (bit-equality, not approx), and run-to-run determinism."""
    from ha_sqllite_2_influxdb_spark.operators.forecast import (
        ema_points, ema_recurrence)

    # alpha = 2/(2+1) = 2/3 for n=2: hand-computable
    assert ema_recurrence([3.0, 6.0], 2) == [3.0, 5.0]
    assert ema_recurrence([], 9) == []

    rows = [(i, "W", "sensor", "power", float(10 * i), float(v))
            for i, v in enumerate([5.0, 8.0, 2.0, 7.5, 7.5, 0.25])]
    rows += [(99, "C", "sensor", "temp", 0.0, 21.5)]
    pts = spark.createDataFrame(
        rows, "state_id long, measurement string, domain string, "
              "entity_id string, ts_epoch double, value double")
    got = {r.state_id: r.ema for r in ema_points(pts, n=9).collect()}
    ref = ema_recurrence([5.0, 8.0, 2.0, 7.5, 7.5, 0.25], 9)
    assert [got[i] for i in range(6)] == ref        # bit-exact
    assert got[99] == 21.5                          # 1-point series
    again = {r.state_id: r.ema for r in ema_points(pts, n=9).collect()}
    assert again == got


def test_ha_energy_daily_trapezoid_known_answer(spark, sf_dir):
    """Constant 100 W across a day boundary: energy accrues to the day
    of each trapezoid's LEFT endpoint, Wh = W·s/3600."""
    from ha_sqllite_2_influxdb_spark.plans import influxql

    rows = [(1, "W", "d", "e", 82800.0, 100.0),    # 23:00 day 0
            (2, "W", "d", "e", 86400.0, 100.0),    # 00:00 day 1
            (3, "W", "d", "e", 90000.0, 100.0)]    # 01:00 day 1
    pts = spark.createDataFrame(
        rows, "state_id long, measurement string, domain string, "
              "entity_id string, ts_epoch double, value double")
    import ha_sqllite_2_influxdb_spark.plans.influxql as iq

    # drive the same expression path on a frame (the registry entry
    # reads the fixture; here we call the internals on known points)
    from pyspark.sql import functions as F
    w = iq._w()
    trap = ((F.col("value") + F.lag("value").over(w))
            * (F.col("ts_epoch") - F.lag("ts_epoch").over(w)) / F.lit(2.0))
    day = (F.floor(F.lag("ts_epoch").over(w) / 86400).cast("long")
           * 86400)
    terms = pts.select(*iq._SERIES, day.alias("day"),
                       F.round(trap * 1e6).cast("long").alias("_t"))
    out = {r.day: r.wh for r in
           terms.filter(F.col("_t").isNotNull())
           .groupBy(*iq._SERIES, "day")
           .agg(((F.sum("_t") / 1e6) / F.lit(3600.0)).alias("wh"))
           .collect()}
    # 23:00->00:00 trapezoid (1h at 100W) belongs to day 0;
    # 00:00->01:00 to day 1
    assert out == {0: 100.0, 86400: 100.0}


def test_neardup_sql_text_plan_equals_dataframe_build(spark, sf_dir):
    """r10 (VERDICT r9 #6): the xxhash64 LSH tier's one-parse SQL-text
    build must be plan-identical to the chained DataFrame build it
    replaced — optimizer-level sameResult, same executed shuffle count,
    and identical pair values — so the ~4x plan-build saving (measured
    0.50 -> 0.13 s per fresh build) changes nothing physical. The
    simhash r6 precedent, applied to the banding pipeline."""
    from ha_sqllite_2_influxdb_spark.operators import dedup

    corpus = dedup.recrawl_corpus(
        load_table(spark, sf_dir, "documents")).cache()
    try:
        corpus.count()
        df_build = dedup._neardup_pairs_df(
            corpus, 0.5, 8, portable=False, bucket_cap=256)
        sql_build = dedup.neardup_pairs(
            corpus, 0.5, 8, portable=False, bucket_cap=256)
        assert (df_build._jdf.queryExecution().optimizedPlan().sameResult(
                sql_build._jdf.queryExecution().optimizedPlan()))
        n_ex_df = (df_build._jdf.queryExecution().executedPlan()
                   .toString().count("Exchange"))
        n_ex_sql = (sql_build._jdf.queryExecution().executedPlan()
                    .toString().count("Exchange"))
        assert n_ex_df == n_ex_sql
        got_df = sorted((r.doc_a, r.doc_b, round(r.jaccard, 9))
                        for r in df_build.collect())
        got_sql = sorted((r.doc_a, r.doc_b, round(r.jaccard, 9))
                         for r in sql_build.collect())
        assert got_df == got_sql and got_df
        # the uncapped tier must stay plan-equal too (no-window branch)
        assert (dedup._neardup_pairs_df(
                    corpus, 0.5, 8, portable=False, bucket_cap=None)
                ._jdf.queryExecution().optimizedPlan().sameResult(
                dedup.neardup_pairs(
                    corpus, 0.5, 8, portable=False, bucket_cap=None)
                ._jdf.queryExecution().optimizedPlan()))
        # ADVICE r10 low: widen the lockstep guard past the default
        # parameters — an affine-coefficient drift affecting only
        # seeds >= 8 would slip every n_seeds=8 assertion above (the
        # SQL literals now derive from _perm_coeffs/_ROT/SHINGLE_K,
        # the same constants the Column builders read)
        assert (dedup._neardup_pairs_df(
                    corpus, 0.5, 12, portable=False, bucket_cap=None)
                ._jdf.queryExecution().optimizedPlan().sameResult(
                dedup.neardup_pairs(
                    corpus, 0.5, 12, portable=False, bucket_cap=None)
                ._jdf.queryExecution().optimizedPlan()))
    finally:
        corpus.unpersist()


def test_simhash_rotated_sql_text_plan_equals_dataframe_build(
        spark, sf_dir):
    """r12 (VERDICT r11 #7): the xxhash64 rotated-simhash tier's
    one-parse SQL-text build must be plan-identical to the chained
    DataFrame build it replaced — optimizer-level sameResult, equal
    executed Exchange counts, identical pair values — pinned on BOTH
    cap branches AND at non-default rotation parameters (the ADVICE r10
    widening convention: a drift touching only some rotation count or
    bucket width must not slip the default-parameter assertion). The
    signature stage is shared VERBATIM between the two tiers via
    _simhash_sig_text, so only the bucketing/cap/pairing stages can
    ever diverge, and they are what this pins."""
    from ha_sqllite_2_influxdb_spark.operators import dedup

    corpus = dedup.recrawl_corpus(
        load_table(spark, sf_dir, "documents")).cache()
    try:
        corpus.count()
        for cap, rots, bw in ((dedup.DEFAULT_BUCKET_CAP, 4, 16),
                              (None, 4, 16),
                              (dedup.DEFAULT_BUCKET_CAP, 3, 12)):
            sql_b = dedup.simhash_neighbors_rotated(
                corpus, max_hamming=3, portable=False, rotations=rots,
                bucket_width=bw, bucket_cap=cap)
            ref_b = dedup._simhash_neighbors_rotated_df(
                corpus, 3, dedup.SIMHASH_BITS, False, rots, bw, cap)
            key = (cap, rots, bw)
            assert (sql_b._jdf.queryExecution().optimizedPlan()
                    .sameResult(
                        ref_b._jdf.queryExecution().optimizedPlan())), key
            n_sql = (sql_b._jdf.queryExecution().executedPlan()
                     .toString().count("Exchange"))
            n_ref = (ref_b._jdf.queryExecution().executedPlan()
                     .toString().count("Exchange"))
            assert n_sql == n_ref, key
            got_sql = sorted(map(tuple, sql_b.collect()))
            got_ref = sorted(map(tuple, ref_b.collect()))
            assert got_sql == got_ref and got_sql, key
    finally:
        corpus.unpersist()


def test_simhash_rotated_sql_null_and_empty_text_edges(spark):
    """The rotated tier's documented NULL/empty-text row semantics must
    survive the SQL-text build: a NULL-text doc yields NO signature (so
    no pairs), an empty-but-non-null text yields the ''-token signature
    on both builds — identical pair sets either way."""
    from ha_sqllite_2_influxdb_spark.operators import dedup

    corpus = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, None),
         (4, ""), (5, "")],
        "doc_id long, text string")
    sql_b = dedup.simhash_neighbors_rotated(corpus, portable=False)
    ref_b = dedup._simhash_neighbors_rotated_df(
        corpus, 3, dedup.SIMHASH_BITS, False, 4, 16,
        dedup.DEFAULT_BUCKET_CAP)
    got_sql = sorted(map(tuple, sql_b.collect()))
    assert got_sql == sorted(map(tuple, ref_b.collect()))
    pairs = {(a, b) for a, b, _ in got_sql}
    assert (1, 2) in pairs and (4, 5) in pairs   # dup texts, '' tokens
    assert all(3 not in p for p in pairs), "NULL-text doc paired"


def test_aggwin_sql_text_plan_equals_dataframe_build(spark, sf_dir):
    """r11 (VERDICT r10 #7): the plain-aggregate aggregateWindow stage
    compiles from ONE SQL-text parse (the `_neardup_pairs_sql`
    precedent — the r11 profile measured 0.28 s of
    flux_window_fill_prev's 0.37 s fresh build in this stage's chained
    Column construction). The fast path must be plan-identical to the
    DataFrame build it replaces: optimizer-level sameResult, equal
    executed Exchange counts, identical values — pinned on BOTH the
    createEmpty grid branch (the frozen headline) and the plain
    downsample branch. Selector fns (first/last) and empty group keys
    stay on the reference DataFrame build."""
    from ha_sqllite_2_influxdb_spark.plans import flux_text as FX

    for name in ("flux_window_fill_prev", "flux_downsample_mean"):
        fn = FX.QUERIES[name]
        try:
            FX._AGGWIN_SQL_ENABLED = True
            sql_b = fn(spark, sf_dir)
            FX._AGGWIN_SQL_ENABLED = False
            ref_b = fn(spark, sf_dir)
        finally:
            FX._AGGWIN_SQL_ENABLED = True
        assert (sql_b._jdf.queryExecution().optimizedPlan().sameResult(
                ref_b._jdf.queryExecution().optimizedPlan())), name
        n_sql = (sql_b._jdf.queryExecution().executedPlan()
                 .toString().count("Exchange"))
        n_ref = (ref_b._jdf.queryExecution().executedPlan()
                 .toString().count("Exchange"))
        assert n_sql == n_ref, name
        got_sql = sorted(map(tuple, sql_b.collect()))
        got_ref = sorted(map(tuple, ref_b.collect()))
        assert got_sql == got_ref and got_sql, name


def test_downsample_gap_fill_is_lagged_mean(spark, sf_dir):
    """r14 plan surgery pin: downsample_fill_previous now fills gaps by
    PROJECTION (the generating bucket's lagged mean) instead of a
    second window over the exploded grid. The two formulations must be
    row-identical — checked against an inline rebuild of the OLD
    two-window plan on (a) the real fixture and (b) a crafted series
    with a RUN of consecutive empty hours (0 observed; 1,2,3 empty;
    4 observed — every gap row must carry hour 0's mean, exactly what
    last(ignorenulls) picked)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import ha_sqllite_2_influxdb_spark.plans.influxql as iq

    def old_formulation(pts):
        hr = F.floor(F.col("ts_epoch") / 3600).cast("long")
        micro = F.round(F.col("value") * 1e6).cast("long")
        buckets = (
            pts.select(*iq._SERIES, hr.alias("hour_idx"),
                       micro.alias("micro"))
            .groupBy(*iq._SERIES, "hour_idx")
            .agg(((F.sum("micro") / 1e6) / F.count(F.lit(1)))
                 .alias("mean_val"),
                 F.count(F.lit(1)).alias("n_points")))
        wseries = Window.partitionBy(*iq._SERIES).orderBy("hour_idx")
        lagged = buckets.select(
            *iq._SERIES, "hour_idx", "mean_val", "n_points",
            F.lag("hour_idx").over(wseries).alias("_prev"))
        expanded = lagged.select(
            *iq._SERIES, "hour_idx", "mean_val", "n_points",
            F.explode(F.sequence(
                F.coalesce(F.col("_prev") + 1, F.col("hour_idx")),
                F.col("hour_idx"))).alias("grid_idx"))
        is_real = F.col("grid_idx") == F.col("hour_idx")
        wfill = wseries.orderBy("grid_idx").rowsBetween(
            Window.unboundedPreceding, 0)
        return expanded.select(
            *iq._SERIES,
            (F.col("grid_idx") * 3600).alias("bucket_epoch"),
            F.last(F.when(is_real, F.col("mean_val")), ignorenulls=True)
             .over(wfill).alias("mean_locf"),
            F.when(is_real, F.col("n_points")).otherwise(F.lit(0))
             .alias("n_points"),
            (~is_real).alias("gap_filled"))

    crafted = spark.createDataFrame(
        [(1, "W", "sensor", "power", 100.0, 2.0),
         (2, "W", "sensor", "power", 200.0, 4.0),
         (3, "W", "sensor", "power", 14_500.0, 9.0),
         (4, "C", "sensor", "temp", 50.0, 21.5)],
        "state_id long, measurement string, domain string, "
        "entity_id string, ts_epoch double, value double")
    for pts in (crafted, iq._numeric_points(spark, sf_dir)):
        new_df = iq.downsample_fill_previous(pts)
        old_df = old_formulation(pts)
        assert new_df.exceptAll(old_df).count() == 0
        assert old_df.exceptAll(new_df).count() == 0
        assert new_df.count() == old_df.count() > 0
    # the crafted run of gaps explicitly: hours 1-3 all carry hour 0's
    # mean and the flag
    rows = {r.bucket_epoch: (r.mean_locf, r.n_points, r.gap_filled)
            for r in iq.downsample_fill_previous(crafted)
            .filter(F.col("measurement") == "W").collect()}
    assert rows == {0: (3.0, 2, False), 3600: (3.0, 0, True),
                    7200: (3.0, 0, True), 10800: (3.0, 0, True),
                    14400: (9.0, 1, False)}


def test_points_and_attr_fields_sql_text_plan_equality(spark, sf_dir):
    """r14 (guide §1.1/§7.3): the two reference-core transforms ship as
    ONE SQL parse each (eager per-call analysis made the ~10-call chained
    builds cost 0.08-0.13 s of pure driver work per invocation; measured
    77->36 ms and 125->32 ms with the texts). The text build must stay
    plan-identical to the DataFrame reference: optimizer-level
    sameResult, equal executed Exchange counts, identical values — on
    BOTH points branches (keep_state toggles the state_raw column the
    sink's byte-exact rendering needs)."""
    from ha_sqllite_2_influxdb_spark.operators import transform as T
    from ha_sqllite_2_influxdb_spark.sources.ha_fixture import (
        derive_ha_tables,
    )

    ha = derive_ha_tables(spark, sf_dir)
    args = (ha["ha_states"], ha["ha_states_meta"],
            ha["ha_state_attributes"])
    for new, ref, kw in ((T.points, T._points_df, {}),
                         (T.points, T._points_df, {"keep_state": True}),
                         (T.attr_fields, T._attr_fields_df, {})):
        a, b = new(*args, **kw), ref(*args, **kw)
        assert (a._jdf.queryExecution().optimizedPlan().sameResult(
                b._jdf.queryExecution().optimizedPlan())), kw
        n_a = (a._jdf.queryExecution().executedPlan()
               .toString().count("Exchange"))
        n_b = (b._jdf.queryExecution().executedPlan()
               .toString().count("Exchange"))
        assert n_a == n_b
        got_a = sorted(map(tuple, a.collect()))
        got_b = sorted(map(tuple, b.collect()))
        assert got_a == got_b and got_a


def test_curate_pipeline_sql_text_plan_equality(spark, sf_dir):
    """r14: q_curate_pipeline ships as one SQL parse (build 262->129 ms
    — the chained build re-analyzed the whole pipeline tree at every
    call). Must stay plan-identical to the operator-composed reference:
    optimizer sameResult, equal Exchange counts, identical rows."""
    from ha_sqllite_2_influxdb_spark.plans import llm_ops

    a = llm_ops.q_curate_pipeline(spark, sf_dir)
    b = llm_ops._q_curate_pipeline_df(spark, sf_dir)
    assert (a._jdf.queryExecution().optimizedPlan().sameResult(
            b._jdf.queryExecution().optimizedPlan()))
    assert (a._jdf.queryExecution().executedPlan().toString()
            .count("Exchange")
            == b._jdf.queryExecution().executedPlan().toString()
            .count("Exchange"))
    got_a = sorted(map(tuple, a.collect()))
    got_b = sorted(map(tuple, b.collect()))
    assert got_a == got_b and got_a


def test_lang_id_sql_text_plan_equality(spark, sf_dir):
    """r14: lang_id ships as one SQL parse (build 152->41 ms), rendered
    from the same STOPWORDS table as the Column build — sameResult,
    same columns, identical rows."""
    from ha_sqllite_2_influxdb_spark.operators import text as T

    docs = load_table(spark, sf_dir, "documents")
    a, b = T.lang_id(docs), T._lang_id_df(docs)
    assert a.columns == b.columns
    assert (a._jdf.queryExecution().optimizedPlan().sameResult(
            b._jdf.queryExecution().optimizedPlan()))
    got_a = sorted(map(tuple, a.collect()))
    got_b = sorted(map(tuple, b.collect()))
    assert got_a == got_b and got_a


def test_bloom_and_dsir_sql_text_plan_equality(spark, sf_dir):
    """r14: bloom_probe and dsir_apply ship as one SQL parse each
    (builds 192->97 ms and 156->102 ms on their headline queries — the
    chained builds re-analyzed the K-probe rolling-hash / bucket-
    transform trees per call). Pinned plan-identical to the chained
    references on BOTH hash tiers (portable toggles rolling-hash vs
    xxhash64)."""
    from ha_sqllite_2_influxdb_spark import memo
    from ha_sqllite_2_influxdb_spark.operators import curation, scoring
    from ha_sqllite_2_influxdb_spark.plans import llm_ops

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = llm_ops._bloom_words(spark, sf_dir)
    lr = llm_ops._dsir_lr(spark, sf_dir)
    n_part = spark.sparkContext.defaultParallelism
    ref_in = docs
    if memo.input_width(ref_in) < n_part:
        ref_in = ref_in.repartition(n_part)
    for portable in (True, False):
        pairs = (
            (curation.bloom_probe(docs, words, portable),
             curation._bloom_probe_df(ref_in, words, portable)),
            (scoring.dsir_apply(docs, lr, portable=portable),
             scoring._dsir_apply_df(docs, lr, portable=portable)),
        )
        for a, b in pairs:
            assert a.columns == b.columns
            assert (a._jdf.queryExecution().optimizedPlan().sameResult(
                    b._jdf.queryExecution().optimizedPlan())), portable
            got_a = sorted(map(tuple, a.collect()))
            got_b = sorted(map(tuple, b.collect()))
            assert got_a == got_b and got_a


def test_sql_text_builds_do_not_evict_fixture_cache(spark, sf_dir):
    """r14 regression pin: the parameterized spark.sql formatter DROPS
    its temp views after parsing, and dropTempView un-caches any cached
    plan canonically matching the view — so splicing the persisted HA
    fixture through it unpersisted the fixture on every points/
    attr_fields build (flux fill-previous tripled while every
    sameResult pin stayed green). The sql_with_plans helper must keep
    the cache: after building every SQL-text transform, a scan of each
    fixture table still reads InMemoryTableScan."""
    from ha_sqllite_2_influxdb_spark.operators import transform as T
    from ha_sqllite_2_influxdb_spark.sources.ha_fixture import (
        derive_ha_tables,
    )

    ha = derive_ha_tables(spark, sf_dir)
    for df in ha.values():
        df.count()  # materialize the persisted fixture
    args = (ha["ha_states"], ha["ha_states_meta"],
            ha["ha_state_attributes"])
    T.points(*args).schema
    T.points(*args, keep_state=True).schema
    T.attr_fields(*args).schema
    for name, df in ha.items():
        plan = (df.select(df.columns[0])._jdf.queryExecution()
                .executedPlan().toString())
        assert "InMemoryTableScan" in plan, name


def test_tpch_text_plans_equal_dataframe_builds(spark, sf_dir):
    """r14 (guide §5): the three TPC-H headliners ship as one SQL parse
    — each chained build cost 0.16-0.26 s of per-call Catalyst analysis
    at any data size (measured min-of-10 in one JVM: q1 0.263→0.048,
    q3 0.189→0.057, q5 0.159→0.085 s). The text build must be
    plan-identical (optimizer sameResult) and value-identical to the
    chained reference so nothing physical changes.

    ADVICE r14 low #3: canonicalization erases JoinHints, so sameResult
    alone would pass silently if a text dropped its BROADCAST hint and
    fell back to SMJ. Mirror the curate pin's extra check: executed
    Exchange and BroadcastExchange counts must also match, and the
    hint-bearing q3/q5 plans must actually broadcast (no SMJ)."""
    for text_fn, df_fn, hinted in (
        (analytics.q_tpch_q1, analytics._q_tpch_q1_df, False),
        (analytics.q_tpch_q3, analytics._q_tpch_q3_df, True),
        (analytics.q_tpch_q5, analytics._q_tpch_q5_df, True),
    ):
        a = text_fn(spark, sf_dir)
        b = df_fn(spark, sf_dir)
        assert a._jdf.queryExecution().optimizedPlan().sameResult(
            b._jdf.queryExecution().optimizedPlan()), text_fn.__name__
        pa = a._jdf.queryExecution().executedPlan().toString()
        pb = b._jdf.queryExecution().executedPlan().toString()
        for node in ("Exchange", "BroadcastExchange"):
            assert pa.count(node) == pb.count(node), (
                text_fn.__name__, node)
        if hinted:
            assert "BroadcastHashJoin" in pa, text_fn.__name__
            assert "SortMergeJoin" not in pa, text_fn.__name__
        got_a = sorted(map(tuple, a.collect()))
        got_b = sorted(map(tuple, b.collect()))
        assert got_a == got_b and got_a, text_fn.__name__


def test_knn_text_plan_equals_dataframe_build(spark, sf_dir):
    """r14 (guide §5): brute-force kNN ships as one SQL parse — the
    chained build re-analyzed the lambda-bearing fold trees per call
    (~0.26 s at any data size; text ~0.03 s). Plan- and value-identical
    to the chained reference, at the default and a non-default (n, k)."""
    from ha_sqllite_2_influxdb_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    for kw in ({}, {"n_queries": 3, "k": 4}):
        a = similarity.knn_brute_force(emb, **kw)
        b = similarity._knn_brute_force_df(emb, **kw)
        assert a._jdf.queryExecution().optimizedPlan().sameResult(
            b._jdf.queryExecution().optimizedPlan()), kw
        got_a = sorted(map(tuple, a.collect()))
        got_b = sorted(map(tuple, b.collect()))
        assert got_a == got_b and got_a, kw


def test_downsample_text_plan_equals_dataframe_build(spark, sf_dir):
    """r14 (guide §5): the downsample core ships as one SQL parse (the
    chained build cost ~0.22 s per call; text ~0.04 s). Plan- and
    value-identical to the chained reference on the real numeric-point
    relation AND on a crafted multi-gap series (the scale probe calls
    the operator on synthetic corpora, so the text must accept any
    conforming relation)."""
    from ha_sqllite_2_influxdb_spark.plans import influxql as iq

    pts = iq._numeric_points(spark, sf_dir)
    a = iq.downsample_fill_previous(pts)
    b = iq._downsample_fill_previous_df(pts)
    assert a._jdf.queryExecution().optimizedPlan().sameResult(
        b._jdf.queryExecution().optimizedPlan())
    got_a = sorted(map(tuple, a.collect()))
    got_b = sorted(map(tuple, b.collect()))
    assert got_a == got_b and got_a

    crafted = spark.createDataFrame(
        [("m", "d", "e1", 0, 1.5), ("m", "d", "e1", 3600 * 4, 2.5),
         ("m", "d", "e2", 7200, -1.0)],
        "measurement string, domain string, entity_id string, "
        "ts_epoch long, value double")
    got_c = sorted(map(tuple,
                       iq.downsample_fill_previous(crafted).collect()))
    got_d = sorted(map(tuple,
                       iq._downsample_fill_previous_df(crafted).collect()))
    assert got_c == got_d and len(got_c) == 6


def test_mean_shift_text_plan_equals_dataframe_build(spark, sf_dir):
    """r14 (guide §5): the mean-shift detector ships as one SQL parse
    (chained build ~0.35 s per call at any data size; text ~0.06 s).
    Plan- and value-identical at the default and a non-default
    (w_pts, threshold)."""
    from ha_sqllite_2_influxdb_spark.operators import monitor
    from ha_sqllite_2_influxdb_spark.plans.influxql import _numeric_points

    pts = _numeric_points(spark, sf_dir)
    for kw in ({"w_pts": 3, "threshold": 10.0},
               {"w_pts": 2, "threshold": 0.5}):
        a = monitor.mean_shift_scores(pts, **kw)
        b = monitor._mean_shift_scores_df(pts, **kw)
        assert a._jdf.queryExecution().optimizedPlan().sameResult(
            b._jdf.queryExecution().optimizedPlan()), kw
        got_a = sorted(map(tuple, a.collect()))
        got_b = sorted(map(tuple, b.collect()))
        assert got_a == got_b, kw


def test_series_stats_text_plan_equals_dataframe_build(spark, sf_dir):
    """r14 (guide §5 + §2.4): series-stats ships as one SQL parse
    (chained build ~0.21 s per call; text ~0.06 s) AND drops a window
    pass — the lag now sits adjacent to the ascending rank so
    CollapseWindow merges their identical specs (2 Window nodes, the
    old column order interposed the descending rank and paid 3).
    Values are per-row window outputs, so reordering changes nothing:
    pinned against a rebuilt old-order chain."""
    from ha_sqllite_2_influxdb_spark.plans import influxql as iq

    a = iq.q_influx_series_stats(spark, sf_dir)
    b = iq._q_influx_series_stats_df(spark, sf_dir)
    assert a._jdf.queryExecution().optimizedPlan().sameResult(
        b._jdf.queryExecution().optimizedPlan())
    assert (a._jdf.queryExecution().optimizedPlan().toString()
            .count("Window") == 2)
    got_a = sorted(map(tuple, a.collect()))
    got_b = sorted(map(tuple, b.collect()))
    assert got_a == got_b and got_a

    # the old window order (rank asc, rank desc, THEN lag) — values equal
    from pyspark.sql import Window as W

    pts = iq._numeric_points(spark, sf_dir)
    w = iq._w()
    old = (
        pts.withColumn("_rn_a", F.row_number().over(w))
        .withColumn("_rn_d", F.row_number().over(
            W.partitionBy(*iq._SERIES)
            .orderBy(F.desc("ts_epoch"), F.desc("state_id"))))
        .withColumn("_gap", F.col("ts_epoch") - F.lag("ts_epoch").over(w))
        .groupBy(*iq._SERIES).agg(
            F.count(F.lit(1)).alias("n_points"),
            (F.max("value") - F.min("value")).alias("spread"),
            F.max(F.when(F.col("_rn_a") == 1, F.col("value")))
            .alias("first_val"),
            F.max(F.when(F.col("_rn_d") == 1, F.col("value")))
            .alias("last_val"),
            (F.max("ts_epoch") - F.min("ts_epoch")).alias("elapsed_s"),
            F.max("_gap").alias("max_gap_s"),
        )
    )
    assert got_a == sorted(map(tuple, old.collect()))


def test_ngram_text_plan_equals_dataframe_build(spark, sf_dir):
    """r14 (guide §5): the span-dedup measurement's xxhash64 tier ships
    as one SQL parse (chained build ~0.25 s per call; text ~0.05 s).
    Plan- and value-identical to the chained reference at n=8 and a
    non-default n; the string-grouping oracle tier stays chained."""
    from ha_sqllite_2_influxdb_spark.operators import dedup

    docs = dedup.recrawl_corpus(load_table(spark, sf_dir, "documents"))
    for n in (8, 3):
        a = dedup.ngram_span_stats(docs, n=n)
        b = dedup._ngram_span_stats_df(docs, n=n)
        assert a._jdf.queryExecution().optimizedPlan().sameResult(
            b._jdf.queryExecution().optimizedPlan()), n
        got_a = sorted(map(tuple, a.collect()))
        got_b = sorted(map(tuple, b.collect()))
        assert got_a == got_b and got_a, n
