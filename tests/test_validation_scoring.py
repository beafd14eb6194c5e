"""Behavioral tests for the r6 additions: data expectations, the hashed
quality classifier, JL random projection, and streaming windowed top-k.
(Oracle value parity for all four is covered by test_oracle_parity.)"""

import uuid

from pyspark.sql import functions as F

from ha_sqllite_2_influxdb_spark.operators.scoring import quality_classify
from ha_sqllite_2_influxdb_spark.operators.similarity import (
    random_projection,
)
from ha_sqllite_2_influxdb_spark.operators.validate import (
    expectations_report,
)
from ha_sqllite_2_influxdb_spark.sources.tables import load_table


def test_expectations_flags_injected_violations(spark):
    """Each rule must count exactly the rows planted to violate it."""
    li = spark.createDataFrame(
        [
            # (okey, linenumber, qty, discount)       violations planted:
            (1, 1, 10.0, 0.05),   # clean
            (1, 2, 99.0, 0.05),   # qty out of range
            (None, 1, 10.0, 0.05),  # null orderkey (+ orphan by NOT EXISTS)
            (2, 1, 10.0, 0.9),    # discount out of range
            (2, 1, 10.0, 0.05),   # duplicate (2, 1) key
            (7, 1, 10.0, 0.05),   # orphan: no order 7
        ],
        "l_orderkey long, l_linenumber int, l_quantity double, "
        "l_discount double",
    )
    orders = spark.createDataFrame(
        [(1, "O", 10.0), (2, "F", 20.0), (3, "X", -5.0)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    rows = {r.rule: r for r in expectations_report(li, orders).collect()}
    assert rows["lineitem.l_quantity between 1 and 50"].violations == 1
    assert rows["lineitem.l_orderkey not null"].violations == 1
    assert rows["lineitem.l_discount between 0 and 0.5"].violations == 1
    assert rows["orders.o_orderstatus in (O,F,P)"].violations == 1
    assert rows["orders.o_totalprice > 0"].violations == 1
    assert rows["lineitem (l_orderkey, l_linenumber) unique"].violations == 1
    # NOT-EXISTS semantics: the null key never matches, so 2 orphans
    assert rows["lineitem.l_orderkey references orders"].violations == 2
    assert all(not r.passed for r in rows.values())
    assert all(r.total == (3 if r.rule.startswith("orders") else 6)
               for r in rows.values())


def test_expectations_on_fixture(spark, sf_dir):
    """On the driver fixture: six rules pass clean; the composite-key
    uniqueness rule genuinely FIRES (the synthetic generator reuses
    (l_orderkey, l_linenumber)) and its count must equal an
    independently computed extra-copies total."""
    li = load_table(spark, sf_dir, "lineitem")
    rep = {r.rule: r for r in expectations_report(
        li, load_table(spark, sf_dir, "orders")).collect()}
    assert len(rep) == 7
    uniq = rep.pop("lineitem (l_orderkey, l_linenumber) unique")
    assert all(r.passed and r.violations == 0 for r in rep.values())
    want = (
        li.groupBy("l_orderkey", "l_linenumber")
        .count().agg(F.sum(F.col("count") - 1)).collect()[0][0]
    )
    assert uniq.violations == want and uniq.passed == (want == 0)


def test_quality_classifier_tiers_agree_on_features(spark, sf_dir):
    """Portable (rolling-hash) and xxhash64 tiers must agree on the
    feature COUNT per doc (hashing changes bucket ids, never arity) and
    on the row-local schema; both plans must be shuffle-free."""
    docs = load_table(spark, sf_dir, "documents")
    port = quality_classify(docs, portable=True)
    native = quality_classify(docs, portable=False)
    assert port.columns == native.columns
    a = {r.doc_id: r.n_features for r in port.collect()}
    b = {r.doc_id: r.n_features for r in native.collect()}
    assert a == b
    for df in (port, native):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_quality_classifier_feature_arity(spark):
    """n words → n unigrams + (n-1) bigrams; 1 word → no bigram (the
    descending-sequence guard)."""
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha beta"), (3, "a b c d")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_features
           for r in quality_classify(docs).collect()}
    assert got == {1: 1, 2: 3, 3: 7}


def test_random_projection_no_shuffle_and_linearity(spark, sf_dir):
    """Row-local plan (no Exchange); and on inputs that quantize exactly
    (multiples of 1e-3), the projection is linear: p(2·e) == 2·p(e) in
    integer arithmetic. (On arbitrary floats round(2e·s) ≠ 2·round(e·s),
    so exactness is only claimed post-quantization.)"""
    emb = load_table(spark, sf_dir, "embeddings").limit(8)
    proj = random_projection(emb)
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    exact = spark.createDataFrame(
        [(i, [((i * 64 + d) % 37 - 18) / 1000.0 for d in range(64)])
         for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    doubled = exact.select(
        "vec_id",
        F.transform("embedding", lambda e: e * 2).alias("embedding"),
    )
    p1 = {r.vec_id: [r[f"p{j}"] for j in range(16)]
          for r in random_projection(exact).collect()}
    p2 = {r.vec_id: [r[f"p{j}"] for j in range(16)]
          for r in random_projection(doubled).collect()}
    assert p2 == {k: [2 * x for x in v] for k, v in p1.items()}
    # the sign matrix must not be rank-1 (the j-parity collapse): distinct
    # output dims must differ in magnitude, not only in sign
    mags = {tuple(abs(x) for x in v) for v in p1.values()}
    assert all(len(set(m)) > 2 for m in mags)


def test_random_projection_preserves_distances(spark, sf_dir):
    """The JL property: squared L2 distances in the 16-d sign projection
    correlate strongly with the exact 64-d distances."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").limit(60)
    orig = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    proj = {r.vec_id: np.array([r[f"p{j}"] for j in range(16)],
                               dtype=np.float64) / 1e6
            for r in random_projection(emb).collect()}
    ids = sorted(orig)
    d_orig, d_proj = [], []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d_orig.append(float(np.sum((orig[a] - orig[b]) ** 2)))
            # E[||Sx||^2] = out_dim·||x||^2 for a ±1 sign matrix
            d_proj.append(float(np.sum((proj[a] - proj[b]) ** 2)) / 16.0)
    r = np.corrcoef(d_orig, d_proj)[0, 1]
    # self-calibrating bar: at out_dim=16 even a TRUE random ±1 matrix
    # only reaches ~0.35 on these embeddings, so compare against that
    # baseline rather than an absolute threshold
    rng = np.random.default_rng(7)
    X = np.stack([orig[k] for k in ids])
    base = []
    for _ in range(5):
        S = rng.choice([-1.0, 1.0], size=(64, 16))
        Y = X @ S
        db = [float(np.sum((Y[i] - Y[k]) ** 2)) / 16.0
              for i in range(len(ids)) for k in range(i + 1, len(ids))]
        base.append(np.corrcoef(d_orig, db)[0, 1])
    r_rand = float(np.mean(base))
    assert r > 0.5 * r_rand, (
        f"JL correlation {r:.3f} below half the random baseline "
        f"{r_rand:.3f}"
    )


def test_stream_window_topk_drain_equals_batch(spark, sf_dir):
    """The real streaming path: drain the windowed count, apply the rank
    finishing stage to the sink table — identical to the batch form."""
    from pyspark.sql import Window

    from ha_sqllite_2_influxdb_spark.plans.streaming_ops import (
        q_stream_window_topk,
    )
    from ha_sqllite_2_influxdb_spark.streaming.stream import (
        drain_to_memory, events_stream, windowed_agg,
    )

    drained = drain_to_memory(
        windowed_agg(events_stream(spark, sf_dir)),
        f"topk_{uuid.uuid4().hex[:8]}",
    )
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), "event_type"
    )
    got = sorted(
        drained.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("window_start", "event_type", "n_events", "rk")
        .collect()
    )
    want = sorted(q_stream_window_topk(spark, sf_dir).collect())
    assert got == want


def test_incremental_agg_state_monoid(spark, sf_dir):
    """Merging per-shard states equals the one-shot state for ANY shard
    decomposition (3-way and 10-way splits), and merging with an empty
    state is the identity — the algebra that makes a delta refresh exact."""
    from ha_sqllite_2_influxdb_spark.operators.merge import (
        agg_state, finalize_agg, merge_agg_states,
    )

    ev = load_table(spark, sf_dir, "events")
    one_shot = sorted(
        finalize_agg(agg_state(ev, ["event_type"], "value")).collect()
    )
    for mod in (3, 10):
        shards = [ev.filter(F.col("event_id") % mod == i)
                  for i in range(mod)]
        states = [agg_state(s, ["event_type"], "value") for s in shards]
        merged = sorted(
            finalize_agg(merge_agg_states(states, ["event_type"])).collect()
        )
        assert merged == one_shot, mod
    empty = agg_state(ev.filter(F.lit(False)), ["event_type"], "value")
    with_empty = sorted(finalize_agg(merge_agg_states(
        [agg_state(ev, ["event_type"], "value"), empty], ["event_type"]
    )).collect())
    assert with_empty == one_shot


def test_expectations_single_stats_scan(spark, sf_dir):
    """Plan pin: lineitem contributes exactly TWO scan subtrees — the
    grouped stats aggregate (all rule columns) and the RI anti join
    (pruned to the key) — not one per rule. Guards against the naive
    one-branch-per-rule regression (5 scans). AQE's toString repeats
    the tree under '== Initial Plan ==', so only the final section is
    counted."""
    import re

    rep = expectations_report(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
    )
    rep.collect()
    plan = rep._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    li_scans = [
        m.group(0) for m in
        re.finditer(r".*(?:Scan|FileScan) parquet.*l_orderkey.*", final)
    ]
    assert len(li_scans) <= 2, final


def test_quarantine_rows_reasons_lineage(spark):
    """Each planted violation appears in the row's reasons string, in
    fixed rule order; clean rows pass with empty reasons."""
    from ha_sqllite_2_influxdb_spark.operators.validate import (
        quarantine_rows,
    )

    li = spark.createDataFrame(
        [
            (1, 1, 10.0, 0.05),    # clean
            (1, 2, 99.0, 0.9),     # qty + discount
            (None, 1, 10.0, 0.05),  # null key (=> also orphan)
            (2, 1, 10.0, 0.05),    # dup pair...
            (2, 1, 99.0, 0.05),    # ...dup pair + qty
            (7, 1, 10.0, 0.05),    # orphan
        ],
        "l_orderkey long, l_linenumber int, l_quantity double, "
        "l_discount double",
    )
    orders = spark.createDataFrame(
        [(1, "O", 10.0), (2, "F", 20.0)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    rows = quarantine_rows(li, orders).collect()
    got = {(r.l_orderkey, r.l_linenumber, r.l_quantity): r.reasons
           for r in rows}
    assert got[(1, 1, 10.0)] == ""
    assert got[(1, 2, 99.0)] == "qty_range,discount_range"
    assert got[(None, 1, 10.0)] == "null_key,orphan"
    assert got[(2, 1, 10.0)] == "dup_key"
    assert got[(2, 1, 99.0)] == "qty_range,dup_key"
    assert got[(7, 1, 10.0)] == "orphan"
    assert {r.quarantined for r in rows if r.reasons} == {True}
    # the clean/quarantine split covers every input row exactly once
    assert len(rows) == 6


def test_quality_classifier_matches_pure_python_reference(spark):
    """score_int must equal an independent pure-python re-implementation
    of the hashed model on edge-case inputs (doubled spaces produce ''
    tokens under the corpus convention text.split(' '); single chars;
    punctuation; long repeats)."""
    from ha_sqllite_2_influxdb_spark.operators.scoring import (
        N_BUCKETS, _MIX, _W_RANGE,
    )

    M = 2_147_483_647

    def py_score(text):
        ws = text.split(" ")
        feats = list(ws)
        if len(ws) >= 2:
            feats += [f"{a} {b}" for a, b in zip(ws, ws[1:])]

        def ch(s):
            h = 0
            for c in s:
                h = (h * 31 + ord(c)) % M
            return h

        wts = [(ch(f) % N_BUCKETS) * _MIX % _W_RANGE - 1000 for f in feats]
        return sum(wts), len(feats)

    cases = [
        "hello world",
        "a",
        "double  space",   # '' token in the middle
        "trailing space ",
        " leading",
        "punct! mix? yes.",
        "repeat " * 50 + "repeat",
        "x y z w v u t s r q p",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string"
    )
    got = {r.doc_id: (r.score_int, r.n_features)
           for r in quality_classify(docs).collect()}
    want = {i: py_score(t) for i, t in enumerate(cases)}
    assert got == want


def test_ingest_pipeline_gate_fires_and_merge_exact(spark, sf_dir):
    """The composed refresh: (a) the admission gate genuinely drops
    delta rows on this fixture; (b) the merged incremental state equals
    a direct aggregate over base ∪ admitted — composition correctness."""
    from ha_sqllite_2_influxdb_spark.operators.merge import (
        agg_state, finalize_agg,
    )
    from ha_sqllite_2_influxdb_spark.plans.analytics import (
        _INGEST_TYPES, _INGEST_VALUE_HI, _INGEST_VALUE_LO,
        q_ingest_pipeline,
    )

    ev = load_table(spark, sf_dir, "events")
    admitted = ev.filter(
        (F.col("event_id") % 10 < 8)
        | F.coalesce(
            F.col("value").between(_INGEST_VALUE_LO, _INGEST_VALUE_HI)
            & F.col("event_type").isin(*_INGEST_TYPES)
            & F.col("user_id").isNotNull(),
            F.lit(False),
        )
    )
    assert admitted.count() < ev.count()  # the gate drops something
    got = sorted(q_ingest_pipeline(spark, sf_dir).collect())
    want = sorted(
        finalize_agg(agg_state(admitted, ["event_type"], "value")).collect()
    )
    assert got == want


def test_json_props_stats_malformed_routes_to_null(spark):
    """from_json with an explicit schema must route malformed / missing
    / wrong-typed documents to NULL (counted in n_unparsed) without
    failing the job — the bad-row tolerance the reference pipeline's
    P7 convention requires of every codec."""
    from ha_sqllite_2_influxdb_spark.plans.analytics import (
        q_json_props_stats,
    )
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [
            (1, "a", '{"k": 5}'),
            (2, "a", "not json"),
            (3, "a", '{"other": 1}'),
            (4, "a", None),
            (5, "a", '{"k": "str"}'),
            (6, "a", '{"k": 7}'),
        ],
        "event_id long, event_type string, props string",
    )
    k = F.from_json("props", "k INT").getField("k")
    row = (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
            .cast("long").alias("n_unparsed"),
            F.sum("k").cast("long").alias("sum_k"),
        ).collect()[0]
    )
    assert (row.n, row.n_unparsed, row.sum_k) == (6, 4, 12)


def test_cuped_fully_corrects_preexisting_difference(spark):
    """If y == x (experiment changes nothing and the covariate predicts
    perfectly), theta == 1 and BOTH variants' adjusted means collapse to
    the global mean — a pre-existing imbalance between variants
    disappears, while the raw ybar difference stays."""
    import datetime as dt

    from ha_sqllite_2_influxdb_spark.operators.experiment import (
        cuped_readout,
    )

    pre = dt.datetime(2024, 1, 10)
    post = dt.datetime(2024, 1, 20)
    rows = []
    eid = 0
    for uid in range(20):
        base = 100.0 + 50.0 * (uid % 2) + uid  # variant 1 richer pre
        for ts in (pre, post):
            rows.append((eid, ts, uid, "view", base))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    out = {r.variant: r for r in cuped_readout(ev).collect()}
    assert abs(out[0].theta - 1.0) < 1e-12
    assert abs(out[0].ybar - out[1].ybar) > 10  # raw means differ
    assert abs(out[0].adjusted - out[1].adjusted) < 1e-9  # CUPED corrects


def test_ohlc_deterministic_under_repartition(spark, sf_dir):
    """open/close must come from the (ts, event_id) total order — the
    result cannot move when the input partitioning changes."""
    from ha_sqllite_2_influxdb_spark.plans.analytics import q_ohlc_bars

    base = sorted(map(tuple, q_ohlc_bars(spark, sf_dir).collect()))
    ev = load_table(spark, sf_dir, "events").repartition(13)

    import ha_sqllite_2_influxdb_spark.plans.analytics as an

    # same computation over a different partitioning of the same rows
    from pyspark.sql import Window

    w = Window.partitionBy("event_type", "hour")
    e2 = ev.select(
        "event_type", F.date_trunc("hour", "ts").alias("hour"),
        "ts", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    marked = (
        e2.withColumn("_rn_a",
                      F.row_number().over(w.orderBy("ts", "event_id")))
        .withColumn("_rn_d", F.row_number().over(
            w.orderBy(F.desc("ts"), F.desc("event_id"))))
    )
    again = sorted(map(tuple, (
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
    ).collect()))
    assert again == base


def test_pit_join_never_leaks_future_state(spark, sf_dir):
    """PIT contract on the fixture: every attached state interval must
    START at or before its purchase; and no purchase row is lost even
    when a user's states all start later (NULL state instead)."""
    from ha_sqllite_2_influxdb_spark.plans.analytics import q_pit_join

    rows = q_pit_join(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_purchases = ev.filter(F.col("event_type") == "purchase").count()
    assert len(rows) == n_purchases
    for r in rows:
        if r.state_from_us is not None:
            assert r.state_from_us <= r.ts_us, r


def test_dsir_scoring_plan_and_separation(spark, sf_dir):
    """DSIR (scoring.dsir_score): after the bounded fit pass, the
    scoring plan must be a pure map stage (no Exchange — the ratio
    table is an inlined literal); the target (en) population must score
    strictly higher on average than the non-target rest (the model was
    fit to prefer exactly those n-grams); and the two hash tiers must
    agree on feature arity."""
    import pyspark.sql.functions as F

    from ha_sqllite_2_influxdb_spark.operators.scoring import dsir_score

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang")
    scored = dsir_score(docs, F.col("lang") == "en")
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan

    joined = scored.join(docs.select("doc_id", "lang"), "doc_id")
    means = {r["t"]: r["m"] for r in joined.groupBy(
        (F.col("lang") == "en").alias("t")).agg(
        F.avg("weight").alias("m")).collect()}
    assert means[True] > means[False], means

    native = dsir_score(docs, F.col("lang") == "en", portable=False)
    a = {r.doc_id: r.n_features for r in scored.collect()}
    b = {r.doc_id: r.n_features for r in native.collect()}
    assert a == b


def test_dsir_weight_is_partitioning_invariant(spark, sf_dir):
    """The micro-quantized BIGINT weights must be identical whatever the
    input partitioning (integer fold over a literal table — nothing to
    reorder)."""
    import pyspark.sql.functions as F

    from ha_sqllite_2_influxdb_spark.operators.scoring import dsir_score

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang")
    one = dsir_score(docs.coalesce(1), F.col("lang") == "en")
    many = dsir_score(docs.repartition(13), F.col("lang") == "en")
    assert ({(r.doc_id, r.weight_micro) for r in one.collect()}
            == {(r.doc_id, r.weight_micro) for r in many.collect()})


def test_litarray_exact_roundtrip(spark):
    """functions/litarray.py: the one-parse SQL literal must be value-
    identical to the per-element F.lit form — longs exactly, doubles
    via repr round-trip (shortest string that reparses to the same
    IEEE double), empties typed correctly."""
    from pyspark.sql import functions as F

    from ha_sqllite_2_influxdb_spark.functions.litarray import (
        lit_double_array,
        lit_long_array,
    )

    longs = [0, 1, -1, 2**62, -(2**62), 4096, -123456789]
    # -0.0 deliberately absent: Spark's SQL literal path normalizes it
    # to +0.0 (numerically equal; no ratio table / hyperplane / filter
    # word ever depends on the sign of zero)
    dbls = [0.0, 1e-300, -1.7976931348623157e308, 0.1,
            1 / 3, -2.5, 123456.789]
    df = spark.range(1)
    row = df.select(
        lit_long_array(longs).alias("l"),
        lit_double_array(dbls).alias("d"),
        F.lit(longs).alias("l0"),
        F.lit(dbls).alias("d0"),
        lit_long_array([]).alias("le"),
        lit_double_array([]).alias("de"),
    ).collect()[0]
    assert row.l == row.l0 == longs
    assert row.d == row.d0
    assert [repr(x) for x in row.d] == [repr(float(x)) for x in dbls]
    assert row.le == [] and row.de == []
    sch = {f.name: f.dataType.simpleString()
           for f in df.select(
               lit_long_array([]).alias("le"),
               lit_double_array([]).alias("de")).schema.fields}
    assert sch == {"le": "array<bigint>", "de": "array<double>"}
