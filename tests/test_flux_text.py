"""Flux text surface: parser unit tests, grammar rejection tests, and
compile-semantics pins on the fixture relation. (Registry-level DuckDB
oracle parity for the ten flux_* entries runs in test_oracle_parity.py
like every other entry.) The reference's own probe query shape
(sqllite2influxdb.py:57-63) is the acceptance flagship here.
"""

import pytest
from pyspark.sql import functions as F

from ha_sqllite_2_influxdb_spark.plans.flux_text import (
    FluxBool,
    FluxCmp,
    FluxError,
    FluxMap,
    compile_flux,
    parse_flux,
)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ parser

def test_parse_reference_probe_query_verbatim_shape():
    """The reference's one Flux query (sqllite2influxdb.py:57-63), with
    only the bucket/measurement names swapped for fixture values."""
    pipe = parse_flux('''
        from(bucket: "home_assistant")
          |> range(start: 0)
          |> filter(fn: (r) => r["_measurement"] == "units")
          |> sort(columns: ["_time"], desc: false)
          |> limit(n: 1)
    ''')
    assert pipe.bucket == "home_assistant"
    assert [s.name for s in pipe.stages] == [
        "range", "filter", "sort", "limit"]
    body = pipe.stages[1].args["fn"][1]
    assert body == FluxCmp("_measurement", "==", "units")
    assert pipe.stages[3].args["n"] == ("num", 1.0)


def test_parse_predicates_and_durations():
    pipe = parse_flux('''
        from(bucket: "b")
          |> range(start: "2024-01-01T00:00:00Z", stop: 1706659200)
          |> filter(fn: (r) => (r.domain == "sensor" or r.domain == "light")
                               and r._value >= 1.5)
          |> aggregateWindow(every: 6h, fn: mean, createEmpty: true)
    ''')
    rng = pipe.stages[0].args
    assert rng["start"] == ("str", "2024-01-01T00:00:00Z")
    body = pipe.stages[1].args["fn"][1]
    assert isinstance(body, FluxBool) and body.op == "and"
    assert isinstance(body.parts[0], FluxBool) and body.parts[0].op == "or"
    assert body.parts[1] == FluxCmp("_value", ">=", 1.5)
    assert pipe.stages[2].args["every"] == ("dur", 21600.0)


def test_parse_map_and_regex():
    pipe = parse_flux('''
        from(bucket: "b")
          |> filter(fn: (r) => r.entity_id =~ /temp_[0-9]+/)
          |> map(fn: (r) => ({ r with _value: r._value / 1000 }))
    ''')
    assert pipe.stages[0].args["fn"][1] == FluxCmp(
        "entity_id", "=~", "temp_[0-9]+")
    assert pipe.stages[1].args["fn"][1] == FluxMap("/", 1000.0, False)
    # constant on the left keeps orientation
    pipe2 = parse_flux('''
        from(bucket: "b")
          |> map(fn: (r) => ({ r with _value: 100 - r._value }))
    ''')
    assert pipe2.stages[0].args["fn"][1] == FluxMap("-", 100.0, True)


@pytest.mark.parametrize("bad", [
    'range(start: 0)',                                   # no from()
    'from(bucket: "b") |> explode()',                    # unknown stage
    'from(bucket: "b") |> range(stop: 5)',               # missing start
    'from(bucket: "b") |> filter(fn: (r) => r.unknown == "x")',
    'from(bucket: "b") |> filter(fn: (r) => r.domain > 3)',  # num on tag
    'from(bucket: "b") |> quantile(q: 0.5, method: "estimate_tdigest")',
    'from(bucket: "b") |> aggregateWindow(every: 1h, fn: spread)',
    'from(bucket: "b") |> group(columns: ["nope"])',
    'from(bucket: "b") |> movingAverage(n: 100)',
    'from(bucket: "b") |> mean(column: "_value")',       # args on agg
    'from(bucket: "b") |> map(fn: (r) => ({ r with _time: 0 }))',
    'from(bucket: "b") |> fill()',
    'from(bucket: "b") |> range(start: "Jan 1 2024")',
    'from(bucket: "b") |> pivot(rowKey: ["_time"], '
    'columnKey: ["entity_id"], valueColumn: "_value")',
    'from(bucket: "b") |> pivot(rowKey: ["nope"], '
    'columnKey: ["_field"], valueColumn: "_value")',
])
def test_grammar_rejection(bad, spark):
    # parse errors surface at compile time, stage/argument errors when
    # the pipeline is bound to a relation — both must be FluxError, never
    # a silent mis-execution
    with pytest.raises(FluxError):
        compile_flux(bad)(spark, SF)


def test_create_empty_requires_aligned_range(spark):
    # no stop:
    with pytest.raises(FluxError, match="explicit range"):
        compile_flux('''
            from(bucket: "b") |> range(start: 0)
              |> aggregateWindow(every: 1h, fn: mean, createEmpty: true)
        ''')(spark, SF)
    # misaligned stop:
    with pytest.raises(FluxError, match="aligned"):
        compile_flux('''
            from(bucket: "b") |> range(start: 0, stop: 5401)
              |> aggregateWindow(every: 1h, fn: mean, createEmpty: true)
        ''')(spark, SF)


# --------------------------------------------------------------- semantics

def test_range_start_inclusive_stop_exclusive(spark):
    lo, hi = compile_flux('''
        from(bucket: "b") |> range(start: 0) |> group()
          |> sort(columns: ["_time"]) |> limit(n: 1)
    ''')(spark, SF).select("_time").collect(), None
    t0 = lo[0]["_time"]
    # a range starting exactly at t0 keeps the point; stopping at t0
    # excludes it
    keep = compile_flux(f'''
        from(bucket: "b") |> range(start: {t0}) |> group() |> count()
    ''')(spark, SF).collect()[0]["_value"]
    cut = compile_flux(f'''
        from(bucket: "b") |> range(start: 0, stop: {t0}) |> group()
          |> count()
    ''')(spark, SF).collect()
    assert keep > 0
    assert cut[0]["_value"] == 0


def test_increase_counter_reset_rule(spark):
    """Flux increase(): a decrease contributes the NEW value (counter
    restart), not zero — pinned on a hand-built frame."""
    from ha_sqllite_2_influxdb_spark.plans import flux_text as fx

    df = spark.createDataFrame(
        [(i, "m", "d", "e", "value", float(i), v)
         for i, v in enumerate([10.0, 12.0, 3.0, 5.0])],
        "state_id long, _measurement string, domain string, "
        "entity_id string, _field string, _time double, _value double")
    st = fx._State(df)
    fx._stage_increase(st, {})
    vals = [r["_value"] for r in
            st.df.orderBy("_time").select("_value").collect()]
    # 0, +2, reset→+3 (new value), +2
    assert vals == [0.0, 2.0, 5.0, 7.0]


def test_limit_is_per_table_and_group_merges(spark):
    """Default grouping = one table per series, so limit(n:1) returns one
    row per series; group() merges into a single table first."""
    per_series = compile_flux('''
        from(bucket: "b") |> range(start: 0)
          |> filter(fn: (r) => r._measurement == "W")
          |> sort(columns: ["_time"], desc: false) |> limit(n: 1)
    ''')(spark, SF)
    n_series = (per_series.select("domain", "entity_id").distinct().count())
    assert per_series.count() == n_series > 1
    merged = compile_flux('''
        from(bucket: "b") |> range(start: 0)
          |> filter(fn: (r) => r._measurement == "W")
          |> group() |> sort(columns: ["_time"], desc: false)
          |> limit(n: 1)
    ''')(spark, SF)
    assert merged.count() == 1


def test_aggregate_window_time_is_window_stop(spark):
    rows = compile_flux('''
        from(bucket: "b") |> range(start: 0)
          |> aggregateWindow(every: 1h, fn: count)
    ''')(spark, SF).select("_time").collect()
    assert rows and all(r["_time"] % 3600 == 0 for r in rows)


def test_selector_keeps_time_aggregate_drops_it(spark):
    last = compile_flux('''
        from(bucket: "b") |> range(start: 0) |> last()
    ''')(spark, SF)
    assert "_time" in last.columns
    mean = compile_flux('''
        from(bucket: "b") |> range(start: 0) |> mean()
    ''')(spark, SF)
    assert "_time" not in mean.columns and "_value" in mean.columns


def test_tail_returns_last_n_of_sort(spark):
    df = compile_flux('''
        from(bucket: "b") |> range(start: 0)
          |> filter(fn: (r) => r._measurement == "W")
          |> group() |> sort(columns: ["_time"]) |> tail(n: 3)
    ''')(spark, SF)
    got = sorted(r["_time"] for r in df.select("_time").collect())
    all_ts = compile_flux('''
        from(bucket: "b") |> range(start: 0)
          |> filter(fn: (r) => r._measurement == "W") |> group()
    ''')(spark, SF).select("_time").collect()
    assert got == sorted(r["_time"] for r in all_ts)[-3:]


def test_limit_after_keep_raises_fluxerror_not_analysis_error(spark):
    """Dropping every order column then limiting must fail as a
    FluxError with guidance, never an opaque AnalysisException."""
    with pytest.raises(FluxError, match="ordered column"):
        compile_flux(
            'from(bucket: "b") |> range(start: 0) |> mean() '
            '|> keep(columns: ["_value"]) |> limit(n: 1)')(spark, SF)


def test_internal_state_id_never_leaks(spark):
    for text in ('from(bucket: "b") |> range(start: 0)',
                 'from(bucket: "b") |> range(start: 0) |> difference()',
                 'from(bucket: "b") |> range(start: 0) |> limit(n: 2)'):
        assert "state_id" not in compile_flux(text)(spark, SF).columns


def test_flux_task_parse_and_rejections(spark):
    from ha_sqllite_2_influxdb_spark.plans.flux_text import (
        parse_flux_task,
        run_flux_task,
    )

    opts, pipe = parse_flux_task('''
        option task = {name: "t", every: 30m, offset: 5m}

        from(bucket: "b") |> range(start: 0)
          |> aggregateWindow(every: 30m, fn: sum)
          |> to(bucket: "b2")
    ''')
    assert opts["name"] == ("str", "t")
    assert opts["every"] == ("dur", 1800.0)
    assert pipe.stages[-1].name == "to"
    for bad in (
        # no to()
        'option task = {name: "t", every: 1h}\n'
        'from(bucket: "b") |> aggregateWindow(every: 1h, fn: mean)',
        # no aggregateWindow
        'option task = {name: "t", every: 1h}\n'
        'from(bucket: "b") |> range(start: 0) |> to(bucket: "b2")',
        # unsupported body stage
        'option task = {name: "t", every: 1h}\n'
        'from(bucket: "b") |> derivative(unit: 1s) |> to(bucket: "b2")',
        # missing every option
        'option task = {name: "t"}\n'
        'from(bucket: "b") |> aggregateWindow(every: 1h, fn: mean) '
        '|> to(bucket: "b2")',
    ):
        with pytest.raises(FluxError):
            run_flux_task(spark, SF, bad)


def test_flux_program_join_semantics(spark):
    """join(): inner on the key columns, conflicting columns suffixed
    with the table labels, cross-column map — pinned on hand-built
    frames via the real parser+compiler."""
    from ha_sqllite_2_influxdb_spark.plans.flux_text import (
        compile_flux_program,
        parse_flux_program,
    )

    prog = parse_flux_program('''
        a = from(bucket: "b") |> range(start: 0)
        b = from(bucket: "b") |> range(start: 0) |> difference()
        join(tables: {x: a, y: b}, on: ["_time", "entity_id"])
          |> map(fn: (r) => ({ r with _value: r._value_x - r._value_y }))
    ''')
    assert [n for n, _ in prog.assigns] == ["a", "b"]
    assert prog.final.tables == (("x", "a"), ("y", "b"))
    assert prog.final.on == ("_time", "entity_id")

    # ratio of hourly means W vs %: every joined row's value must equal
    # the two sides' division recomputed directly
    out = compile_flux_program('''
        p = from(bucket: "b") |> range(start: 0)
          |> filter(fn: (r) => r._measurement == "W")
          |> aggregateWindow(every: 1h, fn: mean)
        h = from(bucket: "b") |> range(start: 0)
          |> filter(fn: (r) => r._measurement == "%")
          |> aggregateWindow(every: 1h, fn: mean)
        join(tables: {p: p, h: h}, on: ["_time", "domain", "entity_id"])
          |> map(fn: (r) => ({ r with _value: r._value_p / r._value_h }))
    ''')(spark, SF)
    rows = out.limit(50).collect()
    assert rows, "join produced no rows"
    for r in rows:
        assert r["_value"] == r["_value_p"] / r["_value_h"]

    for bad in (
        # unknown variable in join
        'a = from(bucket: "b") |> range(start: 0)\n'
        'join(tables: {x: a, y: zz}, on: ["_time"])',
        # three tables
        'a = from(bucket: "b")\nb = from(bucket: "b")\n'
        'c = from(bucket: "b")\n'
        'join(tables: {x: a, y: b, z: c}, on: ["_time"])',
        # trailing garbage after program
        'a = from(bucket: "b")\nfrom(bucket: "b") |> mean() extra',
    ):
        with pytest.raises(FluxError):
            compile_flux_program(bad)(spark, SF)


def test_schema_meta_queries(spark):
    from ha_sqllite_2_influxdb_spark.plans.flux_text import (
        compile_flux_meta,
    )

    vals = {r["_value"] for r in compile_flux_meta(
        'import "influxdata/influxdb/schema"\n'
        'schema.measurements(bucket: "b")')(spark, SF).collect()}
    assert "W" in vals and "%" in vals
    keys = [r["_value"] for r in compile_flux_meta(
        'import "influxdata/influxdb/schema"\n'
        'schema.tagKeys(bucket: "b")')(spark, SF).collect()]
    assert keys == ["_field", "_measurement", "domain", "entity_id"]
    for bad in (
        'schema.measurements(bucket: "b")',              # missing import
        'import "contrib/foo"\nschema.measurements(bucket: "b")',
        'import "influxdata/influxdb/schema"\n'
        'schema.tagValues(bucket: "b", tag: "nope")',
        'import "influxdata/influxdb/schema"\n'
        'schema.dropAll(bucket: "b")',
        'import "influxdata/influxdb/schema"\n'
        'schema.measurements(bucket: "b") |> limit(n: 1)',
    ):
        with pytest.raises(FluxError):
            compile_flux_meta(bad)(spark, SF)


def test_relative_range_needs_pinned_now(spark):
    with pytest.raises(FluxError, match="pinned"):
        compile_flux(
            'from(bucket: "b") |> range(start: -1h)')(spark, SF)
    # pinned: start resolves to now-1h, stop defaults to now
    df = compile_flux('from(bucket: "b") |> range(start: -1h) '
                      '|> group() |> count()', now_s=1704070800.0)(
        spark, SF)
    n = df.collect()[0]["_value"]
    exact = compile_flux('from(bucket: "b") '
                         '|> range(start: 1704067200, stop: 1704070800) '
                         '|> group() |> count()')(spark, SF)
    assert n == exact.collect()[0]["_value"]


def test_highest_average_and_max(spark):
    """highestAverage/highestMax keep the N highest series by their
    per-table reduce; group() first (single table) is rejected."""
    n_all = compile_flux('''
        from(bucket: "b") |> range(start: 0)
          |> filter(fn: (r) => r._measurement == "W")
          |> highestAverage(n: 1000000)
    ''')(spark, SF).count()
    top3 = compile_flux('''
        from(bucket: "b") |> range(start: 0)
          |> filter(fn: (r) => r._measurement == "W")
          |> highestMax(n: 3)
    ''')(spark, SF)
    assert n_all > 3 and top3.count() == 3
    vals = [r["_value"] for r in top3.collect()]
    assert vals == sorted(vals, reverse=True)
    with pytest.raises(FluxError, match="grouped tables"):
        compile_flux('from(bucket: "b") |> group() '
                     '|> highestAverage(n: 2)')(spark, SF)


def test_state_duration_and_count_runs(spark):
    """stateDuration/stateCount on a hand-built on/off sequence: runs
    reset on a false row, false rows emit -1, a second run restarts."""
    from ha_sqllite_2_influxdb_spark.plans import flux_text as fx

    # on at 0,10,30 — off at 40 — on again at 50,60
    vals = [(0, 1), (10, 1), (30, 1), (40, 0), (50, 1), (60, 1)]
    df = spark.createDataFrame(
        [(i, "m", "d", "e", "value", float(t), float(v))
         for i, (t, v) in enumerate(vals)],
        "state_id long, _measurement string, domain string, "
        "entity_id string, _field string, _time double, _value double")
    st = fx._State(df)
    fx._stage_state_track(
        st, {"fn": ("lambda", fx.FluxCmp("_value", ">", 0.5)),
             "unit": ("dur", 1.0)}, count=False)
    dur = {r["_time"]: r["stateDuration"]
           for r in st.df.select("_time", "stateDuration").collect()}
    assert dur == {0: 0.0, 10: 10.0, 30: 30.0, 40: -1.0,
                   50: 0.0, 60: 10.0}
    st2 = fx._State(df)
    fx._stage_state_track(
        st2, {"fn": ("lambda", fx.FluxCmp("_value", ">", 0.5))},
        count=True)
    cnt = {r["_time"]: r["stateCount"]
           for r in st2.df.select("_time", "stateCount").collect()}
    assert cnt == {0: 1, 10: 2, 30: 3, 40: -1, 50: 1, 60: 2}


def test_histogram_cumulative_counts(spark):
    """Known-answer: cumulative le counts and the Prometheus-style
    interpolated quantile on a hand-built table."""
    from ha_sqllite_2_influxdb_spark.plans import flux_text as fx

    df = spark.createDataFrame(
        [(i, "m", "d", "e", "value", float(i), v)
         for i, v in enumerate([1.0, 3.0, 7.0, 9.0, 15.0])],
        "state_id long, _measurement string, domain string, "
        "entity_id string, _field string, _time double, _value double")
    st = fx._State(df)
    fx._stage_histogram(st, {"bins": ("numarray", [0.0, 5.0, 10.0])})
    rows = {r["le"]: r["_value"]
            for r in st.df.select("le", "_value").collect()}
    # 15.0 exceeds the top bin: counted nowhere (Flux finite-bin rule)
    assert rows == {0.0: 0.0, 5.0: 2.0, 10.0: 4.0}
    fx._stage_histogram_quantile(st, {"quantile": ("num", 0.5)})
    got = st.df.collect()[0]["_value"]
    # rank = 0.5·4 = 2 lands exactly on cum(le=5): interpolate to 5.0
    assert got == 5.0


def test_histogram_bins_validation(spark):
    for bad in ('histogram(bins: [5, 1])', 'histogram(bins: [1])',
                'histogram(bins: ["a", "b"])'):
        with pytest.raises(FluxError):
            compile_flux(f'from(bucket: "b") |> {bad}')(spark, SF)


def test_flux_series_exchange_budget(spark, sf_dir):
    """Every compiled Flux pipeline pays a budgeted number of series-key
    shuffles (the same contract as the InfluxQL layer). Per-series
    windows/aggregates: ONE. The createEmpty grid and histogram tiers:
    TWO by design — the (series, bucket/bin) partial agg plus the series
    window the lag+sequence gap expansion (and any LOCF/cumsum) share;
    a grid JOIN or a second input scan would show up as a third
    exchange or a SortMergeJoin, both asserted away."""
    import re

    from ha_sqllite_2_influxdb_spark.plans import flux_text as fx
    from tests.test_plans import explain_str

    budget = {"flux_oldest_global": 0,      # merged table: no series key
              "flux_window_fill_prev": 2, "flux_histogram": 2,
              "flux_histogram_quantile": 2,
              # streaming task: the drained memory-sink relation has no
              # exchanges of its own (the per-micro-batch shuffle is
              # pinned in test_flux_task_* instead)
              "flux_task_hourly_mean": 0,
              # schema meta: distincts keyed on the aliased _value
              # column (not the raw series key) or literal relations
              "flux_schema_measurements": 0,
              "flux_schema_tag_values": 0,
              "flux_schema_m_tag_values": 0,
              "flux_schema_field_keys": 0,
              # join math: one series-keyed downsample agg PER SIDE;
              # the join itself keys on (_time, tags) over the two
              # already-downsampled relations
              "flux_join_math": 2,
              # pivot on the static _field is a rename: no shuffle at all
              "flux_pivot_fields": 0,
              # union: one downsample agg per side + the re-grouped
              # mean keyed on _measurement
              "flux_union_streams": 3}
    for name, fn in fx.QUERIES.items():
        plan = explain_str(fn(spark, sf_dir))
        n = sum(1 for ln in plan.splitlines()
                if ln.strip().startswith("Arguments: hashpartitioning(")
                and "_measurement" in ln)
        assert n == budget.get(name, 1), f"{name}: {n} series exchanges"
        if name != "flux_join_math":
            # join_math's SMJ is the genuine two-sided join of the two
            # DOWNSAMPLED relations — by design, not a grid-join smell
            assert "SortMergeJoin" not in plan, name


@pytest.mark.parametrize("text", [
    # post-aggregate stages referencing dropped columns must be
    # FluxError, never a leaked AnalysisException
    'from(bucket: "b") |> group(columns: ["domain"]) |> mean() '
    '|> filter(fn: (r) => r.entity_id == "x")',
    'from(bucket: "b") |> mean() |> timeShift(duration: 1h)',
    'from(bucket: "b") |> mean() |> derivative(unit: 1s)',
    'from(bucket: "b") |> mean() |> last()',
    'from(bucket: "b") |> mean() '
    '|> aggregateWindow(every: 1h, fn: mean)',
])
def test_dropped_column_stages_raise_fluxerror(text, spark):
    with pytest.raises(FluxError):
        compile_flux(text)(spark, SF)


def test_fuzz_valid_pipelines_compile_clean(spark):
    """Every pipeline the grammar generator emits must BIND against the
    relation without leaking a Spark AnalysisException — the class of
    bug the limit-after-keep guard fixed, hunted broadly. (Analysis is
    driver-side; no jobs run.)"""
    from hypothesis import given, settings
    from tests.test_text_surface_fuzz import flux_pipeline

    from ha_sqllite_2_influxdb_spark.plans.flux_text import (
        FluxError as FE,
    )

    @settings(max_examples=40, deadline=None)
    @given(flux_pipeline())
    def run(tp):
        text, _ = tp
        try:
            compile_flux(text)(spark, SF)
        except FE:
            pass                      # in-contract rejection

    run()


def test_no_python_udfs_in_compiled_plan(spark):
    """The whole text layer stays JVM-side: no BatchEvalPython /
    ArrowEvalPython in any compiled plan."""
    from tests.test_plans import explain_str

    plan = explain_str(compile_flux('''
        from(bucket: "b") |> range(start: 0)
          |> filter(fn: (r) => r._measurement == "W")
          |> aggregateWindow(every: 1h, fn: mean)
          |> fill(usePrevious: true)
    ''')(spark, SF))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_fill_prev_fusion_row_identical(spark, sf_dir):
    """r15 plan surgery pin (guide §2.4 — the r14 influx_downsample
    lagged-mean surgery applied to the Flux compiler): fill(usePrevious:
    true) directly after aggregateWindow(createEmpty: true) fuses the
    LOCF into the bucket window (one more window expression on the same
    spec) instead of re-sorting and re-windowing the exploded grid.
    Row-identical to the generic LOCF window on (a) the real fixture
    pipeline (the frozen headline flux_window_fill_prev) and (b) a
    crafted series exercising every edge: a LEADING gap (slots before
    the first bucket stay null), a RUN of consecutive empty buckets, a
    null-valued REAL bucket (LOCF must look through it), and a trailing
    gap after the last bucket. Plan shape: Window and Sort nodes halve,
    exchange count unchanged. The count-fn case is a no-op fusion (grid
    rows are 0, never null) and must also match."""
    from ha_sqllite_2_influxdb_spark.plans import flux_text as fx

    def both(builder):
        new = builder()
        try:
            fx._FILL_FUSE_ENABLED = False
            old = builder()
        finally:
            fx._FILL_FUSE_ENABLED = True
        return new, old

    # (a) the real fixture headline
    new, old = both(
        lambda: fx.QUERIES["flux_window_fill_prev"](spark, sf_dir))
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0
    pn = new._jdf.queryExecution().executedPlan().toString()
    po = old._jdf.queryExecution().executedPlan().toString()
    assert pn.count("Window") == po.count("Window") - 1
    assert pn.count("Sort") == po.count("Sort") - 1
    assert pn.count("Exchange") == po.count("Exchange")

    # (b) crafted edges: leading gap, empty-bucket run, null-valued
    # real bucket, trailing gap
    crafted = spark.createDataFrame(
        [(1, "m", "d", "e", "value", 15.0, 2.0),
         (2, "m", "d", "e", "value", 25.0, None),
         (3, "m", "d", "e", "value", 65.0, 7.0)],
        "state_id long, _measurement string, domain string, "
        "entity_id string, _field string, _time double, _value double")
    pipe = fx.parse_flux('''
from(bucket: "b")
  |> range(start: 0, stop: 100)
  |> aggregateWindow(every: 10s, fn: mean, createEmpty: true)
  |> fill(usePrevious: true)
''')

    def run_crafted():
        st = fx._State(crafted)
        fx._apply_stages(st, pipe.stages)
        return st.df.drop("state_id")

    new, old = both(run_crafted)
    got = {r["_time"]: r["_value"] for r in new.collect()}
    assert got == {r["_time"]: r["_value"] for r in old.collect()}
    # leading slot null; null real bucket (30) looked through to 2.0;
    # run of empties carries 2.0; trailing slots carry 7.0
    assert got[10.0] is None and got[20.0] == 2.0 and got[30.0] == 2.0
    assert got[60.0] == 2.0 and got[70.0] == 7.0 and got[100.0] == 7.0

    # (c) count: fusion is a no-op (0-valued grid rows are non-null)
    pipe_c = fx.parse_flux('''
from(bucket: "b")
  |> range(start: 0, stop: 100)
  |> aggregateWindow(every: 10s, fn: count, createEmpty: true)
  |> fill(usePrevious: true)
''')

    def run_count():
        st = fx._State(crafted)
        fx._apply_stages(st, pipe_c.stages)
        return st.df.drop("state_id")

    new, old = both(run_count)
    assert sorted(map(tuple, new.collect())) == \
        sorted(map(tuple, old.collect()))
