"""InfluxQL text surface: parser unit tests, grammar rejection tests,
compile semantics on synthetic frames, and plan-shape pins showing the
text layer builds the same physical shapes as the function layer.
(Registry-level DuckDB oracle parity for the five influxql_text_*
entries runs in test_oracle_parity.py like every other entry.)
"""

import pytest
from pyspark.sql import functions as F

from ha_sqllite_2_influxdb_spark.plans.influxql_text import (
    InfluxQLError,
    compile_ast,
    compile_influxql,
    parse_influxql,
)
from tests.test_plans import explain_str


# ------------------------------------------------------------------ parser

def test_parse_full_clause_set():
    ast = parse_influxql(
        'SELECT MEAN(value), COUNT(value) FROM "W" '
        "WHERE time >= 1704067200s AND time < 1706668800 "
        "AND domain = 'sensor' "
        "GROUP BY time(1h), * FILL(previous) "
        "ORDER BY time DESC LIMIT 10 SLIMIT 5")
    assert [p.func for p in ast.projs] == ["mean", "count"]
    assert ast.measurement == "W"
    assert [(c.lhs, c.op, c.rhs) for c in ast.where] == [
        ("time", ">=", 1704067200.0), ("time", "<", 1706668800.0),
        ("domain", "=", "sensor")]
    assert ast.bucket_s == 3600
    assert ast.group_tags == ("domain", "entity_id") and ast.grouped
    assert ast.fill == "previous"
    assert ast.order_desc and ast.limit == 10 and ast.slimit == 5


def test_parse_durations_and_args():
    assert parse_influxql(
        "SELECT SUM(value) FROM m GROUP BY time(30m)").bucket_s == 1800
    assert parse_influxql(
        "SELECT SUM(value) FROM m GROUP BY time(2d)").bucket_s == 172800
    ast = parse_influxql("SELECT TOP(value, 3) FROM m GROUP BY *")
    assert ast.projs[0].func == "top" and ast.projs[0].arg == 3.0
    ast = parse_influxql("SELECT PERCENTILE(value, 95) FROM m GROUP BY *")
    assert ast.projs[0].arg == 95.0


@pytest.mark.parametrize("bad", [
    "MEAN(value) FROM m",                          # no SELECT
    "SELECT MEAN(value)",                          # no FROM
    "SELECT MEAN(field2) FROM m",                  # unknown field
    "SELECT EXPLODE(value) FROM m",                # unknown function
    "SELECT TOP(value) FROM m",                    # missing selector arg
    "SELECT MEAN(value) FROM m GROUP BY time(10ms)",   # sub-second bucket
    "SELECT MEAN(value) FROM m GROUP BY region",   # unknown tag
    "SELECT MEAN(value) FROM m FILL(previous)",    # FILL without time()
    "SELECT MEAN(value), TOP(value, 3) FROM m",    # mixed proj kinds
    "SELECT DERIVATIVE(value) FROM m GROUP BY time(1h)",  # transform+bucket
    "SELECT value FROM m WHERE domain = sensor",   # unquoted tag literal
    "SELECT value FROM m WHERE name = 'x'",        # unfilterable column
    "SELECT value FROM m extra",                   # trailing input
])
def test_parse_rejects_out_of_grammar(bad):
    with pytest.raises(InfluxQLError):
        df = parse_influxql(bad)
        compile_ast(None, df)   # some errors surface at compile time


# --------------------------------------------------------------- semantics

def _pts(spark):
    rows = [
        # (state_id, measurement, domain, entity_id, ts_epoch, value)
        (1, "m", "sensor", "a", 0.0, 1.0),
        (2, "m", "sensor", "a", 3600.0, 3.0),
        (3, "m", "sensor", "a", 14400.0, 5.0),   # 3-bucket gap before this
        (4, "m", "sensor", "b", 0.0, 10.0),
        (5, "m", "sensor", "b", 60.0, 20.0),
        (6, "m", "power", "c", 0.0, 7.0),
        (7, "other", "sensor", "a", 0.0, 99.0),
    ]
    return spark.createDataFrame(
        rows, "state_id long, measurement string, domain string, "
              "entity_id string, ts_epoch double, value double")


def test_fill_modes_on_gap(spark):
    pts = _pts(spark)
    base = 'SELECT MEAN(value) FROM m GROUP BY time(1h), * FILL({})'
    prev = {(r["entity_id"], r["time"]): r["mean"] for r in compile_ast(
        pts, parse_influxql(base.format("previous"))).collect()}
    # series a: buckets 0,1,4 real; 2,3 LOCF from bucket 1's mean 3.0
    assert prev[("a", 7200)] == 3.0 and prev[("a", 10800)] == 3.0
    assert prev[("a", 14400)] == 5.0
    lin = {(r["entity_id"], r["time"]): r["mean"] for r in compile_ast(
        pts, parse_influxql(base.format("linear"))).collect()}
    # linear between (bucket 1, 3.0) and (bucket 4, 5.0)
    assert lin[("a", 7200)] == pytest.approx(3 + 2 * 1 / 3)
    assert lin[("a", 10800)] == pytest.approx(3 + 2 * 2 / 3)
    zero = {(r["entity_id"], r["time"]): r["mean"] for r in compile_ast(
        pts, parse_influxql(base.format("0")))[["entity_id", "time",
                                                "mean"]].collect()}
    assert zero[("a", 7200)] == 0.0
    none = compile_ast(pts, parse_influxql(base.format("none"))).collect()
    assert not [r for r in none if r["entity_id"] == "a"
                and r["time"] in (7200, 10800)]


def test_ungrouped_merges_series_grouped_splits(spark):
    pts = _pts(spark)
    merged = compile_ast(
        pts, parse_influxql("SELECT COUNT(value) FROM m")).collect()
    assert len(merged) == 1 and merged[0]["count"] == 6
    split = compile_ast(
        pts, parse_influxql("SELECT COUNT(value) FROM m GROUP BY *"))
    assert {(r["domain"], r["entity_id"]): r["count"]
            for r in split.collect()} == {
        ("sensor", "a"): 3, ("sensor", "b"): 2, ("power", "c"): 1}


def test_limit_per_series_vs_global(spark):
    pts = _pts(spark)
    per_series = compile_ast(pts, parse_influxql(
        "SELECT value FROM m GROUP BY * LIMIT 1")).collect()
    # first point of each of the 3 series
    assert sorted(r["value"] for r in per_series) == [1.0, 7.0, 10.0]
    global_lim = compile_ast(pts, parse_influxql(
        "SELECT value FROM m ORDER BY time DESC LIMIT 2")).collect()
    # latest two points overall: ts 14400 (5.0) and ts 3600 (3.0)
    assert sorted(r["value"] for r in global_lim) == [3.0, 5.0]


def test_slimit_keeps_first_series(spark):
    pts = _pts(spark)
    out = compile_ast(pts, parse_influxql(
        "SELECT COUNT(value) FROM m GROUP BY * SLIMIT 2")).collect()
    # series order: (power,c) < (sensor,a)
    assert {(r["domain"], r["entity_id"]) for r in out} == {
        ("power", "c"), ("sensor", "a")}


def test_moving_average_and_where(spark):
    pts = _pts(spark)
    out = compile_ast(pts, parse_influxql(
        "SELECT MOVING_AVERAGE(value, 2) FROM m "
        "WHERE entity_id = 'a' GROUP BY *")).collect()
    assert [r["moving_average"] for r in
            sorted(out, key=lambda r: r["time"])] == [2.0, 4.0]


def test_tag_and_value_where(spark):
    pts = _pts(spark)
    out = compile_ast(pts, parse_influxql(
        "SELECT value FROM m WHERE domain != 'sensor'")).collect()
    assert [r["value"] for r in out] == [7.0]
    out = compile_ast(pts, parse_influxql(
        "SELECT value FROM m WHERE value >= 10 AND value < 20")).collect()
    assert [r["value"] for r in out] == [10.0]


def test_show_statements(spark):
    pts = _pts(spark)
    from ha_sqllite_2_influxdb_spark.plans.influxql_text import InfluxShow

    ast = parse_influxql("SHOW MEASUREMENTS")
    assert ast == InfluxShow("measurements")
    assert [r["name"] for r in compile_ast(pts, ast).collect()] == [
        "m", "other"]

    ast = parse_influxql('SHOW TAG VALUES FROM m WITH KEY = "domain"')
    assert ast == InfluxShow("tag_values", "m", "domain")
    assert {r["value"] for r in compile_ast(pts, ast).collect()} == {
        "sensor", "power"}

    out = compile_ast(pts, parse_influxql("SHOW TAG KEYS FROM m")).collect()
    assert [(r["measurement"], r["tagKey"]) for r in out] == [
        ("m", "domain"), ("m", "entity_id")]

    out = compile_ast(pts, parse_influxql("SHOW FIELD KEYS")).collect()
    assert {(r["fieldKey"], r["fieldType"]) for r in out} == {
        ("value", "float")}

    card = compile_ast(
        pts, parse_influxql("SHOW SERIES CARDINALITY")).collect()
    assert card[0]["count"] == 4   # (m,sensor,a) (m,sensor,b) (m,power,c) (other,sensor,a)
    card_m = compile_ast(
        pts, parse_influxql("SHOW SERIES EXACT CARDINALITY FROM m"))
    assert card_m.collect()[0]["count"] == 3

    with pytest.raises(InfluxQLError):
        parse_influxql("SHOW TAG VALUES FROM m")     # missing WITH KEY
    with pytest.raises(InfluxQLError):
        parse_influxql("SHOW USERS")                 # unsupported


def test_subquery_daily_mean_of_hourly_max(spark):
    """The re-bucketing idiom on a crafted frame: hourly maxes 3, 5
    (day 0) and 7 (day 1) for series a -> daily means 4.0 and 7.0."""
    pts = _pts(spark)  # a: (0h: 1,?), (1h: 3), (4h: 5) -- all day 0
    out = compile_ast(pts, parse_influxql(
        "SELECT MEAN(max) FROM (SELECT MAX(value) FROM m "
        "GROUP BY time(1h), *) GROUP BY time(1d), *")).collect()
    got = {(r["entity_id"], r["time"]): r["mean"] for r in out}
    # series a day 0: hourly maxes 1,3,5 -> mean 3; b: 20; c: 7
    assert got[("a", 0)] == 3.0
    assert got[("b", 0)] == 20.0 and got[("c", 0)] == 7.0

    # ungrouped-time outer over a bucketed inner: global max of means
    out2 = compile_ast(pts, parse_influxql(
        "SELECT MAX(mean), COUNT(mean) FROM (SELECT MEAN(value) FROM m "
        "GROUP BY time(1h), *) GROUP BY *")).collect()
    got2 = {(r["entity_id"]): (r["max"], r["count"]) for r in out2}
    assert got2[("a")] == (5.0, 3) and got2[("b")] == (15.0, 1)


def test_subquery_validation_errors(spark):
    pts = _pts(spark)
    for bad in [
        # outer field not produced by the subquery
        "SELECT MEAN(sum) FROM (SELECT MAX(value) FROM m GROUP BY *)",
        # outer tags exceed the inner grouping
        "SELECT MEAN(max) FROM (SELECT MAX(value) FROM m) GROUP BY *",
        # outer time bucket without inner time bucket
        "SELECT MEAN(max) FROM (SELECT MAX(value) FROM m GROUP BY *) "
        "GROUP BY time(1d), *",
        # outer WHERE
        "SELECT MEAN(max) FROM (SELECT MAX(value) FROM m GROUP BY *) "
        "WHERE value > 1",
        # outer transform outside the supported set (DERIVATIVE /
        # NND / DIFFERENCE / CUMULATIVE_SUM are supported since r7 —
        # test_outer_transform_over_subquery)
        "SELECT MOVING_AVERAGE(max, 3) FROM (SELECT MAX(value) FROM m "
        "GROUP BY time(1h), *)",
        # outer selector remains invalid
        "SELECT TOP(max, 2) FROM (SELECT MAX(value) FROM m "
        "GROUP BY time(1h), *)",
        # unknown field on a plain measurement
        "SELECT MEAN(foo) FROM m",
    ]:
        with pytest.raises(InfluxQLError):
            compile_ast(pts, parse_influxql(bad))


def test_cq_parse_and_validation():
    from ha_sqllite_2_influxdb_spark.plans.influxql_text import InfluxCQ

    ast = parse_influxql(
        'CREATE CONTINUOUS QUERY "cq_1h" ON mydb BEGIN '
        "SELECT MEAN(value) INTO hourly FROM m GROUP BY time(1h), * END")
    assert isinstance(ast, InfluxCQ)
    assert ast.name == "cq_1h" and ast.db == "mydb"
    assert ast.select.into == "hourly" and ast.select.bucket_s == 3600

    for bad in [
        # no INTO
        "CREATE CONTINUOUS QUERY c ON d BEGIN "
        "SELECT MEAN(value) FROM m GROUP BY time(1h), * END",
        # no time bucket
        "CREATE CONTINUOUS QUERY c ON d BEGIN "
        "SELECT MEAN(value) INTO h FROM m GROUP BY * END",
        # FILL in a standing stream
        "CREATE CONTINUOUS QUERY c ON d BEGIN SELECT MEAN(value) "
        "INTO h FROM m GROUP BY time(1h), * FILL(previous) END",
        # selector body
        "CREATE CONTINUOUS QUERY c ON d BEGIN SELECT TOP(value, 3) "
        "INTO h FROM m GROUP BY time(1h), * END",
        # first/last need the tie-break the wire stream lacks
        "CREATE CONTINUOUS QUERY c ON d BEGIN SELECT FIRST(value) "
        "INTO h FROM m GROUP BY time(1h), * END",
    ]:
        with pytest.raises(InfluxQLError):
            parse_influxql(bad)


# ------------------------------------------------------------- plan shape

def test_text_downsample_matches_function_layer_shape(spark, sf_dir):
    """The text-compiled Grafana downsample keeps the function layer's
    two-exchange budget: the (series, bucket) partial agg plus the one
    series window the gap expansion and LOCF fill share."""
    df = compile_influxql(
        spark, sf_dir,
        'SELECT MEAN(value) FROM "W" GROUP BY time(1h), * FILL(previous)')
    physical = explain_str(df)
    assert physical.count("hashpartitioning(measurement") == 2, physical


def test_text_transform_single_series_exchange(spark, sf_dir):
    df = compile_influxql(
        spark, sf_dir,
        'SELECT NON_NEGATIVE_DERIVATIVE(value) FROM "%" GROUP BY *')
    physical = explain_str(df)
    assert physical.count("hashpartitioning(measurement") == 1, physical


def test_text_raw_global_limit_is_take_ordered(spark, sf_dir):
    df = compile_influxql(
        spark, sf_dir,
        "SELECT value FROM default_measurement "
        "ORDER BY time DESC LIMIT 100")
    assert "TakeOrderedAndProject" in explain_str(df)


# ------------------------------------------- r7 grammar extensions

def test_parse_regex_or_now_offsets():
    ast = parse_influxql(
        "SELECT COUNT(value) FROM /^cpu/ "
        "WHERE entity_id =~ /core\\d+/ AND (value > 5 OR value < 1) "
        "AND time >= now() - 1h GROUP BY * "
        "LIMIT 10 OFFSET 20 SLIMIT 3 SOFFSET 6",
        now_s=1000000.0)
    from ha_sqllite_2_influxdb_spark.plans.influxql_text import (
        CondOr, Regex)
    assert isinstance(ast.measurement, Regex)
    assert ast.measurement.pattern == "^cpu"
    tagc, orc, timec = ast.where
    assert (tagc.lhs, tagc.op, tagc.rhs) == ("entity_id", "=~",
                                             "core\\d+")
    assert isinstance(orc, CondOr) and len(orc.alts) == 2
    assert (timec.lhs, timec.op, timec.rhs) == ("time", ">=", 996400.0)
    assert (ast.limit, ast.offset, ast.slimit, ast.soffset) == (10, 20,
                                                                3, 6)


def test_parse_new_functions():
    for text, func in [
        ("SELECT STDDEV(value) FROM m GROUP BY *", "stddev"),
        ("SELECT MEDIAN(value) FROM m GROUP BY *", "median"),
        ("SELECT MODE(value) FROM m GROUP BY time(1d), *", "mode"),
        ("SELECT DISTINCT(value) FROM m GROUP BY *", "distinct"),
        ("SELECT INTEGRAL(value) FROM m GROUP BY *", "integral"),
        ("SELECT ELAPSED(value) FROM m GROUP BY *", "elapsed"),
        ("SELECT SAMPLE(value, 5) FROM m GROUP BY *", "sample"),
        ("SELECT COUNT(DISTINCT(value)) FROM m GROUP BY *",
         "count_distinct"),
    ]:
        assert parse_influxql(text).projs[0].func == func, text


@pytest.mark.parametrize("bad", [
    # now() without a pinned now_s must refuse, not read the wall clock
    "SELECT value FROM m WHERE time > now() - 1h",
    # top-level OR must be parenthesized
    "SELECT value FROM m WHERE value > 5 OR value < 1",
    # time never regex-matches
    "SELECT value FROM m WHERE time =~ /x/",
    # =~ needs a regex literal
    "SELECT value FROM m WHERE domain =~ 'sensor'",
    # OFFSET/SOFFSET need their LIMIT
    "SELECT value FROM m GROUP BY * OFFSET 5",
    "SELECT value FROM m GROUP BY * SLIMIT 5 LIMIT 5",  # clause order
    # SAMPLE needs n; nested DISTINCT only under COUNT
    "SELECT SAMPLE(value) FROM m GROUP BY *",
    "SELECT SUM(DISTINCT(value)) FROM m GROUP BY *",
    # INTEGRAL has no bucketed form here
    "SELECT INTEGRAL(value) FROM m GROUP BY time(1h), *",
])
def test_r7_grammar_rejections(bad):
    with pytest.raises(InfluxQLError):
        ast = parse_influxql(bad)
        compile_ast(None, ast)


def test_or_and_precedence_on_frame(spark):
    # (domain='sensor' OR domain='power') AND value >= 7
    # -> rows 3 (a,5.0 excluded: value<7), 4, 5, 6; row 7 other meas.
    df = compile_ast(_pts(spark), parse_influxql(
        "SELECT value FROM m WHERE "
        "(domain = 'sensor' OR domain = 'power') AND value >= 7"))
    assert sorted(r.state_id for r in df.collect()) == [4, 5, 6]


def test_regex_measurement_and_negated_tag(spark):
    df = compile_ast(_pts(spark), parse_influxql(
        "SELECT value FROM /^(m|other)$/ WHERE entity_id !~ /^[bc]/"))
    # both measurements, entity a only
    assert sorted(r.state_id for r in df.collect()) == [1, 2, 3, 7]


def test_offset_pagination_per_series(spark):
    # series a has 3 points; LIMIT 1 OFFSET 1 -> the middle point
    df = compile_ast(_pts(spark), parse_influxql(
        "SELECT value FROM m WHERE entity_id = 'a' GROUP BY * "
        "LIMIT 1 OFFSET 1"))
    assert [r.state_id for r in df.collect()] == [2]


def test_median_even_odd_and_mode_tie(spark):
    stats = compile_ast(_pts(spark), parse_influxql(
        "SELECT MEDIAN(value) FROM m GROUP BY *")).collect()
    med = {r.entity_id: r.median for r in stats}
    assert med["a"] == 3.0          # odd n: middle
    assert med["b"] == 15.0         # even n: avg of two middles
    rows = [(1, "m", "d", "e", 0.0, 2.0), (2, "m", "d", "e", 1.0, 2.0),
            (3, "m", "d", "e", 2.0, 1.0), (4, "m", "d", "e", 3.0, 1.0)]
    pts = spark.createDataFrame(
        rows, "state_id long, measurement string, domain string, "
              "entity_id string, ts_epoch double, value double")
    mode = compile_ast(pts, parse_influxql(
        "SELECT MODE(value) FROM m GROUP BY *")).collect()
    assert mode[0].mode == 1.0      # tie on freq: lowest value wins


def test_bucket_offset_alignment(spark):
    # time(1h, 30m): bucket edges at :30 — a point at t=3599 lands in
    # the [-1800, 1800) bucket labeled -1800; t=5400 starts a new one
    rows = [(1, "m", "d", "e", 3599.0, 2.0),
            (2, "m", "d", "e", 5400.0, 4.0),
            (3, "m", "d", "e", 5401.0, 6.0)]
    pts = spark.createDataFrame(
        rows, "state_id long, measurement string, domain string, "
              "entity_id string, ts_epoch double, value double")
    out = {r.time: (r.mean, r["count"]) for r in compile_ast(
        pts, parse_influxql(
            "SELECT MEAN(value), COUNT(value) FROM m "
            "GROUP BY time(1h, 30m), *")).collect()}
    assert out == {1800: (2.0, 1), 5400: (5.0, 2)}
    ast = parse_influxql("SELECT MEAN(value) FROM m GROUP BY time(1h)")
    assert ast.bucket_off_s == 0
    with pytest.raises(InfluxQLError):
        parse_influxql("SELECT MEAN(value) FROM m GROUP BY time(1h, 2h)")


def test_show_databases_and_retention(spark):
    db = compile_ast(_pts(spark),
                     parse_influxql("SHOW DATABASES")).collect()
    assert [r.name for r in db] == ["home_assistant"]
    rp = compile_ast(_pts(spark),
                     parse_influxql("SHOW RETENTION POLICIES")).collect()
    assert rp[0].name == "autogen" and rp[0]["default"] is True


def test_projection_arithmetic_and_iso_time():
    ast = parse_influxql(
        "SELECT MEAN(value) * 100 FROM m "
        "WHERE time >= '2024-01-10T06:30:00Z' AND time < '2024-01-20' "
        "GROUP BY time(1d), *")
    p = ast.projs[0]
    assert (p.func, p.scale_op, p.scale_k) == ("mean", "*", 100.0)
    assert [c.rhs for c in ast.where] == [1704868200.0, 1705708800.0]
    # raw-field scaling parses too
    assert parse_influxql("SELECT value * 0.001 FROM m").projs[0] \
        .scale_k == 0.001
    for bad in [
        "SELECT TOP(value, 3) * 2 FROM m GROUP BY *",   # selector
        "SELECT DERIVATIVE(value) + 1 FROM m GROUP BY *",  # transform
        "SELECT value FROM m WHERE time > 'not-a-date'",
    ]:
        with pytest.raises(InfluxQLError):
            parse_influxql(bad)


def test_scaled_aggregate_values(spark):
    out = compile_ast(_pts(spark), parse_influxql(
        "SELECT SUM(value) - 1, COUNT(value) * 2 FROM m "
        "WHERE entity_id = 'b' GROUP BY *")).collect()[0]
    assert out["sum"] == 29.0 and out["count"] == 4
    raw = compile_ast(_pts(spark), parse_influxql(
        "SELECT value * 10 FROM m WHERE entity_id = 'b'")).collect()
    assert sorted(r.value for r in raw) == [100.0, 200.0]


def test_limit_on_aggregates_caps_buckets_per_series(spark):
    pts = _pts(spark)
    out = compile_ast(pts, parse_influxql(
        "SELECT COUNT(value) FROM m GROUP BY time(1h), * "
        "ORDER BY time DESC LIMIT 1")).collect()
    # latest bucket per series: a->14400, b->0, c->0
    got = {(r.entity_id): r.time for r in out}
    assert got == {"a": 14400, "b": 0, "c": 0}
    # transform LIMIT: per-series cap on emitted points
    tr = compile_ast(pts, parse_influxql(
        "SELECT DIFFERENCE(value) FROM m WHERE entity_id = 'a' "
        "GROUP BY * LIMIT 1")).collect()
    assert len(tr) == 1 and tr[0].difference == 2.0
    # whole-series aggregate: OFFSET >= 1 empties, LIMIT keeps
    assert compile_ast(pts, parse_influxql(
        "SELECT SUM(value) FROM m GROUP BY * LIMIT 1 OFFSET 1"
    )).count() == 0
    with pytest.raises(InfluxQLError):
        compile_ast(pts, parse_influxql(
            "SELECT TOP(value, 3) FROM m GROUP BY * LIMIT 2"))


def test_tz_local_midnight_buckets(spark):
    """tz('Europe/Berlin'), January (+01:00, no DST): epoch 0 is 01:00
    Berlin, so the local-day bucket runs [-3600, 82800) UTC and its
    label is the UTC instant of Berlin midnight (-3600)."""
    out = compile_ast(_pts(spark), parse_influxql(
        "SELECT MEAN(value) FROM m WHERE entity_id = 'a' "
        "GROUP BY time(1d), * tz('Europe/Berlin')")).collect()
    assert len(out) == 1
    assert out[0].time == -3600
    assert out[0].mean == 3.0          # (1 + 3 + 5) / 3, all one local day

    for bad in (
        "SELECT MEAN(value) FROM m tz('Europe/Berlin')",        # no time()
        "SELECT MEAN(value) FROM m GROUP BY time(1d), * "
        "FILL(previous) tz('Europe/Berlin')",                   # with FILL
        "SELECT MEAN(value) FROM m GROUP BY time(1d, 1h), * "
        "tz('Europe/Berlin')",                                  # with offset
    ):
        with pytest.raises(InfluxQLError):
            parse_influxql(bad)


def test_math_projection_per_point(spark):
    """ABS/CEIL/FLOOR/ROUND: row-local, float-typed (InfluxDB returns
    float fields), scale arithmetic composes after the function."""
    pts = _pts(spark)
    out = {r.state_id: r.abs for r in compile_ast(pts, parse_influxql(
        "SELECT ABS(value) * 2 FROM m WHERE entity_id = 'a'")).collect()}
    assert out == {1: 2.0, 2: 6.0, 3: 10.0}
    ceil = compile_ast(pts, parse_influxql(
        "SELECT CEIL(value) FROM m")).schema["ceil"].dataType.typeName()
    assert ceil == "double"
    with pytest.raises(InfluxQLError):
        parse_influxql("SELECT SIN(value) FROM m")
    with pytest.raises(InfluxQLError):
        compile_ast(pts, parse_influxql(
            "SELECT ABS(value) FROM m GROUP BY time(1h)"))


def test_delete_and_drop_compile_to_retained_complement(spark):
    pts = _pts(spark)
    kept = compile_ast(pts, parse_influxql(
        "DELETE FROM m WHERE time < 3600 AND domain = 'sensor'"))
    ids = {r.state_id for r in kept.collect()}
    # rows 1 (m/sensor t=0), 4, 5? no: 4,5 are t=0,60 sensor -> deleted;
    # kept: 2,3 (t>=3600), 6 (power domain), 7 (other measurement)
    assert ids == {2, 3, 6, 7}
    dropped = compile_ast(pts, parse_influxql('DROP MEASUREMENT "m"'))
    assert {r.measurement for r in dropped.collect()} == {"other"}
    with pytest.raises(InfluxQLError):
        compile_ast(pts, parse_influxql("DELETE FROM m WHERE value > 1"))


def test_multi_measurement_from_list(spark):
    pts = _pts(spark)
    out = compile_ast(pts, parse_influxql(
        'SELECT COUNT(value) FROM "m", "other" GROUP BY *')).collect()
    assert {r.measurement for r in out} == {"m", "other"}
    with pytest.raises(InfluxQLError):
        parse_influxql('SELECT COUNT(value) FROM /m/, "other" GROUP BY *')


def test_explain_returns_engine_plan(spark, sf_dir):
    from ha_sqllite_2_influxdb_spark.plans.influxql_text import (
        compile_influxql,
    )

    rows = compile_influxql(
        spark, sf_dir,
        'EXPLAIN ANALYZE SELECT MEAN(value) FROM "W" GROUP BY time(1h), *'
    ).collect()
    plan = "\n".join(r.plan_step for r in rows)
    assert "HashAggregate" in plan
    assert "BatchEvalPython" not in plan
    assert rows[0].line_no == 1
    with pytest.raises(InfluxQLError):
        parse_influxql("EXPLAIN SHOW MEASUREMENTS")


def test_outer_transform_over_subquery(spark):
    """DERIVATIVE/CUMULATIVE_SUM over a time-bucketed subquery: the
    transform rides the inner's bucket series; rejections cover
    unbucketed inners and out-of-subset combinations."""
    pts = _pts(spark)
    out = compile_ast(pts, parse_influxql(
        "SELECT DIFFERENCE(count) FROM "
        "(SELECT COUNT(value) FROM m WHERE entity_id = 'a' "
        "GROUP BY time(1h), *)")).collect()
    # hourly counts for a: h0=1, h1=1, h4=1 -> diffs 0, 0
    assert sorted(r.difference for r in out) == [0, 0]
    cs = compile_ast(pts, parse_influxql(
        "SELECT CUMULATIVE_SUM(count) FROM "
        "(SELECT COUNT(value) FROM m WHERE entity_id = 'a' "
        "GROUP BY time(1h), *)")).collect()
    assert sorted(r.cumulative_sum for r in cs) == [1.0, 2.0, 3.0]
    for bad in (
        "SELECT DERIVATIVE(mean) FROM (SELECT MEAN(value) FROM m "
        "GROUP BY *)",                               # unbucketed inner
        "SELECT DERIVATIVE(max) FROM (SELECT MEAN(value) FROM m "
        "GROUP BY time(1h), *)",                     # wrong field
        "SELECT MOVING_AVERAGE(mean, 3) FROM (SELECT MEAN(value) "
        "FROM m GROUP BY time(1h), *)",              # unsupported fn
    ):
        with pytest.raises(InfluxQLError):
            compile_ast(pts, parse_influxql(bad))
