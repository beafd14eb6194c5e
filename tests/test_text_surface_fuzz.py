"""Property-based fuzzing for the two text surfaces (InfluxQL + Flux):

1. Generated-valid pipelines parse and preserve structure (the parser
   never drops or reorders stages/clauses).
2. Arbitrary garbage NEVER escapes as anything but the surface's own
   error type — a text layer that throws IndexError/AttributeError on
   malformed dashboards is a production incident, so the error contract
   is a real invariant, not a nicety.

Driver-side only (no SparkSession needed): parsing is pure string work.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from ha_sqllite_2_influxdb_spark.plans.flux_text import (
    FluxError,
    parse_flux,
)
from ha_sqllite_2_influxdb_spark.plans.influxql_text import (
    InfluxQLError,
    parse_influxql,
)

# ------------------------------------------------------- valid generators

_TAG = st.sampled_from(["domain", "entity_id"])
_MEAS = st.sampled_from(["W", "%", "default_measurement"])
_DUR = st.sampled_from(["30s", "5m", "1h", "6h", "1d"])
_AGG = st.sampled_from(["mean", "sum", "count", "min", "max",
                        "first", "last"])


@st.composite
def flux_filter(draw):
    col = draw(st.sampled_from(
        ["_measurement", "_field", "domain", "entity_id"]))
    val = draw(_MEAS) if col == "_measurement" else draw(
        st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8))
    style = draw(st.sampled_from(["dot", "bracket"]))
    lhs = f"r.{col}" if style == "dot" else f'r["{col}"]'
    return f'filter(fn: (r) => {lhs} == "{val}")'


@st.composite
def flux_pipeline(draw):
    stages = [f'range(start: {draw(st.integers(0, 2_000_000_000))})']
    stages += draw(st.lists(flux_filter(), max_size=3))
    kind = draw(st.sampled_from(["window", "agg", "transform", "none"]))
    if kind == "window":
        stages.append(
            f"aggregateWindow(every: {draw(_DUR)}, fn: {draw(_AGG)})")
    elif kind == "agg":
        stages.append(f"{draw(_AGG)}()")
    elif kind == "transform":
        stages.append(draw(st.sampled_from(
            ["derivative(unit: 1s)", "difference()", "cumulativeSum()",
             "increase()", "movingAverage(n: 3)"])))
    if draw(st.booleans()):
        stages.append('sort(columns: ["_time"], desc: false)')
        stages.append(f"limit(n: {draw(st.integers(1, 100))})")
    return 'from(bucket: "b")\n  |> ' + "\n  |> ".join(stages), stages


@settings(max_examples=200, deadline=None)
@given(flux_pipeline())
def test_flux_valid_pipelines_parse_and_preserve_stages(tp):
    text, stages = tp
    pipe = parse_flux(text)
    assert pipe.bucket == "b"
    got = [s.name for s in pipe.stages]
    want = [s.split("(")[0] for s in stages]
    assert got == want


@st.composite
def influxql_query(draw):
    func = draw(st.sampled_from(
        ["MEAN", "SUM", "COUNT", "MIN", "MAX", "SPREAD", "FIRST",
         "LAST", "STDDEV", "MEDIAN"]))
    q = f"SELECT {func}(value) FROM \"{draw(_MEAS)}\""
    conds = []
    if draw(st.booleans()):
        conds.append(f"time >= {draw(st.integers(0, 2_000_000_000))}")
    if draw(st.booleans()):
        conds.append(f"{draw(_TAG)} = 'x{draw(st.integers(0, 99))}'")
    if conds:
        q += " WHERE " + " AND ".join(conds)
    grouped = draw(st.booleans())
    if grouped:
        q += f" GROUP BY time({draw(_DUR)}), *"
    if draw(st.booleans()):
        q += f" LIMIT {draw(st.integers(1, 50))}"
    return q, func.lower(), len(conds), grouped


@settings(max_examples=200, deadline=None)
@given(influxql_query())
def test_influxql_valid_queries_parse_and_preserve_clauses(qt):
    q, func, n_conds, grouped = qt
    ast = parse_influxql(q)
    assert ast.projs[0].func == ("count_distinct"
                                 if func == "count_distinct" else func)
    assert len(ast.where) == n_conds
    assert (ast.bucket_s is not None) == grouped


# ------------------------------------------------------------ error fuzz

_GARBAGE = st.text(
    alphabet=string.printable, min_size=0, max_size=120)
_ALMOST_FLUX = st.builds(
    lambda pre, mid, suf: f'from(bucket: "b") |> {pre}({mid}) |> {suf}',
    st.text(alphabet=string.ascii_letters, max_size=10),
    _GARBAGE, _GARBAGE)


@settings(max_examples=300, deadline=None)
@given(st.one_of(_GARBAGE, _ALMOST_FLUX))
def test_flux_garbage_never_escapes_fluxerror(text):
    try:
        parse_flux(text)
    except FluxError:
        pass            # the contract
    # a parse SUCCESS on garbage is acceptable only if it produced a
    # well-formed pipeline object — which the return type guarantees


@settings(max_examples=300, deadline=None)
@given(st.one_of(_GARBAGE, st.builds(
    lambda a, b: f"SELECT {a} FROM {b}", _GARBAGE, _GARBAGE)))
def test_influxql_garbage_never_escapes_influxqlerror(text):
    try:
        parse_influxql(text)
    except InfluxQLError:
        pass
