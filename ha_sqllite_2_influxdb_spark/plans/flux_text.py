"""Flux TEXT surface: tokenizer, parser, compiler to per-series plans.

The reference itself speaks Flux — its one InfluxDB *query* is the Flux
pipeline at ``sqllite2influxdb.py:57-63``::

    from(bucket: "…")
      |> range(start: 0)
      |> filter(fn: (r) => r["_measurement"] == "units")
      |> sort(columns: ["_time"], desc: false)
      |> limit(n: 1)

and the bucket it fills is queried by Grafana/HA dashboards in Flux.
``plans/influxql_text.py`` covers the InfluxQL dashboard surface; this
module covers the Flux one: a Flux pipeline string compiles to the SAME
Spark plans the function layer builds (one shuffle keyed on the series
columns — InfluxDB's own shard key — per window/aggregate; the parser is
driver-side string work on a <1 KB query, no per-row Python anywhere).

Supported pipeline stages (a documented, tested subset — anything
outside it raises ``FluxError`` rather than mis-executing):

  from(bucket: "name")
  |> range(start: t [, stop: t])          t := epoch-seconds | RFC3339
                                          start inclusive, stop exclusive
  |> filter(fn: (r) => pred)              pred := and/or tree over
                                          r._measurement/_field/_value,
                                          r.domain, r.entity_id with
                                          == != < <= > >= =~ !~
  |> group(columns: ["tag", …]) | group() (mode "by"; () merges all)
  |> aggregateWindow(every: d, fn: f [, createEmpty: b])
        f := mean|sum|count|min|max|first|last, _time = window STOP
        (epoch-aligned, Flux's default); createEmpty:true requires an
        explicit range whose bounds are multiples of ``every`` (so no
        truncated last window exists) and emits null (count: 0) rows
  |> mean()|sum()|count()|min()|max()|first()|last()|spread()|stddev()
  |> median()                             exact: avg of the two middle
                                          values on the (value, state_id)
                                          total order
  |> quantile(q: p, method: "exact_selected")
                                          rank max(1, ceil(p·n)) sample
  |> derivative(unit: d [, nonNegative: b])   per-series rate; negative
                                          results → null when nonNegative
  |> difference() | cumulativeSum() | increase() | movingAverage(n: k)
  |> elapsed(unit: d) | timeShift(duration: d)
  |> sort(columns: ["_time"|"_value"] [, desc: b])
  |> limit(n: k) | tail(n: k)             per table (per group key)
  |> fill(value: c) | fill(usePrevious: true)
  |> map(fn: (r) => ({ r with _value: <arith> }))   _value ⊙ const, or
                                          two record columns (post-join)
  |> histogram(bins: […]) | histogramQuantile(quantile: p)
                                          Prometheus-style le bins
  |> stateDuration(fn:, unit:) | stateCount(fn:)
                                          binary-sensor run tracking
  |> pivot(rowKey:, columnKey: ["_field"], valueColumn:)
                                          fieldsAsCols idiom
  |> keep(columns: […]) | drop(columns: […])
  |> yield(name: "…")                     no-op

Also parsed and executed (dedicated entry points):

- multi-statement programs — ``name = from(…) |> …`` assignments plus
  a two-table ``join(tables: {a: x, b: y}, on: […])`` with
  label-suffixed conflict columns (`compile_flux_program`)
- InfluxDB v2 TASKS — ``option task = {name, every}`` + ``to(bucket:)``
  run as Structured Streaming (`run_flux_task`)
- the ``schema.*`` meta functions Grafana's v2 datasource issues
  (`compile_flux_meta`)
- relative ranges (``range(start: -30d)``, stop defaulting to now())
  against a pinned now (`compile_flux(text, now_s=…)`)

Semantics follow Flux's documented behavior on the migrated point
relation (series key = _measurement + tags(domain, entity_id) + _field):

- After ``from |> range |> filter`` the stream is grouped by the series
  key (Flux's default table grouping); aggregates/selectors/limits act
  PER TABLE. ``group()`` merges everything into one table (the
  reference's ``records[0]`` read is over the first table — the
  ``flux_oldest_global`` entry models the global-oldest intent).
- Aggregates (mean/sum/count/…) drop ``_time``; selectors
  (first/last/min/max) keep the selected row's ``_time`` — exactly
  Flux's aggregate-vs-selector split.
- ``increase()`` uses Flux's counter-reset rule: a DECREASE contributes
  the new value itself (counter restarted), not zero; row 1 emits 0.
- Float exactness vs the DuckDB oracles uses the established quantized-
  integer accumulation patterns (micro-BIGINT sums for mean/sum/
  cumulativeSum/increase, milli-BIGINT moments for stddev) — see
  plans/influxql.py for the numeric-determinism notes.

Scale shape: identical to the InfluxQL layer — one exchange on the
series key serves every per-series window/aggregate; aggregateWindow is
one partial-agg exchange; createEmpty's grid explodes over the DISTINCT
series relation (tiny) and left-joins the buckets; limits are window
ranks on the same series shuffle, never a global sort.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .influxql import _ORACLE_NUM, _numeric_points

__all__ = ["FluxError", "parse_flux", "compile_flux", "QUERIES", "ORACLES"]


class FluxError(ValueError):
    """Raised on any pipeline outside the documented grammar subset."""


# ---------------------------------------------------------------- tokenizer

_TOKEN_RE = re.compile(
    r"""\s*(?:
      (?P<pipe>\|>)
    | (?P<arrow>=>)
    | (?P<string>"[^"]*")
    | (?P<regex>/(?:\\.|[^/\\])+/)
    | (?P<duration>-?\d+(?:w|d|h|ms|m|s))
    | (?P<number>-?\d+(?:\.\d+)?)
    | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op>==|!=|=~|!~|<=|>=|=|<|>)
    | (?P<punct>[()\[\]{}:,.])
    | (?P<arith>[*+/-])
    )""",
    re.VERBOSE,
)

# a '/' opens a regex literal ONLY right after a match operator (=~ / !~);
# anywhere else it is division (map arithmetic)
_NO_REGEX_RE = re.compile(
    _TOKEN_RE.pattern.replace("(?P<regex>/(?:\\\\.|[^/\\\\])+/)\n    | ", ""),
    re.VERBOSE,
)

_DUR_S = {"w": 604800.0, "d": 86400.0, "h": 3600.0, "m": 60.0, "s": 1.0,
          "ms": 0.001}

_RFC3339 = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})Z$")


def _rfc3339_epoch(s: str) -> float:
    m = _RFC3339.match(s)
    if not m:
        raise FluxError(f"unsupported time literal: {s!r}")
    import calendar
    y, mo, d, h, mi, se = (int(g) for g in m.groups())
    return float(calendar.timegm((y, mo, d, h, mi, se)))


@dataclass(frozen=True)
class _Tok:
    kind: str
    text: str


def _tokenize(text: str) -> list[_Tok]:
    out, pos = [], 0
    while pos < len(text):
        rx = (_TOKEN_RE if out and out[-1].kind == "op"
              and out[-1].text in ("=~", "!~") else _NO_REGEX_RE)
        m = rx.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip():
                raise FluxError(f"bad token at: {text[pos:pos + 24]!r}")
            break
        pos = m.end()
        out.append(_Tok(m.lastgroup, m.group(m.lastgroup)))
    return out


# ------------------------------------------------------------------- AST

@dataclass(frozen=True)
class FluxCmp:
    lhs: str      # column name without the r. prefix
    op: str
    rhs: object   # float for _value, str for tags / regex pattern


@dataclass(frozen=True)
class FluxBool:
    op: str       # 'and' | 'or'
    parts: tuple


@dataclass(frozen=True)
class FluxMap:
    op: str       # '*' '/' '+' '-'
    const: float
    const_left: bool = False   # const ⊙ r._value (for '-' and '/')


@dataclass(frozen=True)
class FluxMap2:
    """map body combining two record columns (the cross-measurement math
    idiom after join()): ``r._value_p / r._value_h``."""
    op: str
    lhs: tuple    # ("col", name) | ("num", value)
    rhs: tuple


@dataclass(frozen=True)
class FluxJoin:
    """``join(tables: {a: x, b: y}, on: […])`` + trailing stages."""
    tables: tuple[tuple[str, str], ...]   # (label, variable) pairs
    on: tuple[str, ...]
    stages: tuple


@dataclass(frozen=True)
class FluxUnion:
    """``union(tables: [a, b, …])`` + trailing stages."""
    tables: tuple[str, ...]
    stages: tuple


@dataclass(frozen=True)
class FluxProgram:
    assigns: tuple[tuple[str, "FluxPipeline"], ...]
    final: object                          # FluxPipeline | FluxJoin


@dataclass(frozen=True)
class FluxStage:
    name: str
    args: dict


@dataclass(frozen=True)
class FluxPipeline:
    bucket: str
    stages: tuple[FluxStage, ...]


_R_COLS = {"_measurement", "_field", "_value", "_time",
           "domain", "entity_id"}


class _Parser:
    def __init__(self, toks: list[_Tok], now_s: float | None = None):
        self.toks = toks
        self.i = 0
        self.now_s = now_s

    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> _Tok:
        t = self.peek()
        if t is None:
            raise FluxError("unexpected end of pipeline")
        self.i += 1
        return t

    def expect(self, kind: str, text: str | None = None) -> _Tok:
        t = self.next()
        if t.kind != kind or (text is not None and t.text != text):
            raise FluxError(f"expected {text or kind}, got {t.text!r}")
        return t

    # -- values ----------------------------------------------------------
    def value(self):
        t = self.next()
        if t.kind == "string":
            return ("str", t.text[1:-1])
        if t.kind == "number":
            return ("num", float(t.text))
        if t.kind == "duration":
            unit = re.sub(r"^-?\d+", "", t.text)
            return ("dur", float(t.text[: -len(unit)]) * _DUR_S[unit])
        if t.kind == "ident" and t.text in ("true", "false"):
            return ("bool", t.text == "true")
        if t.kind == "ident":
            return ("ident", t.text)
        if t.kind == "punct" and t.text == "[":
            items, kinds = [], set()
            while True:
                v = self.value()
                if v[0] not in ("str", "num", "ident"):
                    raise FluxError(
                        "arrays must hold string/number literals or "
                        "identifiers")
                kinds.add(v[0])
                items.append(v[1])
                t2 = self.next()
                if t2.text == "]":
                    break
                if t2.text != ",":
                    raise FluxError(f"bad array separator {t2.text!r}")
            if len(kinds) > 1:
                raise FluxError("arrays must be homogeneous")
            kind = {"num": "numarray", "str": "array",
                    "ident": "identarray"}[kinds.pop()]
            return (kind, items)
        if t.kind == "punct" and t.text == "{":
            # record of identifiers: {p: a, h: b} (join tables:)
            pairs = []
            while True:
                k = self.expect("ident").text
                self.expect("punct", ":")
                pairs.append((k, self.expect("ident").text))
                t2 = self.next()
                if t2.text == "}":
                    break
                if t2.text != ",":
                    raise FluxError(f"bad record separator {t2.text!r}")
            return ("record", tuple(pairs))
        if t.kind == "punct" and t.text == "(":
            # lambda: (r) => …
            self.expect("ident", "r")
            self.expect("punct", ")")
            self.expect("arrow")
            return ("lambda", self.lambda_body())
        raise FluxError(f"unsupported value: {t.text!r}")

    # -- lambda bodies -----------------------------------------------------
    def lambda_body(self):
        t = self.peek()
        if t and t.text == "(" and self._is_record_rewrite():
            return self.map_body()
        return self.or_expr()

    def _is_record_rewrite(self) -> bool:
        # "({ r with" lookahead distinguishes map bodies from parenthesized
        # predicates
        j = self.i
        return (
            j + 2 < len(self.toks)
            and self.toks[j].text == "("
            and self.toks[j + 1].text == "{"
            and self.toks[j + 2].text == "r"
        )

    def map_body(self):
        self.expect("punct", "(")
        self.expect("punct", "{")
        self.expect("ident", "r")
        self.expect("ident", "with")
        self.expect("ident", "_value")
        self.expect("punct", ":")
        # <operand> op <operand>; operands are record columns or numbers
        left = self._map_operand()
        op = self.next().text
        if op not in ("*", "/", "+", "-"):
            raise FluxError(f"unsupported map operator {op!r}")
        right = self._map_operand()
        self.expect("punct", "}")
        self.expect("punct", ")")
        if left == ("col", "_value") and right[0] == "num":
            return FluxMap(op, right[1], const_left=False)
        if right == ("col", "_value") and left[0] == "num":
            return FluxMap(op, left[1], const_left=True)
        if left[0] == "col" and right[0] == "col":
            return FluxMap2(op, left, right)
        raise FluxError(
            "map must combine r._value with a constant, or two record "
            "columns")

    def _map_operand(self) -> tuple:
        t = self.next()
        if t.kind == "number":
            return ("num", float(t.text))
        if t.kind == "ident" and t.text == "r":
            self.expect("punct", ".")
            return ("col", self.expect("ident").text)
        raise FluxError(f"bad map operand {t.text!r}")

    def or_expr(self):
        parts = [self.and_expr()]
        while self.peek() and self.peek().text == "or":
            self.next()
            parts.append(self.and_expr())
        return parts[0] if len(parts) == 1 else FluxBool("or", tuple(parts))

    def and_expr(self):
        parts = [self.cmp()]
        while self.peek() and self.peek().text == "and":
            self.next()
            parts.append(self.cmp())
        return parts[0] if len(parts) == 1 else FluxBool("and", tuple(parts))

    def cmp(self):
        t = self.peek()
        if t and t.text == "(":
            self.next()
            inner = self.or_expr()
            self.expect("punct", ")")
            return inner
        col = self._r_column()
        op = self.next()
        if op.kind != "op":
            raise FluxError(f"expected comparison, got {op.text!r}")
        rhs = self.next()
        if op.text in ("=~", "!~"):
            if rhs.kind != "regex":
                raise FluxError("=~/!~ need a /regex/ literal")
            return FluxCmp(col, op.text, rhs.text[1:-1])
        if rhs.kind == "string":
            return FluxCmp(col, op.text, rhs.text[1:-1])
        if rhs.kind == "number":
            if col != "_value":
                raise FluxError(f"numeric comparison on tag {col!r}")
            return FluxCmp(col, op.text, float(rhs.text))
        raise FluxError(f"unsupported comparison operand {rhs.text!r}")

    def _r_column(self) -> str:
        self.expect("ident", "r")
        t = self.next()
        if t.text == ".":
            col = self.expect("ident").text
        elif t.text == "[":
            col = self.expect("string").text[1:-1]
            self.expect("punct", "]")
        else:
            raise FluxError(f"expected r.col or r[\"col\"], got {t.text!r}")
        if col not in _R_COLS:
            raise FluxError(f"unknown column r.{col}")
        return col

    # -- stages ------------------------------------------------------------
    def call(self) -> FluxStage:
        name = self.expect("ident").text
        self.expect("punct", "(")
        args: dict = {}
        while self.peek() and self.peek().text != ")":
            key = self.expect("ident").text
            self.expect("punct", ":")
            args[key] = self.value()
            if self.peek() and self.peek().text == ",":
                self.next()
        self.expect("punct", ")")
        return FluxStage(name, args)

    def _stage_chain(self) -> tuple:
        stages = []
        while self.peek() is not None and self.peek().kind == "pipe":
            self.next()
            stages.append(self.call())
        return tuple(stages)

    def pipeline(self) -> FluxPipeline:
        head = self.call()
        if head.name != "from" or "bucket" not in head.args:
            raise FluxError("pipeline must start with from(bucket: …)")
        if head.args["bucket"][0] != "str":
            raise FluxError("bucket must be a string literal")
        return FluxPipeline(head.args["bucket"][1], self._stage_chain())

    def _at_assignment(self) -> bool:
        t, n = self.peek(), (self.toks[self.i + 1]
                             if self.i + 1 < len(self.toks) else None)
        return (t is not None and t.kind == "ident"
                and t.text not in ("from", "join", "option", "import")
                and n is not None and n.kind == "op" and n.text == "=")

    def program(self) -> FluxProgram:
        """Multi-statement Flux: ``name = from(…) |> …`` assignments
        followed by a final pipeline or a ``join(tables: {…}, on: […])``
        — the cross-measurement-math form Grafana panels use."""
        assigns = []
        while self._at_assignment():
            name = self.next().text
            self.next()                      # '='
            assigns.append((name, self.pipeline()))
        t = self.peek()
        if t is None:
            raise FluxError("program needs a final pipeline or join()")
        if t.kind == "ident" and t.text == "join":
            head = self.call()
            tables = _arg(head.args, "tables", ("record",), required=True)
            on = _arg(head.args, "on", ("array",), required=True)
            if len(tables) != 2:
                raise FluxError("join() supports exactly two tables")
            final: object = FluxJoin(tuple(tables), tuple(on),
                                     self._stage_chain())
        elif t.kind == "ident" and t.text == "union":
            head = self.call()
            tables = _arg(head.args, "tables", ("identarray",),
                          required=True)
            if len(tables) < 2:
                raise FluxError("union() needs at least two tables")
            final = FluxUnion(tuple(tables), self._stage_chain())
        else:
            final = self.pipeline()
        if self.peek() is not None:
            raise FluxError(f"trailing tokens after program: "
                            f"{self.peek().text!r}")
        names = {n for n, _ in assigns}
        if isinstance(final, FluxJoin):
            for _, var in final.tables:
                if var not in names:
                    raise FluxError(f"join references unknown table "
                                    f"{var!r}")
        if isinstance(final, FluxUnion):
            for var in final.tables:
                if var not in names:
                    raise FluxError(f"union references unknown table "
                                    f"{var!r}")
        return FluxProgram(tuple(assigns), final)

    def meta(self) -> FluxStage:
        """``import "influxdata/influxdb/schema"`` + one ``schema.X(…)``
        call — the Flux meta queries Grafana's datasource browser issues
        to populate its dropdowns (the v2 counterpart of the InfluxQL
        SHOW statements)."""
        self.expect("ident", "import")
        imp = self.next()
        if imp.kind != "string" or \
                imp.text[1:-1] != "influxdata/influxdb/schema":
            raise FluxError("only the schema package is importable")
        self.expect("ident", "schema")
        self.expect("punct", ".")
        call = self.call()
        if self.peek() is not None:
            raise FluxError("schema queries take no pipeline stages")
        return call

    def task(self) -> tuple[dict, FluxPipeline]:
        """``option task = { name: "…", every: 1h [, offset: d] }``
        followed by the task's pipeline — the InfluxDB v2 standing-query
        form (the v2 counterpart of CREATE CONTINUOUS QUERY)."""
        self.expect("ident", "option")
        self.expect("ident", "task")
        self.expect("op", "=")
        self.expect("punct", "{")
        opts: dict = {}
        while self.peek() and self.peek().text != "}":
            key = self.expect("ident").text
            self.expect("punct", ":")
            opts[key] = self.value()
            if self.peek() and self.peek().text == ",":
                self.next()
        self.expect("punct", "}")
        if opts.get("name", (None,))[0] != "str":
            raise FluxError("task option needs name: \"…\"")
        if opts.get("every", (None,))[0] != "dur":
            raise FluxError("task option needs every: <duration>")
        return opts, self.pipeline()


def _exhausted(p: "_Parser"):
    if p.peek() is not None:
        raise FluxError(f"trailing tokens: {p.peek().text!r}")


def parse_flux(text: str, now_s: float | None = None) -> FluxPipeline:
    p = _Parser(_tokenize(text), now_s=now_s)
    pipe = p.pipeline()
    _exhausted(p)
    return pipe


def parse_flux_task(text: str,
                    now_s: float | None = None) -> tuple[dict,
                                                         FluxPipeline]:
    p = _Parser(_tokenize(text), now_s=now_s)
    out = p.task()
    _exhausted(p)
    return out


def parse_flux_program(text: str,
                       now_s: float | None = None) -> FluxProgram:
    return _Parser(_tokenize(text), now_s=now_s).program()


_META_TAGS = ("_measurement", "domain", "entity_id")


def compile_flux_meta(text: str):
    """Compile a ``schema.X(…)`` meta query to a (spark, sf_dir) ->
    DataFrame callable. Supported: ``measurements(bucket:)``,
    ``tagKeys(bucket:)``, ``fieldKeys(bucket:)``,
    ``tagValues(bucket:, tag:)``,
    ``measurementTagValues(bucket:, measurement:, tag:)`` — each returns
    one ``_value`` string column like Flux does. All are DISTINCT over
    the (tiny after partial-agg) series columns — one exchange whose map
    side collapses to the series cardinality, exactly how InfluxDB
    serves its tag-key index."""
    call = _Parser(_tokenize(text)).meta()
    name = call.name
    _arg(call.args, "bucket", ("str",), required=True)

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        pts = _flux_points(spark, sf_dir)
        if name == "measurements":
            return (pts.select(F.col("_measurement").alias("_value"))
                    .distinct())
        if name == "tagKeys":
            # the point relation's tag keys (Flux includes the hidden
            # _measurement/_field columns here too)
            return spark.createDataFrame(
                [(k,) for k in ("_field", "_measurement", "domain",
                                "entity_id")], "_value string")
        if name == "fieldKeys":
            return pts.select(F.col("_field").alias("_value")).distinct()
        if name == "tagValues":
            tag = _arg(call.args, "tag", ("str",), required=True)
            if tag not in _META_TAGS:
                raise FluxError(f"unknown tag {tag!r}")
            return pts.select(F.col(tag).alias("_value")).distinct()
        if name == "measurementTagValues":
            m = _arg(call.args, "measurement", ("str",), required=True)
            tag = _arg(call.args, "tag", ("str",), required=True)
            if tag not in _META_TAGS:
                raise FluxError(f"unknown tag {tag!r}")
            return (pts.filter(F.col("_measurement") == m)
                    .select(F.col(tag).alias("_value")).distinct())
        raise FluxError(f"unsupported schema function: {name}")

    # argument validation happens at compile time for fail-fast parity
    if name in ("tagValues", "measurementTagValues"):
        tag = _arg(call.args, "tag", ("str",), required=True)
        if tag not in _META_TAGS:
            raise FluxError(f"unknown tag {tag!r}")
    elif name not in ("measurements", "tagKeys", "fieldKeys"):
        raise FluxError(f"unsupported schema function: {name}")
    return run


# ---------------------------------------------------------------- compiler

_SERIES_KEY = ("_measurement", "domain", "entity_id", "_field")

_AGG_FNS = {"mean", "sum", "count", "min", "max", "first", "last"}


def _flux_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The migrated bucket in Flux's column convention."""
    return _numeric_points(spark, sf_dir).select(
        "state_id",
        F.col("measurement").alias("_measurement"),
        "domain", "entity_id",
        F.lit("value").alias("_field"),
        F.col("ts_epoch").alias("_time"),
        F.col("value").alias("_value"),
    )


def _arg(args: dict, key: str, kinds: tuple[str, ...], default=None,
         required: bool = False):
    if key not in args:
        if required:
            raise FluxError(f"missing argument {key}:")
        return default
    kind, val = args[key]
    if kind not in kinds:
        raise FluxError(f"argument {key}: expects {kinds}, got {kind}")
    return val


class _State:
    def __init__(self, df: DataFrame, now_s: float | None = None):
        self.df = df
        self.gkey: tuple[str, ...] = _SERIES_KEY
        self.sort_cols: tuple[str, ...] = ("_time",)
        self.sort_desc = False
        self.range: tuple[float | None, float | None] | None = None
        self.now_s = now_s
        # set by aggregateWindow(createEmpty: true): lets an IMMEDIATELY
        # following fill(usePrevious: true) rebuild the grid with the
        # LOCF fused into the bucket window instead of paying a second
        # Sort+Window over the exploded grid (r15, guide §2.4 — the
        # influx_downsample lagged-mean surgery applied to the Flux
        # compiler). {"df": the stage's output (identity-checked so any
        # intervening stage disables the fusion), "gcols": the group key
        # at expansion time, "rebuild": () -> fused DataFrame}
        self.aggwin_fill: dict | None = None

    def series_window(self) -> Window:
        """Ascending (time, state_id) window — for stages whose semantics
        are pinned to event order regardless of a user sort."""
        if "_time" not in self.df.columns:
            raise FluxError(
                "this stage needs the _time column (apply it before "
                "aggregates that drop _time)")
        part = [c for c in self.gkey if c in self.df.columns]
        w = Window.partitionBy(*part) if part else Window.partitionBy(
            F.lit(1))
        order = [F.col("_time").asc()]
        if "state_id" in self.df.columns:
            order.append(F.col("state_id").asc())
        return w.orderBy(*order)

    def gcols(self) -> list[str]:
        return [c for c in self.gkey if c in self.df.columns]


def _stage_range(st: _State, args: dict):
    start = args.get("start")
    stop = args.get("stop")

    def _as_epoch(v, what):
        if v is None:
            return None
        kind, val = v
        if kind == "num":
            return float(val)
        if kind == "str":
            return _rfc3339_epoch(val)
        if kind == "dur":
            # Flux relative bound (-30d): resolved against the PINNED
            # now — queries with relative ranges refuse to compile
            # without one, keeping every plan deterministic
            if st.now_s is None:
                raise FluxError(
                    f"range {what}: relative duration needs a pinned "
                    "now (compile_flux(text, now_s=…))")
            return float(st.now_s) + float(val)
        raise FluxError(
            f"range {what}: must be epoch seconds, RFC3339 or a "
            "relative duration")

    lo = _as_epoch(start, "start")
    # Flux defaults stop to now(); honor that when a now is pinned,
    # stay unbounded otherwise (the batch-registry convention)
    hi = _as_epoch(stop, "stop")
    if hi is None and st.now_s is not None:
        hi = float(st.now_s)
    if lo is None:
        raise FluxError("range() requires start:")
    cond = F.col("_time") >= F.lit(lo)
    if hi is not None:
        cond = cond & (F.col("_time") < F.lit(hi))
    st.df = st.df.filter(cond)
    st.range = (lo, hi)


def _pred_col(node) -> F.Column:
    if isinstance(node, FluxBool):
        cols = [_pred_col(p) for p in node.parts]
        out = cols[0]
        for c in cols[1:]:
            out = (out & c) if node.op == "and" else (out | c)
        return out
    assert isinstance(node, FluxCmp)
    c = F.col(node.lhs)
    if node.op == "==":
        return c == F.lit(node.rhs)
    if node.op == "!=":
        return c != F.lit(node.rhs)
    if node.op == "=~":
        return c.rlike(node.rhs)
    if node.op == "!~":
        return ~c.rlike(node.rhs)
    if node.op == "<":
        return c < F.lit(node.rhs)
    if node.op == "<=":
        return c <= F.lit(node.rhs)
    if node.op == ">":
        return c > F.lit(node.rhs)
    if node.op == ">=":
        return c >= F.lit(node.rhs)
    raise FluxError(f"unsupported operator {node.op!r}")


def _pred_columns(node) -> set:
    if isinstance(node, FluxBool):
        out: set = set()
        for p in node.parts:
            out |= _pred_columns(p)
        return out
    return {node.lhs}


def _stage_filter(st: _State, args: dict):
    body = _arg(args, "fn", ("lambda",), required=True)
    if isinstance(body, (FluxMap, FluxMap2)):
        raise FluxError("filter fn must be a predicate")
    missing = _pred_columns(body) - set(st.df.columns)
    if missing:
        raise FluxError(
            f"filter references columns not in the stream: "
            f"{sorted(missing)}")
    st.df = st.df.filter(_pred_col(body))


def _stage_group(st: _State, args: dict):
    mode = _arg(args, "mode", ("str",), default="by")
    if mode != "by":
        raise FluxError("group() supports mode: \"by\" only")
    cols = _arg(args, "columns", ("array",), default=[])
    for c in cols:
        if c not in st.df.columns:
            raise FluxError(f"group column {c!r} not in stream")
    st.gkey = tuple(cols)


_MICRO = 1_000_000

# plan-equality escape hatch: tests flip this to compile through the
# reference DataFrame build and pin sameResult against the SQL text
_AGGWIN_SQL_ENABLED = True

# r15 escape hatch: tests flip this to compile fill(usePrevious) after
# aggregateWindow(createEmpty) through the OLD grid-window LOCF and pin
# the fused shape row-identical against it
_FILL_FUSE_ENABLED = True


def _agg_exprs(fn: str, order_rank: str, order_rank_desc: str):
    """Aggregate expression for one bucket/table. ``order_rank`` columns
    are precomputed row_numbers on the (time, state_id) order."""
    micro = F.round(F.col("_value") * _MICRO).cast("long")
    if fn == "mean":
        return (F.sum(micro) / F.lit(float(_MICRO))) / F.count(F.lit(1))
    if fn == "sum":
        return F.sum(micro) / F.lit(float(_MICRO))
    if fn == "count":
        return F.count(F.lit(1))
    if fn == "min":
        return F.min("_value")
    if fn == "max":
        return F.max("_value")
    if fn == "first":
        return F.max(F.when(F.col(order_rank) == 1, F.col("_value")))
    if fn == "last":
        return F.max(F.when(F.col(order_rank_desc) == 1, F.col("_value")))
    raise FluxError(f"unsupported aggregate fn: {fn}")


def _aggwin_sql(st: _State, fn: str, every: int, create_empty: bool,
                fill_prev: bool = False) -> DataFrame | None:
    """One-parse SQL-text build of the plain-aggregate aggregateWindow
    stage — the `_neardup_pairs_sql` pattern applied to the r11
    plan-build profile's remaining ≥0.3 s fresh-build headline
    (`flux_window_fill_prev`: 0.28 s of its 0.37 s construction was
    this stage's ~27 chained Column/select py4j round-trips). Mirrors
    `_stage_aggregate_window`'s DataFrame build expression-for-
    expression (same literals, same alias names, same nesting) so the
    optimized plans are `sameResult`; the plan-equality test pins that
    plus exchange counts and values. Returns None when the stage shape
    is outside the fast path (selector fns, empty group key) — the
    DataFrame build below stays the reference implementation."""
    if not _AGGWIN_SQL_ENABLED or fn in ("first", "last"):
        return None
    gcols = st.gcols()
    if not gcols:
        return None
    g = ", ".join(gcols)
    agg = {
        "mean": f"(sum(CAST(round(_value * {_MICRO}, 0) AS BIGINT)) "
                f"/ {float(_MICRO)!r}D) / count(1)",
        "sum": f"sum(CAST(round(_value * {_MICRO}, 0) AS BIGINT)) "
               f"/ {float(_MICRO)!r}D",
        "count": "count(1)",
        "min": "min(_value)",
        "max": "max(_value)",
    }[fn]
    buckets = f"""
      SELECT {g}, _wstop, {agg} AS _value
      FROM (SELECT {g}, _value,
                   (CAST(floor(_time / {every}) AS BIGINT) + 1) * {every}
                     AS _wstop
            FROM {{src}})
      GROUP BY {g}, _wstop"""
    if create_empty:
        if st.range is None or st.range[1] is None:
            raise FluxError(
                "createEmpty: true needs an explicit range(start:, stop:)")
        lo, hi = st.range
        if lo % every or hi % every:
            raise FluxError(
                "createEmpty: true needs range bounds aligned to every: "
                "(no truncated window subset)")
        empty_val = "0" if fn == "count" else "NULL"
        head = (f"sequence(coalesce(_prev + {every}, "
                f"CAST({int(lo + every)} AS BIGINT)), _wstop, "
                f"CAST({every} AS BIGINT))")
        tail = (f"CASE WHEN _next IS NULL AND _wstop < "
                f"CAST({int(hi)} AS BIGINT) "
                f"THEN sequence(_wstop + {every}, "
                f"CAST({int(hi)} AS BIGINT), CAST({every} AS BIGINT)) "
                f"ELSE CAST(array() AS ARRAY<BIGINT>) END")
        # r15 (guide §2.4, the influx_downsample lagged-mean surgery):
        # with a following fill(usePrevious: true) the LOCF value of
        # every grid row is derivable on THIS bucket window — a head gap
        # row lies strictly between its generating bucket and the
        # predecessor, so it carries the last non-null bucket value
        # STRICTLY BEFORE the generator (_fprev); the real row and the
        # trailing rows carry coalesce(own, _fprev). The second
        # Sort+Window over the ~80x-larger exploded grid disappears.
        fprev = (f",\n                 last(_value, true) OVER "
                 f"(PARTITION BY {g} ORDER BY _wstop ROWS BETWEEN "
                 f"UNBOUNDED PRECEDING AND 1 PRECEDING) AS _fprev"
                 if fill_prev else "")
        val = (("CASE WHEN (_grid >= _wstop) THEN coalesce(_value, _fprev) "
                "ELSE _fprev END")
               if fill_prev else
               f"CASE WHEN (_grid = _wstop) THEN _value ELSE {empty_val} "
               f"END")
        fcol = ", _fprev" if fill_prev else ""
        buckets = f"""
      SELECT {g}, _grid AS _wstop,
             {val}
               AS _value
      FROM (
        SELECT {g}, _wstop, _value{fcol},
               explode(concat({head}, {tail})) AS _grid
        FROM (
          SELECT {g}, _wstop, _value,
                 lag(_wstop) OVER (PARTITION BY {g} ORDER BY _wstop)
                   AS _prev,
                 lead(_wstop) OVER (PARTITION BY {g} ORDER BY _wstop)
                   AS _next{fprev}
          FROM ({buckets})))"""
    text = f"""
SELECT {g}, CAST(_wstop AS DOUBLE) AS _time, _value
FROM ({buckets})"""
    return st.df.sparkSession.sql(text, src=st.df)


def _stage_aggregate_window(st: _State, args: dict):
    every = _arg(args, "every", ("dur",), required=True)
    fn = _arg(args, "fn", ("ident",), required=True)
    create_empty = _arg(args, "createEmpty", ("bool",), default=False)
    if fn not in _AGG_FNS:
        raise FluxError(f"aggregateWindow fn must be one of {_AGG_FNS}")
    every = int(every)
    if every <= 0:
        raise FluxError("every: must be a positive duration")

    df = st.df
    if "_time" in df.columns:
        fast = _aggwin_sql(st, fn, every, create_empty)
        if fast is not None:
            if create_empty:
                src, gkey, rng, now = st.df, st.gkey, st.range, st.now_s

                def _rebuild(src=src, gkey=gkey, rng=rng, now=now):
                    if fn == "count":
                        return None     # grid rows are 0, never null:
                    s2 = _State(src, now_s=now)  # LOCF is a no-op
                    s2.gkey, s2.range = gkey, rng
                    return _aggwin_sql(s2, fn, every, True,
                                       fill_prev=True)

                st.aggwin_fill = {
                    "df": fast,
                    "gcols": [c for c in st.gkey if c in fast.columns],
                    "rebuild": _rebuild,
                }
            st.df = fast
            st.sort_cols, st.sort_desc = ("_time",), False
            return
    if "_time" not in df.columns:
        raise FluxError("aggregateWindow needs the _time column")
    gcols = st.gcols()
    stop = (F.floor(F.col("_time") / every).cast("long") + 1) * every
    if fn in ("first", "last"):
        # selector aggregates need the in-bucket event order; the rank
        # windows share the (series, bucket) exchange the agg uses.
        # Plain aggregates skip this block — an unused Window operator
        # is NOT pruned by Catalyst and would cost a real exchange.
        wb_part = [*gcols, "_wstop"]
        asc = [F.col("_time").asc()]
        desc = [F.col("_time").desc()]
        if "state_id" in df.columns:
            asc.append(F.col("state_id").asc())
            desc.append(F.col("state_id").desc())
        wb = Window.partitionBy(*wb_part).orderBy(*asc)
        wbd = Window.partitionBy(*wb_part).orderBy(*desc)
        marked = df.withColumn("_wstop", stop).select(
            *gcols, "_value", "_wstop",
            F.row_number().over(wb).alias("_rn_a"),
            F.row_number().over(wbd).alias("_rn_d"),
        )
    else:
        marked = df.withColumn("_wstop", stop).select(
            *gcols, "_value", "_wstop")
    buckets = marked.groupBy(*gcols, "_wstop").agg(
        _agg_exprs(fn, "_rn_a", "_rn_d").alias("_value"))

    if create_empty:
        # Empty-window expansion WITHOUT a grid join or a second input
        # scan (the q_influx_downsample lag+sequence pattern): each
        # bucket row emits the grid slots from its predecessor (or the
        # range start) up to itself, and the last bucket of each series
        # also emits the tail out to the range stop — one explode on the
        # DOWNSAMPLED relation, riding the same series window. Two
        # exchanges total; no distinct, no SMJ.
        if st.range is None or st.range[1] is None:
            raise FluxError(
                "createEmpty: true needs an explicit range(start:, stop:)")
        lo, hi = st.range
        if lo % every or hi % every:
            raise FluxError(
                "createEmpty: true needs range bounds aligned to every: "
                "(no truncated window subset)")
        part = gcols if gcols else [F.lit(1)]
        ws = Window.partitionBy(*part).orderBy("_wstop")
        lit_l = lambda v: F.lit(int(v)).cast("long")  # noqa: E731
        head = F.sequence(
            F.coalesce(F.col("_prev") + every, lit_l(lo + every)),
            F.col("_wstop"), lit_l(every))
        tail = F.when(
            F.col("_next").isNull() & (F.col("_wstop") < lit_l(hi)),
            F.sequence(F.col("_wstop") + every, lit_l(hi), lit_l(every)),
        ).otherwise(F.array().cast("array<long>"))
        bucket_rel = buckets
        lagged = bucket_rel.select(
            *gcols, "_wstop", "_value",
            F.lag("_wstop").over(ws).alias("_prev"),
            F.lead("_wstop").over(ws).alias("_next"),
        )
        expanded = lagged.select(
            *gcols, "_wstop", "_value",
            F.explode(F.concat(head, tail)).alias("_grid"),
        )
        is_real = F.col("_grid") == F.col("_wstop")
        empty_val = F.lit(0) if fn == "count" else F.lit(None)
        buckets = expanded.select(
            *gcols, F.col("_grid").alias("_wstop"),
            F.when(is_real, F.col("_value")).otherwise(empty_val)
             .alias("_value"),
        )

    out = buckets.select(
        *gcols, F.col("_wstop").cast("double").alias("_time"), "_value")
    if create_empty:
        # the DataFrame-reference twin of the SQL fast path's fused
        # rebuild (mirrored expression-for-expression so the plan-
        # equality pin holds on the fused shape too); also covers the
        # selector fns the SQL path declines
        def _rebuild_df(bucket_rel=bucket_rel, gcols=tuple(gcols), ws=ws,
                        head=head, tail=tail):
            if fn == "count":
                return None             # grid rows are 0, never null
            lagged2 = bucket_rel.select(
                *gcols, "_wstop", "_value",
                F.lag("_wstop").over(ws).alias("_prev"),
                F.lead("_wstop").over(ws).alias("_next"),
                F.last("_value", ignorenulls=True).over(
                    ws.rowsBetween(Window.unboundedPreceding, -1))
                 .alias("_fprev"),
            )
            expanded2 = lagged2.select(
                *gcols, "_wstop", "_value", "_fprev",
                F.explode(F.concat(head, tail)).alias("_grid"),
            )
            grid2 = expanded2.select(
                *gcols, F.col("_grid").alias("_wstop"),
                F.when(F.col("_grid") >= F.col("_wstop"),
                       F.coalesce(F.col("_value"), F.col("_fprev")))
                 .otherwise(F.col("_fprev")).alias("_value"),
            )
            return grid2.select(
                *gcols, F.col("_wstop").cast("double").alias("_time"),
                "_value")

        st.aggwin_fill = {"df": out, "gcols": list(gcols),
                          "rebuild": _rebuild_df}
    st.df = out
    st.sort_cols, st.sort_desc = ("_time",), False


def _stage_plain_agg(st: _State, fn: str, args: dict):
    df = st.df
    gcols = st.gcols()
    gb = df.groupBy(*gcols) if gcols else df.groupBy()

    if fn in ("first", "last", "min", "max"):
        # selectors: keep the selected row's _time (Flux keeps the row)
        if "_time" not in df.columns:
            raise FluxError(f"{fn}() selects a row and needs _time")
        tie = ([F.col("state_id").asc()] if "state_id" in df.columns
               else [])
        tie_d = ([F.col("state_id").desc()] if "state_id" in df.columns
                 else [])
        if fn == "first":
            order = [F.col("_time").asc(), *tie]
        elif fn == "last":
            order = [F.col("_time").desc(), *tie_d]
        elif fn == "min":
            order = [F.col("_value").asc(), F.col("_time").asc(), *tie]
        else:
            order = [F.col("_value").desc(), F.col("_time").asc(), *tie]
        part = gcols if gcols else [F.lit(1)]
        w = Window.partitionBy(*part).orderBy(*order)
        st.df = (df.withColumn("_rn", F.row_number().over(w))
                 .filter(F.col("_rn") == 1)
                 .select(*gcols, "_time", "_value"))
        return

    micro = F.round(F.col("_value") * _MICRO).cast("long")
    milli = F.round(F.col("_value") * 1e3).cast("long")
    if fn == "mean":
        expr = (F.sum(micro) / F.lit(float(_MICRO))) / F.count(F.lit(1))
    elif fn == "sum":
        expr = F.sum(micro) / F.lit(float(_MICRO))
    elif fn == "count":
        expr = F.count(F.lit(1))
    elif fn == "spread":
        expr = F.max("_value") - F.min("_value")
    elif fn == "stddev":
        n = F.count(F.lit(1))
        expr = F.when(
            n > 1,
            F.sqrt(
                (n * F.sum(F.col("_m") * F.col("_m"))
                 - F.sum("_m") * F.sum("_m")).cast("double")
                / (n * (n - 1)).cast("double")
            ) / F.lit(1e3),
        )
        df = df.withColumn("_m", milli)
        gb = df.groupBy(*gcols) if gcols else df.groupBy()
    elif fn == "median":
        part = gcols if gcols else [F.lit(1)]
        vorder = ["_value"] + (["state_id"] if "state_id" in df.columns
                               else [])
        wv = Window.partitionBy(*part).orderBy(*vorder)
        nw = F.count(F.lit(1)).over(Window.partitionBy(*part))
        ranked = df.select(
            *gcols, "_value",
            F.row_number().over(wv).alias("_rn"),
            F.floor((nw + 1) / 2).cast("long").alias("_lo"),
            (F.floor(nw / 2) + 1).cast("long").alias("_hi"),
        )
        gb2 = ranked.groupBy(*gcols) if gcols else ranked.groupBy()
        st.df = gb2.agg(
            ((F.max(F.when(F.col("_rn") == F.col("_lo"), F.col("_value")))
              + F.max(F.when(F.col("_rn") == F.col("_hi"),
                             F.col("_value"))))
             / F.lit(2.0)).alias("_value"))
        return
    else:
        raise FluxError(f"unsupported aggregate: {fn}")
    st.df = gb.agg(expr.alias("_value"))


def _stage_quantile(st: _State, args: dict):
    q = _arg(args, "q", ("num",), required=True)
    method = _arg(args, "method", ("str",), default="exact_selected")
    if method != "exact_selected":
        raise FluxError("quantile supports method: \"exact_selected\" only")
    if not 0 < q <= 1:
        raise FluxError("q: must be in (0, 1]")
    gcols = st.gcols()
    part = gcols if gcols else [F.lit(1)]
    vorder = ["_value"] + (["state_id"] if "state_id" in st.df.columns
                           else [])
    wv = Window.partitionBy(*part).orderBy(*vorder)
    n = F.count(F.lit(1)).over(Window.partitionBy(*part))
    ranked = st.df.select(
        *gcols, "_value",
        F.row_number().over(wv).alias("_rn"),
        F.greatest(F.lit(1), F.ceil(n * F.lit(q))).alias("_target"),
    )
    st.df = (ranked.filter(F.col("_rn") == F.col("_target"))
             .select(*gcols, "_value"))


def _stage_derivative(st: _State, args: dict):
    unit = _arg(args, "unit", ("dur",), default=1.0)
    nonneg = _arg(args, "nonNegative", ("bool",), default=False)
    w = st.series_window()
    dv = F.col("_value") - F.lag("_value").over(w)
    dt = F.col("_time") - F.lag("_time").over(w)
    rate = F.when(dt != 0, dv / dt * F.lit(float(unit)))
    if nonneg:
        rate = F.when(rate >= 0, rate)
    st.df = (st.df.withColumn("_d", rate)
             .withColumn("_dt", dt)
             .filter(F.col("_dt").isNotNull())
             .drop("_value", "_dt")
             .withColumnRenamed("_d", "_value"))


def _stage_difference(st: _State, args: dict):
    w = st.series_window()
    d = F.col("_value") - F.lag("_value").over(w)
    st.df = (st.df.withColumn("_d", d)
             .filter(F.col("_d").isNotNull())
             .drop("_value")
             .withColumnRenamed("_d", "_value"))


def _stage_cumulative_sum(st: _State, args: dict):
    w = st.series_window().rowsBetween(Window.unboundedPreceding, 0)
    micro = F.round(F.col("_value") * _MICRO).cast("long")
    st.df = st.df.withColumn(
        "_value", F.sum(micro).over(w) / F.lit(float(_MICRO)))


def _stage_increase(st: _State, args: dict):
    """Flux ``increase()``: running total of per-point increases with the
    counter-reset rule — a decrease contributes the NEW value (counter
    restarted from zero), not 0. Row 1 of each table emits 0. Micro-
    quantized BIGINT running sum for cross-engine exactness."""
    w = st.series_window()
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    micro = F.round(F.col("_value") * _MICRO).cast("long")
    prev = F.lag(micro).over(w)
    inc = F.when(prev.isNull(), F.lit(0)).otherwise(
        F.when(micro - prev >= 0, micro - prev).otherwise(micro))
    st.df = st.df.withColumn(
        "_value", F.sum(inc).over(wrun) / F.lit(float(_MICRO)))


def _stage_moving_average(st: _State, args: dict):
    n = _arg(args, "n", ("num",), required=True)
    n = int(n)
    if not 2 <= n <= 8:
        raise FluxError("movingAverage supports n in [2, 8]")
    w = st.series_window()
    # fixed left-to-right association so both engines produce
    # bit-identical doubles (see q_influx_moving_average)
    acc = F.lag("_value", n - 1).over(w)
    for k in range(n - 2, 0, -1):
        acc = acc + F.lag("_value", k).over(w)
    acc = (acc + F.col("_value")) / F.lit(float(n))
    st.df = (st.df.withColumn("_ma", acc)
             .filter(F.col("_ma").isNotNull())
             .drop("_value")
             .withColumnRenamed("_ma", "_value"))


def _stage_elapsed(st: _State, args: dict):
    unit = _arg(args, "unit", ("dur",), default=1.0)
    w = st.series_window()
    dt = (F.col("_time") - F.lag("_time").over(w)) / F.lit(float(unit))
    st.df = (st.df.withColumn("elapsed", dt)
             .filter(F.col("elapsed").isNotNull()))


def _stage_time_shift(st: _State, args: dict):
    d = _arg(args, "duration", ("dur", "num"), required=True)
    if "_time" not in st.df.columns:
        raise FluxError("timeShift needs the _time column")
    st.df = st.df.withColumn("_time", F.col("_time") + F.lit(float(d)))


def _stage_sort(st: _State, args: dict):
    cols = _arg(args, "columns", ("array",), default=["_time"])
    for c in cols:
        if c not in st.df.columns:
            raise FluxError(f"sort column {c!r} not in stream")
    st.sort_cols = tuple(cols)
    st.sort_desc = bool(_arg(args, "desc", ("bool",), default=False))


def _stage_limit(st: _State, args: dict, tail: bool = False):
    n = _arg(args, "n", ("num",), required=True)
    n = int(n)
    if n <= 0:
        raise FluxError("limit/tail n: must be positive")
    part = [c for c in st.gkey if c in st.df.columns]
    wp = Window.partitionBy(*part) if part else Window.partitionBy(F.lit(1))
    # tail = last n under the current sort = first n under its reverse
    desc = st.sort_desc != tail
    order = [F.col(c).desc() if desc else F.col(c).asc()
             for c in st.sort_cols if c in st.df.columns]
    if "state_id" in st.df.columns:
        order.append(F.col("state_id").desc() if desc
                     else F.col("state_id").asc())
    if not order:
        raise FluxError(
            "limit/tail needs an ordered column in the stream — keep "
            "_time or add sort(columns: […]) first")
    st.df = (st.df.withColumn(
                 "_rn_lim", F.row_number().over(wp.orderBy(*order)))
             .filter(F.col("_rn_lim") <= n)
             .drop("_rn_lim"))


def _stage_fill(st: _State, args: dict):
    if "value" in args:
        v = _arg(args, "value", ("num",))
        st.df = st.df.withColumn(
            "_value", F.coalesce(F.col("_value"), F.lit(float(v))))
        return
    if _arg(args, "usePrevious", ("bool",), default=False):
        # r15 fusion (guide §2.4): when this fill directly follows an
        # aggregateWindow(createEmpty: true) — same df object, same
        # group key — the LOCF is computable on the BUCKET window the
        # expansion already pays (one more window expression, same
        # spec), so the Sort+Window over the exploded grid is dropped.
        # Row-identical to the generic LOCF below: grid slots are
        # unique per series, every head gap slot lies strictly between
        # its generating bucket and the predecessor, so its
        # carried-forward value is the last non-null bucket value
        # strictly before the generator; real/tail slots carry
        # coalesce(own, that). Pinned by
        # tests/test_flux_text.py::test_fill_prev_fusion_row_identical.
        info = st.aggwin_fill
        if (_FILL_FUSE_ENABLED and info is not None
                and info["df"] is st.df
                and [c for c in st.gkey if c in st.df.columns]
                == list(info["gcols"])):
            fused = info["rebuild"]()
            if fused is not None:
                st.df = fused
            return
        w = st.series_window().rowsBetween(Window.unboundedPreceding, 0)
        st.df = st.df.withColumn(
            "_value", F.last("_value", ignorenulls=True).over(w))
        return
    raise FluxError("fill() needs value: or usePrevious: true")


def _stage_histogram(st: _State, args: dict):
    """Flux ``histogram(bins: […])``: per table, CUMULATIVE counts of
    ``_value ≤ le`` for each bin upper bound — the Prometheus-style
    le-bin shape Grafana heatmaps/SLO panels consume. Values above the
    top bin are counted in no bin, but their table still emits its
    zero/partial bins (Flux's behavior with finite bins); counts emit
    as doubles (Flux's float counts). Plan: one when-chain bin
    assignment (codegen, no explode of rows×bins; overflow rows go to a
    virtual bin so all-overflow tables still surface), a (series, bin)
    partial agg, then the lag+sequence gap expansion and the cumulative
    sum ride ONE series window — the q_influx_downsample shape, no
    grid join, no second input scan."""
    bins = _arg(args, "bins", ("numarray",), required=True)
    if len(bins) < 2 or len(bins) > 64:
        raise FluxError("histogram needs 2..64 bins")
    if sorted(bins) != list(bins):
        raise FluxError("histogram bins must be ascending")
    gcols = st.gcols()
    df = st.df
    nb = len(bins)
    # first bin whose upper bound covers the value; nb = overflow
    expr = F.lit(nb)
    for i, b in reversed(list(enumerate(bins))):
        expr = F.when(F.col("_value") <= F.lit(float(b)), F.lit(i)) \
            .otherwise(expr)
    counts = (df.withColumn("_bin", expr)
              .groupBy(*gcols, "_bin")
              .agg(F.count(F.lit(1)).alias("_c")))
    part = gcols if gcols else [F.lit(1)]
    ws = Window.partitionBy(*part).orderBy("_bin")
    lagged = counts.select(
        *gcols, "_bin", "_c",
        F.lag("_bin").over(ws).alias("_prev"),
        F.lead("_bin").over(ws).alias("_next"),
    )
    head_lo = F.coalesce(F.col("_prev") + 1, F.lit(0))
    head_hi = F.least(F.col("_bin"), F.lit(nb - 1))
    head = F.when(head_lo <= head_hi, F.sequence(head_lo, head_hi)) \
        .otherwise(F.array().cast("array<int>"))
    tail = F.when(
        F.col("_next").isNull() & (F.col("_bin") < nb - 1),
        F.sequence(F.col("_bin") + 1, F.lit(nb - 1)),
    ).otherwise(F.array().cast("array<int>"))
    expanded = lagged.select(
        *gcols, "_bin", "_c",
        F.explode(F.concat(head, tail)).alias("_grid"),
    )
    wcum = (Window.partitionBy(*part).orderBy("_grid")
            .rowsBetween(Window.unboundedPreceding, 0))
    le_expr = None
    for i, b in enumerate(bins):
        le_expr = F.when(F.col("_grid") == i, F.lit(float(b))) \
            if le_expr is None else \
            le_expr.when(F.col("_grid") == i, F.lit(float(b)))
    real_c = F.when(F.col("_grid") == F.col("_bin"), F.col("_c")) \
        .otherwise(F.lit(0))
    st.df = expanded.select(
        *gcols,
        le_expr.alias("le"),
        F.sum(real_c).over(wcum).cast("double").alias("_value"),
    )
    st.sort_cols, st.sort_desc = ("le",), False


def _stage_histogram_quantile(st: _State, args: dict):
    """Flux ``histogramQuantile(quantile: q)``: linear interpolation
    inside the bracket bin of a cumulative le-histogram (Prometheus's
    formula, minValue = 0 for the first bin). The bracket row is the
    unique bin with prev_cum < q·total ≤ cum; the interpolation is one
    row-local double expression with pinned association."""
    q = _arg(args, "quantile", ("num",), required=True)
    if not 0 < q <= 1:
        raise FluxError("quantile: must be in (0, 1]")
    df = st.df
    if "le" not in df.columns:
        raise FluxError("histogramQuantile needs histogram() output (le)")
    gcols = [c for c in st.gcols() if c != "le"]
    part = gcols if gcols else [F.lit(1)]
    w = Window.partitionBy(*part).orderBy("le")
    wall = Window.partitionBy(*part)
    marked = df.select(
        *gcols, "le", "_value",
        F.coalesce(F.lag("_value").over(w), F.lit(0.0)).alias("_pcum"),
        F.coalesce(F.lag("le").over(w), F.lit(0.0)).alias("_ple"),
        (F.max("_value").over(wall) * F.lit(float(q))).alias("_rank"),
    )
    interp = (
        F.col("_ple")
        + (F.col("le") - F.col("_ple"))
        * ((F.col("_rank") - F.col("_pcum"))
           / (F.col("_value") - F.col("_pcum")))
    )
    st.df = (marked.filter((F.col("_pcum") < F.col("_rank"))
                           & (F.col("_rank") <= F.col("_value")))
             .select(*gcols, interp.alias("_value")))


def _stage_map(st: _State, args: dict):
    body = _arg(args, "fn", ("lambda",), required=True)
    if isinstance(body, FluxMap):
        v, k = F.col("_value"), F.lit(body.const)
        a, b = (k, v) if body.const_left else (v, k)
    elif isinstance(body, FluxMap2):
        for kind, name in (body.lhs, body.rhs):
            if kind == "col" and name not in st.df.columns:
                raise FluxError(f"map references unknown column "
                                f"r.{name}")
        mk = (lambda o: F.col(o[1]) if o[0] == "col"
              else F.lit(float(o[1])))
        a, b = mk(body.lhs), mk(body.rhs)
    else:
        raise FluxError("map fn must be ({ r with _value: … })")
    expr = {"*": a * b, "/": a / b, "+": a + b, "-": a - b}[body.op]
    st.df = st.df.withColumn("_value", expr)


def _stage_highest(st: _State, args: dict, fn: str):
    """Flux ``highestAverage(n:)`` / ``highestMax(n:)`` — the Grafana
    "Top N series" panel: reduce each table to its average/max, then
    keep the N highest tables. One series-keyed partial agg (tiny
    output: one row per series) + a top-N rank over that SMALL relation
    (a single-partition window over |series| rows, not the input —
    bounded exactly like InfluxQL SLIMIT). Ties break on the series key
    for cross-engine determinism."""
    n = int(_arg(args, "n", ("num",), required=True))
    if n <= 0:
        raise FluxError("n: must be positive")
    gcols = st.gcols()
    if not gcols:
        raise FluxError(f"{fn} needs grouped tables (don't group() "
                        "to a single table first)")
    micro = F.round(F.col("_value") * _MICRO).cast("long")
    expr = ((F.sum(micro) / F.lit(float(_MICRO))) / F.count(F.lit(1))
            if fn == "highestAverage" else F.max("_value"))
    per = st.df.groupBy(*gcols).agg(expr.alias("_value"))
    w = Window.partitionBy(F.lit(1)).orderBy(
        F.desc("_value"), *[F.col(c).asc() for c in gcols])
    st.df = (per.withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") <= n).drop("_rn"))
    st.sort_cols, st.sort_desc = ("_value",), True


def _stage_state_track(st: _State, args: dict, count: bool):
    """Flux ``stateDuration(fn:, unit:)`` / ``stateCount(fn:)`` — run
    tracking over consecutive predicate-true rows (the binary-sensor
    "how long has it been on" dashboard stage). Gaps-and-islands on the
    ONE series window: a running count of predicate-false rows labels
    each run; duration = _time − the run's first true _time, count =
    the 1-based ordinal; false rows emit −1 (Flux's sentinel)."""
    body = _arg(args, "fn", ("lambda",), required=True)
    if isinstance(body, (FluxMap, FluxMap2)):
        raise FluxError("stateDuration/stateCount fn must be a predicate")
    unit = float(_arg(args, "unit", ("dur",), default=1.0))
    pred = _pred_col(body)
    w = st.series_window()
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    df = st.df.withColumn("_ok", pred).withColumn(
        "_grp", F.sum(F.when(F.col("_ok"), 0).otherwise(1)).over(wrun))
    part = [c for c in st.gkey if c in df.columns] or [F.lit(1)]
    wg = Window.partitionBy(*part, "_grp")
    if count:
        wgo = wg.orderBy(*([F.col("_time").asc()]
                           + ([F.col("state_id").asc()]
                              if "state_id" in df.columns else [])))
        run_frame = wgo.rowsBetween(Window.unboundedPreceding, 0)
        val = F.when(
            F.col("_ok"),
            F.sum(F.when(F.col("_ok"), 1).otherwise(0)).over(run_frame),
        ).otherwise(F.lit(-1)).cast("long")
        name = "stateCount"
    else:
        first_true = F.min(F.when(F.col("_ok"), F.col("_time"))).over(wg)
        val = F.when(
            F.col("_ok"),
            (F.col("_time") - first_true) / F.lit(unit),
        ).otherwise(F.lit(-1.0))
        name = "stateDuration"
    st.df = df.withColumn(name, val).drop("_ok", "_grp")


def _stage_pivot(st: _State, args: dict):
    """``pivot(rowKey:["_time"], columnKey:["_field"],
    valueColumn:"_value")`` — the fieldsAsCols idiom every Flux
    dashboard uses to get value-named columns. Supported subset:
    columnKey must be ["_field"] (the point relation's one STATIC field
    dimension — a data-dependent column set would need a driver-side
    distinct scan, the anti-pattern this layer avoids); the stage
    renames _value to the field name and drops _field. Zero exchanges."""
    row_key = _arg(args, "rowKey", ("array",), required=True)
    col_key = _arg(args, "columnKey", ("array",), required=True)
    val_col = _arg(args, "valueColumn", ("str",), required=True)
    if col_key != ["_field"]:
        raise FluxError("pivot supports columnKey: [\"_field\"] only")
    if val_col != "_value":
        raise FluxError("pivot supports valueColumn: \"_value\" only")
    for c in row_key:
        if c not in st.df.columns:
            raise FluxError(f"pivot rowKey column {c!r} not in stream")
    if "_field" not in st.df.columns:
        raise FluxError("pivot needs the _field column")
    # one field ('value') per series: the pivot is a rename + drop
    st.df = (st.df.withColumnRenamed("_value", "value").drop("_field"))
    st.gkey = tuple(c for c in st.gkey if c != "_field")
    st.sort_cols = tuple(c for c in st.sort_cols if c != "_field")


def _stage_keep(st: _State, args: dict, drop: bool = False):
    cols = _arg(args, "columns", ("array",), required=True)
    if drop:
        keep = [c for c in st.df.columns if c not in cols]
    else:
        missing = [c for c in cols if c not in st.df.columns]
        if missing:
            raise FluxError(f"keep columns not in stream: {missing}")
        keep = [c for c in st.df.columns if c in cols]
    st.df = st.df.select(*keep)
    st.gkey = tuple(c for c in st.gkey if c in keep)
    st.sort_cols = tuple(c for c in st.sort_cols if c in keep) or ()


def _apply_stages(st: _State, stages) -> None:
    for stage in stages:
        nm, a = stage.name, stage.args
        if nm == "range":
            _stage_range(st, a)
        elif nm == "filter":
            _stage_filter(st, a)
        elif nm == "group":
            _stage_group(st, a)
        elif nm == "aggregateWindow":
            _stage_aggregate_window(st, a)
        elif nm in ("mean", "sum", "count", "min", "max", "first",
                    "last", "spread", "stddev", "median"):
            if a:
                raise FluxError(f"{nm}() takes no arguments here")
            _stage_plain_agg(st, nm, a)
        elif nm == "quantile":
            _stage_quantile(st, a)
        elif nm == "histogram":
            _stage_histogram(st, a)
        elif nm == "histogramQuantile":
            _stage_histogram_quantile(st, a)
        elif nm == "derivative":
            _stage_derivative(st, a)
        elif nm == "difference":
            _stage_difference(st, a)
        elif nm == "cumulativeSum":
            _stage_cumulative_sum(st, a)
        elif nm == "increase":
            _stage_increase(st, a)
        elif nm == "movingAverage":
            _stage_moving_average(st, a)
        elif nm == "elapsed":
            _stage_elapsed(st, a)
        elif nm == "timeShift":
            _stage_time_shift(st, a)
        elif nm == "sort":
            _stage_sort(st, a)
        elif nm == "limit":
            _stage_limit(st, a)
        elif nm == "tail":
            _stage_limit(st, a, tail=True)
        elif nm == "fill":
            _stage_fill(st, a)
        elif nm == "map":
            _stage_map(st, a)
        elif nm == "pivot":
            _stage_pivot(st, a)
        elif nm in ("highestAverage", "highestMax"):
            _stage_highest(st, a, nm)
        elif nm == "stateDuration":
            _stage_state_track(st, a, count=False)
        elif nm == "stateCount":
            _stage_state_track(st, a, count=True)
        elif nm == "keep":
            _stage_keep(st, a)
        elif nm == "drop":
            _stage_keep(st, a, drop=True)
        elif nm == "yield":
            pass
        elif nm == "to":
            raise FluxError("to(bucket:) runs via run_flux_task()")
        else:
            raise FluxError(f"unsupported stage: {nm}()")


def compile_flux(text: str, now_s: float | None = None):
    """Compile a Flux pipeline string to a (spark, sf_dir) -> DataFrame
    callable running on the migrated point relation."""
    pipe = parse_flux(text)

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        st = _State(_flux_points(spark, sf_dir), now_s=now_s)
        _apply_stages(st, pipe.stages)
        # state_id is an engine-internal tie-break column, not part of
        # Flux's row schema — never emit it
        return st.df.drop("state_id")

    return run


def compile_flux_program(text: str, now_s: float | None = None):
    """Compile a multi-statement Flux program — assignments plus a final
    pipeline or ``join(tables: {a: x, b: y}, on: […])`` — the
    cross-measurement-math idiom (e.g. a power/percentage ratio panel).

    Join semantics follow Flux: INNER join on the ``on`` columns;
    conflicting non-key columns from each side are suffixed ``_<label>``
    (so ``r._value_p / r._value_h`` in a trailing map). Scale shape:
    each side is typically an aggregateWindow downsample, so the join
    keys on (time, tags) over two ALREADY-DOWNSAMPLED relations — a
    genuine two-sided shuffle join on small inputs; the big scans never
    join each other directly."""
    prog = parse_flux_program(text, now_s=now_s)

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        pts = _flux_points(spark, sf_dir)
        env: dict[str, DataFrame] = {}
        for name, pipe in prog.assigns:
            st = _State(pts, now_s=now_s)
            _apply_stages(st, pipe.stages)
            env[name] = st.df.drop("state_id")
        final = prog.final
        if isinstance(final, FluxPipeline):
            st = _State(pts, now_s=now_s)
            _apply_stages(st, final.stages)
            return st.df.drop("state_id")
        if isinstance(final, FluxUnion):
            dfs = [env[v] for v in final.tables]
            cols = dfs[0].columns
            for v, d in zip(final.tables[1:], dfs[1:], strict=False):
                if set(d.columns) != set(cols):
                    raise FluxError(
                        f"union table {v!r} has a different schema")
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d)
            st = _State(out, now_s=now_s)
            st.gkey = tuple(c for c in _SERIES_KEY if c in out.columns)
            st.sort_cols = (("_time",) if "_time" in out.columns
                            else tuple(cols[:1]))
            _apply_stages(st, final.stages)
            return st.df
        (la, va), (lb, vb) = final.tables
        da, db = env[va], env[vb]
        on = list(final.on)
        for c in on:
            if c not in da.columns or c not in db.columns:
                raise FluxError(f"join key {c!r} missing from a side")
        conflicts = (set(da.columns) & set(db.columns)) - set(on)
        for c in sorted(conflicts):
            da = da.withColumnRenamed(c, f"{c}_{la}")
            db = db.withColumnRenamed(c, f"{c}_{lb}")
        joined = da.join(db, on, "inner")
        st = _State(joined, now_s=now_s)
        st.gkey = tuple(c for c in on if c != "_time")
        st.sort_cols = (("_time",) if "_time" in joined.columns
                        else tuple(on[:1]))
        _apply_stages(st, final.stages)
        return st.df

    return run


# ---------------------------------------------------------------- tasks

def run_flux_task(spark: SparkSession, sf_dir: str, text: str,
                  now_s: float | None = None) -> DataFrame:
    """Execute an InfluxDB v2 TASK — ``option task = {name, every}`` + a
    Flux pipeline ending in ``to(bucket:)`` — the way InfluxDB does: as
    a STANDING query over arriving data. The v2 counterpart of
    ``run_continuous_query`` (InfluxQL CREATE CONTINUOUS QUERY): the
    pipeline's aggregateWindow runs per (series, event-time window) on
    the line-protocol ingest stream and drains AvailableNow in complete
    mode; the ``to`` bucket names the memory-sink relation standing in
    for the target bucket. Supported task bodies (documented subset):
    ``range? filter* aggregateWindow(every, fn) to`` with fn in
    mean/sum/count/min/max — exactly the downsample shape real tasks
    run. State is bounded by open windows × active series (InfluxDB's
    own task shard model); bucket means accumulate micro-quantized
    BIGINTs so the batch oracle matches bit-exactly."""
    from .streaming_ops import _lp_stream, drain_to_memory

    opts, pipe = parse_flux_task(text, now_s=now_s)
    name = opts["name"][1]
    stages = list(pipe.stages)
    if not stages or stages[-1].name != "to":
        raise FluxError("a task pipeline must end in to(bucket:)")
    to_args = stages[-1].args
    if _arg(to_args, "bucket", ("str",), required=True) is None:
        raise FluxError("to() needs bucket:")
    body, agg_stage = stages[:-1], None
    pts = _lp_stream(spark, sf_dir).filter(F.col("value").isNotNull())
    # the wire relation in Flux column names (no state_id on the wire)
    pts = pts.select(
        F.col("measurement").alias("_measurement"), "domain", "entity_id",
        F.lit("value").alias("_field"),
        F.col("ts_epoch").alias("_time"), F.col("value").alias("_value"),
    )
    st = _State(pts, now_s=now_s)
    for stage in body:
        if stage.name == "range":
            _stage_range(st, stage.args)
        elif stage.name == "filter":
            _stage_filter(st, stage.args)
        elif stage.name == "aggregateWindow":
            agg_stage = stage
            break
        else:
            raise FluxError(
                f"task bodies support range/filter/aggregateWindow/to, "
                f"got {stage.name}()")
    if agg_stage is None:
        raise FluxError("a task body needs an aggregateWindow stage")
    every = int(_arg(agg_stage.args, "every", ("dur",), required=True))
    fn = _arg(agg_stage.args, "fn", ("ident",), required=True)
    if fn not in ("mean", "sum", "count", "min", "max"):
        raise FluxError(f"task aggregateWindow fn {fn!r} unsupported")
    win = F.window(F.timestamp_seconds(F.col("_time")), f"{every} seconds")
    gcols = [c for c in _SERIES_KEY]
    micro = F.round(F.col("_value") * _MICRO).cast("long")
    if fn == "mean":
        agg = [(F.sum(micro) / F.lit(float(_MICRO)) / F.count(F.lit(1)))
               .alias("_value"), F.count(F.lit(1)).alias("n_points")]
    elif fn == "sum":
        agg = [(F.sum(micro) / F.lit(float(_MICRO))).alias("_value"),
               F.count(F.lit(1)).alias("n_points")]
    elif fn == "count":
        agg = [F.count(F.lit(1)).alias("_value"),
               F.count(F.lit(1)).alias("n_points")]
    else:
        agg = [(F.min("_value") if fn == "min" else F.max("_value"))
               .alias("_value"), F.count(F.lit(1)).alias("n_points")]
    out = (
        st.df.groupBy(*gcols, win.alias("_w"))
        .agg(*agg)
        .select(*gcols,
                F.unix_seconds(F.col("_w.end")).alias("_time"),
                "_value", "n_points")
    )
    return drain_to_memory(out, f"task_{name}")


# ------------------------------------------------------------- registry

_BUCKET = "home_assistant"

# 2024-01-01T00:00:00Z .. 2024-01-31T00:00:00Z — covers the fixture span,
# multiples of every createEmpty window used below
_T0, _T1 = 1704067200, 1706659200

FLUX_TEXTS = {
    # the reference's own probe (sqllite2influxdb.py:57-63) with a
    # measurement present in the fixture: per Flux table semantics the
    # un-grouped stream is one table PER SERIES, so limit(n:1) returns
    # each series' oldest point
    "flux_oldest_point": f'''
from(bucket: "{_BUCKET}")
  |> range(start: 0)
  |> filter(fn: (r) => r["_measurement"] == "W")
  |> sort(columns: ["_time"], desc: false)
  |> limit(n: 1)
''',
    # the reference then reads result[0].records[0] — the global-oldest
    # intent, modeled faithfully with an explicit group() merge
    "flux_oldest_global": f'''
from(bucket: "{_BUCKET}")
  |> range(start: 0)
  |> filter(fn: (r) => r["_measurement"] == "W")
  |> group()
  |> sort(columns: ["_time"], desc: false)
  |> limit(n: 1)
''',
    "flux_downsample_mean": f'''
from(bucket: "{_BUCKET}")
  |> range(start: {_T0}, stop: {_T1})
  |> filter(fn: (r) => r._measurement == "%")
  |> aggregateWindow(every: 1h, fn: mean, createEmpty: false)
''',
    "flux_window_fill_prev": f'''
from(bucket: "{_BUCKET}")
  |> range(start: "2024-01-01T00:00:00Z", stop: "2024-01-31T00:00:00Z")
  |> filter(fn: (r) => r._measurement == "W" and r.domain == "sensor")
  |> aggregateWindow(every: 6h, fn: mean, createEmpty: true)
  |> fill(usePrevious: true)
''',
    "flux_increase": f'''
from(bucket: "{_BUCKET}")
  |> range(start: 0)
  |> filter(fn: (r) => r._measurement == "W" and r.domain == "sensor")
  |> increase()
''',
    "flux_derivative_nn": f'''
from(bucket: "{_BUCKET}")
  |> range(start: 0)
  |> filter(fn: (r) => r._measurement == "%")
  |> derivative(unit: 1s, nonNegative: true)
''',
    "flux_group_domain_mean": f'''
from(bucket: "{_BUCKET}")
  |> range(start: 0)
  |> filter(fn: (r) => r._value >= 0)
  |> group(columns: ["_measurement", "domain"])
  |> mean()
''',
    "flux_map_scale_mean": f'''
from(bucket: "{_BUCKET}")
  |> range(start: 0)
  |> filter(fn: (r) => r._measurement == "W")
  |> map(fn: (r) => ({{ r with _value: r._value * 0.001 }}))
  |> mean()
''',
    "flux_quantile": f'''
from(bucket: "{_BUCKET}")
  |> range(start: 0)
  |> filter(fn: (r) => r._measurement == "%")
  |> quantile(q: 0.9, method: "exact_selected")
''',
    "flux_last_per_series": f'''
from(bucket: "{_BUCKET}")
  |> range(start: 0)
  |> filter(fn: (r) => r._measurement =~ /^(W|%)$/)
  |> last()
''',
    "flux_top_sensors": f'''
from(bucket: "{_BUCKET}")
  |> range(start: 0)
  |> filter(fn: (r) => r._measurement == "W")
  |> highestAverage(n: 5)
''',
    "flux_state_duration": f'''
from(bucket: "{_BUCKET}")
  |> range(start: 0)
  |> filter(fn: (r) => r._measurement == "%")
  |> stateDuration(fn: (r) => r._value > 50, unit: 1s)
''',
    "flux_pivot_fields": f'''
from(bucket: "{_BUCKET}")
  |> range(start: 0)
  |> filter(fn: (r) => r._measurement == "W" and r.domain == "sensor")
  |> pivot(rowKey: ["_time"], columnKey: ["_field"],
           valueColumn: "_value")
''',
    "flux_histogram": f'''
from(bucket: "{_BUCKET}")
  |> range(start: 0)
  |> filter(fn: (r) => r._measurement == "%")
  |> histogram(bins: [0, 20, 40, 60, 80, 100])
''',
    "flux_histogram_quantile": f'''
from(bucket: "{_BUCKET}")
  |> range(start: 0)
  |> filter(fn: (r) => r._measurement == "%")
  |> histogram(bins: [0, 20, 40, 60, 80, 100])
  |> histogramQuantile(quantile: 0.95)
''',
}


def _q(name: str):
    def run(spark: SparkSession, sf_dir: str, _n=name) -> DataFrame:
        return compile_flux(FLUX_TEXTS[_n])(spark, sf_dir)
    run.__name__ = f"q_{name}"
    run.__doc__ = (
        f"Flux text surface: compiles and runs::\n{FLUX_TEXTS[name]}\n"
        "See module docstring for grammar/semantics; reference probe "
        "query at sqllite2influxdb.py:57-63."
    )
    return run


QUERIES = {name: _q(name) for name in FLUX_TEXTS}

_TASK_TEXT = f'''
option task = {{name: "w_hourly", every: 1h}}

from(bucket: "{_BUCKET}")
  |> range(start: 0)
  |> filter(fn: (r) => r._measurement == "W")
  |> aggregateWindow(every: 1h, fn: mean)
  |> to(bucket: "{_BUCKET}_hourly")
'''

_NOW_REL_TEXT = f'''
from(bucket: "{_BUCKET}")
  |> range(start: -30d)
  |> filter(fn: (r) => r._measurement == "%")
  |> mean()
'''


def q_flux_task_hourly_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxDB v2 TASK (``option task`` + ``to(bucket:)``) executed as
    Structured Streaming over the line-protocol ingest — the v2
    counterpart of the InfluxQL CONTINUOUS QUERY entry
    (`stream_cq_downsample`). See `run_flux_task`."""
    return run_flux_task(spark, sf_dir, _TASK_TEXT)


def q_flux_now_relative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flux relative range (``range(start: -30d)``, stop defaulting to
    now()) against a PINNED now — the bound form every auto-refreshing
    Grafana Flux panel issues."""
    return compile_flux(_NOW_REL_TEXT, now_s=float(_T1))(spark, sf_dir)


QUERIES["flux_task_hourly_mean"] = q_flux_task_hourly_mean
QUERIES["flux_now_relative"] = q_flux_now_relative

_META_TEXTS = {
    "flux_schema_measurements":
        f'import "influxdata/influxdb/schema"\n\n'
        f'schema.measurements(bucket: "{_BUCKET}")',
    "flux_schema_tag_values":
        f'import "influxdata/influxdb/schema"\n\n'
        f'schema.tagValues(bucket: "{_BUCKET}", tag: "entity_id")',
    "flux_schema_m_tag_values":
        f'import "influxdata/influxdb/schema"\n\n'
        f'schema.measurementTagValues(bucket: "{_BUCKET}", '
        f'measurement: "W", tag: "entity_id")',
    "flux_schema_field_keys":
        f'import "influxdata/influxdb/schema"\n\n'
        f'schema.fieldKeys(bucket: "{_BUCKET}")',
}


def _q_meta(name: str):
    def run(spark: SparkSession, sf_dir: str, _n=name) -> DataFrame:
        return compile_flux_meta(_META_TEXTS[_n])(spark, sf_dir)
    run.__name__ = f"q_{name}"
    run.__doc__ = (
        f"Flux schema meta query (Grafana dropdowns)::\n"
        f"{_META_TEXTS[name]}\nSee compile_flux_meta."
    )
    return run


QUERIES.update({n: _q_meta(n) for n in _META_TEXTS})

_JOIN_TEXT = f'''
p = from(bucket: "{_BUCKET}")
  |> range(start: 0)
  |> filter(fn: (r) => r._measurement == "W")
  |> aggregateWindow(every: 6h, fn: mean)
h = from(bucket: "{_BUCKET}")
  |> range(start: 0)
  |> filter(fn: (r) => r._measurement == "%")
  |> aggregateWindow(every: 6h, fn: mean)
join(tables: {{p: p, h: h}}, on: ["_time", "domain", "entity_id"])
  |> map(fn: (r) => ({{ r with _value: r._value_p / r._value_h }}))
  |> keep(columns: ["_time", "domain", "entity_id", "_value"])
'''


_UNION_TEXT = f'''
w = from(bucket: "{_BUCKET}")
  |> range(start: 0)
  |> filter(fn: (r) => r._measurement == "W")
  |> aggregateWindow(every: 6h, fn: mean)
p = from(bucket: "{_BUCKET}")
  |> range(start: 0)
  |> filter(fn: (r) => r._measurement == "%")
  |> aggregateWindow(every: 6h, fn: mean)
union(tables: [w, p])
  |> group(columns: ["_measurement"])
  |> mean()
'''


def q_flux_union_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flux union(): two independently-downsampled streams merged, then
    re-grouped — the multi-panel overlay idiom. unionByName of the two
    small bucket relations; the trailing mean re-quantizes the (already
    cross-engine-exact) bucket means, so the oracle stays bit-exact."""
    return compile_flux_program(_UNION_TEXT)(spark, sf_dir)


def q_flux_join_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flux variables + join() + cross-column map — the Grafana
    cross-measurement-math panel (hourly W mean over hourly % mean per
    entity). See compile_flux_program for join semantics and the
    downsample-before-join scale shape."""
    return compile_flux_program(_JOIN_TEXT)(spark, sf_dir)


QUERIES["flux_join_math"] = q_flux_join_math
QUERIES["flux_union_streams"] = q_flux_union_streams

_SKEY = "measurement AS _measurement, domain, entity_id, 'value' AS _field"
_SPART = "measurement, domain, entity_id"

ORACLES = {
    "flux_oldest_point": f"""{_ORACLE_NUM},
r AS (
  SELECT {_SKEY}, ts_epoch AS _time, value AS _value,
    row_number() OVER (PARTITION BY {_SPART}
                       ORDER BY ts_epoch, state_id) AS rn
  FROM num WHERE measurement = 'W'
)
SELECT _measurement, domain, entity_id, _field, _time, _value
FROM r WHERE rn = 1
""",
    "flux_oldest_global": f"""{_ORACLE_NUM}
SELECT {_SKEY}, ts_epoch AS _time, value AS _value
FROM num WHERE measurement = 'W'
ORDER BY ts_epoch, state_id LIMIT 1
""",
    "flux_downsample_mean": f"""{_ORACLE_NUM}
SELECT {_SKEY},
  CAST((floor(ts_epoch / 3600) + 1) * 3600 AS DOUBLE) AS _time,
  (sum(CAST(round(value * 1e6) AS BIGINT)) / 1e6) / count(*) AS _value
FROM num
WHERE measurement = '%' AND ts_epoch >= {_T0} AND ts_epoch < {_T1}
GROUP BY measurement, domain, entity_id, floor(ts_epoch / 3600)
""",
    "flux_window_fill_prev": f"""{_ORACLE_NUM},
pts2 AS (
  SELECT * FROM num
  WHERE measurement = 'W' AND domain = 'sensor'
    AND ts_epoch >= {_T0} AND ts_epoch < {_T1}
),
buckets AS (
  SELECT measurement, domain, entity_id,
    CAST((floor(ts_epoch / 21600) + 1) * 21600 AS BIGINT) AS wstop,
    (sum(CAST(round(value * 1e6) AS BIGINT)) / 1e6) / count(*) AS mv
  FROM pts2 GROUP BY 1, 2, 3, 4
),
grid AS (
  SELECT s.measurement, s.domain, s.entity_id, g.wstop
  FROM (SELECT DISTINCT measurement, domain, entity_id FROM pts2) s
  CROSS JOIN (SELECT unnest(generate_series({_T0} + 21600, {_T1}, 21600))
              AS wstop) g
),
joined2 AS (
  SELECT g.measurement, g.domain, g.entity_id, g.wstop, b.mv
  FROM grid g LEFT JOIN buckets b USING (measurement, domain, entity_id,
                                         wstop)
)
SELECT measurement AS _measurement, domain, entity_id,
  'value' AS _field, CAST(wstop AS DOUBLE) AS _time,
  last_value(mv IGNORE NULLS) OVER (
    PARTITION BY measurement, domain, entity_id ORDER BY wstop
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _value
FROM joined2
""",
    "flux_increase": f"""{_ORACLE_NUM},
m AS (
  SELECT state_id, {_SKEY}, ts_epoch AS _time,
    CAST(round(value * 1e6) AS BIGINT) AS micro
  FROM num WHERE measurement = 'W' AND domain = 'sensor'
),
inc AS (
  SELECT state_id, _measurement, domain, entity_id, _field, _time,
    CASE WHEN lag(micro) OVER w IS NULL THEN 0
         WHEN micro - lag(micro) OVER w >= 0 THEN micro - lag(micro) OVER w
         ELSE micro END AS step
  FROM m WINDOW w AS (PARTITION BY _measurement, domain, entity_id
                      ORDER BY _time, state_id)
)
SELECT _measurement, domain, entity_id, _field, _time,
  CAST(sum(step) OVER (PARTITION BY _measurement, domain, entity_id
                       ORDER BY _time, state_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       AS BIGINT) / 1e6 AS _value
FROM inc
""",
    "flux_derivative_nn": f"""{_ORACLE_NUM},
lagged AS (
  SELECT state_id, {_SKEY}, ts_epoch AS _time,
    value - lag(value) OVER w AS dv,
    ts_epoch - lag(ts_epoch) OVER w AS dt
  FROM num WHERE measurement = '%'
  WINDOW w AS (PARTITION BY {_SPART} ORDER BY ts_epoch, state_id)
)
SELECT _measurement, domain, entity_id, _field, _time,
  CASE WHEN dt <> 0 AND dv / dt * 1.0 >= 0 THEN dv / dt * 1.0 END AS _value
FROM lagged WHERE dt IS NOT NULL
""",
    "flux_group_domain_mean": f"""{_ORACLE_NUM}
SELECT measurement AS _measurement, domain,
  (sum(CAST(round(value * 1e6) AS BIGINT)) / 1e6) / count(*) AS _value
FROM num WHERE value >= 0
GROUP BY measurement, domain
""",
    "flux_map_scale_mean": f"""{_ORACLE_NUM}
SELECT {_SKEY},
  (sum(CAST(round(value * 0.001 * 1e6) AS BIGINT)) / 1e6) / count(*)
    AS _value
FROM num WHERE measurement = 'W'
GROUP BY measurement, domain, entity_id
""",
    "flux_quantile": f"""{_ORACLE_NUM},
r AS (
  SELECT {_SKEY}, value AS _value,
    row_number() OVER (PARTITION BY {_SPART}
                       ORDER BY value, state_id) AS rn,
    greatest(1, CAST(ceil(count(*) OVER (PARTITION BY {_SPART}) * 0.9)
                     AS BIGINT)) AS target
  FROM num WHERE measurement = '%'
)
SELECT _measurement, domain, entity_id, _field, _value
FROM r WHERE rn = target
""",
    "flux_last_per_series": f"""{_ORACLE_NUM},
r AS (
  SELECT {_SKEY}, ts_epoch AS _time, value AS _value,
    row_number() OVER (PARTITION BY {_SPART}
                       ORDER BY ts_epoch DESC, state_id DESC) AS rn
  FROM num WHERE regexp_matches(measurement, '^(W|%)$')
)
SELECT _measurement, domain, entity_id, _field, _time, _value
FROM r WHERE rn = 1
""",
    "flux_top_sensors": f"""{_ORACLE_NUM},
per AS (
  SELECT {_SKEY},
    (sum(CAST(round(value * 1e6) AS BIGINT)) / 1e6) / count(*) AS _value
  FROM num WHERE measurement = 'W'
  GROUP BY measurement, domain, entity_id
)
SELECT _measurement, domain, entity_id, _field, _value FROM per
ORDER BY _value DESC, _measurement, domain, entity_id LIMIT 5
""",
    "flux_state_duration": f"""{_ORACLE_NUM},
marked AS (
  SELECT state_id, {_SKEY}, ts_epoch AS _time, value AS _value,
    (value > 50) AS ok,
    sum(CASE WHEN value > 50 THEN 0 ELSE 1 END) OVER (
      PARTITION BY {_SPART} ORDER BY ts_epoch, state_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM num WHERE measurement = '%'
)
SELECT _measurement, domain, entity_id, _field, _time, _value,
  CASE WHEN ok THEN
    (_time - min(CASE WHEN ok THEN _time END) OVER (
       PARTITION BY _measurement, domain, entity_id, grp)) / 1.0
  ELSE -1.0 END AS stateDuration
FROM marked
""",
    "flux_pivot_fields": f"""{_ORACLE_NUM}
SELECT measurement AS _measurement, domain, entity_id,
  ts_epoch AS _time, value
FROM num WHERE measurement = 'W' AND domain = 'sensor'
""",
    # cumulative count per le bin: the quadratic pts×bins formulation is
    # fine as an ORACLE (sf0.01); the Spark plan is the linear
    # when-chain + grid join
    "flux_histogram": f"""{_ORACLE_NUM},
bins AS (SELECT unnest([0.0, 20.0, 40.0, 60.0, 80.0, 100.0]) AS le),
series AS (
  SELECT DISTINCT {_SKEY} FROM num WHERE measurement = '%'
)
SELECT s._measurement, s.domain, s.entity_id, s._field,
  CAST(b.le AS DOUBLE) AS le,
  CAST((SELECT count(*) FROM num n
        WHERE n.measurement = s._measurement AND n.domain = s.domain
          AND n.entity_id = s.entity_id AND n.value <= b.le)
       AS DOUBLE) AS _value
FROM series s CROSS JOIN bins b
""",
    "flux_histogram_quantile": f"""{_ORACLE_NUM},
bins AS (SELECT unnest([0.0, 20.0, 40.0, 60.0, 80.0, 100.0]) AS le),
series AS (
  SELECT DISTINCT {_SKEY} FROM num WHERE measurement = '%'
),
hist AS (
  SELECT s._measurement, s.domain, s.entity_id, s._field, b.le,
    CAST((SELECT count(*) FROM num n
          WHERE n.measurement = s._measurement AND n.domain = s.domain
            AND n.entity_id = s.entity_id AND n.value <= b.le)
         AS DOUBLE) AS cum
  FROM series s CROSS JOIN bins b
),
marked AS (
  SELECT *, coalesce(lag(cum) OVER w, 0.0) AS pcum,
         coalesce(lag(le) OVER w, 0.0) AS ple,
         max(cum) OVER (PARTITION BY _measurement, domain, entity_id)
           * 0.95 AS rnk
  FROM hist
  WINDOW w AS (PARTITION BY _measurement, domain, entity_id ORDER BY le)
)
SELECT _measurement, domain, entity_id, _field,
  ple + (le - ple) * ((rnk - pcum) / (cum - pcum)) AS _value
FROM marked WHERE pcum < rnk AND rnk <= cum
""",
    # the task's batch truth: stop-labeled hourly buckets straight off
    # the point relation (the wire round-trip is exact — established by
    # stream_cq_downsample's oracle)
    "flux_task_hourly_mean": f"""{_ORACLE_NUM}
SELECT {_SKEY},
  (CAST(floor(ts_epoch / 3600) AS BIGINT) + 1) * 3600 AS _time,
  (CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) / 1e6)
    / count(*) AS _value,
  count(*)::BIGINT AS n_points
FROM num WHERE measurement = 'W'
GROUP BY measurement, domain, entity_id,
         CAST(floor(ts_epoch / 3600) AS BIGINT)
""",
    "flux_now_relative": f"""{_ORACLE_NUM}
SELECT {_SKEY},
  (sum(CAST(round(value * 1e6) AS BIGINT)) / 1e6) / count(*) AS _value
FROM num
WHERE measurement = '%' AND ts_epoch >= {_T1} - 2592000
  AND ts_epoch < {_T1}
GROUP BY measurement, domain, entity_id
""",
    "flux_schema_measurements": f"""{_ORACLE_NUM}
SELECT DISTINCT measurement AS _value FROM num
""",
    "flux_schema_tag_values": f"""{_ORACLE_NUM}
SELECT DISTINCT entity_id AS _value FROM num
""",
    "flux_schema_m_tag_values": f"""{_ORACLE_NUM}
SELECT DISTINCT entity_id AS _value FROM num WHERE measurement = 'W'
""",
    "flux_schema_field_keys": """
SELECT 'value' AS _value
""",
    "flux_union_streams": f"""{_ORACLE_NUM},
bw AS (
  SELECT measurement,
    (sum(CAST(round(value * 1e6) AS BIGINT)) / 1e6) / count(*) AS mv
  FROM num WHERE measurement = 'W'
  GROUP BY measurement, domain, entity_id, floor(ts_epoch / 21600)
),
bp AS (
  SELECT measurement,
    (sum(CAST(round(value * 1e6) AS BIGINT)) / 1e6) / count(*) AS mv
  FROM num WHERE measurement = '%'
  GROUP BY measurement, domain, entity_id, floor(ts_epoch / 21600)
),
u AS (SELECT * FROM bw UNION ALL SELECT * FROM bp)
SELECT measurement AS _measurement,
  (sum(CAST(round(mv * 1e6) AS BIGINT)) / 1e6) / count(*) AS _value
FROM u GROUP BY measurement
""",
    "flux_join_math": f"""{_ORACLE_NUM},
pw AS (
  SELECT domain, entity_id,
    CAST((floor(ts_epoch / 21600) + 1) * 21600 AS DOUBLE) AS _time,
    (sum(CAST(round(value * 1e6) AS BIGINT)) / 1e6) / count(*) AS mv
  FROM num WHERE measurement = 'W'
  GROUP BY domain, entity_id, floor(ts_epoch / 21600)
),
ph AS (
  SELECT domain, entity_id,
    CAST((floor(ts_epoch / 21600) + 1) * 21600 AS DOUBLE) AS _time,
    (sum(CAST(round(value * 1e6) AS BIGINT)) / 1e6) / count(*) AS mv
  FROM num WHERE measurement = '%'
  GROUP BY domain, entity_id, floor(ts_epoch / 21600)
)
SELECT p._time, p.domain, p.entity_id, p.mv / h.mv AS _value
FROM pw p JOIN ph h USING (_time, domain, entity_id)
""",
}
