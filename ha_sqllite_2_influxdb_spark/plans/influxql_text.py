"""InfluxQL TEXT surface: tokenizer, recursive-descent parser, compiler.

`plans/influxql.py` re-expresses the post-migration query surface as
Python functions; this module closes the loop for the reference *user*,
who types InfluxQL (reference `sqllite2influxdb.py` ships points into an
InfluxDB bucket precisely so dashboards can issue InfluxQL against it):
an InfluxQL SELECT string compiles to the SAME Spark plans the function
layer builds — the text layer adds zero new physical shapes.

Supported grammar (a documented, tested subset — anything outside it
raises ``InfluxQLError`` rather than mis-executing):

  query  := SELECT proj (',' proj)* FROM source
            [WHERE wexpr]
            [GROUP BY item (',' item)*] [FILL '(' fillarg ')']
            [ORDER BY time [ASC|DESC]]
            [LIMIT n [OFFSET n]] [SLIMIT n [SOFFSET n]]
  proj   := pbase [('*'|'+'|'-') number]        (unit scaling; aggs/raw)
  pbase  := FUNC '(' value [',' number] ')' | value
          | COUNT '(' DISTINCT '(' value ')' ')'
  FUNC   := COUNT|SUM|MEAN|MIN|MAX|SPREAD|FIRST|LAST
          | STDDEV|MEDIAN | MODE|DISTINCT|INTEGRAL
          | TOP|BOTTOM | PERCENTILE|SAMPLE
          | DERIVATIVE|NON_NEGATIVE_DERIVATIVE|DIFFERENCE
          | CUMULATIVE_SUM|MOVING_AVERAGE|ELAPSED
  source := ident | '"' any '"' | '/' regex '/'
  wexpr  := wfact (AND wfact)*
  wfact  := '(' wexpr (OR wexpr)* ')' | cond
  cond   := time (< <= > >=) timelit | tag (= !=) 'string'
          | tag (=~ !~) '/' regex '/'
          | value (< <= > >= = !=) number
  timelit:= epoch 's' | number | now() [± duration]   (now_s pinned)
          | 'RFC3339'                       ('2024-01-15T06:00:00Z')
  item   := time '(' duration [',' duration] ')' | tag | '*'

Semantics follow InfluxDB's documented behavior on the migrated point
relation (series key = measurement/domain/entity_id, field = value):

- ``GROUP BY *`` groups by all tags (domain, entity_id); explicit tags
  group by those; NO group clause merges every point of the measurement
  into one series ordered by (time, state_id) — exactly InfluxQL's
  merge behavior for ungrouped queries.
- ``GROUP BY time(d)`` buckets at epoch-aligned ``floor(ts/d)``
  boundaries (InfluxDB's preset epoch-zero alignment), with
  ``FILL(none|null|previous|linear|<number>)`` over each series' own
  observed bucket span. Bucket means/sums accumulate micro-quantized
  BIGINTs, so results are bit-identical in the DuckDB oracles.
- ``LIMIT n`` is per series when the query is grouped (InfluxDB returns
  the first n points of each series), a global time-ordered limit when
  ungrouped. ``SLIMIT n`` keeps the first n series in series-key order.

Scale shape: identical to the function layer — one shuffle keyed on the
series columns for windows/aggregates (InfluxDB's own shard key), time
buckets as a second exchange only when FILL expansion needs the series
window, SLIMIT as a distinct+limit on the (tiny) series relation
broadcast back. The parser itself is driver-side string work on a
<1 KB query — no per-row Python anywhere.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .influxql import _ORACLE_NUM, _numeric_points

__all__ = ["InfluxQLError", "parse_influxql", "compile_influxql",
           "QUERIES", "ORACLES"]

_TAGS = ("domain", "entity_id")
_DB_NAME = "home_assistant"   # the migrated bucket's logical database


class InfluxQLError(ValueError):
    """Raised on any query outside the documented grammar subset."""


# ---------------------------------------------------------------- tokenizer

_TOKEN_RE = re.compile(
    r"""\s*(?:
      (?P<dquote>"[^"]*")
    | (?P<squote>'[^']*')
    | (?P<regex>/(?:\\.|[^/\\])*/)
    | (?P<duration>\d+(?:ns|us|ms|s|m|h|d|w))
    | (?P<number>\d+(?:\.\d+)?)
    | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op>=~|!~|<=|>=|!=|<>|=|<|>)
    | (?P<punct>[(),*+-])
    )""",
    re.VERBOSE,
)

_DUR_S = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}


@dataclass(frozen=True)
class _Tok:
    kind: str
    text: str


def _tokenize(text: str) -> list[_Tok]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip():
                raise InfluxQLError(f"bad token at: {text[pos:pos + 20]!r}")
            break
        pos = m.end()
        kind = m.lastgroup
        out.append(_Tok(kind, m.group(kind)))
    return out


# ------------------------------------------------------------------- AST

@dataclass(frozen=True)
class Proj:
    func: str | None          # None = raw field
    arg: float | None = None  # TOP/BOTTOM n, PERCENTILE p, MOVING_AVERAGE n
    field: str = "value"      # outer queries aggregate an inner column
    scale_op: str | None = None   # trailing '* k' / '/ k' / '+ k' / '- k'
    scale_k: float | None = None


@dataclass(frozen=True)
class Cond:
    lhs: str                  # 'time' | tag name | 'value'
    op: str                   # comparison, or '=~' / '!~' regex match
    rhs: object               # float for time/value, str for tags/regex


@dataclass(frozen=True)
class CondOr:
    """OR of AND-chains: ``alts`` holds one tuple of Cond/CondOr per OR
    alternative — the parenthesized boolean subset real dashboards use
    (``(a OR b) AND c``)."""
    alts: tuple[tuple, ...]


@dataclass(frozen=True)
class Regex:
    """``/pattern/`` — unanchored match, Influx's Go-regexp semantics
    (Spark ``rlike`` / DuckDB ``regexp_matches`` are both unanchored)."""
    pattern: str


@dataclass(frozen=True)
class InfluxSelect:
    projs: tuple[Proj, ...]
    measurement: object       # str, Regex, or nested InfluxSelect
    where: tuple = ()         # AND-chain of Cond | CondOr
    bucket_s: int | None = None
    group_tags: tuple[str, ...] = ()
    grouped: bool = False     # any GROUP BY tag clause present (incl. *)
    fill: object = "none"     # none|null|previous|linear|float
    order_desc: bool = False
    limit: int | None = None
    slimit: int | None = None
    into: str | None = None   # SELECT ... INTO target (CQ bodies)
    offset: int | None = None
    soffset: int | None = None
    bucket_off_s: int = 0     # GROUP BY time(d, off) alignment shift
    tz: str | None = None     # tz('Europe/Berlin') bucket alignment


_AGGS = {"count", "sum", "mean", "min", "max", "spread", "first", "last",
         "stddev", "median", "count_distinct"}
_SELECTORS = {"top", "bottom", "percentile", "sample"}
_TRANSFORMS = {"derivative", "non_negative_derivative", "difference",
               "cumulative_sum", "moving_average", "elapsed"}
_SINGLETONS = {"mode", "integral", "distinct"}  # dedicated compile paths
_MATH = {"abs", "ceil", "floor", "round"}       # per-point math (1.6+)


@dataclass(frozen=True)
class InfluxCQ:
    """``CREATE CONTINUOUS QUERY <name> ON <db> BEGIN SELECT ... END`` —
    InfluxDB's standing downsample. The body must be a time-bucketed
    aggregate with INTO (exactly InfluxDB's own CQ contract); it runs
    as Structured Streaming (see ``run_continuous_query``)."""
    name: str
    db: str
    select: InfluxSelect


@dataclass(frozen=True)
class InfluxExplain:
    """``EXPLAIN [ANALYZE] SELECT …`` — compiles the inner statement and
    returns the ENGINE'S formatted physical plan, one row per line (the
    honest answer: the plan InfluxDB would print describes ITS iterator
    tree; this engine's is Catalyst's)."""
    select: "InfluxSelect"


@dataclass(frozen=True)
class MeasurementList:
    """``FROM "a", "b"`` — InfluxQL's multi-measurement source list;
    each measurement stays its own series (measurement is already the
    leading series-key column)."""
    names: tuple[str, ...]


@dataclass(frozen=True)
class InfluxDelete:
    """``DELETE FROM m [WHERE …]`` / ``DROP MEASUREMENT m`` — the data
    lifecycle statements. On a lakehouse the physical action is a
    partition-pruned retain-rewrite (delete = rewrite the touched
    partitions keeping the complement); the compiled relation IS the
    retained data, which a sink then materializes."""
    measurement: str
    where: tuple = ()


@dataclass(frozen=True)
class InfluxShow:
    """AST for the SHOW meta statements (the InfluxQL surface every
    Grafana datasource browser issues to populate its dropdowns)."""
    kind: str                        # measurements|tag_keys|tag_values|
    #                                  field_keys|cardinality
    measurement: str | None = None   # optional FROM filter
    with_key: str | None = None      # SHOW TAG VALUES ... WITH KEY = k


class _Parser:
    def __init__(self, text: str, now_s: float | None = None):
        self.toks = _tokenize(text)
        self.i = 0
        self.now_s = now_s

    def _peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> _Tok:
        t = self._peek()
        if t is None:
            raise InfluxQLError("unexpected end of query")
        self.i += 1
        return t

    def _kw(self, *words: str) -> bool:
        t = self._peek()
        if t and t.kind == "ident" and t.text.lower() == words[0]:
            save = self.i
            for w in words:
                t = self._peek()
                if not (t and t.kind == "ident" and t.text.lower() == w):
                    self.i = save
                    return False
                self.i += 1
            return True
        return False

    def _expect(self, text: str) -> None:
        t = self._next()
        if t.text.lower() != text.lower():
            raise InfluxQLError(f"expected {text!r}, got {t.text!r}")

    def _number(self) -> float:
        """A possibly-signed numeric literal (the tokenizer emits the
        sign as punct so ``now()-7d`` lexes cleanly)."""
        t = self._next()
        sign = 1.0
        if t.text in ("+", "-"):
            sign = -1.0 if t.text == "-" else 1.0
            t = self._next()
        if t.kind != "number":
            raise InfluxQLError(f"expected a number, got {t.text!r}")
        return sign * float(t.text)

    def _duration_s(self) -> float:
        t = self._next()
        if t.kind != "duration":
            raise InfluxQLError(f"expected a duration, got {t.text!r}")
        unit = re.sub(r"^\d+", "", t.text)
        if unit not in _DUR_S:
            raise InfluxQLError(f"sub-second duration {t.text!r} "
                                "unsupported")
        return float(t.text[:-len(unit)]) * _DUR_S[unit]

    def parse(self):
        if self._kw("explain"):
            # EXPLAIN [ANALYZE] SELECT … — InfluxDB's plan inspector.
            # ANALYZE (executed plan with runtime stats) maps to the
            # same formatted plan here; the statement returns THIS
            # engine's physical plan, which is the honest answer.
            self._kw("analyze")
            if not self._kw("select"):
                raise InfluxQLError("EXPLAIN takes a SELECT statement")
            inner = self._select_body()
            if self._peek() is not None:
                raise InfluxQLError(
                    f"trailing input at {self._peek().text!r}")
            return InfluxExplain(inner)
        if self._kw("show"):
            ast: object = self._show()
        elif self._kw("create", "continuous", "query"):
            ast = self._cq()
        elif self._kw("select"):
            ast = self._select_body()
        elif self._kw("delete", "from"):
            ast = self._delete()
        elif self._kw("drop", "measurement"):
            t = self._next()
            name = t.text[1:-1] if t.kind == "dquote" else t.text
            ast = InfluxDelete(name, ())
        else:
            raise InfluxQLError(
                "query must start with SELECT, SHOW, CREATE, DELETE "
                "or DROP")
        if self._peek() is not None:
            raise InfluxQLError(f"trailing input at {self._peek().text!r}")
        return ast

    def _delete(self) -> "InfluxDelete":
        t = self._next()
        name = t.text[1:-1] if t.kind == "dquote" else t.text
        where: tuple = ()
        if self._kw("where"):
            where = tuple(self._where_and())
        return InfluxDelete(name, where)

    def _select_body(self) -> InfluxSelect:
        projs = [self._proj()]
        while self._peek() and self._peek().text == ",":
            self._next()
            projs.append(self._proj())
        into = None
        if self._kw("into"):
            tgt = self._next()
            into = tgt.text[1:-1] if tgt.kind == "dquote" else tgt.text
        if not self._kw("from"):
            raise InfluxQLError("expected FROM")
        if self._peek() and self._peek().text == "(":
            # InfluxQL subquery: FROM ( SELECT ... )
            self._next()
            if not self._kw("select"):
                raise InfluxQLError("subquery must be a SELECT")
            measurement = self._select_body()
            self._expect(")")
        else:
            src = self._next()
            if src.kind == "dquote":
                measurement = src.text[1:-1]
            elif src.kind == "ident":
                measurement = src.text
            elif src.kind == "regex":
                measurement = Regex(src.text[1:-1])
            else:
                raise InfluxQLError(f"bad FROM source {src.text!r}")
            if self._peek() and self._peek().text == ",":
                names = [measurement]
                if not isinstance(measurement, str):
                    raise InfluxQLError(
                        "measurement lists hold plain names only")
                while self._peek() and self._peek().text == ",":
                    self._next()
                    t2 = self._next()
                    if t2.kind == "dquote":
                        names.append(t2.text[1:-1])
                    elif t2.kind == "ident":
                        names.append(t2.text)
                    else:
                        raise InfluxQLError(
                            f"bad FROM source {t2.text!r}")
                measurement = MeasurementList(tuple(names))

        where: list = []
        if self._kw("where"):
            where = list(self._where_and())
            t = self._peek()
            if t and t.kind == "ident" and t.text.lower() == "or":
                raise InfluxQLError(
                    "parenthesize top-level OR conditions: (a OR b)")

        bucket_s, bucket_off_s, group_tags, grouped = None, 0, [], False
        if self._kw("group", "by"):
            while True:
                t = self._next()
                name = t.text.lower()
                if name == "time":
                    self._expect("(")
                    d = self._next()
                    if d.kind != "duration":
                        raise InfluxQLError(f"bad duration {d.text!r}")
                    unit = re.sub(r"^\d+", "", d.text)
                    if unit not in _DUR_S:
                        raise InfluxQLError(
                            f"sub-second GROUP BY time({d.text}) unsupported")
                    bucket_s = int(d.text[:-len(unit)]) * _DUR_S[unit]
                    if self._peek() and self._peek().text == ",":
                        # time(d, offset): Influx's bucket-alignment
                        # shift (Grafana week/day alignment)
                        self._next()
                        bucket_off_s = int(self._duration_s())
                        if not 0 <= bucket_off_s < bucket_s:
                            raise InfluxQLError(
                                "time() offset must lie in [0, interval)")
                    self._expect(")")
                elif t.text == "*":
                    grouped = True
                    group_tags = list(_TAGS)
                elif name in _TAGS:
                    grouped = True
                    if name not in group_tags:
                        group_tags.append(name)
                else:
                    raise InfluxQLError(f"cannot GROUP BY {t.text!r}")
                if self._peek() and self._peek().text == ",":
                    self._next()
                else:
                    break

        fill: object = "none"
        if self._kw("fill"):
            self._expect("(")
            t = self._next()
            if t.kind == "number":
                fill = float(t.text)
            elif t.text.lower() in ("none", "null", "previous", "linear"):
                fill = t.text.lower()
            else:
                raise InfluxQLError(f"bad FILL argument {t.text!r}")
            self._expect(")")
            if bucket_s is None:
                raise InfluxQLError("FILL requires GROUP BY time()")

        order_desc = False
        if self._kw("order", "by"):
            self._expect("time")
            if self._kw("desc"):
                order_desc = True
            else:
                self._kw("asc")

        limit = slimit = offset = soffset = None
        if self._kw("limit"):
            limit = int(self._next().text)
        if self._kw("offset"):
            offset = int(self._next().text)
            if limit is None:
                raise InfluxQLError("OFFSET requires LIMIT")
        if self._kw("slimit"):
            slimit = int(self._next().text)
        if self._kw("soffset"):
            soffset = int(self._next().text)
            if slimit is None:
                raise InfluxQLError("SOFFSET requires SLIMIT")
        tzname = None
        if self._kw("tz"):
            self._expect("(")
            t = self._next()
            if t.kind != "squote":
                raise InfluxQLError("tz() takes a quoted IANA zone name")
            tzname = t.text[1:-1]
            self._expect(")")
            if bucket_s is None:
                raise InfluxQLError("tz() requires GROUP BY time()")
            if bucket_off_s:
                raise InfluxQLError("tz() with a time() offset is "
                                    "unsupported")
            if fill != "none":
                raise InfluxQLError("tz() with FILL is unsupported "
                                    "(fill on read after alignment)")
        return InfluxSelect(tuple(projs), measurement, tuple(where),
                            bucket_s, tuple(group_tags), grouped, fill,
                            order_desc, limit, slimit, into,
                            offset, soffset, bucket_off_s, tzname)

    def _cq(self) -> InfluxCQ:
        def _name() -> str:
            t = self._next()
            if t.kind == "dquote":
                return t.text[1:-1]
            if t.kind == "ident":
                return t.text
            raise InfluxQLError(f"bad identifier {t.text!r}")

        name = _name()
        self._expect("on")
        db = _name()
        self._expect("begin")
        if not self._kw("select"):
            raise InfluxQLError("CQ body must be a SELECT")
        body = self._select_body()
        self._expect("end")
        if body.into is None:
            raise InfluxQLError("a continuous query needs INTO")
        if body.bucket_s is None:
            raise InfluxQLError("a continuous query needs GROUP BY time()")
        if body.fill != "none":
            raise InfluxQLError(
                "CQ FILL is unsupported (a standing stream materializes "
                "observed buckets; fill on read)")
        if body.bucket_off_s:
            raise InfluxQLError("CQ time() offset is unsupported")
        if any(p.scale_op for p in body.projs):
            raise InfluxQLError("CQ projections take no arithmetic")
        # first/last need the state_id tie-break the wire stream does not
        # carry — honest subset: the order-free aggregates only
        bad = {p.func for p in body.projs} - (_AGGS - {"first", "last"})
        if bad:
            raise InfluxQLError(f"CQ body supports order-free aggregates "
                                f"only, got {sorted(bad)}")
        if not isinstance(body.measurement, str):
            raise InfluxQLError("CQ body cannot use a subquery")
        return InfluxCQ(name, db, body)

    def _show(self) -> InfluxShow:
        if self._kw("databases"):
            kind = "databases"
        elif self._kw("retention", "policies"):
            kind = "retention_policies"
        elif self._kw("measurements"):
            kind = "measurements"
        elif self._kw("tag", "keys"):
            kind = "tag_keys"
        elif self._kw("tag", "values"):
            kind = "tag_values"
        elif self._kw("field", "keys"):
            kind = "field_keys"
        elif self._kw("series", "exact", "cardinality") \
                or self._kw("series", "cardinality"):
            kind = "cardinality"
        elif self._kw("series"):
            kind = "series"
        else:
            raise InfluxQLError(
                f"unsupported SHOW statement at {self._peek()!r}")
        measurement = None
        if self._kw("from"):
            src = self._next()
            if src.kind == "dquote":
                measurement = src.text[1:-1]
            elif src.kind == "ident":
                measurement = src.text
            else:
                raise InfluxQLError(f"bad FROM source {src.text!r}")
        with_key = None
        if self._kw("with", "key"):
            self._expect("=")
            k = self._next()
            name = (k.text[1:-1] if k.kind == "dquote"
                    else k.text).lower()
            if name not in _TAGS:
                raise InfluxQLError(f"unknown tag key {name!r}")
            with_key = name
        if kind == "tag_values" and with_key is None:
            raise InfluxQLError("SHOW TAG VALUES needs WITH KEY = <tag>")
        return InfluxShow(kind, measurement, with_key)

    def _proj(self) -> Proj:
        t = self._next()
        name = t.text.lower()
        if t.kind == "ident" and name == "value":
            return self._proj_scale(Proj(None))
        if t.kind != "ident" or name not in (_AGGS | _SELECTORS
                                             | _TRANSFORMS | _SINGLETONS
                                             | _MATH | {"count"}):
            raise InfluxQLError(f"unsupported projection {t.text!r}")
        self._expect("(")
        a = self._next()
        if a.kind == "ident" and a.text.lower() == "distinct" \
                and self._peek() and self._peek().text == "(":
            # COUNT(DISTINCT(value)) — InfluxQL's nested-distinct form
            if name != "count":
                raise InfluxQLError("DISTINCT() nests under COUNT only")
            self._next()
            fld_t = self._next()
            fld = (fld_t.text[1:-1] if fld_t.kind == "dquote"
                   else fld_t.text).lower()
            self._expect(")")
            self._expect(")")
            return Proj("count_distinct", None, fld)
        if a.kind == "dquote":
            fld = a.text[1:-1].lower()
        elif a.kind == "ident":
            fld = a.text.lower()
        else:
            raise InfluxQLError(f"functions take a field, got {a.text!r}")
        arg = None
        if self._peek() and self._peek().text == ",":
            self._next()
            arg = self._number()
        self._expect(")")
        if name in ("top", "bottom", "percentile", "moving_average",
                    "sample") and arg is None:
            raise InfluxQLError(f"{name.upper()} needs a second argument")
        return self._proj_scale(Proj(name, arg, fld))

    def _proj_scale(self, p: Proj) -> Proj:
        """Optional trailing unit-conversion arithmetic on a projection:
        ``MEAN(value) * 100``, ``value / 1000`` — one operator, numeric
        literal RHS (the Grafana unit-scaling idiom)."""
        t = self._peek()
        if t is None or t.text not in ("*", "+", "-"):
            return p
        # '-'/'+' could open a signed literal elsewhere, but in
        # projection position only scaling follows; '/' would lex as a
        # regex, so division is written '* 0.001'
        op = self._next().text
        k = self._number()
        if p.func in _SELECTORS or p.func in _TRANSFORMS \
                or p.func in _SINGLETONS:
            raise InfluxQLError(
                "arithmetic applies to aggregates and raw fields only")
        return Proj(p.func, p.arg, p.field, op, k)

    # WHERE boolean grammar: expr := term (OR term)*;
    # term := factor (AND factor)*; factor := '(' expr ')' | cond.
    # The AND-chain is kept flat (the InfluxSelect.where tuple) so the
    # common no-OR query keeps its original shape; OR groups become
    # CondOr nodes inside that chain.
    def _where_and(self) -> tuple:
        out = [self._where_factor()]
        while self._kw("and"):
            out.append(self._where_factor())
        return tuple(out)

    def _where_factor(self):
        if self._peek() and self._peek().text == "(":
            self._next()
            alts = [self._where_and()]
            while self._kw("or"):
                alts.append(self._where_and())
            self._expect(")")
            if len(alts) == 1:
                # parenthesized AND-chain: collapse if single cond
                return (alts[0][0] if len(alts[0]) == 1
                        else CondOr((alts[0],)))
            return CondOr(tuple(alts))
        return self._cond()

    def _time_literal(self) -> float:
        """Epoch seconds: ``1704067200s`` / bare number / ``now()`` with
        optional ``± duration`` (resolved against the PINNED now_s —
        queries with now() refuse to compile without one, keeping every
        plan deterministic and oracle-reproducible)."""
        t = self._next()
        if t.kind == "ident" and t.text.lower() == "now":
            self._expect("(")
            self._expect(")")
            if self.now_s is None:
                raise InfluxQLError(
                    "now() needs a pinned now_s "
                    "(parse_influxql(text, now_s=...))")
            val = float(self.now_s)
            nxt = self._peek()
            if nxt and nxt.text in ("+", "-"):
                sign = 1.0 if self._next().text == "+" else -1.0
                val += sign * self._duration_s()
            return val
        if t.kind == "duration":                # 1704067200s epoch literal
            if not t.text.endswith("s") or t.text.endswith("ms"):
                raise InfluxQLError(f"bad time literal {t.text!r}")
            return float(t.text[:-1])
        if t.kind == "number":
            return float(t.text)
        if t.kind == "squote":
            # RFC3339: '2024-01-15T06:00:00Z' or a bare '2024-01-15'
            # date — resolved driver-side to UTC epoch seconds (a pure
            # literal rewrite; the plan still sees one float bound)
            from datetime import datetime, timezone
            raw = t.text[1:-1]
            try:
                iso = raw.replace("Z", "+00:00")
                dt = datetime.fromisoformat(iso)
                if dt.tzinfo is None:
                    dt = dt.replace(tzinfo=timezone.utc)
                return dt.timestamp()
            except ValueError as exc:
                raise InfluxQLError(
                    f"bad RFC3339 time literal {raw!r}") from exc
        raise InfluxQLError(f"bad time literal {t.text!r}")

    def _cond(self) -> Cond:
        lhs = self._next()
        op = self._next()
        if op.kind != "op":
            raise InfluxQLError(f"expected comparison, got {op.text!r}")
        name = lhs.text.lower()
        if name == "time":
            if op.text in ("=~", "!~"):
                raise InfluxQLError("time does not regex-match")
            return Cond("time", op.text, self._time_literal())
        rhs = self._next()
        if name in _TAGS:
            if op.text in ("=~", "!~"):
                if rhs.kind != "regex":
                    raise InfluxQLError(f"{op.text} needs a /regex/")
                return Cond(name, op.text, rhs.text[1:-1])
            if rhs.kind != "squote" or op.text not in ("=", "!=", "<>"):
                raise InfluxQLError(f"tag {name} compares = or != to a "
                                    "'string' (or =~ to a /regex/)")
            return Cond(name, "!=" if op.text == "<>" else op.text,
                        rhs.text[1:-1])
        if name == "value":
            if rhs.text in ("+", "-"):
                sign = -1.0 if rhs.text == "-" else 1.0
                rhs = self._next()
                if rhs.kind != "number":
                    raise InfluxQLError(f"bad field literal {rhs.text!r}")
                return Cond("value", "!=" if op.text == "<>" else op.text,
                            sign * float(rhs.text))
            if rhs.kind != "number":
                raise InfluxQLError(f"bad field literal {rhs.text!r}")
            return Cond("value", "!=" if op.text == "<>" else op.text,
                        float(rhs.text))
        raise InfluxQLError(f"cannot filter on {lhs.text!r}")


def parse_influxql(text: str,
                   now_s: float | None = None) -> InfluxSelect:
    return _Parser(text, now_s=now_s).parse()


# ---------------------------------------------------------------- compiler

_OPS = {"=": "==", "!=": "!=", "<": "<", "<=": "<=", ">": ">", ">=": ">="}


def _cond_expr(c):
    if isinstance(c, CondOr):
        alt_exprs = []
        for alt in c.alts:
            e = _cond_expr(alt[0])
            for sub in alt[1:]:
                e = e & _cond_expr(sub)
            alt_exprs.append(e)
        out = alt_exprs[0]
        for e in alt_exprs[1:]:
            out = out | e
        return out
    col = F.col("ts_epoch") if c.lhs == "time" else F.col(c.lhs)
    if c.op == "=~":
        return col.rlike(c.rhs)
    if c.op == "!~":
        return ~col.rlike(c.rhs)
    return {
        "=": col == F.lit(c.rhs), "!=": col != F.lit(c.rhs),
        "<": col < F.lit(c.rhs), "<=": col <= F.lit(c.rhs),
        ">": col > F.lit(c.rhs), ">=": col >= F.lit(c.rhs),
    }[c.op]


def _apply_where(pts: DataFrame, ast: InfluxSelect) -> DataFrame:
    if isinstance(ast.measurement, Regex):
        out = pts.filter(
            F.col("measurement").rlike(ast.measurement.pattern))
    elif isinstance(ast.measurement, MeasurementList):
        out = pts.filter(
            F.col("measurement").isin(*ast.measurement.names))
    else:
        out = pts.filter(F.col("measurement") == ast.measurement)
    for c in ast.where:
        out = out.filter(_cond_expr(c))
    return out


def _series_cols(ast: InfluxSelect) -> list[str]:
    return ["measurement", *ast.group_tags]


def _series_window(ast: InfluxSelect) -> Window:
    return (Window.partitionBy(*_series_cols(ast))
            .orderBy("ts_epoch", "state_id"))


_MICRO = 1e6


def _agg_expr(p: Proj):
    """Bucket/series aggregate for one projection, cross-engine-exact:
    mean/sum via micro-quantized BIGINT accumulation; STDDEV from
    milli-quantized integer moments under ONE shared double expression
    (the `q_influx_stddev_median` recipe); MEDIAN per InfluxDB's rule
    (average of the two middle values) over a sorted collect_list —
    per-bucket state is bounded by points-per-series-per-bucket, the
    same bound InfluxDB's own sorted-iterator median pays."""
    micro = F.sum(F.round(F.col("value") * _MICRO).cast("long"))
    order = F.struct("ts_epoch", "state_id")
    n = F.count(F.lit(1))
    milli = F.round(F.col("value") * 1e3).cast("long")
    arr = F.sort_array(F.collect_list("value"))
    asz = F.size(arr)
    return {
        "count": F.count(F.lit(1)).alias("count"),
        "sum": (micro / _MICRO).alias("sum"),
        "mean": ((micro / _MICRO) / F.count(F.lit(1))).alias("mean"),
        "min": F.min("value").alias("min"),
        "max": F.max("value").alias("max"),
        "spread": (F.max("value") - F.min("value")).alias("spread"),
        "first": F.min_by("value", order).alias("first"),
        "last": F.max_by("value", order).alias("last"),
        "stddev": F.when(
            n > 1,
            F.sqrt((n * F.sum(milli * milli) - F.sum(milli)
                    * F.sum(milli)).cast("double")
                   / (n * (n - 1)).cast("double")) / F.lit(1e3),
        ).alias("stddev"),
        "median": ((F.element_at(arr, F.floor((asz + 1) / 2)
                                 .cast("int"))
                    + F.element_at(arr, (F.floor(asz / 2) + 1)
                                   .cast("int"))) / F.lit(2.0)
                   ).alias("median"),
        "count_distinct": F.count_distinct(F.col("value"))
                           .alias("count_distinct"),
    }[p.func]


def _compile_math(pts: DataFrame, ast: InfluxSelect) -> DataFrame:
    """Per-point math projections (``SELECT ABS(value) …``, InfluxQL
    1.6+): a pure row-local column expression — no window, no shuffle.
    ceil/floor return DOUBLE (InfluxDB's float fields; Spark's LONG is
    cast) and round half-away-from-zero matches DuckDB's."""
    p = ast.projs[0]
    fn = {"abs": F.abs, "ceil": F.ceil, "floor": F.floor,
          "round": F.round}[p.func]
    val = fn(F.col("value")).cast("double")
    if p.scale_op:
        val = {"*": val * p.scale_k, "+": val + p.scale_k,
               "-": val - p.scale_k}[p.scale_op]
    return pts.select("state_id", *_series_cols(ast),
                      F.col("ts_epoch").alias("time"),
                      val.alias(p.func))


def _compile_raw(pts: DataFrame, ast: InfluxSelect) -> DataFrame:
    p = ast.projs[0]
    val = F.col("value")
    if p.scale_op:
        val = {"*": val * p.scale_k, "+": val + p.scale_k,
               "-": val - p.scale_k}[p.scale_op]
    out = pts.select("state_id", *_series_cols(ast),
                     F.col("ts_epoch").alias("time"),
                     val.alias("value"))
    off = ast.offset or 0
    if ast.grouped:
        if ast.limit is not None:
            w = (Window.partitionBy(*_series_cols(ast))
                 .orderBy(*([F.desc("time"), F.desc("state_id")]
                            if ast.order_desc
                            else [F.asc("time"), F.asc("state_id")])))
            out = (out.withColumn("_rn", F.row_number().over(w))
                   .filter((F.col("_rn") > off)
                           & (F.col("_rn") <= off + ast.limit))
                   .drop("_rn"))
        return out
    if ast.limit is not None:
        keys = ([F.desc("time"), F.desc("state_id")] if ast.order_desc
                else [F.asc("time"), F.asc("state_id")])
        # TakeOrderedAndProject keeps limit+offset rows; the OFFSET skip
        # ranks only that tiny bounded relation
        out = out.orderBy(*keys).limit((ast.limit or 0) + off)
        if off:
            w = Window.orderBy(*keys)
            out = (out.withColumn("_rn", F.row_number().over(w))
                   .filter(F.col("_rn") > off).drop("_rn"))
    return out


def _compile_transform(pts: DataFrame, ast: InfluxSelect) -> DataFrame:
    p = ast.projs[0]
    w = _series_window(ast)
    base = ["state_id", *_series_cols(ast),
            F.col("ts_epoch").alias("time")]
    dv = F.col("value") - F.lag("value").over(w)
    dt = F.col("ts_epoch") - F.lag("ts_epoch").over(w)
    if p.func == "derivative":
        out = pts.select(*base, F.when(dt != 0, dv / dt).alias("derivative"),
                         dt.alias("_dt")).filter(
            F.col("_dt").isNotNull()).drop("_dt")
    elif p.func == "non_negative_derivative":
        out = pts.select(
            *base, F.when(dt != 0, dv / dt).alias("non_negative_derivative"),
            dt.alias("_dt"),
        ).filter(F.col("_dt").isNotNull()
                 & (F.col("non_negative_derivative") >= 0)).drop("_dt")
    elif p.func == "difference":
        out = pts.select(*base, dv.alias("difference")).filter(
            F.col("difference").isNotNull())
    elif p.func == "cumulative_sum":
        micro = F.round(F.col("value") * _MICRO).cast("long")
        run = w.rowsBetween(Window.unboundedPreceding, 0)
        out = pts.select(
            *base, (F.sum(micro).over(run) / _MICRO).alias("cumulative_sum"))
    elif p.func == "elapsed":
        # ELAPSED(value): seconds since the previous point of the series
        # (Influx defaults to ns; the point relation's clock is seconds —
        # documented unit, same lag shape as DIFFERENCE)
        out = pts.select(*base, dt.alias("elapsed")).filter(
            F.col("elapsed").isNotNull())
    else:                                   # moving_average(value, n)
        n = int(p.arg)
        if not 2 <= n <= 64:
            raise InfluxQLError("MOVING_AVERAGE window must be in [2, 64]")
        # explicit left-associated sum: bit-identical in the oracle,
        # unlike a frame-spec AVG whose association the engine picks
        acc = F.lag("value", n - 1).over(w)
        for k in range(n - 2, 0, -1):
            acc = acc + F.lag("value", k).over(w)
        acc = (acc + F.col("value")) / F.lit(float(n))
        out = pts.select(*base, acc.alias("moving_average")).filter(
            F.col("moving_average").isNotNull())
    if ast.order_desc:
        out = out.orderBy(*_series_cols(ast), F.desc("time"),
                          F.desc("state_id"))
    return out


def _compile_selector(pts: DataFrame, ast: InfluxSelect) -> DataFrame:
    p = ast.projs[0]
    if p.func == "percentile":
        wv = (Window.partitionBy(*_series_cols(ast))
              .orderBy("value", "state_id"))
        n = F.count(F.lit(1)).over(Window.partitionBy(*_series_cols(ast)))
        ranked = pts.select(
            *_series_cols(ast), "value",
            F.row_number().over(wv).alias("_rn"),
            F.greatest(F.lit(1),
                       F.ceil(n * F.lit(p.arg / 100.0))).alias("_t"),
        )
        return (ranked.filter(F.col("_rn") == F.col("_t"))
                .select(*_series_cols(ast),
                        F.col("value").alias("percentile")))
    n = int(p.arg)
    if p.func == "sample":
        # derandomized sample (operators/sampling.py precedent):
        # md5(state_id) rank — retries and the oracle reproduce it
        w = Window.partitionBy(*_series_cols(ast)).orderBy(
            F.md5(F.col("state_id").cast("string")), "state_id")
        return (
            pts.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .select("state_id", *_series_cols(ast),
                    F.col("ts_epoch").alias("time"),
                    F.col("value").alias("sample"))
        )
    order = ([F.desc("value"), F.asc("ts_epoch"), F.asc("state_id")]
             if p.func == "top"
             else [F.asc("value"), F.asc("ts_epoch"), F.asc("state_id")])
    w = Window.partitionBy(*_series_cols(ast)).orderBy(*order)
    return (
        pts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .select("state_id", *_series_cols(ast),
                F.col("ts_epoch").alias("time"),
                F.col("value").alias(p.func), F.col("_rn").alias("rank"))
    )


def _scaled_agg(p: Proj):
    """One projection's aggregate with its optional trailing arithmetic
    (``MEAN(value) * 100``) folded in — the scale applies to computed
    aggregates; FILL constants are emitted as-is (fill runs after
    projection arithmetic, Influx's own order)."""
    e = _agg_expr(p)
    if p.scale_op:
        e = {"*": e * p.scale_k, "+": e + p.scale_k,
             "-": e - p.scale_k}[p.scale_op].alias(p.func)
    return e


def _compile_agg(pts: DataFrame, ast: InfluxSelect) -> DataFrame:
    keys = _series_cols(ast)
    aggs = [_scaled_agg(p) for p in ast.projs]
    if ast.bucket_s is None:
        return pts.groupBy(*keys).agg(*aggs)

    off = ast.bucket_off_s
    if ast.tz is not None:
        # tz('Zone'): buckets align to LOCAL boundaries. Per-row zone
        # offset from the engine's tzdata (whole seconds — offsets are
        # minute-granular, so the floor-second probe is exact), bucket
        # on the shifted epoch, and each bucket label converts its
        # local boundary back to the UTC instant (DST-correct at bucket
        # granularity — exactly InfluxDB's tz() semantics). Both
        # engines read the same IANA database, so the DuckDB oracle is
        # value-exact.
        secs = F.floor(F.col("ts_epoch")).cast("long")
        row_off = (F.unix_timestamp(
            F.from_utc_timestamp(F.timestamp_seconds(secs), ast.tz))
            - secs)
        bucket = F.floor((F.col("ts_epoch") + row_off.cast("double"))
                         / ast.bucket_s).cast("long")
    else:
        bucket = F.floor((F.col("ts_epoch") - off)
                         / ast.bucket_s).cast("long")
    buckets = (pts.select(*keys, bucket.alias("_b"), "value",
                          "ts_epoch", "state_id")
               .groupBy(*keys, "_b").agg(*aggs))
    names = [p.func for p in ast.projs]
    if ast.tz is not None:
        label = F.unix_timestamp(F.to_utc_timestamp(
            F.timestamp_seconds(F.col("_b") * ast.bucket_s), ast.tz))
        return buckets.select(*keys, label.alias("time"), *names)
    if ast.fill == "none":
        return buckets.select(
            *keys, (F.col("_b") * ast.bucket_s + off).alias("time"),
            *names)

    # gap expansion on the DOWNSAMPLED relation (lag + sequence — the
    # q_influx_downsample shape; no calendar crossJoin, two exchanges)
    wseries = Window.partitionBy(*keys).orderBy("_b")
    prevs = [F.lag("_b").over(wseries).alias("_prev")]
    if ast.fill == "linear":
        if len(names) != 1:
            raise InfluxQLError("FILL(linear) supports one aggregate")
        prevs.append(F.lag(names[0]).over(wseries).alias("_prev_val"))
    lagged = buckets.select(*keys, "_b", *names, *prevs)
    expanded = lagged.select(
        *keys, "_b", *names,
        *(["_prev_val"] if ast.fill == "linear" else []),
        "_prev",
        F.explode(F.sequence(
            F.coalesce(F.col("_prev") + 1, F.col("_b")), F.col("_b"),
        )).alias("_g"),
    )
    is_real = F.col("_g") == F.col("_b")
    out_cols = [(F.col("_g") * ast.bucket_s + off).alias("time")]
    for name in names:
        if ast.fill == "previous":
            wfill = (Window.partitionBy(*keys).orderBy("_g")
                     .rowsBetween(Window.unboundedPreceding, 0))
            val = F.last(F.when(is_real, F.col(name)),
                         ignorenulls=True).over(wfill)
        elif ast.fill == "null":
            val = F.when(is_real, F.col(name))
        elif ast.fill == "linear":
            interp = (
                F.col("_prev_val")
                + (F.col(name) - F.col("_prev_val"))
                * (F.col("_g") - F.col("_prev")).cast("double")
                / (F.col("_b") - F.col("_prev")).cast("double"))
            val = F.when(is_real, F.col(name)).otherwise(interp)
        else:                               # FILL(<number>)
            val = F.when(is_real, F.col(name)).otherwise(F.lit(ast.fill))
            if name in ("count", "count_distinct"):
                val = val.cast("long")
        out_cols.append(val.alias(name))
    return expanded.select(*_series_cols(ast), *out_cols)


def _compile_singleton(pts: DataFrame, ast: InfluxSelect) -> DataFrame:
    """MODE / INTEGRAL / DISTINCT — each needs its own two-stage shape
    (pre-aggregation or ordered-lag) rather than a plain groupBy agg, so
    they compile alone (matching the function layer's dedicated plans).

    - MODE: (series[, bucket], value) count → min_by over (-freq, value)
      (InfluxDB's lowest-value-wins tie rule); the second agg rides the
      already-collapsed distinct relation on the same keys.
    - DISTINCT: two-phase distinct — map-side combine collapses each
      partition's duplicates before the one exchange.
    - INTEGRAL: per-series trapezoid (value+prev)/2·dt summed, lag and
      sum on ONE series shuffle; micro-quantized terms keep the oracle
      bit-exact. Unit: value·seconds (Influx's default unit=1s).
    """
    p = ast.projs[0]
    keys = _series_cols(ast)
    bucket_cols, bucket_out = [], []
    if ast.bucket_s is not None:
        if p.func == "integral":
            raise InfluxQLError("INTEGRAL does not take GROUP BY time()")
        b = (F.floor((F.col("ts_epoch") - ast.bucket_off_s)
                     / ast.bucket_s).cast("long")
             * ast.bucket_s + ast.bucket_off_s)
        pts = pts.withColumn("_t", b)
        bucket_cols, bucket_out = ["_t"], [F.col("_t").alias("time")]
    if p.func == "mode":
        freq = pts.groupBy(*keys, *bucket_cols, "value").agg(
            F.count(F.lit(1)).alias("_f"))
        return (freq.groupBy(*keys, *bucket_cols).agg(
            F.min_by("value", F.struct((-F.col("_f")).alias("nf"),
                                       "value")).alias("mode"))
            .select(*keys, *bucket_out, "mode"))
    if p.func == "distinct":
        return (pts.select(*keys, *bucket_cols, "value").distinct()
                .select(*keys, *bucket_out,
                        F.col("value").alias("distinct")))
    # integral — the q_influx_integral association, bit-pinned:
    # (v + prev) * dt / 2.0, micro-quantized, integer-summed
    w = _series_window(ast)
    trap = ((F.col("value") + F.lag("value").over(w))
            * (F.col("ts_epoch") - F.lag("ts_epoch").over(w))
            / F.lit(2.0))
    term = F.round(trap * _MICRO).cast("long")
    return (pts.select(*keys, term.alias("_a"))
            .filter(F.col("_a").isNotNull())
            .groupBy(*keys)
            .agg((F.sum("_a") / _MICRO).alias("integral")))


def _apply_point_limit(out: DataFrame, ast: InfluxSelect) -> DataFrame:
    """InfluxDB's LIMIT semantics for NON-RAW results: LIMIT/OFFSET cap
    output POINTS per series (buckets for a GROUP BY time() aggregate,
    emitted rows for a transform). One rank on the series window the
    result already shuffled on; a whole-series single-row aggregate has
    one point, so OFFSET ≥ 1 empties it and any LIMIT keeps it."""
    if ast.limit is None:
        return out
    keys = _series_cols(ast)
    off = ast.offset or 0
    if "time" not in out.columns:
        return out.limit(0) if off >= 1 else out
    order = [F.desc("time") if ast.order_desc else F.asc("time")]
    if "state_id" in out.columns:
        order.append(F.desc("state_id") if ast.order_desc
                     else F.asc("state_id"))
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") > off) & (F.col("_rn") <= off + ast.limit))
        .drop("_rn")
    )


def _apply_slimit(out: DataFrame, ast: InfluxSelect) -> DataFrame:
    if ast.slimit is None:
        return out
    keys = _series_cols(ast)
    soff = ast.soffset or 0
    series = (out.select(*keys).distinct()
              .orderBy(*keys).limit(ast.slimit + soff))
    if soff:
        # rank the already-tiny limited series relation (≤ slimit+soffset
        # rows — driver-bounded, not a data-scale window)
        w = Window.orderBy(*keys)
        series = (series.withColumn("_sn", F.row_number().over(w))
                  .filter(F.col("_sn") > soff).drop("_sn"))
    return out.join(F.broadcast(series), keys)


def _compile_delete(pts: DataFrame, ast: InfluxDelete) -> DataFrame:
    """DELETE/DROP compile to the RETAINED relation (the complement of
    the deletion predicate) — on a lakehouse the delete is a
    partition-pruned rewrite and this is exactly what gets rewritten.
    InfluxDB's documented constraint holds: DELETE predicates are time
    and tags only, never fields."""
    for c in ast.where:
        lhs = c.lhs if isinstance(c, Cond) else None
        if isinstance(c, CondOr) or lhs == "value":
            raise InfluxQLError(
                "DELETE supports AND-chains over time/tags only "
                "(InfluxDB's own constraint)")
    doomed = F.col("measurement") == ast.measurement
    for c in ast.where:
        doomed = doomed & _cond_expr(c)
    return pts.filter(~doomed)


def _compile_show(pts: DataFrame, ast: InfluxShow) -> DataFrame:
    """SHOW meta statements — every one is a distinct/count-distinct over
    the series-key columns, so the plan is a partial aggregation (map-side
    combine collapses each partition to its distinct series first) plus
    one exchange on the already-tiny distinct relation."""
    if ast.kind == "databases":
        # one logical database: the migrated HA bucket (reference
        # sqllite2influxdb.py writes a single INFLUXDB_BUCKET)
        return pts.sparkSession.createDataFrame(
            [(_DB_NAME,)], "name string")
    if ast.kind == "retention_policies":
        # the stock autogen policy InfluxDB creates per database —
        # infinite retention, replication 1 (a lakehouse table keeps
        # history; retention is a lifecycle policy, not a row filter)
        return pts.sparkSession.createDataFrame(
            [("autogen", "0s", "168h0m0s", 1, True)],
            "name string, duration string, shardGroupDuration string, "
            "replicaN int, `default` boolean")
    if ast.measurement is not None:
        pts = pts.filter(F.col("measurement") == ast.measurement)
    if ast.kind == "measurements":
        return (pts.select(F.col("measurement").alias("name"))
                .distinct().orderBy("name"))
    if ast.kind == "tag_keys":
        return (pts.select("measurement").distinct()
                .select("measurement",
                        F.explode(F.array(*[F.lit(t) for t in _TAGS]))
                        .alias("tagKey"))
                .orderBy("measurement", "tagKey"))
    if ast.kind == "tag_values":
        return (pts.select(F.lit(ast.with_key).alias("key"),
                           F.col(ast.with_key).alias("value"))
                .distinct().orderBy("value"))
    if ast.kind == "field_keys":
        return (pts.select("measurement").distinct()
                .select("measurement", F.lit("value").alias("fieldKey"),
                        F.lit("float").alias("fieldType"))
                .orderBy("measurement"))
    if ast.kind == "series":
        # SHOW SERIES: one line-protocol-style key per distinct series —
        # the exact text InfluxDB prints (fixture tag values carry no
        # commas/spaces, so no escaping subset needed)
        return (pts.select("measurement", *_TAGS).distinct()
                .select(F.concat_ws(
                    ",", F.col("measurement"),
                    *[F.concat(F.lit(f"{t}="), F.col(t)) for t in _TAGS])
                    .alias("key"))
                .orderBy("key"))
    # series cardinality: exact distinct count of (measurement, tags)
    return (pts.select("measurement", *_TAGS).distinct()
            .agg(F.count(F.lit(1)).alias("count")))


def compile_influxql(spark: SparkSession, sf_dir: str, text: str,
                     now_s: float | None = None) -> DataFrame:
    """Parse InfluxQL ``text`` and build its DataFrame over the migrated
    point relation at ``sf_dir``. Queries using ``now()`` must pass a
    pinned ``now_s`` (epoch seconds) — the engine never reads the wall
    clock, so retries, oracles and repeated runs see one time."""
    ast = parse_influxql(text, now_s=now_s)
    return compile_ast(_numeric_points(spark, sf_dir), ast)


def _compile_outer_transform(inner_df: DataFrame,
                             ast: InfluxSelect) -> DataFrame:
    """Outer TRANSFORM over a time-bucketed subquery — the Grafana
    "rate of the hourly mean" idiom (``SELECT DERIVATIVE(mean) FROM
    (SELECT MEAN(value) … GROUP BY time(1h), *)``). The transform rides
    a window keyed on the inner's series columns ordered by the bucket
    ``time`` (unique per series — no tie-break needed), over the
    ALREADY-DOWNSAMPLED small relation: the big scan pays only the
    inner's one exchange. Supported: DERIVATIVE /
    NON_NEGATIVE_DERIVATIVE (per second), DIFFERENCE, CUMULATIVE_SUM —
    each with the established cross-engine exactness discipline
    (row-local doubles; micro-quantized BIGINT running sum)."""
    inner = ast.measurement
    if ast.tz is not None or inner.tz is not None:
        raise InfluxQLError("tz() inside subqueries is unsupported")
    if len(ast.projs) != 1 or len(inner.projs) != 1:
        raise InfluxQLError(
            "outer transforms take exactly one projection over a "
            "single-aggregate subquery")
    p = ast.projs[0]
    if p.scale_op:
        raise InfluxQLError("subquery outer projections take no "
                            "arithmetic")
    if p.func not in ("derivative", "non_negative_derivative",
                      "difference", "cumulative_sum"):
        raise InfluxQLError(f"outer {p.func.upper()} over a subquery "
                            "is unsupported")
    fname = inner.projs[0].func
    if p.field != fname:
        raise InfluxQLError(
            f"outer field {p.field!r} is not produced by the subquery "
            f"(has: {fname!r})")
    if inner.bucket_s is None:
        raise InfluxQLError("outer transforms need a time-bucketed "
                            "subquery (add GROUP BY time())")
    if inner.fill not in ("none", "previous", "linear") or ast.where \
            or ast.bucket_s is not None or ast.fill != "none":
        raise InfluxQLError("outer transforms take no WHERE/GROUP BY "
                            "time()/FILL of their own")
    keys = ["measurement", *inner.group_tags]
    w = Window.partitionBy(*keys).orderBy("time")
    v = F.col(fname)
    if p.func == "cumulative_sum":
        wrun = w.rowsBetween(Window.unboundedPreceding, 0)
        micro = F.round(v * _MICRO).cast("long")
        return inner_df.select(
            *keys, "time",
            (F.sum(micro).over(wrun) / _MICRO).alias("cumulative_sum"))
    dv = v - F.lag(v).over(w)
    dt = (F.col("time") - F.lag("time").over(w)).cast("double")
    if p.func == "difference":
        return (inner_df.select(*keys, "time", dv.alias("difference"))
                .filter(F.col("difference").isNotNull()))
    rate = F.when(dt != 0, dv / dt)
    if p.func == "non_negative_derivative":
        return (inner_df.select(
                    *keys, "time", rate.alias("non_negative_derivative"),
                    dt.alias("_dt"))
                .filter(F.col("_dt").isNotNull()
                        & (F.col("non_negative_derivative") >= 0))
                .drop("_dt"))
    return (inner_df.select(*keys, "time", rate.alias("derivative"),
                            dt.alias("_dt"))
            .filter(F.col("_dt").isNotNull()).drop("_dt"))


def _compile_outer_agg(inner_df: DataFrame,
                       ast: InfluxSelect) -> DataFrame:
    """The outer half of an InfluxQL subquery — aggregates over the
    inner SELECT's result (the Grafana re-bucketing idiom, e.g. daily
    MEAN of hourly MAXes). The inner relation is already downsampled, so
    this stage aggregates the SMALL relation; its exchange keys start
    with the same series columns as the inner's, and an outer
    ``GROUP BY time(d)`` re-buckets the inner's epoch-aligned ``time``."""
    inner = ast.measurement
    if ast.tz is not None or inner.tz is not None:
        raise InfluxQLError("tz() inside subqueries is unsupported")
    inner_names = {p.func for p in inner.projs}
    for p in ast.projs:
        if p.func not in _AGGS:
            raise InfluxQLError(
                "subquery outer SELECT supports aggregates only")
        if p.scale_op:
            raise InfluxQLError(
                "subquery outer projections take no arithmetic")
        if p.field not in inner_names:
            raise InfluxQLError(
                f"outer field {p.field!r} is not produced by the "
                f"subquery (has: {sorted(n for n in inner_names if n)})")
    if not set(ast.group_tags) <= set(inner.group_tags):
        raise InfluxQLError("outer GROUP BY tags must be a subset of "
                            "the subquery's")
    if ast.where:
        raise InfluxQLError("put WHERE inside the subquery")
    if ast.bucket_s is not None and inner.bucket_s is None:
        raise InfluxQLError("outer GROUP BY time() needs a time-bucketed "
                            "subquery")
    if inner.bucket_s is None and any(p.func in ("first", "last")
                                      for p in ast.projs):
        raise InfluxQLError("outer FIRST/LAST need the subquery's time "
                            "column (add GROUP BY time())")
    if ast.fill != "none":
        raise InfluxQLError("outer FILL is unsupported")

    keys: list = ["measurement", *ast.group_tags]
    out_time: list = []
    if ast.bucket_s is not None:
        grid = (F.floor(F.col("time") / ast.bucket_s).cast("long")
                * ast.bucket_s)
        inner_df = inner_df.withColumn("_ot", grid)
        keys = [*keys, "_ot"]
        out_time = [F.col("_ot").alias("time")]

    aggs = []
    for p in ast.projs:
        f_ = p.field
        micro = F.sum(F.round(F.col(f_) * _MICRO).cast("long"))
        aggs.append({
            "count": F.count(F.col(f_)),
            "sum": micro / _MICRO,
            "mean": (micro / _MICRO) / F.count(F.col(f_)),
            "min": F.min(f_),
            "max": F.max(f_),
            "spread": F.max(f_) - F.min(f_),
            # the inner bucket grid is unique per (series, time), so
            # time alone is a total order within a series
            "first": F.min_by(f_, F.col("time")),
            "last": F.max_by(f_, F.col("time")),
        }[p.func].alias(p.func))
    out = inner_df.groupBy(*keys).agg(*aggs)
    return out.select("measurement", *ast.group_tags, *out_time,
                      *[p.func for p in ast.projs])


def run_continuous_query(spark: SparkSession, sf_dir: str,
                         text: str) -> DataFrame:
    """Execute a ``CREATE CONTINUOUS QUERY`` statement the way InfluxDB
    does — as a STANDING query over arriving data: the parsed body's
    aggregates run per (series, event-time bucket window) on the
    line-protocol ingest stream (`plans.streaming_ops._lp_stream`) and
    drain AvailableNow in complete mode (the bounded-stream convention
    of `stream_cq_downsample`). The INTO target names the result
    relation; the memory sink stands in for the target measurement.
    State is bounded by open windows × active series — InfluxDB's own
    CQ shard model."""
    from .streaming_ops import _lp_stream, drain_to_memory

    ast = parse_influxql(text)
    if not isinstance(ast, InfluxCQ):
        raise InfluxQLError("not a CREATE CONTINUOUS QUERY statement")
    sel = ast.select
    pts = _lp_stream(spark, sf_dir).filter(F.col("value").isNotNull())
    pts = _apply_where(pts, sel)
    win = F.window(F.timestamp_seconds(F.col("ts_epoch")),
                   f"{sel.bucket_s} seconds")
    agg = (
        pts.groupBy(*[F.col(c) for c in _series_cols(sel)], win.alias("w"))
        .agg(*[_agg_expr(p) for p in sel.projs])
        .select(
            *_series_cols(sel),
            F.unix_seconds(F.col("w.start")).alias("time"),
            *[p.func for p in sel.projs],
        )
    )
    return drain_to_memory(agg, f"cq_{ast.name}")


def compile_ast(pts: DataFrame,
                ast: InfluxSelect | InfluxShow) -> DataFrame:
    if isinstance(ast, InfluxExplain):
        import io
        from contextlib import redirect_stdout

        inner = compile_ast(pts, ast.select)
        buf = io.StringIO()
        with redirect_stdout(buf):
            inner.explain(mode="formatted")
        lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
        return pts.sparkSession.createDataFrame(
            [(i + 1, ln) for i, ln in enumerate(lines)],
            "line_no int, plan_step string")
    if isinstance(ast, InfluxDelete):
        return _compile_delete(pts, ast)
    if isinstance(ast, InfluxShow):
        return _compile_show(pts, ast)
    if isinstance(ast, InfluxCQ):
        raise InfluxQLError(
            "CREATE CONTINUOUS QUERY runs via run_continuous_query()")
    if isinstance(ast.measurement, InfluxSelect):
        outer_funcs = {p.func for p in ast.projs}
        if outer_funcs <= _TRANSFORMS:
            return _apply_slimit(
                _compile_outer_transform(
                    compile_ast(pts, ast.measurement), ast), ast)
        return _apply_slimit(
            _compile_outer_agg(compile_ast(pts, ast.measurement), ast),
            ast)
    for p in ast.projs:
        if p.field != "value":
            raise InfluxQLError(
                f"unknown field {p.field!r} (the point relation has one "
                "field: value)")
    funcs = {p.func for p in ast.projs}
    if funcs == {None}:
        if len(ast.projs) != 1:
            raise InfluxQLError("SELECT value supports a single field")
        out = _compile_raw(_apply_where(pts, ast), ast)
    elif funcs <= _AGGS:
        out = _apply_point_limit(
            _compile_agg(_apply_where(pts, ast), ast), ast)
    elif len(funcs) == 1 and funcs <= _SINGLETONS:
        if ast.bucket_s is not None and "integral" in funcs:
            raise InfluxQLError("INTEGRAL does not take GROUP BY time()")
        out = _apply_point_limit(
            _compile_singleton(_apply_where(pts, ast), ast), ast)
    elif len(funcs) == 1 and funcs <= _MATH:
        if ast.bucket_s is not None:
            raise InfluxQLError("math functions do not take "
                                "GROUP BY time()")
        out = _apply_point_limit(
            _compile_math(_apply_where(pts, ast), ast), ast)
    elif len(funcs) == 1 and funcs <= _TRANSFORMS:
        if ast.bucket_s is not None:
            raise InfluxQLError("transforms do not take GROUP BY time()")
        out = _apply_point_limit(
            _compile_transform(_apply_where(pts, ast), ast), ast)
    elif len(funcs) == 1 and funcs <= _SELECTORS:
        if ast.bucket_s is not None:
            raise InfluxQLError("selectors do not take GROUP BY time()")
        out = _compile_selector(_apply_where(pts, ast), ast)
        if ast.limit is not None:
            raise InfluxQLError(
                "LIMIT after a selector is redundant — the selector's "
                "N already caps points per series")
    else:
        raise InfluxQLError(
            f"cannot mix projection kinds {sorted(f or 'value' for f in funcs)}")
    return _apply_slimit(out, ast)


# ---------------------------------------------------- registry + oracles

_Q_DOWNSAMPLE = ('SELECT MEAN(value), COUNT(value) FROM "W" '
                 "WHERE time >= 1704067200 AND time < 1706668800 "
                 "GROUP BY time(1h), * FILL(previous)")
_Q_RATE = ('SELECT NON_NEGATIVE_DERIVATIVE(value) FROM "%" GROUP BY *')
_Q_TOP = ("SELECT TOP(value, 3) FROM default_measurement "
          "WHERE domain = 'sensor' GROUP BY *")
_Q_RAW = ('SELECT value FROM default_measurement WHERE value > 50 '
          "ORDER BY time DESC LIMIT 100")
_Q_SUMMARY = ("SELECT SPREAD(value), COUNT(value), FIRST(value), "
              'LAST(value), MEAN(value) FROM "W" GROUP BY * SLIMIT 40')


def q_influxql_text_downsample(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """The Grafana dashboard query typed as TEXT: hourly mean + count
    per series with LOCF fill — compiles to the q_influx_downsample
    plan shape (two exchanges; pinned in tests/test_influxql_text.py)."""
    return compile_influxql(spark, sf_dir, _Q_DOWNSAMPLE)


def q_influxql_text_counter_rate(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """``NON_NEGATIVE_DERIVATIVE`` from text — the counter-rate query."""
    return compile_influxql(spark, sf_dir, _Q_RATE)


def q_influxql_text_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``TOP(value, 3)`` with a tag-equality WHERE, from text."""
    return compile_influxql(spark, sf_dir, _Q_TOP)


def q_influxql_text_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw field select with value predicate + global ordered LIMIT
    (TakeOrderedAndProject), from text."""
    return compile_influxql(spark, sf_dir, _Q_RAW)


def q_influxql_text_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate series summary + SLIMIT series cap, from text."""
    return compile_influxql(spark, sf_dir, _Q_SUMMARY)


_Q_SHOW_TAGVALS = ('SHOW TAG VALUES FROM default_measurement '
                   'WITH KEY = "domain"')


def q_influxql_show_measurements(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """``SHOW MEASUREMENTS`` — the first query every Grafana InfluxQL
    datasource issues."""
    return compile_influxql(spark, sf_dir, "SHOW MEASUREMENTS")


def q_influxql_show_tag_values(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """``SHOW TAG VALUES ... WITH KEY`` — the dashboard-variable query."""
    return compile_influxql(spark, sf_dir, _Q_SHOW_TAGVALS)


def q_influxql_show_cardinality(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """``SHOW SERIES EXACT CARDINALITY`` — exact distinct series count
    (two-phase distinct: map-side combine collapses to per-partition
    distinct series before the one exchange)."""
    return compile_influxql(spark, sf_dir, "SHOW SERIES EXACT CARDINALITY")


_Q_SUBQUERY = ("SELECT MEAN(max), MIN(max) FROM "
               "(SELECT MAX(value) FROM default_measurement "
               "GROUP BY time(1h), *) GROUP BY time(1d), *")


def q_influxql_text_subquery(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """The InfluxQL SUBQUERY re-bucketing idiom: daily MEAN and MIN of
    hourly MAXes — ``FROM (SELECT ...)`` with an outer GROUP BY time(1d)
    over the inner time(1h) grid. The outer aggregate runs on the
    already-downsampled inner relation (tiny), re-using its series-led
    exchange keys."""
    return compile_influxql(spark, sf_dir, _Q_SUBQUERY)


_Q_CQ = ("CREATE CONTINUOUS QUERY cq_hourly ON ha BEGIN "
         "SELECT MEAN(value), COUNT(value) INTO ha_hourly "
         "FROM default_measurement GROUP BY time(1h), * END")


def q_influxql_text_cq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A full CREATE CONTINUOUS QUERY statement, parsed and RUN as
    Structured Streaming over the line-protocol ingest stream — the
    user's standing downsample executing the way InfluxDB executes it,
    with the memory sink standing in for the INTO target."""
    return run_continuous_query(spark, sf_dir, _Q_CQ)


# --- r7 grammar extensions: regex matchers, OR trees, now(), OFFSET,
# and the function tier (STDDEV/MEDIAN/COUNT DISTINCT/MODE/ELAPSED/
# SAMPLE/INTEGRAL) — each compiling to an already-pinned plan shape.

_Q_REGEX_OR = ("SELECT COUNT(value), MEAN(value), STDDEV(value) "
               "FROM /^[W%]/ WHERE entity_id =~ /_[0-3]$/ "
               "AND (value > 50 OR value < 10) GROUP BY *")
_NOW_PIN_S = 1706660000          # 2024-01-31T00:53:20Z, inside the fixture
_Q_NOW = ('SELECT MAX(value), FIRST(value) FROM "W" '
          "WHERE time >= now() - 2w GROUP BY *")
_Q_STATS = ("SELECT STDDEV(value), MEDIAN(value), "
            'COUNT(DISTINCT(value)) FROM "W" GROUP BY time(6h), *')
_Q_MODE_B = ('SELECT MODE(value) FROM "%" GROUP BY time(1d), *')
_Q_OFFSET = ('SELECT value FROM "W" GROUP BY * ORDER BY time DESC '
             "LIMIT 5 OFFSET 5 SLIMIT 10 SOFFSET 5")
_Q_ELAPSED = ("SELECT ELAPSED(value) FROM default_measurement "
              "GROUP BY *")
_Q_SAMPLE = ('SELECT SAMPLE(value, 3) FROM "W" GROUP BY *')
_Q_INTEGRAL = ('SELECT INTEGRAL(value) FROM "W" GROUP BY *')


def q_influxql_text_regex_or(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Regex measurement (``FROM /^[W%]/``), regex tag matcher
    (``entity_id =~ /…/``) and a parenthesized OR value filter — the
    Grafana templated-dashboard WHERE shape. All three predicates stay
    JVM-side column expressions on the one scan."""
    return compile_influxql(spark, sf_dir, _Q_REGEX_OR)


def q_influxql_text_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``WHERE time >= now() - 2w`` — the single most common dashboard
    clause — against a PINNED now (the engine never reads the wall
    clock: retries, oracles and repeated runs resolve the same bound,
    and the time predicate still pushes down to the scan)."""
    return compile_influxql(spark, sf_dir, _Q_NOW, now_s=_NOW_PIN_S)


def q_influxql_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed STDDEV + MEDIAN + COUNT(DISTINCT(value)) in one
    GROUP BY time(6h) aggregate — stddev from quantized integer
    moments, median per InfluxDB's two-middle-average rule."""
    return compile_influxql(spark, sf_dir, _Q_STATS)


def q_influxql_text_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-bucketed MODE(value): lowest-value-wins tie rule on a
    (series, day, value) pre-aggregation."""
    return compile_influxql(spark, sf_dir, _Q_MODE_B)


def q_influxql_text_offset(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Per-series LIMIT/OFFSET pagination + SLIMIT/SOFFSET series
    pagination — the panel-paging query, rank filters on the one
    series window plus a broadcast of the ≤15-row series page."""
    return compile_influxql(spark, sf_dir, _Q_OFFSET)


def q_influxql_text_elapsed(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """``ELAPSED(value)``: seconds since the previous point per series
    (the sensor-gap audit query), one series-window lag."""
    return compile_influxql(spark, sf_dir, _Q_ELAPSED)


def q_influxql_text_sample(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """``SAMPLE(value, 3)`` from text — derandomized md5-rank sample,
    reproduced bit-for-bit by the oracle."""
    return compile_influxql(spark, sf_dir, _Q_SAMPLE)


def q_influxql_text_integral(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """``INTEGRAL(value)`` from text — per-series trapezoid area in
    value·seconds, micro-quantized integer accumulation."""
    return compile_influxql(spark, sf_dir, _Q_INTEGRAL)


_Q_BUCKET_OFF = ('SELECT MEAN(value), COUNT(value) FROM "W" '
                 "GROUP BY time(1h, 30m), *")


def q_influxql_text_bucket_offset(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """``GROUP BY time(1h, 30m)`` — Influx's bucket-alignment offset
    (the Grafana day/week-boundary alignment): buckets shift to
    :30-aligned edges, same two-exchange downsample plan."""
    return compile_influxql(spark, sf_dir, _Q_BUCKET_OFF)


def q_influxql_show_databases(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """``SHOW DATABASES`` — the connect-time handshake query."""
    return compile_influxql(spark, sf_dir, "SHOW DATABASES")


def q_influxql_show_retention(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """``SHOW RETENTION POLICIES`` — the stock autogen policy row."""
    return compile_influxql(spark, sf_dir,
                            "SHOW RETENTION POLICIES")


_Q_SCALED = ('SELECT MEAN(value) * 100, SUM(value) - 50 FROM "%" '
             "WHERE time >= '2024-01-10T00:00:00Z' "
             "AND time < '2024-01-20' GROUP BY time(1d), *")


def q_influxql_text_scaled(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Projection arithmetic (``MEAN(value) * 100`` unit scaling) +
    RFC3339 time literals — the Grafana percent-panel query, typed the
    way users actually type it."""
    return compile_influxql(spark, sf_dir, _Q_SCALED)


_Q_AGG_LIMIT = ('SELECT MEAN(value) FROM "W" GROUP BY time(1d), * '
                "ORDER BY time DESC LIMIT 2")


def q_influxql_text_agg_limit(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """``LIMIT`` on a GROUP BY time() aggregate — InfluxDB caps output
    BUCKETS per series (the "last 2 days per sensor" panel): one rank
    on the series window the downsample already shuffled on."""
    return compile_influxql(spark, sf_dir, _Q_AGG_LIMIT)


_Q_TZ = ('SELECT MEAN(value) FROM "W" GROUP BY time(1d), * '
         "tz('Europe/Berlin')")
_Q_MATH = 'SELECT ROUND(value) FROM "%" WHERE value > 40'
_Q_DELETE = ("DELETE FROM \"default_measurement\" "
             "WHERE time < 1705276800 AND domain = 'sensor'")
_Q_MULTI = 'SELECT SPREAD(value) FROM "W", "%" GROUP BY *'


def q_influxql_text_multi(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """``FROM "W", "%"`` multi-measurement list — one isin() filter,
    measurements stay separate series (the leading series-key col)."""
    return compile_influxql(spark, sf_dir, _Q_MULTI)


def q_influxql_text_delete(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """``DELETE FROM m WHERE time/tags`` — compiled to the retained
    complement (the lakehouse retain-rewrite; see _compile_delete)."""
    return compile_influxql(spark, sf_dir, _Q_DELETE)


def q_influxql_text_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-point math projection (``ROUND(value)``, InfluxQL 1.6+ math
    functions) — a pure row-local expression, zero shuffles."""
    return compile_influxql(spark, sf_dir, _Q_MATH)


def q_influxql_text_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY time(1d) tz('Europe/Berlin')`` — local-midnight daily
    buckets, the clause every non-UTC Grafana dashboard adds. Bucket
    alignment and labels resolve through the engine's IANA tzdata (see
    _compile_agg); the oracle resolves through DuckDB's — a hash match
    means both engines agree on the zone math."""
    return compile_influxql(spark, sf_dir, _Q_TZ)


def q_influxql_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``EXPLAIN SELECT …`` — rows-only registry tier (the plan text is
    engine-specific BY DESIGN, so no cross-engine oracle exists);
    pytest pins that the downsample's plan contains its aggregate and
    no Python evaluation."""
    return compile_influxql(
        spark, sf_dir,
        'EXPLAIN SELECT MEAN(value) FROM "W" GROUP BY time(1h), *')


_Q_RATE_OF_MEAN = ('SELECT DERIVATIVE(mean) FROM '
                   '(SELECT MEAN(value) FROM "W" GROUP BY time(1h), *)')


def q_influxql_rate_of_mean(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Outer DERIVATIVE over an hourly-mean subquery — the Grafana
    "rate of the hourly mean" idiom (see _compile_outer_transform)."""
    return compile_influxql(spark, sf_dir, _Q_RATE_OF_MEAN)


def q_influxql_show_series(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """``SHOW SERIES`` — the full series-key listing (one line-protocol
    key per distinct series), the browse query behind InfluxDB's series
    explorer. Distinct over the series columns: partial agg collapses
    each partition first, one exchange on the tiny distinct relation."""
    return compile_influxql(spark, sf_dir, "SHOW SERIES")


QUERIES = {
    "influxql_text_downsample": q_influxql_text_downsample,
    "influxql_text_counter_rate": q_influxql_text_counter_rate,
    "influxql_text_top": q_influxql_text_top,
    "influxql_text_raw": q_influxql_text_raw,
    "influxql_text_summary": q_influxql_text_summary,
    "influxql_text_subquery": q_influxql_text_subquery,
    "influxql_text_cq": q_influxql_text_cq,
    "influxql_show_measurements": q_influxql_show_measurements,
    "influxql_show_tag_values": q_influxql_show_tag_values,
    "influxql_show_cardinality": q_influxql_show_cardinality,
    "influxql_text_regex_or": q_influxql_text_regex_or,
    "influxql_text_now": q_influxql_text_now,
    "influxql_text_stats": q_influxql_text_stats,
    "influxql_text_mode": q_influxql_text_mode,
    "influxql_text_offset": q_influxql_text_offset,
    "influxql_text_elapsed": q_influxql_text_elapsed,
    "influxql_text_sample": q_influxql_text_sample,
    "influxql_text_integral": q_influxql_text_integral,
    "influxql_text_bucket_offset": q_influxql_text_bucket_offset,
    "influxql_show_databases": q_influxql_show_databases,
    "influxql_show_retention": q_influxql_show_retention,
    "influxql_text_scaled": q_influxql_text_scaled,
    "influxql_text_agg_limit": q_influxql_text_agg_limit,
    "influxql_show_series": q_influxql_show_series,
    "influxql_text_tz": q_influxql_text_tz,
    "influxql_text_math": q_influxql_text_math,
    "influxql_text_delete": q_influxql_text_delete,
    "influxql_text_multi": q_influxql_text_multi,
    "influxql_explain": q_influxql_explain,
    "influxql_rate_of_mean": q_influxql_rate_of_mean,
}

ORACLES = {
    "influxql_text_downsample": f"""{_ORACLE_NUM},
src AS (
  SELECT * FROM num WHERE measurement = 'W'
    AND ts_epoch >= 1704067200 AND ts_epoch < 1706668800
),
buckets AS (
  SELECT measurement, domain, entity_id,
         CAST(floor(ts_epoch / 3600) AS BIGINT) AS b,
         (CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) / 1e6)
           / count(*) AS mean_v,
         count(*) AS count_v
  FROM src GROUP BY 1, 2, 3, 4
),
lagged AS (
  SELECT *, lag(b) OVER (PARTITION BY measurement, domain, entity_id
                         ORDER BY b) AS prev
  FROM buckets
),
expanded AS (
  SELECT measurement, domain, entity_id, b, mean_v, count_v,
         unnest(generate_series(coalesce(prev + 1, b), b)) AS g
  FROM lagged
)
SELECT measurement, domain, entity_id, g * 3600 AS time,
  last_value(CASE WHEN g = b THEN mean_v END IGNORE NULLS)
    OVER (PARTITION BY measurement, domain, entity_id ORDER BY g
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mean,
  last_value(CASE WHEN g = b THEN count_v END IGNORE NULLS)
    OVER (PARTITION BY measurement, domain, entity_id ORDER BY g
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS "count"
FROM expanded
""",
    "influxql_text_counter_rate": f"""{_ORACLE_NUM},
src AS (SELECT * FROM num WHERE measurement = '%'),
d AS (
  SELECT state_id, measurement, domain, entity_id, ts_epoch AS time,
    CASE WHEN ts_epoch - lag(ts_epoch) OVER w != 0 THEN
      (value - lag(value) OVER w) / (ts_epoch - lag(ts_epoch) OVER w)
    END AS non_negative_derivative,
    ts_epoch - lag(ts_epoch) OVER w AS dt
  FROM src
  WINDOW w AS (PARTITION BY measurement, domain, entity_id
               ORDER BY ts_epoch, state_id)
)
SELECT state_id, measurement, domain, entity_id, time,
       non_negative_derivative
FROM d WHERE dt IS NOT NULL AND non_negative_derivative >= 0
""",
    "influxql_text_top": f"""{_ORACLE_NUM},
src AS (SELECT * FROM num
        WHERE measurement = 'default_measurement' AND domain = 'sensor'),
ranked AS (
  SELECT state_id, measurement, domain, entity_id, ts_epoch AS time,
         value AS top,
         row_number() OVER (PARTITION BY measurement, domain, entity_id
                            ORDER BY value DESC, ts_epoch ASC,
                                     state_id ASC) AS rank
  FROM src
)
SELECT * FROM ranked WHERE rank <= 3
""",
    "influxql_text_raw": f"""{_ORACLE_NUM}
SELECT state_id, measurement, ts_epoch AS time, value
FROM num WHERE measurement = 'default_measurement' AND value > 50
ORDER BY ts_epoch DESC, state_id DESC LIMIT 100
""",
    "influxql_text_summary": f"""{_ORACLE_NUM},
src AS (
  SELECT *,
    row_number() OVER (PARTITION BY measurement, domain, entity_id
                       ORDER BY ts_epoch, state_id) AS rn_a,
    row_number() OVER (PARTITION BY measurement, domain, entity_id
                       ORDER BY ts_epoch DESC, state_id DESC) AS rn_d
  FROM num WHERE measurement = 'W'
),
agg AS (
  SELECT measurement, domain, entity_id,
    max(value) - min(value) AS spread,
    count(*) AS "count",
    max(CASE WHEN rn_a = 1 THEN value END) AS "first",
    max(CASE WHEN rn_d = 1 THEN value END) AS "last",
    (CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) / 1e6)
      / count(*) AS mean
  FROM src GROUP BY 1, 2, 3
),
keep AS (
  SELECT measurement, domain, entity_id FROM agg
  ORDER BY measurement, domain, entity_id LIMIT 40
)
SELECT agg.* FROM agg JOIN keep USING (measurement, domain, entity_id)
""",
    "influxql_text_cq": f"""{_ORACLE_NUM}
SELECT measurement, domain, entity_id,
  CAST(floor(ts_epoch / 3600) AS BIGINT) * 3600 AS time,
  (CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) / 1e6)
    / count(*) AS mean,
  count(*) AS "count"
FROM num WHERE measurement = 'default_measurement'
GROUP BY 1, 2, 3, 4
""",
    "influxql_text_subquery": f"""{_ORACLE_NUM},
hourly AS (
  SELECT measurement, domain, entity_id,
         CAST(floor(ts_epoch / 3600) AS BIGINT) * 3600 AS t,
         max(value) AS mx
  FROM num WHERE measurement = 'default_measurement'
  GROUP BY 1, 2, 3, 4
)
SELECT measurement, domain, entity_id,
  CAST(floor(t / 86400) AS BIGINT) * 86400 AS time,
  (CAST(sum(CAST(round(mx * 1e6) AS BIGINT)) AS BIGINT) / 1e6)
    / count(mx) AS mean,
  min(mx) AS min
FROM hourly GROUP BY 1, 2, 3, 4
""",
    "influxql_show_measurements": f"""{_ORACLE_NUM}
SELECT DISTINCT measurement AS name FROM num
""",
    "influxql_show_tag_values": f"""{_ORACLE_NUM}
SELECT DISTINCT 'domain' AS key, domain AS value FROM num
WHERE measurement = 'default_measurement'
""",
    "influxql_show_cardinality": f"""{_ORACLE_NUM}
SELECT count(*) AS "count" FROM
  (SELECT DISTINCT measurement, domain, entity_id FROM num)
""",
    "influxql_show_series": f"""{_ORACLE_NUM}
SELECT measurement || ',domain=' || domain
       || ',entity_id=' || entity_id AS key
FROM (SELECT DISTINCT measurement, domain, entity_id FROM num)
""",
    "influxql_text_math": f"""{_ORACLE_NUM}
SELECT state_id, measurement, ts_epoch AS time,
  CAST(round(value) AS DOUBLE) AS round
FROM num WHERE measurement = '%' AND value > 40
""",
    "influxql_text_delete": f"""{_ORACLE_NUM}
SELECT * FROM num
WHERE NOT (measurement = 'default_measurement'
           AND ts_epoch < 1705276800 AND domain = 'sensor')
""",
    "influxql_rate_of_mean": f"""{_ORACLE_NUM},
buckets AS (
  SELECT measurement, domain, entity_id,
         CAST(floor(ts_epoch / 3600) AS BIGINT) * 3600 AS time,
         (CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) / 1e6)
           / count(*) AS mean
  FROM num WHERE measurement = 'W'
  GROUP BY measurement, domain, entity_id,
           CAST(floor(ts_epoch / 3600) AS BIGINT)
),
lagged AS (
  SELECT measurement, domain, entity_id, time,
    mean - lag(mean) OVER w AS dv,
    CAST(time - lag(time) OVER w AS DOUBLE) AS dt
  FROM buckets
  WINDOW w AS (PARTITION BY measurement, domain, entity_id
               ORDER BY time)
)
SELECT measurement, domain, entity_id, time,
  CASE WHEN dt <> 0 THEN dv / dt END AS derivative
FROM lagged WHERE dt IS NOT NULL
""",
    "influxql_text_multi": f"""{_ORACLE_NUM}
SELECT measurement, domain, entity_id,
  max(value) - min(value) AS spread
FROM num WHERE measurement IN ('W', '%')
GROUP BY measurement, domain, entity_id
""",
    # tz('Europe/Berlin'): per-row zone offset from DuckDB's tzdata
    # (instant → local via timezone(zone, TIMESTAMPTZ), session-tz-free),
    # local-day bucket, label = local boundary back to the UTC instant
    "influxql_text_tz": f"""{_ORACLE_NUM},
shifted AS (
  SELECT measurement, domain, entity_id, value,
    CAST(floor((ts_epoch
      + (epoch(timezone('Europe/Berlin',
                        to_timestamp(CAST(floor(ts_epoch) AS BIGINT))))
         - CAST(floor(ts_epoch) AS BIGINT))) / 86400) AS BIGINT) AS b
  FROM num WHERE measurement = 'W'
)
SELECT measurement, domain, entity_id,
  CAST(epoch(timezone('Europe/Berlin',
                      make_timestamp(b * 86400 * 1000000))) AS BIGINT)
    AS time,
  (CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) / 1e6)
    / count(*) AS mean
FROM shifted GROUP BY measurement, domain, entity_id, b
""",
    "influxql_text_regex_or": f"""{_ORACLE_NUM},
flt AS (
  SELECT * FROM num
  WHERE regexp_matches(measurement, '^[W%]')
    AND regexp_matches(entity_id, '_[0-3]$')
    AND (value > 50 OR value < 10)
),
m AS (SELECT *, CAST(round(value * 1e3) AS BIGINT) AS q FROM flt)
SELECT measurement, domain, entity_id,
  count(*) AS "count",
  (CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) / 1e6)
    / count(*) AS mean,
  CASE WHEN count(*) > 1 THEN
    sqrt(CAST(count(*) * CAST(sum(q * q) AS BIGINT)
              - CAST(sum(q) AS BIGINT) * CAST(sum(q) AS BIGINT)
              AS DOUBLE)
         / CAST(count(*) * (count(*) - 1) AS DOUBLE)) / 1e3
  END AS stddev
FROM m GROUP BY 1, 2, 3
""",
    "influxql_text_now": f"""{_ORACLE_NUM},
src AS (
  SELECT *,
    row_number() OVER (PARTITION BY measurement, domain, entity_id
                       ORDER BY ts_epoch, state_id) AS rn_a
  FROM num
  WHERE measurement = 'W' AND ts_epoch >= {_NOW_PIN_S} - 1209600
)
SELECT measurement, domain, entity_id,
  max(value) AS max,
  max(CASE WHEN rn_a = 1 THEN value END) AS "first"
FROM src GROUP BY 1, 2, 3
""",
    "influxql_text_stats": f"""{_ORACLE_NUM},
src AS (
  SELECT measurement, domain, entity_id, value, state_id,
    CAST(floor(ts_epoch / 21600) AS BIGINT) * 21600 AS t,
    CAST(round(value * 1e3) AS BIGINT) AS q
  FROM num WHERE measurement = 'W'
),
ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY measurement, domain, entity_id, t
                       ORDER BY value, state_id) AS rn,
    count(*) OVER (PARTITION BY measurement, domain, entity_id, t) AS n
  FROM src
)
SELECT measurement, domain, entity_id, t AS time,
  CASE WHEN count(*) > 1 THEN
    sqrt(CAST(count(*) * CAST(sum(q * q) AS BIGINT)
              - CAST(sum(q) AS BIGINT) * CAST(sum(q) AS BIGINT)
              AS DOUBLE)
         / CAST(count(*) * (count(*) - 1) AS DOUBLE)) / 1e3
  END AS stddev,
  (max(CASE WHEN rn = CAST(floor((n + 1) / 2) AS BIGINT)
       THEN value END)
   + max(CASE WHEN rn = CAST(floor(n / 2) + 1 AS BIGINT)
         THEN value END)) / 2.0 AS median,
  count(DISTINCT value) AS count_distinct
FROM ranked GROUP BY 1, 2, 3, 4
""",
    "influxql_text_mode": f"""{_ORACLE_NUM},
freq AS (
  SELECT measurement, domain, entity_id,
    CAST(floor(ts_epoch / 86400) AS BIGINT) * 86400 AS t,
    value, count(*) AS f
  FROM num WHERE measurement = '%'
  GROUP BY 1, 2, 3, 4, 5
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY measurement, domain, entity_id, t
    ORDER BY f DESC, value ASC) AS rn
  FROM freq
)
SELECT measurement, domain, entity_id, t AS time, value AS mode
FROM r WHERE rn = 1
""",
    "influxql_text_offset": f"""{_ORACLE_NUM},
w AS (
  SELECT state_id, measurement, domain, entity_id,
    ts_epoch AS time, value,
    row_number() OVER (PARTITION BY measurement, domain, entity_id
                       ORDER BY ts_epoch DESC, state_id DESC) AS rn
  FROM num WHERE measurement = 'W'
),
lim AS (SELECT * FROM w WHERE rn > 5 AND rn <= 10),
series AS (
  SELECT DISTINCT measurement, domain, entity_id FROM lim
  ORDER BY measurement, domain, entity_id LIMIT 10 OFFSET 5
)
SELECT l.state_id, l.measurement, l.domain, l.entity_id, l.time, l.value
FROM lim l JOIN series USING (measurement, domain, entity_id)
""",
    "influxql_text_elapsed": f"""{_ORACLE_NUM},
lagged AS (
  SELECT state_id, measurement, domain, entity_id,
    ts_epoch AS time,
    ts_epoch - lag(ts_epoch) OVER (
      PARTITION BY measurement, domain, entity_id
      ORDER BY ts_epoch, state_id) AS elapsed
  FROM num WHERE measurement = 'default_measurement'
)
SELECT * FROM lagged WHERE elapsed IS NOT NULL
""",
    "influxql_text_sample": f"""{_ORACLE_NUM},
r AS (
  SELECT state_id, measurement, domain, entity_id,
    ts_epoch AS time, value,
    row_number() OVER (PARTITION BY measurement, domain, entity_id
                       ORDER BY md5(CAST(state_id AS VARCHAR)),
                                state_id) AS rk
  FROM num WHERE measurement = 'W'
)
SELECT state_id, measurement, domain, entity_id, time,
       value AS sample
FROM r WHERE rk <= 3
""",
    "influxql_text_bucket_offset": f"""{_ORACLE_NUM}
SELECT measurement, domain, entity_id,
  CAST(floor((ts_epoch - 1800) / 3600) AS BIGINT) * 3600 + 1800 AS time,
  (CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) / 1e6)
    / count(*) AS mean,
  count(*) AS "count"
FROM num WHERE measurement = 'W'
GROUP BY 1, 2, 3, 4
""",
    "influxql_text_scaled": f"""{_ORACLE_NUM}
SELECT measurement, domain, entity_id,
  CAST(floor(ts_epoch / 86400) AS BIGINT) * 86400 AS time,
  ((CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) / 1e6)
    / count(*)) * 100 AS mean,
  (CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) / 1e6)
    - 50 AS sum
FROM num
WHERE measurement = '%' AND ts_epoch >= 1704844800
  AND ts_epoch < 1705708800
GROUP BY 1, 2, 3, 4
""",
    "influxql_show_databases": "SELECT 'home_assistant' AS name",
    "influxql_show_retention": """
SELECT 'autogen' AS name, '0s' AS duration,
       '168h0m0s' AS shardGroupDuration,
       CAST(1 AS INT) AS replicaN, TRUE AS "default"
""",
    "influxql_text_integral": f"""{_ORACLE_NUM},
terms AS (
  SELECT measurement, domain, entity_id,
    CAST(round((value + lag(value) OVER w)
               * (ts_epoch - lag(ts_epoch) OVER w) / 2.0 * 1e6)
         AS BIGINT) AS trap_micro
  FROM num WHERE measurement = 'W'
  WINDOW w AS (PARTITION BY measurement, domain, entity_id
               ORDER BY ts_epoch, state_id)
)
SELECT measurement, domain, entity_id,
  CAST(sum(trap_micro) AS BIGINT) / 1e6 AS integral
FROM terms WHERE trap_micro IS NOT NULL
GROUP BY measurement, domain, entity_id
""",
}

ORACLES["influxql_text_agg_limit"] = f"""{_ORACLE_NUM},
b AS (
  SELECT measurement, domain, entity_id,
    CAST(floor(ts_epoch / 86400) AS BIGINT) * 86400 AS time,
    (CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) / 1e6)
      / count(*) AS mean
  FROM num WHERE measurement = 'W'
  GROUP BY 1, 2, 3, 4
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY measurement, domain, entity_id
    ORDER BY time DESC) AS rn
  FROM b
)
SELECT measurement, domain, entity_id, time, mean
FROM r WHERE rn <= 2
"""
