"""InfluxDB line-protocol PARSER — the inverse of `sinks.influx.
line_protocol`, completing the wire-format round trip.

The reference only ever WRITES line protocol (sqllite2influxdb.py's
`influx_write` body); its users' natural escape hatch — exporting a
bucket back out (``influx write --dry-run`` dumps, telegraf file
outputs) — produces the same format, so a migration engine that can
parse it can re-ingest its own sink output. Everything here is JVM
regex + string expressions (no UDFs): escape-aware splitting rides
``(?<!\\\\)`` lookbehinds, string-field unquoting is two
regexp_replace passes.

Format notes honored (and their documented ambiguities):
- measurement escapes ``,`` and space; tags escape ``,``, ``=``, space;
  string field values escape ``\\`` then ``"``. Tags do NOT escape
  backslash (InfluxDB's own rule), so a tag value ENDING in a literal
  backslash makes the following delimiter look escaped — that line is
  ambiguous in the format itself, not just in this parser.
- a numeric field never contains a space, so the three line sections
  split on the LAST two unescaped-space boundaries; the string-field
  alternative is tried FIRST because a quoted state like ``"value=5"``
  would otherwise also satisfy the numeric pattern (the tag escaping of
  ``=`` guarantees a real numeric line can never satisfy the string
  pattern, so the precedence is safe, not heuristic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tag/measurement value: runs of non-special chars or escaped pairs
_VAL = r"((?:[^,\\]|\\.)*)"
#: string field body: non-quote/backslash runs or escaped pairs
_STR = r'((?:[^"\\]|\\.)*)'
_STR_RX = f'^(.+?) state="{_STR}" (-?\\d+)$'
_VAL_RX = r"^(.+?) value=([^ ]+) (-?\d+)$"


def _unescape_tag(col: Column) -> Column:
    return F.regexp_replace(col, r"\\([,= ])", "$1")


def _tag(head: Column, key: str) -> Column:
    raw = F.regexp_extract(head, rf"(?:^|(?<!\\),){key}={_VAL}", 1)
    return _unescape_tag(raw)


def parse_line_protocol(lines: DataFrame, col: str = "line",
                        precision_ns: bool = True) -> DataFrame:
    """Parse a line-protocol string column back into typed point rows.

    Returns the `operators.transform.points` shape (measurement, source,
    domain, entity_id, friendly_name, ts_epoch, value, state_str) plus
    any non-``col`` passthrough columns (e.g. a row key riding beside
    the line). Narrow projection — zero shuffles, codegen end-to-end;
    at 100 TB this is a pure map stage over the text scan, exactly like
    the formatter it inverts.
    """
    line = F.col(col)
    is_str = line.rlike(_STR_RX)
    head = F.when(is_str, F.regexp_extract(line, _STR_RX, 1)) \
        .otherwise(F.regexp_extract(line, _VAL_RX, 1))
    ts_txt = F.when(is_str, F.regexp_extract(line, _STR_RX, 3)) \
        .otherwise(F.regexp_extract(line, _VAL_RX, 3))
    num_txt = F.regexp_extract(line, _VAL_RX, 2)
    str_esc = F.regexp_extract(line, _STR_RX, 2)

    measurement = _unescape_tag(F.regexp_extract(head, f"^{_VAL}", 1))
    raw_ts = ts_txt.cast("long")
    # ns longs (~1.7e18) exceed double's 2^53 integer range, so the
    # µs conversion must divide EXACTLY — decimal division, not the
    # default double `/` (which was off by 1 µs on real timestamps)
    us = ((raw_ts.cast("decimal(20,0)") / F.lit(1000)).cast("long")
          if precision_ns else raw_ts)
    state_str = F.regexp_replace(
        F.regexp_replace(str_esc, r'\\"', '"'), r"\\\\", r"\\"
    )
    passthrough = [c for c in lines.columns if c != col]
    return lines.select(
        *passthrough,
        measurement.alias("measurement"),
        _tag(head, "source").alias("source"),
        _tag(head, "domain").alias("domain"),
        _tag(head, "entity_id").alias("entity_id"),
        _tag(head, "friendly_name").alias("friendly_name"),
        (us.cast("double") / F.lit(1e6)).alias("ts_epoch"),
        F.when(~is_str, num_txt.cast("double")).alias("value"),
        F.when(is_str, state_str).alias("state_str"),
    )
