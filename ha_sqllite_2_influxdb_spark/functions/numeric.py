"""Numeric-string detection with exact parity to the reference.

The reference routes a value to the float field iff
``isinstance(v, (int, float)) or (isinstance(v, str) and
v.replace('.', '', 1).isdigit())`` (sqllite2influxdb.py:122,134) — i.e. for
strings: remove ONE dot, remainder non-empty all-digits. That accepts
``"007"``, ``"42.0"``, ``".5"``, ``"5."`` and rejects ``"-5"`` (sign),
``"1e3"`` (exponent), ``"1.2.3"`` (second dot), ``""`` (empty). We encode it
as a JVM-side regex (no Python UDF in the hot path).

Note Python's ``str.isdigit`` also accepts non-ASCII digit codepoints,
giving the reference a three-way behavior: Unicode ``Nd`` digits (``"٥"``,
``"１"``) parse via ``float()`` and route to the float field; ``No``
codepoints (``"²"``) pass ``isdigit()`` but ``float()`` raises, hitting the
row-drop path (sqllite2influxdb.py:143-144). The engine contract is
ASCII-only — every non-ASCII state routes to the STRING field, no drop —
because HA states are ASCII and per-codepoint category routing would force
a Python UDF into the hottest filter. Documented divergence: SURVEY §7.4
#2; pinned by tests/test_functions.py::test_numeric_unicode_divergence_pinned.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# digits with at most one dot, at least one digit
NUMERIC_STR_REGEX = r"^([0-9]+\.?[0-9]*|\.[0-9]+)$"
# same pattern, for embedding into SQL (Spark SQL rlike / DuckDB regexp_matches)
NUMERIC_STR_REGEX_SQL = "^([0-9]+\\.?[0-9]*|\\.[0-9]+)$"


def is_numeric_str(col: Column) -> Column:
    """True iff the reference's string numeric test accepts ``col``."""
    return col.rlike(NUMERIC_STR_REGEX)


def py_is_numeric(value) -> bool:
    """The reference's predicate verbatim-in-behavior (test oracle only)."""
    return isinstance(value, (int, float)) or (
        isinstance(value, str) and value.replace(".", "", 1).isdigit()
    )
