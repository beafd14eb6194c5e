"""Cheap plan-side literal arrays.

``F.lit(<python list>)`` builds one py4j Literal per element — ~2 s of
driver round-trips for a 4096-entry ratio table, paid at PLAN BUILD
time on every invocation (profiled r8: dsir_apply spent 2.3 s building
vs 0.15 s executing). Rendering the same values as ONE SQL ``array(…)``
expression hands the whole literal to Catalyst in a single parse —
identical expression tree, ~6× cheaper to construct, and the driver's
cost no longer scales with table width.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_long_array(values: list[int]) -> Column:
    """One BIGINT array literal via a single SQL parse."""
    if not values:
        return F.expr("CAST(array() AS array<bigint>)")
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in values) + ")")


def lit_double_array(values: list[float]) -> Column:
    """One DOUBLE array literal via a single SQL parse. ``repr`` keeps
    full float precision (round-trip exact); non-finite values render
    as the quoted 'Infinity'/'NaN' cast forms — bare ``inf``/``nan``
    tokens would parse as column references and fail analysis."""
    import math

    def tok(v: float) -> str:
        v = float(v)
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            return ("CAST('Infinity' AS DOUBLE)" if v > 0
                    else "CAST('-Infinity' AS DOUBLE)")
        return f"CAST({v!r} AS DOUBLE)"

    if not values:
        return F.expr("CAST(array() AS array<double>)")
    return F.expr("array(" + ",".join(tok(v) for v in values) + ")")
