"""JSON attribute parsing (F2) and the typed dynamic-map split (F10).

The reference parses ``shared_attrs`` with ``json.loads`` and falls back to
``{}`` on NULL (left-join miss) or malformed text (sqllite2influxdb.py:92-98),
then iterates the dict emitting one typed field per key (:128-137).

Spark-first design:
- Fixed-key lookups (``friendly_name``, ``unit_of_measurement``) use
  ``get_json_object`` — JVM-side, NULL-safe on malformed input, no UDF.
- The dynamic map uses Spark 4 VARIANT (``try_parse_json`` →
  ``cast(... AS MAP<STRING, VARIANT>)``) which preserves the original JSON
  *type* of each value — required for parity, because the reference routes
  a JSON number ``-5`` to float but the JSON *string* ``"-5"`` to string
  (isinstance check vs digit-test, :134).

Scale note (SURVEY §7.4#1): we never pivot dynamic keys into physical
columns; fields stay as exploded rows / typed maps, so the schema is stable
at 100 TB regardless of attribute-key cardinality.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def attr_get(shared_attrs: Column, key: str) -> Column:
    """``attributes_json.get(key)`` → NULL when absent/malformed/NULL blob."""
    return F.get_json_object(shared_attrs, f"$.{key}")


def attrs_variant_map(shared_attrs: Column) -> Column:
    """Parse to MAP<STRING, VARIANT>; NULL on malformed/NULL (≡ ``{}`` since
    downstream explodes entries — an empty dict and NULL both emit no fields)."""
    return F.try_parse_json(shared_attrs).try_cast("map<string,variant>")
