"""Entity-id splitting (F1): first-dot partition parity.

The reference does ``domain, _, short = entity_id.partition('.')``
(sqllite2influxdb.py:106): split on the FIRST dot only; a multi-dot id like
``sensor.esp32.kitchen`` keeps later dots in the short form; an id with no
dot yields ``(whole, '')``. Plain ``split()`` is wrong for both cases.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def entity_domain(entity_id: Column) -> Column:
    """Text before the first dot; the whole string if no dot (partition parity)."""
    return F.substring_index(entity_id, ".", 1)


def entity_short(entity_id: Column) -> Column:
    """Text after the first dot; empty string if no dot (partition parity)."""
    pos = F.instr(entity_id, ".")
    return F.when(pos == 0, F.lit("")).otherwise(
        entity_id.substr(pos + 1, F.length(entity_id))
    )
