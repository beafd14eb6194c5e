"""HA-recorder fixture triplet derived deterministically from ``events``.

The reference reads the Home Assistant recorder schema (``states``,
``states_meta``, ``state_attributes`` — sqllite2influxdb.py:83-86). The
driver's testdata has no such tables, so per FIXTURES.md §3 we derive them
from ``events`` with engine-portable SQL: the *same* text runs in Spark SQL
(our engine) and DuckDB (the correctness oracle), so fixture parity holds by
construction.

Portability constraints honored here:
- ``{EPOCH_US}``: ``unix_micros`` (Spark) vs ``epoch_us`` (DuckDB);
  both are cast to DOUBLE before dividing so the rounding is identical.
- No ``range()`` table functions (column naming differs across engines);
  attribute ids come from ``DISTINCT event_id % 30``.
- ``CAST(x AS STRING)`` and ``||`` work in both dialects.

The variant matrix (FIXTURES.md §2) exercises every transform quirk of the
reference: malformed JSON (:92-98), missing/empty units (:110-113),
force-float keys incl. a failing one (:132-133,138-139), dropped keys
(:129-130), bool/null JSON values (:134-137), numeric-string states and
sentinel states (:104-105,122).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..memo import _artifact
from .tables import load_table

HA_STATES_SQL = """
SELECT
  event_id AS state_id,
  CASE event_id % 12
    WHEN 0 THEN CAST(CAST(FLOOR(value) AS BIGINT) AS STRING) || '.5'
    WHEN 1 THEN 'on'
    WHEN 2 THEN 'off'
    WHEN 3 THEN 'unknown'
    WHEN 4 THEN 'unavailable'
    WHEN 5 THEN 'None'
    WHEN 6 THEN '1e3'
    WHEN 7 THEN '-5'
    WHEN 8 THEN ''
    WHEN 9 THEN '1.2.3'
    WHEN 10 THEN '007'
    ELSE '42.0'
  END AS state,
  CASE WHEN event_id % 7 = 0 THEN CAST(NULL AS BIGINT)
       ELSE event_id % 30 END AS attributes_id,
  user_id AS metadata_id,
  CAST({EPOCH_US}(ts) AS DOUBLE) / 1000000.0 AS last_updated_ts
FROM {EVENTS}
"""

HA_STATES_META_SQL = """
SELECT
  user_id AS metadata_id,
  CASE WHEN user_id % 5 = 0 THEN 'sensor.esp32.user_' || CAST(user_id AS STRING)
       WHEN user_id % 11 = 0 THEN 'nodot_user_' || CAST(user_id AS STRING)
       ELSE 'sensor.user_' || CAST(user_id AS STRING)
  END AS entity_id
FROM (SELECT DISTINCT user_id FROM {EVENTS}) u
"""

HA_STATE_ATTRIBUTES_SQL = """
SELECT
  attributes_id,
  CASE attributes_id % 6
    WHEN 0 THEN '{not json'
    WHEN 1 THEN '{"friendly_name": "Sensor ' || i || '", "unit_of_measurement": "C", "temperature": ' || i || '.5, "id": 999, "k": "' || i || '"}'
    WHEN 2 THEN '{"unit_of_measurement": "", "humidity": "55.5", "update_available": true, "count_attr": ' || i || '}'
    WHEN 3 THEN '{"friendly_name": "Device ' || i || '", "co2": "high", "note": "hello world"}'
    WHEN 4 THEN '{"unit_of_measurement": "W", "linkquality": ' || i || ', "active": true, "missing": null}'
    ELSE '{"unit_of_measurement": "%", "voc": "0.5", "id_str": "drop-me", "neg": "-5"}'
  END AS shared_attrs
FROM (
  SELECT DISTINCT event_id % 30 AS attributes_id,
         CAST(event_id % 30 AS STRING) AS i
  FROM {EVENTS}
) ids
"""

_TEMPLATES = {
    "ha_states": HA_STATES_SQL,
    "ha_states_meta": HA_STATES_META_SQL,
    "ha_state_attributes": HA_STATE_ATTRIBUTES_SQL,
}


def render(name: str, engine: str, events_rel: str = "events") -> str:
    """Render a fixture template for ``engine`` ('spark' | 'duckdb')."""
    epoch = "unix_micros" if engine == "spark" else "epoch_us"
    return _TEMPLATES[name].replace("{EPOCH_US}", epoch).replace("{EVENTS}", events_rel)


# one fixture triplet per (application, sf_dir): the derivation runs a
# window and two DISTINCT subqueries over events, which would otherwise be
# re-executed by every one of the ~10 HA queries that consume the triplet
# (and would dominate ha_points bench timings). The derived tables are
# tiny relative to events, so they persist across queries in the session.
_CACHE: dict[tuple[str, str], dict[str, DataFrame]] = {}


def derive_ha_tables(spark: SparkSession, sf_dir: str,
                     register: bool = True,
                     cache: bool = True) -> dict[str, DataFrame]:
    """Build the HA triplet as DataFrames (and temp views) from events."""

    def build() -> dict[str, DataFrame]:
        load_table(spark, sf_dir, "events").createOrReplaceTempView(
            "events")
        out: dict[str, DataFrame] = {}
        for name in _TEMPLATES:
            df = spark.sql(render(name, "spark"))
            if cache:
                df = df.persist()
            out[name] = df
        return out

    if not cache:
        out = build()
    else:
        key = (spark.sparkContext.applicationId, sf_dir)
        out = _artifact(
            _CACHE, key, build,
            on_evict=lambda old: [df.unpersist() for df in old.values()])
    # view registration happens OUTSIDE the memo (ADVICE r13 low #3):
    # the memo key is (app, sf_dir) only, so a first call with
    # register=False must not poison a later register=True call —
    # createOrReplaceTempView is idempotent and catalog-cheap, so a
    # cache hit simply re-registers.
    if register:
        for name, df in out.items():
            df.createOrReplaceTempView(name)
    return out


def duckdb_ha_cte(events_rel: str = "events") -> str:
    """``WITH ...`` prefix defining the HA triplet for DuckDB oracle SQL."""
    parts = [
        f"{name} AS ({render(name, 'duckdb', events_rel)})"
        for name in _TEMPLATES
    ]
    return "WITH " + ",\n".join(parts)
