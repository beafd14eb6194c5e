"""HA-pipeline query surface: every reference operator as an oracle-checked query.

Each entry pairs a Spark DataFrame query (``QUERIES``) with ANSI SQL for the
DuckDB oracle (``ORACLES``) over the same parquet tables. The HA triplet is
derived from ``events`` by identical SQL in both engines
(`..sources.ha_fixture`), so any mismatch is a genuine engine-semantics bug,
not fixture drift.

Reference coverage (SURVEY §2): P1-P3/P7 filters, J1-J2 joins, A1 min-agg,
O1/O2 sort+limit, F1-F12 scalar transforms, T1 backfill boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.transform import (
    DROPPED_KEYS,
    FORCE_FLOAT_KEYS,
    SENTINEL_STATES,
    attr_fields,
    joined_scan,
    points,
)
from ..sources.ha_fixture import derive_ha_tables, duckdb_ha_cte

# regex literal for DuckDB SQL (only DuckDB parses this; Spark uses .rlike)
_RX = "^([0-9]+\\.?[0-9]*|\\.[0-9]+)$"
_SENTINELS = ", ".join(f"'{s}'" for s in SENTINEL_STATES)
_DROPPED = ", ".join(f"'{k}'" for k in DROPPED_KEYS)
_FORCE = ", ".join(f"'{k}'" for k in FORCE_FLOAT_KEYS)

_CTE = duckdb_ha_cte()

_JOINED = f"""
joined AS (
  SELECT s.state_id, s.state, sm.entity_id, s.last_updated_ts, sa.shared_attrs
  FROM ha_states s
  LEFT JOIN ha_state_attributes sa ON sa.attributes_id = s.attributes_id
  JOIN ha_states_meta sm ON sm.metadata_id = s.metadata_id
),
surviving AS (
  SELECT * FROM joined WHERE state NOT IN ({_SENTINELS})
)"""

_POINTS = f"""
split AS (
  SELECT state_id, state, last_updated_ts,
    CASE WHEN strpos(entity_id, '.') = 0 THEN entity_id
         ELSE substr(entity_id, 1, strpos(entity_id, '.') - 1) END AS domain,
    CASE WHEN strpos(entity_id, '.') = 0 THEN ''
         ELSE substr(entity_id, strpos(entity_id, '.') + 1) END AS short,
    CASE WHEN shared_attrs IS NOT NULL AND json_valid(shared_attrs)
         THEN json_extract_string(shared_attrs, '$.friendly_name') END AS fname_raw,
    CASE WHEN shared_attrs IS NOT NULL AND json_valid(shared_attrs)
         THEN json_extract_string(shared_attrs, '$.unit_of_measurement') END AS unit_raw
  FROM surviving
),
pts AS (
  SELECT state_id,
    CASE WHEN coalesce(unit_raw, 'default_measurement') = '' THEN 'count'
         ELSE coalesce(unit_raw, 'default_measurement') END AS measurement,
    'HA' AS source,
    domain,
    short AS entity_id,
    coalesce(fname_raw, short) AS friendly_name,
    last_updated_ts AS ts_epoch,
    CASE WHEN regexp_matches(state, '{_RX}') THEN CAST(state AS DOUBLE) END AS value,
    CASE WHEN NOT regexp_matches(state, '{_RX}') THEN state END AS state_str,
    state AS state_raw
  FROM split
)"""

_PTS_COLS = ("state_id, measurement, source, domain, entity_id, "
             "friendly_name, ts_epoch, value, state_str")


def _ha(spark: SparkSession, sf_dir: str):
    t = derive_ha_tables(spark, sf_dir)
    return t["ha_states"], t["ha_states_meta"], t["ha_state_attributes"]


# ---------------------------------------------------------------- queries

def q_migration_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+J1+J2: the reference's 3-table source scan (:82-87)."""
    return joined_scan(*_ha(spark, sf_dir)).drop("state_id")


def q_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full typed/tagged point rows (P3, F1-F9)."""
    return points(*_ha(spark, sf_dir))


def q_attr_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10+F12: dynamic JSON map → typed field rows."""
    return attr_fields(*_ha(spark, sf_dir))


def q_min_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the sink probe as a direct min aggregate (:54-69)."""
    return points(*_ha(spark, sf_dir)).agg(
        F.min("ts_epoch").alias("min_ts"), F.count(F.lit(1)).alias("n_points")
    )


def q_oldest_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: the literal Flux formulation — sort asc, limit 1 (:61-62).

    Spark optimizes to TakeOrderedAndProject (top-k, no global sort).
    """
    return (
        points(*_ha(spark, sf_dir))
        .orderBy("ts_epoch")
        .limit(1)
        .select("state_id", "measurement", "ts_epoch")
    )


def q_backfill_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1+P2: rows strictly older than the sink's oldest point.

    The "sink" is simulated as the already-written measurement 'W' subset
    (P5's measurement filter analog). Implements the *intended* typed
    comparison, not the reference's REAL<TEXT no-op quirk (SURVEY §2.2 P2).
    The boundary is a broadcast scalar — no driver round-trip, no shuffle
    of the fact side.
    """
    pts = points(*_ha(spark, sf_dir))
    boundary = (
        pts.filter(F.col("measurement") == "W")
        .agg(F.min("ts_epoch").alias("_boundary"))
    )
    return (
        pts.join(F.broadcast(boundary))
        .filter(F.col("ts_epoch") < F.col("_boundary"))
        .drop("_boundary")
    )


def q_state_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/F9 in isolation: distinct states and their float-vs-string route."""
    st, meta, attrs = _ha(spark, sf_dir)
    from ..functions.numeric import is_numeric_str
    is_num = is_numeric_str(F.col("state"))
    return (
        st.filter(~F.col("state").isin(*SENTINEL_STATES))
        .select("state").distinct()
        .select(
            "state",
            F.when(is_num, F.col("state").cast("double")).alias("value"),
            F.when(~is_num, F.col("state")).alias("state_str"),
        )
    )


def q_line_protocol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 rendering: the sink's exact wire format as column expressions.

    Numeric state fields render from the raw state TEXT (byte-identical
    to the source, no float formatting); see sinks.influx.line_protocol.
    """
    from ..sinks.influx import line_protocol
    pts = points(*_ha(spark, sf_dir), keep_state=True)
    return line_protocol(pts, raw_state=F.col("state_raw"))


def q_lineprotocol_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7 wire-format round trip: render every point to line protocol,
    then PARSE the strings back with `sources.lineprotocol` — the
    output must equal the point relation computed directly (the
    oracle), proving parse ∘ format = identity over real escaping
    (spaces/commas/equals in tags, quoted-and-escaped state strings,
    ns timestamps). Two narrow map stages, zero shuffles."""
    from ..sinks.influx import line_protocol
    from ..sources.lineprotocol import parse_line_protocol

    pts = points(*_ha(spark, sf_dir), keep_state=True)
    lp = line_protocol(pts, raw_state=F.col("state_raw"))
    return parse_line_protocol(lp)


def q_entity_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 in isolation: first-dot partition over all entity ids."""
    from ..functions.entity import entity_domain, entity_short
    _, meta, _ = _ha(spark, sf_dir)
    return meta.select(
        "entity_id",
        entity_domain(F.col("entity_id")).alias("domain"),
        entity_short(F.col("entity_id")).alias("entity_short"),
    )


def q_ts_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: ISO-string timestamp round-trip (``sqllite2influxdb.py:71-78``).

    The reference receives the sink probe's time as an ISO-8601 string,
    strips the ``Z`` suffix, parses, and reformats as
    ``YYYY-MM-DD HH:MM:SS``. The typed engine has no string round-trip in
    the pipeline proper (SURVEY §2.6), so this query reproduces it as a
    standalone parity expression: render each point's time as the probe's
    ISO string, then apply the exact strip/parse/format sequence.
    """
    pts = points(*_ha(spark, sf_dir))
    iso = pts.select(
        "state_id",
        F.concat(
            F.date_format(
                F.timestamp_seconds(F.col("ts_epoch").cast("long")),
                "yyyy-MM-dd'T'HH:mm:ss",
            ),
            F.lit("Z"),
        ).alias("iso_ts"),
    )
    return iso.select(
        "state_id",
        "iso_ts",
        F.date_format(
            F.to_timestamp(F.expr("replace(iso_ts, 'Z', '')")),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("formatted_ts"),
    )


QUERIES = {
    "ha_migration_scan": q_migration_scan,
    "ha_points": q_points,
    "ha_attr_fields": q_attr_fields,
    "ha_min_ts": q_min_ts,
    "ha_oldest_point": q_oldest_point,
    "ha_backfill_boundary": q_backfill_boundary,
    "ha_line_protocol": q_line_protocol,
    "ha_lineprotocol_roundtrip": q_lineprotocol_roundtrip,
    "ha_state_route": q_state_route,
    "ha_entity_split": q_entity_split,
    "ha_ts_format": q_ts_format,
}

# ---------------------------------------------------------------- oracles

ORACLES = {
    "ha_migration_scan": f"""{_CTE},
{_JOINED}
SELECT state, entity_id, last_updated_ts, shared_attrs FROM joined
""",
    "ha_points": f"""{_CTE},
{_JOINED},
{_POINTS}
SELECT {_PTS_COLS} FROM pts
""",
    "ha_attr_fields": f"""{_CTE},
{_JOINED},
kv AS (
  SELECT state_id, shared_attrs,
         unnest(json_keys(shared_attrs)) AS field_key
  FROM surviving
  WHERE shared_attrs IS NOT NULL AND json_valid(shared_attrs)
),
typed AS (
  SELECT state_id, field_key,
    json_extract_string(shared_attrs, '$."' || field_key || '"') AS sv,
    CASE
      -- DuckDB maps a JSON null to SQL NULL on extract; the key is still
      -- listed by json_keys, so NULL-extract ⇒ JSON null (VOID)
      WHEN json_extract(shared_attrs, '$."' || field_key || '"') IS NULL
        OR CAST(json_extract(shared_attrs, '$."' || field_key || '"') AS VARCHAR) = 'null' THEN 'VOID'
      WHEN CAST(json_extract(shared_attrs, '$."' || field_key || '"') AS VARCHAR) IN ('true','false') THEN 'BOOLEAN'
      WHEN CAST(json_extract(shared_attrs, '$."' || field_key || '"') AS VARCHAR) LIKE '"%' THEN 'STRING'
      ELSE 'NUMBER' END AS t
  FROM kv
  WHERE field_key NOT IN ({_DROPPED})
),
routed AS (
  SELECT state_id, field_key,
    CASE
      WHEN t = 'BOOLEAN' THEN CASE WHEN sv = 'true' THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
      WHEN t = 'VOID' THEN NULL
      WHEN t = 'STRING' THEN
        CASE WHEN field_key IN ({_FORCE}) THEN TRY_CAST(sv AS DOUBLE)
             WHEN regexp_matches(sv, '{_RX}') THEN CAST(sv AS DOUBLE) END
      ELSE TRY_CAST(sv AS DOUBLE) END AS value_num,
    CASE
      WHEN field_key IN ({_FORCE}) THEN NULL
      WHEN t = 'VOID' THEN 'None'
      WHEN t = 'STRING' AND NOT regexp_matches(sv, '{_RX}') THEN sv END AS value_str
  FROM typed
)
SELECT state_id, field_key,
  CASE WHEN value_num IS NOT NULL THEN 'float' ELSE 'string' END AS field_type,
  value_num, value_str
FROM routed
WHERE value_num IS NOT NULL OR value_str IS NOT NULL
""",
    "ha_min_ts": f"""{_CTE},
{_JOINED},
{_POINTS}
SELECT min(ts_epoch) AS min_ts, count(*) AS n_points FROM pts
""",
    "ha_oldest_point": f"""{_CTE},
{_JOINED},
{_POINTS}
SELECT state_id, measurement, ts_epoch FROM pts ORDER BY ts_epoch ASC LIMIT 1
""",
    "ha_backfill_boundary": f"""{_CTE},
{_JOINED},
{_POINTS}
SELECT {_PTS_COLS} FROM pts
WHERE ts_epoch < (SELECT min(ts_epoch) FROM pts WHERE measurement = 'W')
""",
    # parse∘format = identity: the round trip must land exactly on the
    # directly-computed point relation (ts through the ns wire integer)
    "ha_lineprotocol_roundtrip": f"""{_CTE},
{_JOINED},
{_POINTS}
SELECT state_id, measurement, source, domain, entity_id, friendly_name,
  CAST(CAST(round(ts_epoch * 1000000.0) AS BIGINT) AS DOUBLE) / 1e6
    AS ts_epoch,
  value, state_str
FROM pts
""",
    "ha_line_protocol": f"""{_CTE},
{_JOINED},
{_POINTS},
lp AS (
  SELECT state_id,
    concat_ws(' ',
      concat_ws(',',
        regexp_replace(measurement, '([, ])', '\\\\\\1', 'g'),
        'source=' || regexp_replace(source, '([,= ])', '\\\\\\1', 'g'),
        'domain=' || regexp_replace(domain, '([,= ])', '\\\\\\1', 'g'),
        'entity_id=' || regexp_replace(entity_id, '([,= ])', '\\\\\\1', 'g'),
        'friendly_name=' || regexp_replace(friendly_name, '([,= ])', '\\\\\\1', 'g')
      ),
      CASE WHEN value IS NOT NULL THEN 'value=' || state_raw
           ELSE 'state="' ||
             regexp_replace(regexp_replace(state_str, '\\\\', '\\\\\\\\', 'g'),
                            '"', '\\\\"', 'g') || '"'
      END,
      CAST(CAST(round(ts_epoch * 1000000.0) AS BIGINT) * 1000 AS VARCHAR)
    ) AS line
  FROM pts
)
SELECT state_id, line FROM lp
""",
    "ha_state_route": f"""{_CTE}
SELECT state,
  CASE WHEN regexp_matches(state, '{_RX}') THEN CAST(state AS DOUBLE) END AS value,
  CASE WHEN NOT regexp_matches(state, '{_RX}') THEN state END AS state_str
FROM (SELECT DISTINCT state FROM ha_states WHERE state NOT IN ({_SENTINELS})) s
""",
    "ha_entity_split": f"""{_CTE}
SELECT entity_id,
  CASE WHEN strpos(entity_id, '.') = 0 THEN entity_id
       ELSE substr(entity_id, 1, strpos(entity_id, '.') - 1) END AS domain,
  CASE WHEN strpos(entity_id, '.') = 0 THEN ''
       ELSE substr(entity_id, strpos(entity_id, '.') + 1) END AS entity_short
FROM ha_states_meta
""",
    "ha_ts_format": f"""{_CTE},
{_JOINED},
{_POINTS},
iso AS (
  SELECT state_id,
    strftime(make_timestamp(CAST(floor(ts_epoch) AS BIGINT) * 1000000),
             '%Y-%m-%dT%H:%M:%S') || 'Z' AS iso_ts
  FROM pts
)
SELECT state_id, iso_ts,
  strftime(CAST(replace(iso_ts, 'Z', '') AS TIMESTAMP),
           '%Y-%m-%d %H:%M:%S') AS formatted_ts
FROM iso
""",
}
