"""The migration pipeline as declarative DataFrame transforms.

This is the Spark-first re-expression of the reference's entire per-row
transform (``batch_insert_to_influx``, sqllite2influxdb.py:100-144): joins
J1/J2, filters P1-P4/P7, scalar functions F1-F12 — all as JVM-side column
expressions (whole-stage-codegen'd; zero Python in the row path).

Scale design:
- ``states`` is the fact table (≈100 TB tier); ``states_meta`` (one row per
  entity) and ``state_attributes`` (deduped JSON blobs) are dimensions →
  explicit ``broadcast()`` so the big side never shuffles for the joins
  (SURVEY §2.3). If attributes outgrew broadcast size, dropping the hint
  lets AQE pick sort-merge — the code is unchanged.
- The dynamic attribute map is exploded to rows, never pivoted to columns
  (SURVEY §7.4#1): schema stays fixed regardless of attribute-key
  cardinality.
- Output keeps ``last_updated_ts`` as the epoch DOUBLE (``ts_epoch``); the
  sink renders timestamps (F6) at write time, so no timezone state leaks
  into the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.entity import entity_domain, entity_short
from ..functions.jsonmap import attr_get, attrs_variant_map
from ..functions.numeric import NUMERIC_STR_REGEX, is_numeric_str

#: states the reference drops entirely (sqllite2influxdb.py:104-105)
SENTINEL_STATES = ("unknown", "unavailable", "None")

#: attribute keys never emitted as fields (:129-130)
DROPPED_KEYS = ("id", "id_str", "update_available")

#: keys force-coerced to float, failure skips the field (:132-133,138-139)
FORCE_FLOAT_KEYS = (
    "temperature", "humidity", "voc", "formaldehyd", "co2", "linkquality",
)


def joined_scan(ha_states: DataFrame, ha_states_meta: DataFrame,
                ha_state_attributes: DataFrame) -> DataFrame:
    """P1+J1+J2: the reference's source query (sqllite2influxdb.py:82-87).

    LEFT join to attributes (may be missing → NULL blob), INNER join to
    meta (resolves entity_id). Both dims broadcast — the fact side stays
    shuffle-free.
    """
    return (
        ha_states
        .join(F.broadcast(ha_state_attributes), "attributes_id", "left")
        .join(F.broadcast(ha_states_meta), "metadata_id", "inner")
        .select("state_id", "state", "entity_id", "last_updated_ts", "shared_attrs")
    )


def drop_sentinel_states(df: DataFrame) -> DataFrame:
    """P3 (sqllite2influxdb.py:104-105)."""
    return df.filter(~F.col("state").isin(*SENTINEL_STATES))


def points(ha_states: DataFrame, ha_states_meta: DataFrame,
           ha_state_attributes: DataFrame,
           keep_state: bool = False) -> DataFrame:
    """Flagship transform: scan → filter → type/tag (F1-F9) → point rows.

    One row per surviving state: measurement + tags + the type-routed state
    field (``value`` float XOR ``state_str``), ready for the sink.
    ``keep_state=True`` additionally carries the raw state TEXT as
    ``state_raw`` so the sink can render numeric fields byte-identically
    to the source (no float formatting).
    """
    # JSON extraction is a pure function of the DEDUPED attr blob: parse
    # on the dimension (one row per distinct blob — HA dedups them), not
    # on the fact side post-join. At 100 TB this turns per-state-row
    # get_json_object calls into per-distinct-blob ones riding the
    # broadcast.
    attrs_dim = ha_state_attributes.select(
        "attributes_id",
        attr_get(F.col("shared_attrs"), "friendly_name").alias("_fname"),
        attr_get(F.col("shared_attrs"), "unit_of_measurement").alias("_unit"),
    )
    df = drop_sentinel_states(
        ha_states
        .join(F.broadcast(attrs_dim), "attributes_id", "left")
        .join(F.broadcast(ha_states_meta), "metadata_id", "inner")
    )
    short = entity_short(F.col("entity_id"))
    unit = F.coalesce(F.col("_unit"), F.lit("default_measurement"))
    is_num = is_numeric_str(F.col("state"))
    return df.select(
        F.col("state_id"),
        # F4+F5: unit default then ''→'count' (:110-113)
        F.when(unit == "", "count").otherwise(unit).alias("measurement"),
        F.lit("HA").alias("source"),                      # F11 (:118)
        entity_domain(F.col("entity_id")).alias("domain"),  # F1 (:106)
        short.alias("entity_id"),
        # F3: friendly_name defaulting to the short id (:109)
        F.coalesce(F.col("_fname"), short).alias("friendly_name"),
        F.col("last_updated_ts").alias("ts_epoch"),       # F6 stays epoch
        # F8+F9: numeric-string test routes to float XOR string (:122-125)
        F.when(is_num, F.col("state").cast("double")).alias("value"),
        F.when(~is_num, F.col("state")).alias("state_str"),
        *([F.col("state").alias("state_raw")] if keep_state else []),
    )


def scan_health(ha_states: DataFrame, ha_states_meta: DataFrame,
                ha_state_attributes: DataFrame) -> dict:
    """P7/§2.9 drop accounting: what the reference emits as per-row
    warnings (sqllite2influxdb.py:97,139,144 and the :104-105 skips),
    as ONE observed pass over the scan — `df.observe` metrics ride the
    normal action, costing zero extra scans when attached to a sink
    write (see sinks.backfill.backfill_once for that pattern; here the
    action is a count so the function is self-contained).
    """
    from pyspark.sql import Observation

    df = joined_scan(ha_states, ha_states_meta, ha_state_attributes)
    parsed = F.try_parse_json(F.col("shared_attrs"))
    obs = Observation("scan_health")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_scanned"),
        F.count_if(F.col("state").isin(*SENTINEL_STATES)).alias("n_sentinel"),
        F.count_if(F.col("shared_attrs").isNotNull() & parsed.isNull())
         .alias("n_malformed_attrs"),
        F.count_if(F.col("shared_attrs").isNull()).alias("n_missing_attrs"),
    )
    observed.count()
    return obs.get


def attr_fields(ha_states: DataFrame, ha_states_meta: DataFrame,
                ha_state_attributes: DataFrame) -> DataFrame:
    """F10+F12: explode the dynamic JSON map into typed field rows.

    VARIANT preserves each JSON value's original type, which the routing
    needs (sqllite2influxdb.py:128-139):

    - dropped keys skipped (:129-130);
    - force-float keys: ``float(value)`` — accepts numbers / numeric-ish
      strings incl. ``"1e3"`` / booleans (``float(True)``→1.0); failure
      (e.g. ``"high"``, JSON null) skips the field (:138-139);
    - otherwise: JSON numbers AND booleans are ``isinstance (int, float)``
      → float; JSON strings take the one-dot digit test (F8) → float else
      string; JSON null → ``str(None)`` = ``'None'`` (:134-137).

    Output: (state_id, field_key, field_type, value_num, value_str).

    The entire parse/route computation is a pure function of the DEDUPED
    attr blob, so it runs on the dimension (one row per distinct blob)
    and fans out to states through the broadcast join — per-state-row
    cost is the join probe alone. This is the scale win of HA's
    attribute dedup carried through the plan.
    """
    exploded = (
        ha_state_attributes.select(
            "attributes_id",
            F.explode(attrs_variant_map(F.col("shared_attrs"))).alias("field_key", "v"),
        )
        .filter(~F.col("field_key").isin(*DROPPED_KEYS))
        .select(
            "attributes_id", "field_key",
            F.expr("schema_of_variant(v)").alias("t"),
            F.expr("cast(v as string)").alias("sv"),
        )
    )
    force = F.col("field_key").isin(*FORCE_FLOAT_KEYS)
    is_str_num = F.col("sv").rlike(NUMERIC_STR_REGEX)
    value_num = (
        F.when(F.col("t") == "BOOLEAN", F.when(F.col("sv") == "true", 1.0).otherwise(0.0))
        .when(F.col("t") == "VOID", F.lit(None).cast("double"))
        .when(
            F.col("t") == "STRING",
            F.when(force, F.expr("try_cast(sv as double)"))
             .when(is_str_num, F.col("sv").cast("double")),
        )
        .otherwise(F.expr("try_cast(sv as double)"))  # JSON numbers
    )
    value_str = (
        F.when(force, F.lit(None).cast("string"))
        .when(F.col("t") == "VOID", F.lit("None"))
        .when((F.col("t") == "STRING") & ~is_str_num, F.col("sv"))
    )
    fields_dim = (
        exploded
        .withColumn("value_num", value_num)
        .withColumn("value_str", value_str)
        .filter(F.col("value_num").isNotNull() | F.col("value_str").isNotNull())
        .select(
            "attributes_id", "field_key",
            F.when(F.col("value_num").isNotNull(), "float").otherwise("string")
             .alias("field_type"),
            "value_num", "value_str",
        )
    )
    # inner join ≡ the original post-join explode: NULL attributes_id,
    # malformed blobs (NULL map) and blobs with no surviving fields all
    # emit zero rows
    base = drop_sentinel_states(
        ha_states.join(F.broadcast(ha_states_meta), "metadata_id", "inner")
    )
    return (
        base.select("state_id", "attributes_id")
        .join(F.broadcast(fields_dim), "attributes_id")
        .select("state_id", "field_key", "field_type", "value_num", "value_str")
    )
