"""Home Assistant recorder STATISTICS compilation — the hourly
`statistics` table HA itself derives from `states` (recorder's
`compile_statistics`, HA Core ≥2022.4): per sensor and hour, the
TIME-WEIGHTED mean plus min/max. This is the capability an HA user
loses by migrating history out of the recorder (reference
`sqllite2influxdb.py` moves raw states only); re-expressing it over the
migrated point relation completes the post-migration story alongside
the InfluxQL/Flux layers.

Semantics (documented subset, value-level oracle-checked):

- Each state observation opens a LOCF step segment ``[t_i, t_{i+1})``
  carrying its value (HA's state model — a sensor HOLDS its value until
  the next report). The last observation of a series has no closing
  edge and is dropped (HA clips at compile time "now"; a bounded
  fixture has no now). Zero-duration segments (tied timestamps — the
  superseded state) are dropped: they carry no time weight.
- Segments are CLIPPED at hour boundaries and each hour's mean is
  ``Σ vᵢ·dᵢ / Σ dᵢ`` over its overlapping clipped segments — exactly
  HA's duration-weighted average, NOT the arithmetic point mean (a
  sensor reporting once at :01 dominates its hour).
- min/max are over the values of all segments overlapping the hour —
  including the carry-in segment from before the hour (HA's statistics
  window includes the last state before the period start).

Scale shape: ONE series-key window (the lead() closing each segment),
an explode over each segment's spanned hours (output rows ≈ points +
gap-hours — the lag+sequence downsample pattern), and one (series,
hour) aggregation; weighted terms and durations accumulate
micro-quantized BIGINTs so results are bit-identical to the DuckDB
oracle at any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .influxql import _ORACLE_NUM, _SERIES, _numeric_points

__all__ = ["hourly_statistics", "QUERIES", "ORACLES"]


def hourly_statistics(pts: DataFrame) -> DataFrame:
    """The statistics compiler over any (series, ts_epoch, value) point
    relation — factored out for the scale probe."""
    w = (Window.partitionBy(*_SERIES).orderBy("ts_epoch", "state_id"))
    seg = (
        pts.select(
            *_SERIES,
            F.col("ts_epoch").alias("t0"), "value",
            F.lead("ts_epoch").over(w).alias("t1"),
        )
        .filter(F.col("t1").isNotNull() & (F.col("t1") > F.col("t0")))
    )
    h_first = F.floor(F.col("t0") / 3600).cast("long")
    # a segment ending exactly ON an hour boundary does not reach into
    # that hour (right-open interval)
    h_last = (
        F.floor(F.col("t1") / 3600).cast("long")
        - F.when(F.col("t1") == F.floor(F.col("t1") / 3600) * 3600, 1)
           .otherwise(0)
    )
    ex = seg.select(
        *_SERIES, "t0", "t1", "value",
        F.explode(F.sequence(h_first, h_last)).alias("h"),
    )
    d = (F.least(F.col("t1"), (F.col("h") + 1) * F.lit(3600.0))
         - F.greatest(F.col("t0"), F.col("h") * F.lit(3600.0)))
    terms = ex.select(
        *_SERIES, "h", "value",
        F.round(d * 1e6).cast("long").alias("_d_micro"),
        F.round(F.col("value") * d * 1e6).cast("long").alias("_vd_micro"),
    )
    return terms.groupBy(*_SERIES, "h").agg(
        ((F.sum("_vd_micro") / 1e6) / (F.sum("_d_micro") / 1e6))
        .alias("dw_mean"),
        F.min("value").alias("min_val"),
        F.max("value").alias("max_val"),
        F.count(F.lit(1)).alias("n_segments"),
    ).select(
        *_SERIES, (F.col("h") * 3600).alias("hour_epoch"),
        "dw_mean", "min_val", "max_val", "n_segments",
    )


def q_ha_statistics_hourly(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """HA recorder `statistics`: hourly duration-weighted mean + min/max
    per sensor (see module docstring; reference migrates raw states
    only — `sqllite2influxdb.py:83-90` — so this is the recorder-side
    capability re-expressed over the migrated points)."""
    return hourly_statistics(_numeric_points(spark, sf_dir))


QUERIES = {"ha_statistics_hourly": q_ha_statistics_hourly}

ORACLES = {
    "ha_statistics_hourly": f"""{_ORACLE_NUM},
seg AS (
  SELECT measurement, domain, entity_id, ts_epoch AS t0, value,
    lead(ts_epoch) OVER (PARTITION BY measurement, domain, entity_id
                         ORDER BY ts_epoch, state_id) AS t1
  FROM num
),
ex AS (
  SELECT measurement, domain, entity_id, t0, t1, value,
    unnest(generate_series(
      CAST(floor(t0 / 3600) AS BIGINT),
      CAST(floor(t1 / 3600) AS BIGINT)
        - CASE WHEN t1 = floor(t1 / 3600) * 3600 THEN 1 ELSE 0 END
    )) AS h
  FROM seg WHERE t1 IS NOT NULL AND t1 > t0
),
terms AS (
  SELECT measurement, domain, entity_id, h, value,
    CAST(round((least(t1, (h + 1) * 3600.0)
                - greatest(t0, h * 3600.0)) * 1e6) AS BIGINT)
      AS d_micro,
    CAST(round(value * (least(t1, (h + 1) * 3600.0)
                        - greatest(t0, h * 3600.0)) * 1e6) AS BIGINT)
      AS vd_micro
  FROM ex
)
SELECT measurement, domain, entity_id, h * 3600 AS hour_epoch,
  (CAST(sum(vd_micro) AS BIGINT) / 1e6)
    / (CAST(sum(d_micro) AS BIGINT) / 1e6) AS dw_mean,
  min(value) AS min_val, max(value) AS max_val,
  count(*)::BIGINT AS n_segments
FROM terms GROUP BY measurement, domain, entity_id, h
""",
}
