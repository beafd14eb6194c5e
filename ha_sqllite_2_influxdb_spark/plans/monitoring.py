"""Registry surface for the per-series monitoring operators
(`operators/monitor.py`) — sensor-health analytics over the migrated
point relation, every entry value-level oracle-checked.

Window parameters here are sized for the sf0.01 fixture's series
lengths (median ≈ 5 points/series; at sf0.1 ≈ 10×): small enough that
every operator emits rows at correctness scale, with the operator
defaults staying production-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import monitor
from .influxql import _ORACLE_NUM, _numeric_points

_ACF_LAGS = 2
_SHIFT_W = 3
_SHIFT_T = 10.0
_RQ_N = 4
_RQ_P = 0.9
_FLAT_RUN = 5
_CORR_BUCKET_S = 604800   # weekly — see q_series_correlation


def q_series_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series autocorrelation at lags 1..2 — the seasonality /
    stuck-sensor diagnostic."""
    return monitor.series_acf(_numeric_points(spark, sf_dir),
                              max_lag=_ACF_LAGS)


def q_mean_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding two-window level-change detection, |Δmean| > 10 over
    3-point windows."""
    return monitor.mean_shift_scores(_numeric_points(spark, sf_dir),
                                     w_pts=_SHIFT_W, threshold=_SHIFT_T)


def q_rolling_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing p90 envelope over the last 4 points per series."""
    return monitor.rolling_quantile(_numeric_points(spark, sf_dir),
                                    n=_RQ_N, p=_RQ_P)


def q_flatline_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stuck-sensor detection: runs of ≥5 identical consecutive
    values per series."""
    return monitor.flatline_runs(_numeric_points(spark, sf_dir),
                                 min_run=_FLAT_RUN)


def q_fleet_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity Pearson r against the fleet average of its
    measurement, over WEEKLY means (the fixture's series are sparse —
    ~5 points each at sf0.01 — and its %/W sensors are constant per
    entity, so this fleet form is the non-vacuous correlation here;
    the cross-measurement `monitor.series_correlation` keeps its
    known-answer pytest on synthetic co-varying frames)."""
    return monitor.fleet_correlation(_numeric_points(spark, sf_dir),
                                     bucket_s=_CORR_BUCKET_S)


def q_hysteresis_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schmitt-trigger alert episodes on the varying default series
    (open > 100, close < 30 — the fixture's W/% series are constant, so
    the band sits inside the one distribution that actually moves) —
    see monitor.hysteresis_alerts."""
    from pyspark.sql import functions as F

    pts = _numeric_points(spark, sf_dir).filter(
        F.col("measurement") == "default_measurement")
    return monitor.hysteresis_alerts(pts, hi=100.0, lo=30.0)


def q_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiwindow SLO burn-rate alerts over the events stream (error
    ratio vs a 25% budget, 1 h + trailing-6 h windows, alert iff both
    burn > 1.2) — see monitor.slo_burn_rate."""
    from ..sources.tables import load_table

    return monitor.slo_burn_rate(load_table(spark, sf_dir, "events"))


QUERIES = {
    "slo_burn_rate": q_slo_burn_rate,
    "series_hysteresis_alerts": q_hysteresis_alerts,
    "series_acf": q_series_acf,
    "series_fleet_correlation": q_fleet_correlation,
    "series_mean_shift": q_mean_shift,
    "series_rolling_quantile": q_rolling_quantile,
    "series_flatline_runs": q_flatline_runs,
}

_W_SERIES = """WINDOW w AS (PARTITION BY measurement, domain, entity_id
               ORDER BY ts_epoch, state_id)"""

ORACLES = {
    "series_hysteresis_alerts": f"""{_ORACLE_NUM},
m AS (
  SELECT measurement, domain, entity_id, ts_epoch, state_id, value,
    CASE WHEN value > 100.0 THEN 1 WHEN value < 30.0 THEN 0 END AS mk
  FROM num WHERE measurement = 'default_measurement'
),
st AS (
  SELECT *, coalesce(last_value(mk IGNORE NULLS) OVER (
      PARTITION BY measurement, domain, entity_id
      ORDER BY ts_epoch, state_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS on_state
  FROM m
),
chg AS (
  SELECT *, CASE WHEN lag(on_state) OVER w IS NULL
                   OR on_state != lag(on_state) OVER w
            THEN 1 ELSE 0 END AS c
  FROM st WINDOW w AS (PARTITION BY measurement, domain, entity_id
                       ORDER BY ts_epoch, state_id)
),
grp AS (
  SELECT *, sum(c) OVER (PARTITION BY measurement, domain, entity_id
                         ORDER BY ts_epoch, state_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS g
  FROM chg
),
ep AS (
  SELECT measurement, domain, entity_id, g,
    min(ts_epoch) AS alert_start, max(ts_epoch) AS alert_end,
    count(*)::BIGINT AS n_points, max(value) AS peak,
    max(on_state) AS on_state
  FROM grp GROUP BY measurement, domain, entity_id, g
),
closed AS (
  SELECT *, max(g) OVER (PARTITION BY measurement, domain, entity_id)
    AS last_g
  FROM ep
)
SELECT measurement, domain, entity_id, alert_start, alert_end,
       n_points, peak
FROM closed WHERE on_state = 1 AND g < last_g
""",
    "series_fleet_correlation": f"""{_ORACLE_NUM},
hourly AS (
  SELECT measurement, domain, entity_id,
    CAST(floor(ts_epoch / {_CORR_BUCKET_S}) AS BIGINT) AS b,
    (CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) / 1e6)
      / count(*) AS m
  FROM num GROUP BY 1, 2, 3, 4
),
fleet AS (
  SELECT measurement, b,
    (CAST(sum(CAST(round(m * 1e3) AS BIGINT)) AS BIGINT) / 1e3)
      / count(*) AS fm
  FROM hourly GROUP BY 1, 2
),
paired AS (
  SELECT h.measurement, h.domain, h.entity_id,
    CAST(round(h.m * 1e3) AS BIGINT) AS x,
    CAST(round(f.fm * 1e3) AS BIGINT) AS y
  FROM hourly h
  JOIN fleet f ON h.measurement = f.measurement AND h.b = f.b
),
sums AS (
  SELECT measurement, domain, entity_id,
    CAST(count(*) AS BIGINT) AS n_buckets,
    count(*) * CAST(sum(x * x) AS BIGINT)
      - CAST(sum(x) AS BIGINT) * CAST(sum(x) AS BIGINT) AS vx,
    count(*) * CAST(sum(y * y) AS BIGINT)
      - CAST(sum(y) AS BIGINT) * CAST(sum(y) AS BIGINT) AS vy,
    count(*) * CAST(sum(x * y) AS BIGINT)
      - CAST(sum(x) AS BIGINT) * CAST(sum(y) AS BIGINT) AS cov
  FROM paired GROUP BY 1, 2, 3
)
SELECT measurement, domain, entity_id, n_buckets,
  CAST(cov AS DOUBLE)
    / (sqrt(CAST(vx AS DOUBLE)) * sqrt(CAST(vy AS DOUBLE)))
    AS pearson_r
FROM sums WHERE vx > 0 AND vy > 0
""",
    "series_acf": f"""{_ORACLE_NUM},
mn AS (
  SELECT *,
    (CAST(sum(CAST(round(value * 1e6) AS BIGINT)) OVER wp AS BIGINT)
     / 1e6) / count(*) OVER wp AS m
  FROM num
  WINDOW wp AS (PARTITION BY measurement, domain, entity_id)
),
d AS (
  SELECT measurement, domain, entity_id, ts_epoch, state_id,
         value - m AS dd
  FROM mn
),
terms AS (
  SELECT measurement, domain, entity_id,
    CAST(round(dd * dd * 1e6) AS BIGINT) AS p0,
    CAST(round(dd * lag(dd, 1) OVER w * 1e6) AS BIGINT) AS p1,
    CAST(round(dd * lag(dd, 2) OVER w * 1e6) AS BIGINT) AS p2
  FROM d
  {_W_SERIES}
)
SELECT measurement, domain, entity_id,
  CAST(count(*) AS BIGINT) AS n_points,
  CAST(sum(p1) AS BIGINT) / CAST(sum(p0) AS BIGINT) AS acf1,
  CAST(sum(p2) AS BIGINT) / CAST(sum(p0) AS BIGINT) AS acf2
FROM terms GROUP BY 1, 2, 3
HAVING CAST(sum(p0) AS BIGINT) > 0
""",
    "series_mean_shift": f"""{_ORACLE_NUM},
scored AS (
  SELECT state_id, measurement, domain, entity_id, ts_epoch,
    (CAST(sum(CAST(round(value * 1e6) AS BIGINT)) OVER wb AS BIGINT)
     / 1e6) / count(*) OVER wb AS before_mean,
    (CAST(sum(CAST(round(value * 1e6) AS BIGINT)) OVER wa AS BIGINT)
     / 1e6) / count(*) OVER wa AS after_mean,
    count(*) OVER wb AS nb, count(*) OVER wa AS na
  FROM num
  WINDOW wb AS (PARTITION BY measurement, domain, entity_id
                ORDER BY ts_epoch, state_id
                ROWS BETWEEN {_SHIFT_W} PRECEDING AND 1 PRECEDING),
         wa AS (PARTITION BY measurement, domain, entity_id
                ORDER BY ts_epoch, state_id
                ROWS BETWEEN CURRENT ROW AND {_SHIFT_W - 1} FOLLOWING)
)
SELECT state_id, measurement, domain, entity_id, ts_epoch,
  before_mean, after_mean, after_mean - before_mean AS shift
FROM scored
WHERE nb = {_SHIFT_W} AND na = {_SHIFT_W}
  AND abs(after_mean - before_mean) > {_SHIFT_T}
""",
    "series_rolling_quantile": f"""{_ORACLE_NUM},
r AS (
  SELECT state_id, measurement, domain, entity_id, ts_epoch, value,
    list_sort(list(value) OVER wq) AS arr
  FROM num
  WINDOW wq AS (PARTITION BY measurement, domain, entity_id
                ORDER BY ts_epoch, state_id
                ROWS BETWEEN {_RQ_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT state_id, measurement, domain, entity_id, ts_epoch, value,
  arr[CAST(ceil(len(arr) * {_RQ_P}) AS BIGINT)] AS rolling_q
FROM r WHERE len(arr) = {_RQ_N}
""",
    "series_flatline_runs": f"""{_ORACLE_NUM},
marked AS (
  SELECT *, CASE WHEN lag(value) OVER w IS NULL
                   OR value != lag(value) OVER w
            THEN 1 ELSE 0 END AS chg
  FROM num
  {_W_SERIES}
),
grp AS (
  SELECT *, sum(chg) OVER (
    PARTITION BY measurement, domain, entity_id
    ORDER BY ts_epoch, state_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  FROM marked
)
SELECT measurement, domain, entity_id,
  min(ts_epoch) AS run_start, max(ts_epoch) AS run_end,
  CAST(count(*) AS BIGINT) AS run_len, min(value) AS value
FROM grp GROUP BY measurement, domain, entity_id, g
HAVING count(*) >= {_FLAT_RUN}
""",
}

ORACLES["slo_burn_rate"] = """
WITH hourly AS (
  SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS h,
    count(*)::BIGINT AS n_total,
    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
         AS BIGINT) AS n_bad
  FROM events GROUP BY 1
),
win AS (
  SELECT h, n_total, n_bad,
    CAST(sum(n_bad) OVER wr AS BIGINT) AS lb,
    CAST(sum(n_total) OVER wr AS BIGINT) AS lt
  FROM hourly
  WINDOW wr AS (ORDER BY h RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
)
SELECT h * 3600 AS hour_epoch, n_total, n_bad,
  (CAST(n_bad AS DOUBLE) / CAST(n_total AS DOUBLE)) / 0.25 AS short_burn,
  (CAST(lb AS DOUBLE) / CAST(lt AS DOUBLE)) / 0.25 AS long_burn,
  ((CAST(n_bad AS DOUBLE) / CAST(n_total AS DOUBLE)) / 0.25 > 1.2
   AND (CAST(lb AS DOUBLE) / CAST(lt AS DOUBLE)) / 0.25 > 1.2) AS alert
FROM win
"""
