"""Per-series statistical monitoring over the migrated point relation —
the sensor-health analytics an operator runs AFTER the reference's
migration lands the data (reference `sqllite2influxdb.py` ships points
so dashboards/alerts can watch them; these are the standard watchers).

Every operator here is exact-arithmetic and value-level oracle-checked:
the established micro-quantized BIGINT accumulation (see
`plans/influxql.py`) keeps sums order-independent and bit-identical in
DuckDB, and every per-row double expression is written once and
mirrored verbatim in the oracle SQL.

Scale shape: ONE shuffle keyed on the series columns (measurement,
domain, entity_id) — InfluxDB's own shard key — for every operator;
window frames are row-bounded (trailing N points), so state per task is
O(frame), never O(series). Series parallelism is the unit of scale:
100 TB of points over millions of series shards evenly; no operator
here ever takes a global window or collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SERIES = ("measurement", "domain", "entity_id")
_MICRO = 1e6


def _w():
    return Window.partitionBy(*_SERIES).orderBy("ts_epoch", "state_id")


def _series_mean() -> Column:
    """Micro-quantized per-series mean as a window aggregate: the whole
    partition is one frame, integer accumulation, so Spark and DuckDB
    agree to the bit."""
    wp = Window.partitionBy(*_SERIES)
    micro = F.sum(F.round(F.col("value") * _MICRO).cast("long")).over(wp)
    return (micro / _MICRO) / F.count(F.lit(1)).over(wp)


def series_acf(pts: DataFrame, max_lag: int = 3) -> DataFrame:
    """Per-series autocorrelation at lags 1..max_lag:
    ``r_k = Σ_{t>k} d_t·d_{t−k} / Σ_t d_t²`` with ``d_t = x_t − x̄``.

    The sample-order products ``d_t·d_{t−k}`` are computed row-locally
    as doubles (one fixed expression both engines evaluate identically),
    micro-quantized to BIGINT and integer-summed — the order-independent
    accumulation that makes the ratio bit-exact cross-engine. Lags are a
    handful of `F.lag` columns on ONE series window; the final ratio is
    a series-keyed aggregate on the same shuffle.

    The canonical diagnostic behind seasonality detection and
    sensor-stuck alerts (ACF≈1 at every lag = flatlined sensor).
    """
    w = _w()
    d = (F.col("value") - F.col("_mean")).alias("_d")
    base = pts.select(
        *_SERIES, "ts_epoch", "state_id", "value",
        _series_mean().alias("_mean"),
    ).select(*_SERIES, "ts_epoch", "state_id", d)
    lag_cols = [
        F.round(F.col("_d") * F.lag("_d", k).over(w) * _MICRO)
        .cast("long").alias(f"_p{k}")
        for k in range(1, max_lag + 1)
    ]
    terms = base.select(
        *_SERIES,
        F.round(F.col("_d") * F.col("_d") * _MICRO)
        .cast("long").alias("_p0"),
        *lag_cols,
    )
    sums = terms.groupBy(*_SERIES).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("_p0").alias("_s0"),
        *[F.sum(f"_p{k}").alias(f"_s{k}")
          for k in range(1, max_lag + 1)],
    )
    # constant (or single-point) series have zero variance: ACF is
    # undefined there — excluded, not NaN'd (mirrored in the oracle)
    return sums.filter(F.col("_s0") > 0).select(
        *_SERIES, "n_points",
        *[(F.col(f"_s{k}") / F.col("_s0")).alias(f"acf{k}")
          for k in range(1, max_lag + 1)],
    )


# One-parse SQL text of the mean-shift detector (r14, guide §5): the
# chained build cost ~0.35 s of per-call analysis at any data size; the
# text parses once (~0.06 s). Plan-identical to `_mean_shift_scores_df`
# — sameResult-pinned by
# tests/test_plans.py::test_mean_shift_text_plan_equals_dataframe_build.
# `1000000.0D` / `{threshold}D` suffixes: bare SQL float literals parse
# as DECIMAL, the DataFrame build uses Python doubles. ADVICE r14 low
# #1: the threshold renders via float() (repr of a numpy scalar would
# be 'np.float64(10.0)' — invalid SQL) and non-finite values raise up
# front — the replaced F.lit(threshold) path accepted inf/nan, but a
# non-finite threshold was never a meaningful detector input; failing
# loudly beats emitting 'infD'.
def _mean_shift_sql(w_pts: int, threshold: float) -> str:
    import math

    threshold = float(threshold)
    if not math.isfinite(threshold):
        raise ValueError(
            f"mean_shift threshold must be finite, got {threshold!r}")
    skey = ", ".join(_SERIES)
    wser = f"PARTITION BY {skey} ORDER BY ts_epoch ASC, state_id ASC"
    bef = f"OVER ({wser} ROWS BETWEEN {w_pts} PRECEDING AND 1 PRECEDING)"
    aft = (f"OVER ({wser} ROWS BETWEEN CURRENT ROW "
           f"AND {w_pts - 1} FOLLOWING)")
    micro = "CAST(round(value * 1000000.0D, 0) AS BIGINT)"
    return f"""
SELECT state_id, {skey}, ts_epoch, before_mean, after_mean,
       (after_mean - before_mean) AS shift
FROM (
  SELECT state_id, {skey}, ts_epoch, value,
         (sum({micro}) {bef} / 1000000.0D) / count(1) {bef} AS before_mean,
         (sum({micro}) {aft} / 1000000.0D) / count(1) {aft} AS after_mean,
         count(1) {bef} AS _nb,
         count(1) {aft} AS _na
  FROM {{pts}}
) WHERE _nb = {w_pts} AND _na = {w_pts}
  AND abs(after_mean - before_mean) > {threshold!r}D
"""


def mean_shift_scores(pts: DataFrame, w_pts: int = 12,
                      threshold: float = 10.0) -> DataFrame:
    """Sliding two-window mean-shift detection — see
    `_mean_shift_scores_df` for the plan shape and float-determinism
    notes. Ships as ONE SQL parse, plan-identical to the chained
    reference (sameResult-pinned)."""
    from ..functions.sqlsplice import sql_with_plans

    return sql_with_plans(pts.sparkSession,
                          _mean_shift_sql(w_pts, threshold), pts=pts)


def _mean_shift_scores_df(pts: DataFrame, w_pts: int = 12,
                          threshold: float = 10.0) -> DataFrame:
    """Chained-DataFrame reference for the mean-shift text above (the
    exact-SQL half of E-Divisive / CUSUM alerting): at each point,
    compare the mean of the previous ``w_pts`` points against the mean
    of the next ``w_pts`` (current row included); emit points where
    ``|after − before| > threshold`` — a level change in the series.

    Both window means use micro-quantized integer sums over row-bounded
    frames on the ONE series shuffle; only full windows score (InfluxDB
    MOVING_AVERAGE's emit-when-full convention).
    """
    w = _w()
    before_f = w.rowsBetween(-w_pts, -1)
    after_f = w.rowsBetween(0, w_pts - 1)
    micro = F.round(F.col("value") * _MICRO).cast("long")
    scored = pts.select(
        "state_id", *_SERIES, "ts_epoch", "value",
        ((F.sum(micro).over(before_f) / _MICRO)
         / F.count(F.lit(1)).over(before_f)).alias("before_mean"),
        ((F.sum(micro).over(after_f) / _MICRO)
         / F.count(F.lit(1)).over(after_f)).alias("after_mean"),
        F.count(F.lit(1)).over(before_f).alias("_nb"),
        F.count(F.lit(1)).over(after_f).alias("_na"),
    )
    shift = F.col("after_mean") - F.col("before_mean")
    return (
        scored.filter((F.col("_nb") == w_pts) & (F.col("_na") == w_pts))
        .select("state_id", *_SERIES, "ts_epoch",
                "before_mean", "after_mean", shift.alias("shift"))
        .filter(F.abs(F.col("shift")) > threshold)
    )


def rolling_quantile(pts: DataFrame, n: int = 16,
                     p: float = 0.9) -> DataFrame:
    """Trailing p-quantile per series over the last ``n`` points
    (rank pick ``ceil(p·cnt)`` on the sorted frame — the actual-sample
    convention InfluxQL PERCENTILE uses, no interpolation). The rolling
    p90 band is the standard dashboard envelope; emitted once the frame
    is full.

    Per-row state is the sorted n-element frame (sort_array over a
    collect_list frame) — O(n) per row with n fixed and small, riding
    the one series shuffle. The identical list/sort/index expression
    runs in DuckDB (list() OVER + list_sort), so values hash-match.
    """
    w = _w().rowsBetween(-(n - 1), 0)
    arr = F.sort_array(F.collect_list("value").over(w))
    cnt = F.size(arr)
    q = F.element_at(arr, F.ceil(cnt * F.lit(p)).cast("int"))
    return (
        pts.select("state_id", *_SERIES, "ts_epoch", "value",
                   cnt.alias("_cnt"), q.alias("rolling_q"))
        .filter(F.col("_cnt") == n)
        .drop("_cnt")
    )


def series_correlation(pts: DataFrame,
                       bucket_s: int = 3600) -> DataFrame:
    """Cross-MEASUREMENT Pearson correlation per entity — "does power
    track temperature?", the standard multi-sensor dashboard question.

    1. hourly mean per (measurement, domain, entity_id, bucket) —
       micro-quantized integer sums, the established downsample shape;
    2. self-join the DOWNSAMPLED relation on (domain, entity_id,
       bucket) with measurement_a < measurement_b — aligned sample
       pairs; the join input is already hours×series small, and the
       exchange keys on the entity columns;
    3. Pearson r per (entity, measurement pair) from milli-quantized
       integer moments: Σx, Σy, Σx², Σy², Σxy as BIGINTs (order-
       independent ⇒ bit-exact cross-engine), one fixed double
       expression at the end. |value| ≤ 1e4 and milli quantization
       bound Σxy at ~1e14·n — exact to ~3e4 aligned hours per pair
       (the `q_influx_stddev_median` bound).

    Constant-on-either-side pairs (zero variance) are excluded —
    r is undefined there, mirrored in the oracle.
    """
    micro = F.sum(F.round(F.col("value") * _MICRO).cast("long"))
    hourly = (
        pts.groupBy(*_SERIES,
                    F.floor(F.col("ts_epoch") / bucket_s).cast("long")
                    .alias("_b"))
        .agg(((micro / _MICRO) / F.count(F.lit(1))).alias("_m"))
    )
    qa = F.round(F.col("_ma") * 1e3).cast("long")
    qb = F.round(F.col("_mb") * 1e3).cast("long")
    a = hourly.select(F.col("measurement").alias("meas_a"),
                      "domain", "entity_id", "_b",
                      F.col("_m").alias("_ma"))
    b = hourly.select(F.col("measurement").alias("meas_b"),
                      "domain", "entity_id", "_b",
                      F.col("_m").alias("_mb"))
    paired = (
        a.join(b, ["domain", "entity_id", "_b"])
        .filter(F.col("meas_a") < F.col("meas_b"))
        .select("domain", "entity_id", "meas_a", "meas_b",
                qa.alias("_x"), qb.alias("_y"))
    )
    n = F.count(F.lit(1))
    sx, sy = F.sum("_x"), F.sum("_y")
    sxx = F.sum(F.col("_x") * F.col("_x"))
    syy = F.sum(F.col("_y") * F.col("_y"))
    sxy = F.sum(F.col("_x") * F.col("_y"))
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    sums = paired.groupBy("domain", "entity_id", "meas_a",
                          "meas_b").agg(
        n.alias("n_buckets"),
        var_x.alias("_vx"), var_y.alias("_vy"),
        (n * sxy - sx * sy).alias("_cov"),
    )
    return (
        sums.filter((F.col("_vx") > 0) & (F.col("_vy") > 0))
        .select(
            "domain", "entity_id", "meas_a", "meas_b", "n_buckets",
            (F.col("_cov").cast("double")
             / (F.sqrt(F.col("_vx").cast("double"))
                * F.sqrt(F.col("_vy").cast("double"))))
            .alias("pearson_r"),
        )
    )


def fleet_correlation(pts: DataFrame,
                      bucket_s: int = 3600) -> DataFrame:
    """Per-entity Pearson correlation against the FLEET AVERAGE of its
    measurement — "which sensors track the building?" The linear-by-
    construction form of cross-series correlation: all-pairs entity
    correlation is quadratic in entities (the classic trap); each
    entity vs one reference series is one pass.

    Shape: bucket means per (measurement, entity, bucket) — one
    downsample shuffle — then the fleet reference per (measurement,
    bucket) aggregates the ALREADY-DOWNSAMPLED relation (tiny:
    measurements × buckets) and broadcasts back. Moments accumulate
    milli-quantized BIGINTs (`series_correlation`'s exactness recipe).
    Zero-variance sides are excluded (constant sensor or constant
    fleet — r undefined).
    """
    micro = F.sum(F.round(F.col("value") * _MICRO).cast("long"))
    hourly = (
        pts.groupBy("measurement", "domain", "entity_id",
                    F.floor(F.col("ts_epoch") / bucket_s).cast("long")
                    .alias("_b"))
        .agg(((micro / _MICRO) / F.count(F.lit(1))).alias("_m"))
    )
    # fleet reference: mean of the ENTITY MEANS per (measurement,
    # bucket) — milli-quantize the entity means so the reference is
    # itself exact integer arithmetic in both engines
    qm = F.round(F.col("_m") * 1e3).cast("long")
    fleet = (
        hourly.groupBy("measurement", "_b")
        .agg(((F.sum(qm) / 1e3) / F.count(F.lit(1))).alias("_fm"))
    )
    paired = (
        hourly.join(F.broadcast(fleet), ["measurement", "_b"])
        .select("measurement", "domain", "entity_id",
                qm.alias("_x"),
                F.round(F.col("_fm") * 1e3).cast("long").alias("_y"))
    )
    n = F.count(F.lit(1))
    sx, sy = F.sum("_x"), F.sum("_y")
    var_x = n * F.sum(F.col("_x") * F.col("_x")) - sx * sx
    var_y = n * F.sum(F.col("_y") * F.col("_y")) - sy * sy
    cov = n * F.sum(F.col("_x") * F.col("_y")) - sx * sy
    sums = paired.groupBy("measurement", "domain", "entity_id").agg(
        n.alias("n_buckets"),
        var_x.alias("_vx"), var_y.alias("_vy"), cov.alias("_cov"),
    )
    return (
        sums.filter((F.col("_vx") > 0) & (F.col("_vy") > 0))
        .select(
            "measurement", "domain", "entity_id", "n_buckets",
            (F.col("_cov").cast("double")
             / (F.sqrt(F.col("_vx").cast("double"))
                * F.sqrt(F.col("_vy").cast("double"))))
            .alias("pearson_r"),
        )
    )


def hysteresis_alerts(pts: DataFrame, hi: float,
                      lo: float) -> DataFrame:
    """Schmitt-trigger alerting — the rule HA automations and Kapacitor
    alert nodes actually run: an alert OPENS when the value crosses
    ABOVE ``hi`` and stays open until the value drops BELOW ``lo`` (the
    hysteresis band kills flapping around a single threshold). Emits
    one row per CLOSED alert episode: span, point count, peak value.
    A series' final still-open episode has no closing crossing and is
    not emitted (the streaming twin would hold it as state).

    Plan: crossing markers (value > hi → 1, value < lo → 0, else NULL),
    alert state = LOCF of the markers, episodes = gaps-and-islands on
    the state — markers, LOCF, group ids and the episode aggregate all
    ride the ONE series shuffle."""
    if not lo < hi:
        raise ValueError("hysteresis needs lo < hi")
    w = _w()
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    marker = (F.when(F.col("value") > hi, 1)
              .when(F.col("value") < lo, 0))
    st = pts.select(
        *_SERIES, "ts_epoch", "state_id", "value",
        F.coalesce(F.last(marker, ignorenulls=True).over(wrun),
                   F.lit(0)).alias("_on"),
    )
    chg = F.when(
        F.lag("_on").over(w).isNull()
        | (F.col("_on") != F.lag("_on").over(w)), 1).otherwise(0)
    grouped = st.select("*", F.sum(chg).over(wrun).alias("_grp"))
    # an episode is CLOSED iff a later group exists in the series
    wall = Window.partitionBy(*_SERIES)
    episodes = (
        grouped.groupBy(*_SERIES, "_grp")
        .agg(F.min("ts_epoch").alias("alert_start"),
             F.max("ts_epoch").alias("alert_end"),
             F.count(F.lit(1)).alias("n_points"),
             F.max("value").alias("peak"),
             F.max("_on").alias("_on"))
    )
    last_grp = F.max("_grp").over(wall)
    return (episodes
            .withColumn("_last", last_grp)
            .filter((F.col("_on") == 1) & (F.col("_grp") < F.col("_last")))
            .select(*_SERIES, "alert_start", "alert_end", "n_points",
                    "peak"))


def flatline_runs(pts: DataFrame, min_run: int = 5) -> DataFrame:
    """Stuck-sensor detection: maximal runs of ≥ ``min_run`` consecutive
    IDENTICAL values per series, with the run's span and length — the
    gaps-and-islands pattern (change-marker → running-sum group id →
    group aggregate), all three steps on the ONE series shuffle.

    A real HA failure mode: a sensor that keeps reporting the same
    reading is dead even though points keep arriving; no threshold on
    values can catch it, run-length can.
    """
    w = _w()
    chg = F.when(
        F.lag("value").over(w).isNull()
        | (F.col("value") != F.lag("value").over(w)), 1).otherwise(0)
    grouped = pts.select(
        *_SERIES, "ts_epoch", "state_id", "value", chg.alias("_chg"),
    ).select(
        *_SERIES, "ts_epoch", "state_id", "value",
        F.sum("_chg").over(
            w.rowsBetween(Window.unboundedPreceding, 0)).alias("_grp"),
    )
    return (
        grouped.groupBy(*_SERIES, "_grp")
        .agg(F.min("ts_epoch").alias("run_start"),
             F.max("ts_epoch").alias("run_end"),
             F.count(F.lit(1)).alias("run_len"),
             F.min("value").alias("value"))
        .filter(F.col("run_len") >= min_run)
        .drop("_grp")
    )


def slo_burn_rate(events: DataFrame, budget: float = 0.25,
                  long_hours: int = 6,
                  factor: float = 1.2) -> DataFrame:
    """Google-SRE multiwindow SLO burn-rate alerts over an event
    stream: per hour, the error-ratio burn (ratio / error budget) for
    the SHORT (1 h) and LONG (trailing ``long_hours``) windows; alert
    iff BOTH exceed ``factor`` — the standard two-window rule that
    suppresses blips (short-only) and stale pages (long-only).

    Scale shape: one hour-keyed partial aggregation collapses the event
    stream to |hours| rows (bounded: a year is 8.8 k rows whatever the
    event volume), so the unpartitioned range window that follows runs
    on a relation that fits one task by construction. Ratios divide
    BIGINT counts in one double expression per engine — oracle-exact.
    """
    from pyspark.sql import Window as W

    h = (F.floor(F.unix_micros(F.col("ts")) / 3_600_000_000)
         .cast("long"))
    hourly = events.groupBy(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long").alias("n_bad"),
    )
    wr = W.orderBy("h").rangeBetween(-(long_hours - 1), 0)
    lb = F.sum("n_bad").over(wr).cast("long")
    lt = F.sum("n_total").over(wr).cast("long")
    short_burn = (F.col("n_bad").cast("double")
                  / F.col("n_total").cast("double")) / F.lit(budget)
    long_burn = (lb.cast("double") / lt.cast("double")) / F.lit(budget)
    return hourly.select(
        (F.col("h") * 3600).alias("hour_epoch"),
        "n_total", "n_bad",
        short_burn.alias("short_burn"),
        long_burn.alias("long_burn"),
        ((short_burn > factor) & (long_burn > factor)).alias("alert"),
    )
