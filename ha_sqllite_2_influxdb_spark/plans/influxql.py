"""InfluxQL-style query functions over the migrated point series.

The reference (``sqllite2influxdb.py``) ships Home-Assistant history INTO
InfluxDB so users can query it there with InfluxQL functions —
``DERIVATIVE``, ``INTEGRAL``, ``MOVING_AVERAGE``, ``SPREAD`` /
``FIRST`` / ``LAST`` / ``ELAPSED``. This module re-expresses that
post-migration query surface Spark-side over the same point relation the
pipeline produces (`..operators.transform.points`), so a reference user
can run their sink-side dashboards without the sink.

Scale shape: every function is a per-series window or aggregate —
partitioned by the (measurement, domain, entity_id) series key, which is
exactly how InfluxDB shards too. No global windows, no driver state; at
100 TB the one shuffle is keyed on series id and AQE handles hot
entities. Float determinism: per-row expressions are written with the
SAME association in Spark and the DuckDB oracle (bit-identical IEEE
ops); the one accumulating aggregate (the trapezoid integral) sums
micro-quantized BIGINTs, so it is partition-order-independent and
repr-exact across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..memo import _artifact
from ..operators.transform import points
from .ha_pipeline import _CTE, _JOINED, _POINTS, _PTS_COLS, _ha

# numeric point series: InfluxQL transformations apply to float fields
_SERIES = ("measurement", "domain", "entity_id")
_SKEY_SQL = ", ".join(_SERIES)  # the series key in the one-parse texts

# Memoized per (application, sf_dir) — the _CORPUS_CACHE pattern, found
# by the r11 plan-build profile (VERDICT r10 #7): 37 call sites across
# five plan modules each re-CONSTRUCTED this ~200-expression tree per
# invocation, ~0.17-0.20 s of pure py4j/analysis chatter per query
# (flux_window_fill_prev spent 0.23 of its 0.39 s fresh build here).
# A DataFrame is immutable, so reusing the OBJECT is plan-identical by
# construction — no sameResult pin needed, nothing physical changes.
# NOT .persist()ed: consumers want the plan, not a materialization the
# optimizer could no longer push filters into.
_NUM_POINTS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _numeric_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    return _artifact(
        _NUM_POINTS_CACHE, key,
        lambda: points(*_ha(spark, sf_dir))
        .filter(F.col("value").isNotNull())
        .select("state_id", *_SERIES, "ts_epoch", "value"))


def _w():
    # ts ties are possible in the fixture; state_id breaks them
    # identically in both engines
    return Window.partitionBy(*_SERIES).orderBy("ts_epoch", "state_id")


_ORACLE_NUM = f"""{_CTE},
{_JOINED},
{_POINTS},
num AS (
  SELECT state_id, measurement, domain, entity_id, ts_epoch, value
  FROM pts WHERE value IS NOT NULL
)"""


def q_influx_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``DERIVATIVE(value, 1s)``: per-series rate of change
    between consecutive points. One window on the series-key shuffle;
    the first point of each series has no predecessor and is dropped,
    zero-Δt pairs yield NULL (InfluxDB skips them too)."""
    pts = _numeric_points(spark, sf_dir)
    w = _w()
    dv = F.col("value") - F.lag("value").over(w)
    dt = F.col("ts_epoch") - F.lag("ts_epoch").over(w)
    return (
        pts.select(
            "state_id", *_SERIES, "ts_epoch",
            F.when(dt != 0, dv / dt).alias("deriv_per_s"),
            dt.alias("dt_s"),
        )
        .filter(F.col("dt_s").isNotNull())
    )


def q_influx_integral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``INTEGRAL(value, 1s)``: per-series trapezoidal area
    under the curve, in value·seconds. Each consecutive-pair trapezoid
    is computed row-locally as a double (bit-identical in both engines),
    micro-quantized to BIGINT, and summed as integers — the established
    partition-order-independent accumulation pattern (see
    operators/similarity.py centroids) — then scaled back once."""
    pts = _numeric_points(spark, sf_dir)
    w = _w()
    trap = (
        (F.col("value") + F.lag("value").over(w))
        * (F.col("ts_epoch") - F.lag("ts_epoch").over(w))
        / F.lit(2.0)
    )
    terms = pts.select(
        *_SERIES,
        F.round(trap * 1e6).cast("long").alias("trap_micro"),
    ).filter(F.col("trap_micro").isNotNull())
    return terms.groupBy(*_SERIES).agg(
        (F.sum("trap_micro") / 1e6).alias("integral_vs"),
        (F.count(F.lit(1)) + 1).alias("n_points"),
    )


def q_influx_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``MOVING_AVERAGE(value, 3)``: trailing 3-point mean per
    series, emitted only once the window is full (InfluxDB semantics).
    Written as explicit lags with a FIXED association
    ``((v-2 + v-1) + v) / 3`` so Spark and the oracle produce
    bit-identical doubles — a frame-spec AVG would leave summation
    order to the engine."""
    pts = _numeric_points(spark, sf_dir)
    w = _w()
    l1, l2 = F.lag("value", 1).over(w), F.lag("value", 2).over(w)
    return pts.select(
        "state_id", *_SERIES, "ts_epoch", "value",
        (((l2 + l1) + F.col("value")) / F.lit(3.0)).alias("ma3"),
    ).filter(F.col("ma3").isNotNull())


# One-parse SQL text of the series-stats summary (r14, guide §5): the
# chained build cost ~0.21 s of per-call analysis; the text parses once
# (~0.06 s). Pinned plan-identical to `_q_influx_series_stats_df` by
# tests/test_plans.py::test_series_stats_text_plan_equals_dataframe_build.
# Window ORDER matters for CollapseWindow: the lag sits ADJACENT to the
# ascending row_number (same spec) so the two merge into one Window
# node — the pre-r14 chain interposed the descending rank between them
# and paid a THIRD whole-partition window pass for the same values.
_SERIES_STATS_SQL = f"""
SELECT {_SKEY_SQL},
       count(1) AS n_points,
       (max(value) - min(value)) AS spread,
       max(CASE WHEN (_rn_a = 1) THEN value END) AS first_val,
       max(CASE WHEN (_rn_d = 1) THEN value END) AS last_val,
       (max(ts_epoch) - min(ts_epoch)) AS elapsed_s,
       max(_gap) AS max_gap_s
FROM (
  SELECT {_SKEY_SQL}, ts_epoch, value,
         row_number() OVER (PARTITION BY {_SKEY_SQL}
                            ORDER BY ts_epoch ASC, state_id ASC) AS _rn_a,
         row_number() OVER (PARTITION BY {_SKEY_SQL}
                            ORDER BY ts_epoch DESC, state_id DESC) AS _rn_d,
         (ts_epoch - lag(ts_epoch) OVER (PARTITION BY {_SKEY_SQL}
              ORDER BY ts_epoch ASC, state_id ASC)) AS _gap
  FROM {{pts}})
GROUP BY {_SKEY_SQL}
"""


def q_influx_series_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``SPREAD`` / ``FIRST`` / ``LAST`` / ``ELAPSED`` as one
    per-series summary: value spread (max−min, exact — no
    accumulation), first/last value under the deterministic
    (ts, state_id) total order (the OHLC row_number trick — one window
    rank riding the same series shuffle the aggregate needs), total
    elapsed seconds, and the largest inter-point gap (a max over
    per-row elapsed — order-independent). Ships as ONE SQL parse,
    plan-identical to `_q_influx_series_stats_df`."""
    from ..functions.sqlsplice import sql_with_plans

    return sql_with_plans(spark, _SERIES_STATS_SQL,
                          pts=_numeric_points(spark, sf_dir))


def _q_influx_series_stats_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained-DataFrame reference for the series-stats text above.
    All three window columns come from ONE select — a withColumn chain
    materializes each in its own Project, which both blocks
    CollapseWindow (the pre-r14 shape paid a third whole-partition
    window pass) and inserts Projects between the Window nodes that
    break plan equality with the one-SELECT text."""
    pts = _numeric_points(spark, sf_dir)
    w = _w()
    marked = pts.select(
        *_SERIES, "ts_epoch", "value",
        F.row_number().over(w).alias("_rn_a"),
        F.row_number().over(
            Window.partitionBy(*_SERIES)
            .orderBy(F.desc("ts_epoch"), F.desc("state_id"))
        ).alias("_rn_d"),
        (F.col("ts_epoch") - F.lag("ts_epoch").over(w)).alias("_gap"),
    )
    return marked.groupBy(*_SERIES).agg(
        F.count(F.lit(1)).alias("n_points"),
        (F.max("value") - F.min("value")).alias("spread"),
        F.max(F.when(F.col("_rn_a") == 1, F.col("value"))).alias("first_val"),
        F.max(F.when(F.col("_rn_d") == 1, F.col("value"))).alias("last_val"),
        (F.max("ts_epoch") - F.min("ts_epoch")).alias("elapsed_s"),
        F.max("_gap").alias("max_gap_s"),
    )


def q_influx_cumulative_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``CUMULATIVE_SUM(value)``: per-series running total.
    Values micro-quantize to BIGINT once per row, the ROWS-frame running
    sum accumulates integers (exact at any prefix, any partitioning),
    and one division restores the scale — the `window_running` integer
    pattern applied to float fields."""
    pts = _numeric_points(spark, sf_dir)
    w = _w().rowsBetween(Window.unboundedPreceding, 0)
    micro = F.round(F.col("value") * 1e6).cast("long")
    return pts.select(
        "state_id", *_SERIES, "ts_epoch",
        (F.sum(micro).over(w) / 1e6).alias("cum_sum"),
    )


def q_influx_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``DIFFERENCE(value)`` + ``NON_NEGATIVE_DIFFERENCE``:
    per-point change vs the previous point in the series (the counter
    pattern — non-negative drops counter resets to NULL). Pure per-row
    double subtraction on one series window."""
    pts = _numeric_points(spark, sf_dir)
    d = F.col("value") - F.lag("value").over(_w())
    return pts.select(
        "state_id", *_SERIES, "ts_epoch",
        d.alias("diff"),
        F.when(d >= 0, d).alias("nn_diff"),
    ).filter(F.col("diff").isNotNull())


def q_influx_nn_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``NON_NEGATIVE_DERIVATIVE(value, 1s)`` — the counter
    rate pattern (the most-issued counter query in practice): same
    per-series rate as DERIVATIVE but negative results (counter resets)
    are DROPPED, not emitted (InfluxDB documents drop, unlike
    NON_NEGATIVE_DIFFERENCE's NULL row). Same single series-key window
    shuffle as the plain derivative."""
    pts = _numeric_points(spark, sf_dir)
    w = _w()
    dv = F.col("value") - F.lag("value").over(w)
    dt = F.col("ts_epoch") - F.lag("ts_epoch").over(w)
    return (
        pts.select(
            "state_id", *_SERIES, "ts_epoch",
            F.when(dt != 0, dv / dt).alias("nn_deriv_per_s"),
            dt.alias("dt_s"),
        )
        .filter(F.col("dt_s").isNotNull()
                & (F.col("nn_deriv_per_s") >= 0))
    )


def q_influx_stddev_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``STDDEV(value)`` + ``MEDIAN(value)`` per series, both
    cross-engine-exact:

    - STDDEV from milli-quantized integer moments — Σx and Σx² as
      BIGINTs (order-independent), then ONE double expression
      ``sqrt((n·Σx² − (Σx)²) / (n·(n−1)))`` with the same association
      in both engines. Milli (1e3) rather than micro bounds Σx² at
      ~1e14·n for |value| ≤ 1e4 — exact to ~3e4 points/series (the HA
      series shape); a corpus with longer series would flip this
      aggregate to DOUBLE moments, correct to ~1 ulp but no longer
      bit-pinned cross-engine.
    - MEDIAN per InfluxDB's documented rule: middle value for odd n,
      the AVERAGE of the two middle values for even n — two rank
      picks on the (value, state_id) total order riding the same
      series shuffle, ``(lo + hi) / 2`` exact.
    """
    pts = _numeric_points(spark, sf_dir)
    milli = F.round(F.col("value") * 1e3).cast("long")
    wv = Window.partitionBy(*_SERIES).orderBy("value", "state_id")
    n = F.count(F.lit(1)).over(Window.partitionBy(*_SERIES))
    ranked = pts.select(
        *_SERIES, "value", milli.alias("_m"),
        F.row_number().over(wv).alias("_rn"),
        n.alias("_n"),
        # middle ranks: odd n -> both = (n+1)/2; even n -> n/2, n/2+1
        F.floor((n + 1) / 2).cast("long").alias("_lo"),
        (F.floor(n / 2) + 1).cast("long").alias("_hi"),
    )
    return ranked.groupBy(*_SERIES).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.when(
            F.count(F.lit(1)) > 1,
            F.sqrt(
                (F.count(F.lit(1)) * F.sum(F.col("_m") * F.col("_m"))
                 - F.sum("_m") * F.sum("_m")).cast("double")
                / (F.count(F.lit(1))
                   * (F.count(F.lit(1)) - 1)).cast("double")
            ) / F.lit(1e3),
        ).alias("stddev_val"),
        ((F.max(F.when(F.col("_rn") == F.col("_lo"), F.col("value")))
          + F.max(F.when(F.col("_rn") == F.col("_hi"), F.col("value"))))
         / F.lit(2.0)).alias("median_val"),
    )


def q_influx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``PERCENTILE(value, 95)``: the ACTUAL SAMPLE at the
    95th percentile rank (no interpolation — Influx semantics), rank
    ``max(1, ceil(0.95·n))`` under the (value, state_id) total order.
    row_number and the partition count ride ONE series shuffle; the
    filter keeps one row per series."""
    pts = _numeric_points(spark, sf_dir)
    wv = Window.partitionBy(*_SERIES).orderBy("value", "state_id")
    n = F.count(F.lit(1)).over(Window.partitionBy(*_SERIES))
    ranked = pts.select(
        *_SERIES, "value",
        F.row_number().over(wv).alias("_rn"),
        F.greatest(F.lit(1), F.ceil(n * F.lit(0.95))).alias("_target"),
        n.alias("n_points"),
    )
    return (
        ranked.filter(F.col("_rn") == F.col("_target"))
        .select(*_SERIES, F.col("value").alias("p95"), "n_points")
    )


def _state_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING-state points (binary_sensor/switch/... series): the other
    half of the reference's output — `sqllite2influxdb.py` writes
    ``state="..."`` fields for every non-numeric state, and the classic
    HA dashboard queries (current mode, time-in-state) run on them."""
    return (
        points(*_ha(spark, sf_dir))
        .filter(F.col("state_str").isNotNull())
        .select("state_id", *_SERIES, "ts_epoch", "state_str")
    )


def q_influx_state_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``MODE(state)`` over string-state series — InfluxDB's MODE works
    on string fields too (ties → lowest lexicographic value, the same
    documented rule as numeric MODE). Two-phase: (series, state) counts,
    then one rank pick; both exchanges lead with the series columns."""
    st = _state_points(spark, sf_dir)
    freq = st.groupBy(*_SERIES, "state_str").agg(
        F.count(F.lit(1)).alias("f"))
    w = Window.partitionBy(*_SERIES).orderBy(F.desc("f"),
                                             F.asc("state_str"))
    return (
        freq.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*_SERIES, F.col("state_str").alias("mode_state"),
                F.col("f").alias("mode_freq"))
    )


def q_influx_state_durations(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Time-in-state per (series, state) — the HA "history stats" query
    (how long was the light on): each state holds from its point until
    the series' NEXT point (the final, still-open state contributes no
    closed interval). Per-row hold seconds are the same double in both
    engines; totals sum micro-quantized BIGINTs, so the result is
    repr-exact. One series window (lead) feeding one (series, state)
    aggregate — both exchanges series-led."""
    st = _state_points(spark, sf_dir)
    w = Window.partitionBy(*_SERIES).orderBy("ts_epoch", "state_id")
    dur = F.round((F.lead("ts_epoch").over(w) - F.col("ts_epoch"))
                  * 1e6).cast("long")
    iv = st.select(*_SERIES, "state_str", dur.alias("_d"))
    return iv.groupBy(*_SERIES, "state_str").agg(
        (F.sum("_d") / 1e6).alias("total_s"),
        F.count("_d").alias("n_intervals"),
    )


def q_influx_percentile_approx(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """The 100 TB face of ``PERCENTILE(value, 95)``: per-series
    ``percentile_approx`` (Greenwald-Khanna sketch). The exact tier
    (`q_influx_percentile`) rides a row_number window — a full sort of
    every series; this tier is a hash AGGREGATE of mergeable sketches:
    map-side partial sketches combine before the one series exchange,
    no sort anywhere, bounded state per series (the sketch, not the
    points). Rows-only registry tier (Spark's sketch is not DuckDB's);
    pytest brackets every approx value between the series' exact p90
    and p99 ranks and asserts it is a real sample of the series."""
    pts = _numeric_points(spark, sf_dir)
    return pts.groupBy(*_SERIES).agg(
        F.percentile_approx("value", 0.95, 10_000).alias("p95_approx"),
        F.count(F.lit(1)).alias("n_points"),
    )


def q_influx_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``EXPONENTIAL_MOVING_AVERAGE(value, 9)`` per series —
    the second inherently-recursive sink-side function (after
    HOLT_WINTERS): ema_0 = v_0, ema_i = α·v_i + (1−α)·ema_{i−1} with
    α = 2/(N+1) (the standard adjust-free recurrence, N = 9). SQL
    window functions cannot express the recurrence without 2^n
    expansion, so this is the forecast-operator pattern:
    ``applyInPandas`` with one group per series (sequential within a
    series, embarrassingly parallel across series — exactly InfluxDB's
    shard model), scalar float64 loop in fixed order so results are
    bit-identical run-to-run and to the pytest-pinned pure-Python
    reference. Rows-only registry tier (no SQL oracle possible)."""
    from ..operators.forecast import ema_points

    return ema_points(_numeric_points(spark, sf_dir), n=9)


def q_influx_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``SELECT MEAN(value) … GROUP BY time(1h) FILL(previous)``
    — the canonical Grafana dashboard downsample. Per series: hourly
    buckets over the series' own [first, last] hour span (integer
    ``sequence()`` + explode — no calendar crossJoin), bucket mean from
    micro-quantized integer sums (exact across engines), empty buckets
    LOCF-filled and flagged. The first bucket always holds data (the
    span starts at an observation), so the fill never sees a leading
    NULL. Plan shape: the big point relation is scanned ONCE into the
    (series, hour) bucket partial-agg; empty grid slots then derive
    from each bucket's DISTANCE to its predecessor (lag + sequence
    explode on the downsampled relation) — no span branch, no
    grid-to-bucket join, no second consumer of anything. Two exchanges
    total: the bucket agg and the series window the gap expansion and
    the LOCF fill share."""
    return downsample_fill_previous(_numeric_points(spark, sf_dir))


# One-parse SQL text of the downsample core (r14, guide §5): the
# chained build cost ~0.22 s of eager per-call analysis at any data
# size; the text parses once (~0.04 s). Plan-identical to
# `_downsample_fill_previous_df` — sameResult-pinned by
# tests/test_plans.py::test_downsample_text_plan_equals_dataframe_build.
# `1000000.0D` suffixes: bare SQL float literals parse as DECIMAL, the
# DataFrame build uses Python doubles (1e6).
_DOWNSAMPLE_SQL = f"""
SELECT {_SKEY_SQL},
       grid_idx * 3600 AS bucket_epoch,
       CASE WHEN (grid_idx = hour_idx) THEN mean_val ELSE _prev_mean END
         AS mean_locf,
       CASE WHEN (grid_idx = hour_idx) THEN n_points ELSE 0 END AS n_points,
       (NOT (grid_idx = hour_idx)) AS gap_filled
FROM (
  SELECT {_SKEY_SQL}, hour_idx, mean_val, n_points, _prev_mean,
         explode(sequence(coalesce(_prev + 1, hour_idx), hour_idx))
           AS grid_idx
  FROM (
    SELECT {_SKEY_SQL}, hour_idx, mean_val, n_points,
           lag(hour_idx) OVER (PARTITION BY {_SKEY_SQL} ORDER BY hour_idx)
             AS _prev,
           lag(mean_val) OVER (PARTITION BY {_SKEY_SQL} ORDER BY hour_idx)
             AS _prev_mean
    FROM (
      SELECT {_SKEY_SQL}, hour_idx,
             (sum(micro) / 1000000.0D) / count(1) AS mean_val,
             count(1) AS n_points
      FROM (
        SELECT {_SKEY_SQL},
               CAST(FLOOR(ts_epoch / 3600) AS BIGINT) AS hour_idx,
               CAST(round(value * 1000000.0D, 0) AS BIGINT) AS micro
        FROM {{pts}})
      GROUP BY {_SKEY_SQL}, hour_idx
    )
  )
)
"""


def downsample_fill_previous(pts: DataFrame) -> DataFrame:
    """The downsample core over any (series, ts_epoch, value) point
    relation — see `_downsample_fill_previous_df` for the plan shape
    and float-determinism notes. Ships as ONE SQL parse, plan-identical
    to the chained reference (sameResult-pinned)."""
    from ..functions.sqlsplice import sql_with_plans

    return sql_with_plans(pts.sparkSession, _DOWNSAMPLE_SQL, pts=pts)


def _downsample_fill_previous_df(pts: DataFrame) -> DataFrame:
    """Chained-DataFrame reference for the downsample text above —
    factored out so the scale probe can measure it on replicated series
    corpora (see `q_influx_downsample` for the plan shape and
    float-determinism notes).

    r14 plan surgery: the LOCF used to be a SECOND window
    (last(…, ignorenulls) over the exploded grid), which forced a sort
    of the full ~2M-row grid relation — two-thirds of the query's wall
    at sf0.1. But every gap row a bucket generates lies strictly
    between that bucket and its predecessor, so its carried-forward
    value IS the predecessor bucket's mean — already available as one
    more lag() on the FIRST window over the ~25k bucket rows. The fill
    becomes a per-row conditional projection; the grid relation is
    never sorted. Gap rows carry the identical double (the same
    mean_val the old window's last() picked), pinned value-equal by
    the unchanged oracle and
    tests/test_plans.py::test_downsample_gap_fill_is_lagged_mean.
    Two keyed exchanges remain — the agg's (series, hour) one (which
    keeps map-side combine: at 100 TB the partial agg collapses
    co-located points BEFORE the wire, which an explicit
    repartition-by-series would forfeit) and the window's (series) one
    over bucket rows only (measured: the raw-row repartition variant
    saves ~0.07 s at sf0.1 — not worth the scale regression)."""
    hr = F.floor(F.col("ts_epoch") / 3600).cast("long")
    micro = F.round(F.col("value") * 1e6).cast("long")
    buckets = (
        pts.select(*_SERIES, hr.alias("hour_idx"), micro.alias("micro"))
        .groupBy(*_SERIES, "hour_idx")
        .agg(
            ((F.sum("micro") / 1e6) / F.count(F.lit(1))).alias("mean_val"),
            F.count(F.lit(1)).alias("n_points"),
        )
    )
    wseries = Window.partitionBy(*_SERIES).orderBy("hour_idx")
    lagged = buckets.select(
        *_SERIES, "hour_idx", "mean_val", "n_points",
        F.lag("hour_idx").over(wseries).alias("_prev"),
        F.lag("mean_val").over(wseries).alias("_prev_mean"),
    )
    expanded = lagged.select(
        *_SERIES, "hour_idx", "mean_val", "n_points", "_prev_mean",
        F.explode(
            F.sequence(
                F.coalesce(F.col("_prev") + 1, F.col("hour_idx")),
                F.col("hour_idx"),
            )
        ).alias("grid_idx"),
    )
    is_real = F.col("grid_idx") == F.col("hour_idx")
    return expanded.select(
        *_SERIES,
        (F.col("grid_idx") * 3600).alias("bucket_epoch"),
        F.when(is_real, F.col("mean_val")).otherwise(F.col("_prev_mean"))
         .alias("mean_locf"),
        F.when(is_real, F.col("n_points")).otherwise(F.lit(0))
         .alias("n_points"),
        (~is_real).alias("gap_filled"),
    )


def q_influx_fill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``GROUP BY time(1h) FILL(linear)``: hourly mean
    downsample with empty buckets linearly INTERPOLATED between their
    neighboring real buckets (vs ``FILL(previous)``'s LOCF in
    `q_influx_downsample`). Same two-exchange shape: one scan into the
    (series, hour) partial agg, then gap expansion by lag + sequence on
    the DOWNSAMPLED relation — each gap row carries both endpoints from
    its generating real bucket (prev value via lag, current value on
    the row), so the interpolation ``v0 + (v1−v0)·(g−p)/(h−p)`` is a
    row-local double expression with the same association in both
    engines; no second window pass, no join back."""
    pts = _numeric_points(spark, sf_dir)
    hr = F.floor(F.col("ts_epoch") / 3600).cast("long")
    micro = F.round(F.col("value") * 1e6).cast("long")
    buckets = (
        pts.select(*_SERIES, hr.alias("hour_idx"), micro.alias("micro"))
        .groupBy(*_SERIES, "hour_idx")
        .agg(
            ((F.sum("micro") / 1e6) / F.count(F.lit(1))).alias("mean_val"),
            F.count(F.lit(1)).alias("n_points"),
        )
    )
    wseries = Window.partitionBy(*_SERIES).orderBy("hour_idx")
    lagged = buckets.select(
        *_SERIES, "hour_idx", "mean_val", "n_points",
        F.lag("hour_idx").over(wseries).alias("_prev"),
        F.lag("mean_val").over(wseries).alias("_prev_val"),
    )
    expanded = lagged.select(
        *_SERIES, "hour_idx", "mean_val", "n_points",
        "_prev", "_prev_val",
        F.explode(
            F.sequence(
                F.coalesce(F.col("_prev") + 1, F.col("hour_idx")),
                F.col("hour_idx"),
            )
        ).alias("grid_idx"),
    )
    is_real = F.col("grid_idx") == F.col("hour_idx")
    interp = (
        F.col("_prev_val")
        + (F.col("mean_val") - F.col("_prev_val"))
        * (F.col("grid_idx") - F.col("_prev")).cast("double")
        / (F.col("hour_idx") - F.col("_prev")).cast("double")
    )
    return expanded.select(
        *_SERIES,
        (F.col("grid_idx") * 3600).alias("bucket_epoch"),
        F.when(is_real, F.col("mean_val")).otherwise(interp)
         .alias("mean_lin"),
        F.when(is_real, F.col("n_points")).otherwise(F.lit(0))
         .alias("n_points"),
        (~is_real).alias("gap_filled"),
    )


def q_influx_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``MODE(value)``: the most frequent value per series,
    ties broken by the smallest value (InfluxDB's documented rule:
    lowest value wins on equal counts). One (series, value) count agg,
    then a min_by over (-freq, value) — the second agg rides a smaller
    relation keyed by the same series columns."""
    pts = _numeric_points(spark, sf_dir)
    freq = pts.groupBy(*_SERIES, "value").agg(
        F.count(F.lit(1)).alias("freq"))
    return freq.groupBy(*_SERIES).agg(
        F.min_by("value", F.struct((-F.col("freq")).alias("nf"), "value"))
         .alias("mode_val"),
        F.max("freq").alias("mode_freq"),
    )


def q_influx_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``TOP(value, 3)``: the three largest points per series
    WITH their timestamps (TOP keeps the source row, unlike MAX) —
    ties resolved by earliest time then state_id, descending-rank
    window on the one series shuffle."""
    pts = _numeric_points(spark, sf_dir)
    w = Window.partitionBy(*_SERIES).orderBy(
        F.desc("value"), F.asc("ts_epoch"), F.asc("state_id"))
    return (
        pts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("state_id", *_SERIES, "ts_epoch", "value", "rank")
    )


def q_influx_bottom3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``BOTTOM(value, 3)``: the three smallest points per
    series with their timestamps — TOP's mirror (ascending value,
    earliest-time tie-break), the same one-window shape."""
    pts = _numeric_points(spark, sf_dir)
    w = Window.partitionBy(*_SERIES).orderBy(
        F.asc("value"), F.asc("ts_epoch"), F.asc("state_id"))
    return (
        pts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("state_id", *_SERIES, "ts_epoch", "value", "rank")
    )


def q_influx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``COUNT(DISTINCT(value))`` + ``MODE``-adjacent cardinality
    summary per series: distinct value count, total points, and the
    min/max distinct value — one (series, value) pre-aggregation (the
    two-phase distinct pattern: map-side combine collapses duplicates
    BEFORE the series shuffle) feeding a series-keyed agg on the
    much smaller distinct relation."""
    pts = _numeric_points(spark, sf_dir)
    dv = pts.groupBy(*_SERIES, "value").agg(
        F.count(F.lit(1)).alias("_n"))
    return dv.groupBy(*_SERIES).agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("_n").alias("n_points"),
        F.min("value").alias("min_val"),
        F.max("value").alias("max_val"),
    )


def q_influx_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``SAMPLE(value, 5)``: a pseudo-random sample of 5 points
    per series — derandomized the engine way (`operators/sampling.py`
    precedent): rank by md5(state_id), identical in Spark and DuckDB,
    so task retries and the oracle reproduce the same sample. One
    series window."""
    pts = _numeric_points(spark, sf_dir)
    w = Window.partitionBy(*_SERIES).orderBy(
        F.md5(F.col("state_id").cast("string")), "state_id")
    return (
        pts.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= 5)
        .select("state_id", *_SERIES, "ts_epoch", "value")
    )


def q_influx_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``HOLT_WINTERS(12, 24)``: 12-hour-ahead forecast per
    series with a 24-hour season, fitted on the gap-filled hourly
    downsample (the InfluxDB input contract — HOLT_WINTERS consumes a
    GROUP BY time() result). Iterative recurrence ⇒ no SQL oracle;
    rows-only tier whose recurrence is bit-pinned against an
    independent reference loop in pytest (`operators/forecast.py`)."""
    from ..operators.forecast import holt_winters_forecast

    ds = q_influx_downsample(spark, sf_dir)
    hourly = ds.select(
        *_SERIES,
        (F.col("bucket_epoch") / 3600).cast("long").alias("hour_idx"),
        F.col("mean_locf").alias("mean_val"),
    )
    return holt_winters_forecast(hourly, season_len=24, horizon=12)


def q_influx_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RE-AGGREGATABLE rollup cascade — the way rollups must be
    built at 100 TB: raw → hourly → daily, where the DAILY tier
    aggregates the HOURLY tier, never rescanning raw. Exact because
    each tier carries MONOID state (micro-quantized BIGINT sum +
    count), not finalized means: integer addition is associative, so
    cascading equals direct aggregation bit-for-bit — which is
    precisely what the oracle asserts (it computes the daily tier
    DIRECTLY from raw; a means-of-means cascade would diverge and
    fail the hash compare). Derived mean materializes once, at read.

    Scale shape: tier N+1's input is tier N's output (monotonically
    smaller, already partitioned by the same leading series columns);
    the raw relation is scanned exactly once for the whole pyramid.
    """
    pts = _numeric_points(spark, sf_dir)
    micro = F.round(F.col("value") * 1e6).cast("long")
    hourly = (
        pts.groupBy(*_SERIES,
                    F.floor(F.col("ts_epoch") / 3600).cast("long")
                    .alias("_h"))
        .agg(F.sum(micro).alias("_s"), F.count(F.lit(1)).alias("_n"))
    )
    daily = (
        hourly.groupBy(*_SERIES,
                       F.floor(F.col("_h") / 24).cast("long").alias("_d"))
        .agg(F.sum("_s").alias("_s"), F.sum("_n").alias("_n"))
    )
    return daily.select(
        *_SERIES, (F.col("_d") * 86400).alias("time"),
        ((F.col("_s") / 1e6) / F.col("_n")).alias("mean"),
        F.col("_n").alias("n_points"),
    )


def q_ha_energy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE Home Assistant query: the energy dashboard — daily Wh per
    power sensor, trapezoid-integrated from the migrated W series
    (HA's own Riemann-sum integration helper does exactly this).
    Each trapezoid belongs to the day of its LEFT endpoint (the
    convention HA's hourly energy statistics use); terms are
    micro-quantized BIGINTs on the one series shuffle, the day
    grouping re-keys the already-small term relation.
    """
    pts = _numeric_points(spark, sf_dir).filter(
        F.col("measurement") == "W")
    w = _w()
    trap = (
        (F.col("value") + F.lag("value").over(w))
        * (F.col("ts_epoch") - F.lag("ts_epoch").over(w))
        / F.lit(2.0)
    )
    day = (F.floor(F.lag("ts_epoch").over(w) / 86400).cast("long")
           * 86400)
    terms = pts.select(
        *_SERIES, day.alias("day"),
        F.round(trap * 1e6).cast("long").alias("_t"),
    ).filter(F.col("_t").isNotNull())
    return terms.groupBy(*_SERIES, "day").agg(
        ((F.sum("_t") / 1e6) / F.lit(3600.0)).alias("energy_wh"),
        (F.count(F.lit(1)) + 1).alias("n_points"),
    )


QUERIES = {
    "influx_derivative": q_influx_derivative,
    "influx_integral": q_influx_integral,
    "influx_moving_average": q_influx_moving_average,
    "influx_series_stats": q_influx_series_stats,
    "influx_cumulative_sum": q_influx_cumulative_sum,
    "influx_difference": q_influx_difference,
    "influx_nn_derivative": q_influx_nn_derivative,
    "influx_stddev_median": q_influx_stddev_median,
    "influx_percentile": q_influx_percentile,
    "influx_downsample": q_influx_downsample,
    "influx_fill_linear": q_influx_fill_linear,
    "influx_mode": q_influx_mode,
    "influx_top3": q_influx_top3,
    "influx_bottom3": q_influx_bottom3,
    "influx_distinct": q_influx_distinct,
    "influx_sample": q_influx_sample,
    "influx_holt_winters": q_influx_holt_winters,
    "influx_percentile_approx": q_influx_percentile_approx,
    "influx_ema": q_influx_ema,
    "influx_state_mode": q_influx_state_mode,
    "influx_state_durations": q_influx_state_durations,
    "influx_rollup_cascade": q_influx_rollup_cascade,
    "ha_energy_daily": q_ha_energy_daily,
}

_ORACLE_ST = f"""{_CTE},
{_JOINED},
{_POINTS},
st AS (
  SELECT state_id, measurement, domain, entity_id, ts_epoch, state_str
  FROM pts WHERE state_str IS NOT NULL
)"""

ORACLES = {
    "influx_state_mode": f"""{_ORACLE_ST},
freq AS (
  SELECT measurement, domain, entity_id, state_str, count(*) AS f
  FROM st GROUP BY 1, 2, 3, 4
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY measurement, domain, entity_id
                               ORDER BY f DESC, state_str ASC) AS rn
  FROM freq
)
SELECT measurement, domain, entity_id, state_str AS mode_state,
       CAST(f AS BIGINT) AS mode_freq
FROM r WHERE rn = 1
""",
    "influx_state_durations": f"""{_ORACLE_ST},
iv AS (
  SELECT measurement, domain, entity_id, state_str,
    CAST(round((lead(ts_epoch) OVER (
        PARTITION BY measurement, domain, entity_id
        ORDER BY ts_epoch, state_id) - ts_epoch) * 1e6) AS BIGINT) AS d
  FROM st
)
SELECT measurement, domain, entity_id, state_str,
  CAST(sum(d) AS BIGINT) / 1e6 AS total_s,
  count(d)::BIGINT AS n_intervals
FROM iv GROUP BY 1, 2, 3, 4
""",
    "influx_derivative": f"""{_ORACLE_NUM},
lagged AS (
  SELECT state_id, measurement, domain, entity_id, ts_epoch,
    value - lag(value) OVER w AS dv,
    ts_epoch - lag(ts_epoch) OVER w AS dt_s
  FROM num
  WINDOW w AS (PARTITION BY measurement, domain, entity_id
               ORDER BY ts_epoch, state_id)
)
SELECT state_id, measurement, domain, entity_id, ts_epoch,
  CASE WHEN dt_s <> 0 THEN dv / dt_s END AS deriv_per_s, dt_s
FROM lagged WHERE dt_s IS NOT NULL
""",
    "influx_integral": f"""{_ORACLE_NUM},
terms AS (
  SELECT measurement, domain, entity_id,
    CAST(round((value + lag(value) OVER w)
               * (ts_epoch - lag(ts_epoch) OVER w) / 2.0 * 1e6)
         AS BIGINT) AS trap_micro
  FROM num
  WINDOW w AS (PARTITION BY measurement, domain, entity_id
               ORDER BY ts_epoch, state_id)
)
SELECT measurement, domain, entity_id,
  CAST(sum(trap_micro) AS BIGINT) / 1e6 AS integral_vs,
  count(*) + 1 AS n_points
FROM terms WHERE trap_micro IS NOT NULL
GROUP BY measurement, domain, entity_id
""",
    "influx_moving_average": f"""{_ORACLE_NUM},
lagged AS (
  SELECT state_id, measurement, domain, entity_id, ts_epoch, value,
    lag(value, 1) OVER w AS l1, lag(value, 2) OVER w AS l2
  FROM num
  WINDOW w AS (PARTITION BY measurement, domain, entity_id
               ORDER BY ts_epoch, state_id)
)
SELECT state_id, measurement, domain, entity_id, ts_epoch, value,
  ((l2 + l1) + value) / 3.0 AS ma3
FROM lagged WHERE l2 IS NOT NULL AND l1 IS NOT NULL
""",
    "influx_cumulative_sum": f"""{_ORACLE_NUM}
SELECT state_id, measurement, domain, entity_id, ts_epoch,
  -- running sum of BIGINTs types as HUGEINT in DuckDB: cast back before
  -- the scale division or the driver's pandas fetch degrades to float64
  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) OVER (
    PARTITION BY measurement, domain, entity_id
    ORDER BY ts_epoch, state_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / 1e6
    AS cum_sum
FROM num
""",
    "influx_difference": f"""{_ORACLE_NUM},
lagged AS (
  SELECT state_id, measurement, domain, entity_id, ts_epoch,
    value - lag(value) OVER (PARTITION BY measurement, domain, entity_id
                             ORDER BY ts_epoch, state_id) AS diff
  FROM num
)
SELECT state_id, measurement, domain, entity_id, ts_epoch, diff,
  CASE WHEN diff >= 0 THEN diff END AS nn_diff
FROM lagged WHERE diff IS NOT NULL
""",
    "influx_percentile": f"""{_ORACLE_NUM},
ranked AS (
  SELECT measurement, domain, entity_id, value,
    row_number() OVER (PARTITION BY measurement, domain, entity_id
                       ORDER BY value, state_id) AS rn,
    count(*) OVER (PARTITION BY measurement, domain, entity_id) AS n_points
  FROM num
)
SELECT measurement, domain, entity_id, value AS p95, n_points
FROM ranked WHERE rn = greatest(1, ceil(n_points * 0.95))
""",
    "influx_nn_derivative": f"""{_ORACLE_NUM},
lagged AS (
  SELECT state_id, measurement, domain, entity_id, ts_epoch,
    value - lag(value) OVER w AS dv,
    ts_epoch - lag(ts_epoch) OVER w AS dt_s
  FROM num
  WINDOW w AS (PARTITION BY measurement, domain, entity_id
               ORDER BY ts_epoch, state_id)
)
SELECT state_id, measurement, domain, entity_id, ts_epoch,
  CASE WHEN dt_s <> 0 THEN dv / dt_s END AS nn_deriv_per_s, dt_s
FROM lagged
WHERE dt_s IS NOT NULL
  AND CASE WHEN dt_s <> 0 THEN dv / dt_s END >= 0
""",
    "influx_stddev_median": f"""{_ORACLE_NUM},
ranked AS (
  SELECT measurement, domain, entity_id, value,
    CAST(round(value * 1e3) AS BIGINT) AS m,
    row_number() OVER (PARTITION BY measurement, domain, entity_id
                       ORDER BY value, state_id) AS rn,
    count(*) OVER (PARTITION BY measurement, domain, entity_id) AS n,
    CAST(floor((count(*) OVER (PARTITION BY measurement, domain,
                               entity_id) + 1) / 2) AS BIGINT) AS lo,
    CAST(floor(count(*) OVER (PARTITION BY measurement, domain,
                              entity_id) / 2) + 1 AS BIGINT) AS hi
  FROM num
)
SELECT measurement, domain, entity_id,
  CAST(count(*) AS BIGINT) AS n_points,
  CASE WHEN count(*) > 1 THEN
    sqrt(CAST(count(*) * CAST(sum(m * m) AS BIGINT)
              - CAST(sum(m) AS BIGINT) * CAST(sum(m) AS BIGINT)
              AS DOUBLE)
         / CAST(count(*) * (count(*) - 1) AS DOUBLE)) / 1e3
  END AS stddev_val,
  (max(CASE WHEN rn = lo THEN value END)
   + max(CASE WHEN rn = hi THEN value END)) / 2.0 AS median_val
FROM ranked
GROUP BY measurement, domain, entity_id
""",
    "influx_fill_linear": f"""{_ORACLE_NUM},
buckets AS (
  SELECT measurement, domain, entity_id,
    CAST(floor(ts_epoch / 3600) AS BIGINT) AS hour_idx,
    (CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) / 1e6)
      / count(*) AS mean_val,
    count(*) AS n_points
  FROM num
  GROUP BY measurement, domain, entity_id,
           CAST(floor(ts_epoch / 3600) AS BIGINT)
),
lagged AS (
  SELECT *,
    lag(hour_idx) OVER w AS prev,
    lag(mean_val) OVER w AS prev_val
  FROM buckets
  WINDOW w AS (PARTITION BY measurement, domain, entity_id
               ORDER BY hour_idx)
),
expanded AS (
  SELECT measurement, domain, entity_id, hour_idx, mean_val, n_points,
    prev, prev_val,
    unnest(generate_series(coalesce(prev + 1, hour_idx), hour_idx))
      AS grid_idx
  FROM lagged
)
SELECT measurement, domain, entity_id,
  grid_idx * 3600 AS bucket_epoch,
  CASE WHEN grid_idx = hour_idx THEN mean_val
       ELSE prev_val + (mean_val - prev_val)
            * CAST(grid_idx - prev AS DOUBLE)
            / CAST(hour_idx - prev AS DOUBLE) END AS mean_lin,
  CAST(CASE WHEN grid_idx = hour_idx THEN n_points ELSE 0 END AS BIGINT)
    AS n_points,
  grid_idx <> hour_idx AS gap_filled
FROM expanded
""",
    "influx_downsample": f"""{_ORACLE_NUM},
buckets AS (
  SELECT measurement, domain, entity_id,
    CAST(floor(ts_epoch / 3600) AS BIGINT) AS hour_idx,
    (CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) / 1e6)
      / count(*) AS mean_val,
    count(*) AS n_points
  FROM num
  GROUP BY measurement, domain, entity_id,
           CAST(floor(ts_epoch / 3600) AS BIGINT)
),
lagged AS (
  SELECT *, lag(hour_idx) OVER (
    PARTITION BY measurement, domain, entity_id ORDER BY hour_idx) AS prev
  FROM buckets
),
expanded AS (
  SELECT measurement, domain, entity_id, hour_idx, mean_val, n_points,
    unnest(generate_series(coalesce(prev + 1, hour_idx), hour_idx))
      AS grid_idx
  FROM lagged
)
SELECT measurement, domain, entity_id,
  grid_idx * 3600 AS bucket_epoch,
  last_value(CASE WHEN grid_idx = hour_idx THEN mean_val END
             IGNORE NULLS) OVER (
    PARTITION BY measurement, domain, entity_id ORDER BY grid_idx
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mean_locf,
  CAST(CASE WHEN grid_idx = hour_idx THEN n_points ELSE 0 END AS BIGINT)
    AS n_points,
  grid_idx <> hour_idx AS gap_filled
FROM expanded
""",
    "influx_mode": f"""{_ORACLE_NUM},
freq AS (
  SELECT measurement, domain, entity_id, value,
         CAST(count(*) AS BIGINT) AS freq
  FROM num GROUP BY measurement, domain, entity_id, value
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY measurement, domain, entity_id
                               ORDER BY freq DESC, value ASC) AS rn
  FROM freq
)
SELECT measurement, domain, entity_id,
  value AS mode_val, freq AS mode_freq
FROM ranked WHERE rn = 1
""",
    "influx_top3": f"""{_ORACLE_NUM},
ranked AS (
  SELECT state_id, measurement, domain, entity_id, ts_epoch, value,
    row_number() OVER (PARTITION BY measurement, domain, entity_id
                       ORDER BY value DESC, ts_epoch ASC, state_id ASC)
      AS rank
  FROM num
)
SELECT state_id, measurement, domain, entity_id, ts_epoch, value, rank
FROM ranked WHERE rank <= 3
""",
    "influx_bottom3": f"""{_ORACLE_NUM},
ranked AS (
  SELECT state_id, measurement, domain, entity_id, ts_epoch, value,
    row_number() OVER (PARTITION BY measurement, domain, entity_id
                       ORDER BY value ASC, ts_epoch ASC, state_id ASC)
      AS rank
  FROM num
)
SELECT state_id, measurement, domain, entity_id, ts_epoch, value, rank
FROM ranked WHERE rank <= 3
""",
    "influx_distinct": f"""{_ORACLE_NUM},
dv AS (
  SELECT measurement, domain, entity_id, value,
         count(*)::BIGINT AS n FROM num
  GROUP BY measurement, domain, entity_id, value
)
SELECT measurement, domain, entity_id,
  count(*)::BIGINT AS n_distinct,
  CAST(sum(n) AS BIGINT) AS n_points,
  min(value) AS min_val, max(value) AS max_val
FROM dv GROUP BY measurement, domain, entity_id
""",
    "influx_sample": f"""{_ORACLE_NUM},
ranked AS (
  SELECT state_id, measurement, domain, entity_id, ts_epoch, value,
    row_number() OVER (PARTITION BY measurement, domain, entity_id
                       ORDER BY md5(CAST(state_id AS VARCHAR)), state_id)
      AS rk
  FROM num
)
SELECT state_id, measurement, domain, entity_id, ts_epoch, value
FROM ranked WHERE rk <= 5
""",
    "influx_series_stats": f"""{_ORACLE_NUM},
m AS (
  SELECT *,
    row_number() OVER (PARTITION BY measurement, domain, entity_id
                       ORDER BY ts_epoch, state_id) AS rn_a,
    row_number() OVER (PARTITION BY measurement, domain, entity_id
                       ORDER BY ts_epoch DESC, state_id DESC) AS rn_d,
    ts_epoch - lag(ts_epoch) OVER (
      PARTITION BY measurement, domain, entity_id
      ORDER BY ts_epoch, state_id) AS gap
  FROM num
)
SELECT measurement, domain, entity_id,
  count(*) AS n_points,
  max(value) - min(value) AS spread,
  max(CASE WHEN rn_a = 1 THEN value END) AS first_val,
  max(CASE WHEN rn_d = 1 THEN value END) AS last_val,
  max(ts_epoch) - min(ts_epoch) AS elapsed_s,
  max(gap) AS max_gap_s
FROM m GROUP BY measurement, domain, entity_id
""",
}

ORACLES["influx_rollup_cascade"] = f"""{_ORACLE_NUM}
SELECT measurement, domain, entity_id,
  CAST(floor(ts_epoch / 86400) AS BIGINT) * 86400 AS time,
  (CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) / 1e6)
    / count(*) AS mean,
  CAST(count(*) AS BIGINT) AS n_points
FROM num GROUP BY 1, 2, 3, 4
"""

ORACLES["ha_energy_daily"] = f"""{_ORACLE_NUM},
terms AS (
  SELECT measurement, domain, entity_id,
    CAST(floor(lag(ts_epoch) OVER w / 86400) AS BIGINT) * 86400 AS day,
    CAST(round((value + lag(value) OVER w)
               * (ts_epoch - lag(ts_epoch) OVER w) / 2.0 * 1e6)
         AS BIGINT) AS t
  FROM num WHERE measurement = 'W'
  WINDOW w AS (PARTITION BY measurement, domain, entity_id
               ORDER BY ts_epoch, state_id)
)
SELECT measurement, domain, entity_id, day,
  (CAST(sum(t) AS BIGINT) / 1e6) / 3600.0 AS energy_wh,
  count(*) + 1 AS n_points
FROM terms WHERE t IS NOT NULL
GROUP BY measurement, domain, entity_id, day
"""
