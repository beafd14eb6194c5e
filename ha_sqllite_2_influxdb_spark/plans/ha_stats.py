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


def _segments(pts: DataFrame, bucket_s: int) -> DataFrame:
    """LOCF step segments (lead on the one series window) with their
    first/last spanned bucket indices — the shared root of the term
    explode and the r14 boundary/interior split."""
    w = (Window.partitionBy(*_SERIES).orderBy("ts_epoch", "state_id"))
    b = float(bucket_s)
    seg = (
        pts.select(
            *_SERIES,
            F.col("ts_epoch").alias("t0"), "value",
            F.lead("ts_epoch").over(w).alias("t1"),
        )
        .filter(F.col("t1").isNotNull() & (F.col("t1") > F.col("t0")))
    )
    # a segment ending exactly ON a bucket boundary does not reach into
    # that bucket (right-open interval)
    return seg.select(
        *_SERIES, "t0", "t1", "value",
        F.floor(F.col("t0") / b).cast("long").alias("h0"),
        (F.floor(F.col("t1") / b).cast("long")
         - F.when(F.col("t1") == F.floor(F.col("t1") / b) * b, 1)
            .otherwise(0)).alias("h1"),
    )


def _overlap_micros(b: float):
    """(d_micro, vd_micro) columns for the segment/bucket overlap of the
    row's (t0, t1, h) — the one quantization expression both the agg
    path and the interior fast path must share bit-for-bit."""
    d = (F.least(F.col("t1"), (F.col("h") + 1) * F.lit(b))
         - F.greatest(F.col("t0"), F.col("h") * F.lit(b)))
    return (F.round(d * 1e6).cast("long"),
            F.round(F.col("value") * d * 1e6).cast("long"))


def _boundary_terms(seg: DataFrame, b: float) -> DataFrame:
    """Micro-quantized terms for each segment's FIRST and LAST spanned
    bucket (one row when the segment lives inside a single bucket) —
    the only terms that can share a bucket with another segment, hence
    the only ones the split compilers aggregate. Shared by
    `hourly_statistics` and `short_term_cascade` so the bit-parity-
    critical construction exists exactly once."""
    bnd = seg.select(
        *_SERIES, "t0", "t1", "value",
        F.explode(
            F.when(F.col("h1") > F.col("h0"), F.array("h0", "h1"))
             .otherwise(F.array("h0"))).alias("h"),
    )
    d_micro, vd_micro = _overlap_micros(b)
    return bnd.select(
        *_SERIES, "h", "value",
        d_micro.alias("_d_micro"), vd_micro.alias("_vd_micro"),
    )


def _interior_rows(seg: DataFrame) -> DataFrame:
    """(series, value, h) for every bucket a segment covers end-to-end
    — sole-occupant by segment disjointness, so downstream compilers
    may project their per-bucket outputs directly, no aggregation."""
    return (
        seg.filter(F.col("h1") >= F.col("h0") + 2)
        .select(
            *_SERIES, "value",
            F.explode(F.sequence(F.col("h0") + 1, F.col("h1") - 1))
             .alias("h"),
        )
    )


def _clipped_terms(pts: DataFrame, bucket_s: int) -> DataFrame:
    """Segments exploded over the ``bucket_s`` buckets they span, each
    overlap micro-quantized — the shared core of the short-term cascade
    and the daily/monthly reductions."""
    b = float(bucket_s)
    ex = _segments(pts, bucket_s).select(
        *_SERIES, "t0", "t1", "value",
        F.explode(F.sequence("h0", "h1")).alias("h"),
    )
    d_micro, vd_micro = _overlap_micros(b)
    return ex.select(
        *_SERIES, "h", "value",
        d_micro.alias("_d_micro"),
        vd_micro.alias("_vd_micro"),
    )


# One-parse SQL text of the segment relation (r14, guide §1.1/§7.3:
# driver-side planning cost — every chained DataFrame call is EAGERLY
# analyzed at ~8-10 ms fixed, so the split compilers' ~10-call builds
# cost ~0.25 s of pure analysis per invocation; the texts parse once).
# Expressions mirror _segments token for token; the helpers remain the
# bit-parity reference the pins compare against.
def _seg_sql(bucket_s: int) -> str:
    b = f"{float(bucket_s)!r}D"
    return f"""
    SELECT measurement, domain, entity_id, t0, t1, value,
           CAST(floor(t0 / {b}) AS BIGINT) AS h0,
           CAST(floor(t1 / {b}) AS BIGINT)
             - (CASE WHEN t1 = floor(t1 / {b}) * {b}
                     THEN 1 ELSE 0 END) AS h1
    FROM (
      SELECT measurement, domain, entity_id, ts_epoch AS t0, value,
             lead(ts_epoch) OVER (
               PARTITION BY measurement, domain, entity_id
               ORDER BY ts_epoch, state_id) AS t1
      FROM {{pts}}
    ) WHERE t1 IS NOT NULL AND t1 > t0
"""


def _checkpointed_segments(pts: DataFrame, bucket_s: int) -> DataFrame:
    """The segment relation, parsed once and materialized ONCE per
    invocation via a LAZY localCheckpoint.

    r15 (guide §2.4/§5; VERDICT r14 #4): the r14 split compilers
    spliced the segment subtree into BOTH union branches and asserted
    runtime sharing from the printed plan — but the EXECUTED plan shows
    two materialized ShuffleQueryStages: Spark 4.1's AQE stage cache
    does not reuse canonically-identical exchanges whose subtree scans
    a persisted relation (minimal repro in OPTIMIZATION_r15.md §4;
    sameResult between the two exchanges is TRUE, with AQE disabled the
    static ReuseExchangeAndSubquery rule fires, with AQE enabled the
    stage is rebuilt). The whole points-assembly + series shuffle +
    window therefore ran TWICE per query. The lazy checkpoint runs it
    once: both branches scan the ~20k-row materialized RDD, and the
    query's printed plan collapses to Union-over-one-scan. eager=False
    keeps the build free — materialization happens inside the query's
    own first action, so every bench/oracle invocation still computes
    from the parquet inputs (a fresh checkpoint per build; nothing
    persists across invocations). Measured within-JVM A/B min-of-5 at
    sf0.1: hourly 1.024 → 0.571 s (−44%), exceptAll empty both ways.

    The splice goes through PySpark's own drop-after-parse ``spark.sql``
    rather than sql_with_plans: a checkpoint's semanticHash is unique
    per invocation (never-dropped views would grow the catalog per
    call), and dropping its view cannot evict anything — the
    checkpoint's persistence is RDD-level, invisible to the
    CacheManager that dropTempView sweeps."""
    from ..functions.sqlsplice import sql_with_plans

    seg = sql_with_plans(pts.sparkSession, _seg_sql(bucket_s), pts=pts)
    return seg.localCheckpoint(eager=False)


_HOURLY_SPLIT_SQL = """
SELECT measurement, domain, entity_id, h * 3600 AS hour_epoch,
       dw_mean, min_val, max_val, n_segments
FROM (
  SELECT measurement, domain, entity_id, h,
         (sum(_vd_micro) / 1E6) / (sum(_d_micro) / 1E6) AS dw_mean,
         min(value) AS min_val,
         max(value) AS max_val,
         count(1) AS n_segments
  FROM (
    SELECT measurement, domain, entity_id, h, value,
           CAST(round((least(t1, (h + 1) * 3600.0D)
                       - greatest(t0, h * 3600.0D)) * 1E6) AS BIGINT)
             AS _d_micro,
           CAST(round(value * (least(t1, (h + 1) * 3600.0D)
                               - greatest(t0, h * 3600.0D)) * 1E6) AS BIGINT)
             AS _vd_micro
    FROM (
      SELECT measurement, domain, entity_id, t0, t1, value,
             explode(CASE WHEN h1 > h0 THEN array(h0, h1)
                          ELSE array(h0) END) AS h
      FROM {seg}
    )
  )
  GROUP BY measurement, domain, entity_id, h

  UNION ALL

  SELECT measurement, domain, entity_id, h,
         (CAST(round(value * 3600.0D * 1E6) AS BIGINT) / 1E6)
           / (CAST(round(3600.0D * 1E6) AS BIGINT) / 1E6) AS dw_mean,
         value AS min_val,
         value AS max_val,
         CAST(1 AS BIGINT) AS n_segments
  FROM (
    SELECT measurement, domain, entity_id, value,
           explode(sequence(h0 + 1, h1 - 1)) AS h
    FROM {seg} WHERE h1 >= h0 + 2
  )
)
"""


def hourly_statistics(pts: DataFrame) -> DataFrame:
    """The split statistics compiler: one parse of the segment text,
    one materialization of the ~20k-row segment relation (lazy
    checkpoint — see _checkpointed_segments), one parse of the split
    union over it. Value-identical to `_hourly_statistics_df` (pinned
    bit-exact by test_hourly_split_equals_direct_agg and the
    rebuilt-chain comparison in test_hourly_sql_text_plan_equals_
    dataframe_build; the DuckDB oracle is unchanged)."""
    seg = _checkpointed_segments(pts, 3600)
    return pts.sparkSession.sql(_HOURLY_SPLIT_SQL, seg=seg)


def _hourly_statistics_df(pts: DataFrame) -> DataFrame:
    """The statistics compiler over any (series, ts_epoch, value) point
    relation — factored out for the scale probe.

    r14 plan surgery (VERDICT r13 #3): the naive formulation exploded
    every segment over every spanned hour and hash-aggregated ALL the
    terms — but the stage-split profile showed ~2.06M groups for ~2.07M
    terms (gap-hours dominate HA data), so partial AND final
    HashAggregate each built a ~2M-entry map to average ~1.008 rows per
    group: two-thirds of the query's wall. The segments of one series
    are disjoint, so an INTERIOR hour (one a segment covers end-to-end)
    can never receive a term from any other segment — its output row is
    a pure projection (the segment's value, weight b, count 1) that
    needs no aggregation at all. Only BOUNDARY terms (a segment's first
    and last spanned hours, ≈ 2×segments rows) can share an hour, and
    only those flow through the groupBy. Both branches quantize through
    the identical `_overlap_micros` expression (interior overlap is
    exactly ``b``, so its least/greatest collapse to the bucket edges),
    which keeps the result bit-identical to the one-agg formulation —
    pinned by `tests/test_ha_stats.py::test_hourly_split_equals_direct_agg`
    and the unchanged DuckDB oracle. Measured at sf0.1 (interleaved
    within-JVM A/B, min-of-5): 2.27 s → 0.76 s (−67%). The cost is one
    extra scan+window for the second branch (~0.3 s here; at 100 TB the
    segment relation is the natural cache/exchange-reuse point). The
    union preserves the agg branch's partitioning guarantees; output
    row order changes, which nothing downstream observes.
    """
    b = 3600.0
    seg = _segments(pts, 3600)
    bagg = _boundary_terms(seg, b).groupBy(*_SERIES, "h").agg(
        ((F.sum("_vd_micro") / 1e6) / (F.sum("_d_micro") / 1e6))
        .alias("dw_mean"),
        F.min("value").alias("min_val"),
        F.max("value").alias("max_val"),
        F.count(F.lit(1)).alias("n_segments"),
    )
    # interior hours mirror the single-term aggregate exactly:
    # (Σvd/1e6)/(Σd/1e6) with d == b
    inner = _interior_rows(seg).select(
        *_SERIES, "h",
        ((F.round(F.col("value") * F.lit(b) * 1e6).cast("long") / 1e6)
         / (F.round(F.lit(b) * 1e6).cast("long") / 1e6))
        .alias("dw_mean"),
        F.col("value").alias("min_val"),
        F.col("value").alias("max_val"),
        F.lit(1).cast("long").alias("n_segments"),
    )
    return bagg.unionByName(inner).select(
        *_SERIES, (F.col("h") * 3600).alias("hour_epoch"),
        "dw_mean", "min_val", "max_val", "n_segments",
    )


_CASCADE_SPLIT_SQL = """
SELECT measurement, domain, entity_id,
       hh * 3600 AS hour_epoch,
       (sum(_svd) / 1E6) / (sum(_sd) / 1E6) AS dw_mean,
       min(_mn) AS min_val,
       max(_mx) AS max_val,
       CAST(sum(_n) AS BIGINT) AS n_terms
FROM (
  SELECT measurement, domain, entity_id,
         CAST(floor(h / 12) AS BIGINT) AS hh, _svd, _sd, _mn, _mx, _n
  FROM (
    SELECT measurement, domain, entity_id, h,
           sum(_vd_micro) AS _svd,
           sum(_d_micro) AS _sd,
           min(value) AS _mn,
           max(value) AS _mx,
           count(1) AS _n
    FROM (
      SELECT measurement, domain, entity_id, h, value,
             CAST(round((least(t1, (h + 1) * 300.0D)
                         - greatest(t0, h * 300.0D)) * 1E6) AS BIGINT)
               AS _d_micro,
             CAST(round(value * (least(t1, (h + 1) * 300.0D)
                                 - greatest(t0, h * 300.0D)) * 1E6)
                  AS BIGINT) AS _vd_micro
      FROM (
        SELECT measurement, domain, entity_id, t0, t1, value,
               explode(CASE WHEN h1 > h0 THEN array(h0, h1)
                            ELSE array(h0) END) AS h
        FROM {seg}
      )
    )
    GROUP BY measurement, domain, entity_id, h

    UNION ALL

    SELECT measurement, domain, entity_id, h,
           CAST(round(value * 300.0D * 1E6) AS BIGINT) AS _svd,
           CAST(round(300.0D * 1E6) AS BIGINT) AS _sd,
           value AS _mn,
           value AS _mx,
           CAST(1 AS BIGINT) AS _n
    FROM (
      SELECT measurement, domain, entity_id, value,
             explode(sequence(h0 + 1, h1 - 1)) AS h
      FROM {seg} WHERE h1 >= h0 + 2
    )
  )
)
GROUP BY measurement, domain, entity_id, hh
"""


def short_term_cascade(pts: DataFrame) -> DataFrame:
    """HA's two-tier statistics pipeline as one segment parse + one
    split-union parse over the checkpointed segment relation (see
    `_checkpointed_segments`; the text form also closes VERDICT r14 #7
    — the cascade's chained build paid the same ~0.25 s of per-call
    eager analysis the hourly's did before r14's text). Value-identical
    to `_short_term_cascade_df` below — pinned by
    `test_cascade_split_equals_direct_agg`, the value comparison in
    `test_cascade_text_values_equal_dataframe_build`, and the unchanged
    oracle."""
    seg = _checkpointed_segments(pts, 300)
    return pts.sparkSession.sql(_CASCADE_SPLIT_SQL, seg=seg)


def _short_term_cascade_df(pts: DataFrame) -> DataFrame:
    """Chained-DataFrame reference for the cascade: the 5-minute
    ``statistics_short_term`` rows first, then the hourly reduction —
    exactly how the recorder compiles hourly rows out of short-term
    ones. The 5-minute tier keeps its state as the MERGEABLE integer
    monoid (Σv·d, Σd, min, max, n) rather than a finished mean, so the
    hourly reduction is pure BIGINT addition — associative at any
    partitioning, and bit-identical to compiling the hour directly from
    the same 5-minute-clipped terms (the oracle proves exactly that).
    Two (series, bucket)-keyed exchanges by design — one per tier, the
    rollup-cascade budget.

    r14: the 5-minute tier gets the same boundary/interior split as
    `hourly_statistics` (the stage-split finding generalizes — at
    bucket 300 the term:group ratio is again ~1.008, so the first-tier
    hash aggregation built two ~12×-larger maps to average one row per
    group). Interior buckets are sole-occupant by segment
    disjointness, so their MONOID rows (Σvd, Σd, min, max, n) project
    directly — one term, weight exactly ``b`` — and only boundary
    terms flow through the first groupBy. The hourly reduction is
    untouched: its 12:1 reduction is real work the split must not
    relocate. Bit-identical by the shared `_overlap_micros` arithmetic
    (interior d == b exactly); pinned by
    `tests/test_ha_stats.py::test_cascade_split_equals_direct_agg`
    and the unchanged oracle."""
    b = 300.0
    seg = _segments(pts, 300)
    bshort = _boundary_terms(seg, b).groupBy(*_SERIES, "h").agg(
        F.sum("_vd_micro").alias("_svd"),
        F.sum("_d_micro").alias("_sd"),
        F.min("value").alias("_mn"),
        F.max("value").alias("_mx"),
        F.count(F.lit(1)).alias("_n"),
    )
    ishort = _interior_rows(seg).select(
        *_SERIES, "h",
        F.round(F.col("value") * F.lit(b) * 1e6).cast("long")
         .alias("_svd"),
        F.round(F.lit(b) * 1e6).cast("long").alias("_sd"),
        F.col("value").alias("_mn"),
        F.col("value").alias("_mx"),
        F.lit(1).cast("long").alias("_n"),
    )
    short = bshort.unionByName(ishort)
    hour = (F.floor(F.col("h") / 12)).cast("long")
    return short.groupBy(*_SERIES, hour.alias("hh")).agg(
        ((F.sum("_svd") / 1e6) / (F.sum("_sd") / 1e6)).alias("dw_mean"),
        F.min("_mn").alias("min_val"),
        F.max("_mx").alias("max_val"),
        F.sum("_n").alias("n_terms"),
    ).select(
        *_SERIES, (F.col("hh") * 3600).alias("hour_epoch"),
        "dw_mean", "min_val", "max_val",
        F.col("n_terms").cast("long").alias("n_terms"),
    )


def q_ha_statistics_hourly(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """HA recorder `statistics`: hourly duration-weighted mean + min/max
    per sensor (see module docstring; reference migrates raw states
    only — `sqllite2influxdb.py:83-90` — so this is the recorder-side
    capability re-expressed over the migrated points)."""
    return hourly_statistics(_numeric_points(spark, sf_dir))


def q_stream_ha_statistics(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """INCREMENTAL statistics compilation over an ordered ingest stream
    — exactly how the HA recorder maintains `statistics` (it compiles
    incrementally as states arrive, never re-scanning history).

    The point relation is written as three time-range parquet files and
    re-read as a file stream (maxFilesPerTrigger=1 → three real
    micro-batches arriving in time order — the recorder's arrival
    order). Per batch: each series' CARRY point (its last state, the
    one still-open segment) unions with the new points, the shared
    `_clipped_terms` core forms exactly the segments this batch closes,
    and their (series, hour) monoid states (Σv·d, Σd, min, max, n —
    all BIGINT/exact) merge into the store: one shuffle sized by
    |touched hours|, state as distributed DataFrames
    (localCheckpoint-bounded), nothing driver-side. Because the monoid
    is associative and each consecutive pair is closed exactly once
    (the carry is the left endpoint of only its successor segment), the
    final store is BIT-IDENTICAL to the batch compiler — the oracle is
    literally `ha_statistics_hourly`'s."""
    import tempfile
    from functools import partial

    from ..streaming.stream import drain_foreach_batch, staged_fixture_dir

    pts = _numeric_points(spark, sf_dir)
    app = spark.sparkContext.applicationId
    tag = sf_dir.strip("/").replace("/", "_")
    # time-ordered arrival is a CORRECTNESS precondition of the carry
    # fold below; staged_fixture_dir makes it explicit — each cut's file
    # gets a strictly increasing mtime (Spark's file source orders by
    # mtime), and the fixture dir appears atomically or not at all
    # (ADVICE r7: the old isdir guard trusted partial/foreign dirs and
    # the ordering rode three implicit write walls)
    cuts = [(0.0, 1704931200.0), (1704931200.0, 1705795200.0),
            (1705795200.0, float("inf"))]

    def _write(lo: float, hi: float, path: str) -> None:
        (pts.filter((F.col("ts_epoch") >= lo) & (F.col("ts_epoch") < hi))
         .coalesce(1).write.mode("overwrite").parquet(path))

    sdir = staged_fixture_dir(
        f"/tmp/spark_graft_stats_stream/{app}/{tag}",
        [partial(_write, lo, hi) for lo, hi in cuts])
    stream = (spark.readStream.schema(pts.schema)
              .option("maxFilesPerTrigger", 1).parquet(sdir))
    state: dict[str, DataFrame] = {}

    def fold(batch: DataFrame, _epoch: int) -> None:
        allp = (batch.unionByName(state["carry"])
                if "carry" in state else batch)
        terms = _clipped_terms(allp, 3600)
        inc = terms.groupBy(*_SERIES, "h").agg(
            F.sum("_vd_micro").alias("_svd"),
            F.sum("_d_micro").alias("_sd"),
            F.min("value").alias("_mn"),
            F.max("value").alias("_mx"),
            F.count(F.lit(1)).alias("_n"),
        )
        if "store" in state:
            inc = (state["store"].unionByName(inc)
                   .groupBy(*_SERIES, "h").agg(
                       F.sum("_svd").alias("_svd"),
                       F.sum("_sd").alias("_sd"),
                       F.min("_mn").alias("_mn"),
                       F.max("_mx").alias("_mx"),
                       F.sum("_n").alias("_n")))
        state["store"] = inc.localCheckpoint(eager=True)
        wlast = Window.partitionBy(*_SERIES).orderBy(
            F.desc("ts_epoch"), F.desc("state_id"))
        state["carry"] = (
            allp.withColumn("_rn", F.row_number().over(wlast))
            .filter(F.col("_rn") == 1).drop("_rn")
            .localCheckpoint(eager=True))

    ckpt = tempfile.mkdtemp(prefix="stream_ha_stats_ckpt_")
    drain_foreach_batch(stream, ckpt, fold)
    store = state["store"]
    return store.select(
        *_SERIES, (F.col("h") * 3600).alias("hour_epoch"),
        ((F.col("_svd") / 1e6) / (F.col("_sd") / 1e6)).alias("dw_mean"),
        F.col("_mn").alias("min_val"),
        F.col("_mx").alias("max_val"),
        F.col("_n").cast("long").alias("n_segments"),
    )


def q_ha_statistics_daily(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """HA's ``statistics_during_period(period="day")`` read path — the
    call behind every frontend history graph at day granularity. The
    DAY rows reduce the same hour-clipped terms by ``floor(h/24)``:
    clipping finer than the target period keeps the duration-weighted
    mean exact (the monoid property the cascade entry proves), so no
    re-clipping pass is needed — one agg on the terms relation."""
    terms = _clipped_terms(_numeric_points(spark, sf_dir), 3600)
    day = F.floor(F.col("h") / 24).cast("long")
    return terms.groupBy(*_SERIES, day.alias("d")).agg(
        ((F.sum("_vd_micro") / 1e6) / (F.sum("_d_micro") / 1e6))
        .alias("dw_mean"),
        F.min("value").alias("min_val"),
        F.max("value").alias("max_val"),
        F.count(F.lit(1)).alias("n_segments"),
    ).select(
        *_SERIES, (F.col("d") * 86400).alias("day_epoch"),
        "dw_mean", "min_val", "max_val", "n_segments",
    )


def q_ha_statistics_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HA's COUNTER statistic — the `sum` column the recorder compiles
    for total/total_increasing sensors (energy meters): per hour, the
    END-OF-HOUR cumulative increase since the series began, with HA's
    counter-reset rule (a decrease restarts the counter: the new value
    itself is the increment — the same rule Flux increase() documents).
    Applied to the W series as the counter-semantics exercise (the
    fixture has no true monotone meter; the RULE is the deliverable and
    the oracle pins it value-exactly). Micro-quantized BIGINT running
    sum on ONE series window; the per-hour pick is a rank on the same
    shuffle. Hours without points emit nothing (HA carries the last sum
    forward on read)."""
    pts = _numeric_points(spark, sf_dir).filter(
        F.col("measurement") == "W")
    w = Window.partitionBy(*_SERIES).orderBy("ts_epoch", "state_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    micro = F.round(F.col("value") * 1e6).cast("long")
    prev = F.lag(micro).over(w)
    inc = F.when(prev.isNull(), F.lit(0)).otherwise(
        F.when(micro - prev >= 0, micro - prev).otherwise(micro))
    hour = F.floor(F.col("ts_epoch") / 3600).cast("long")
    marked = pts.select(
        *_SERIES, "ts_epoch", "state_id",
        F.sum(inc).over(wrun).alias("_run"),
        hour.alias("_h"),
    ).withColumn(
        "_rn", F.row_number().over(
            Window.partitionBy(*_SERIES, "_h")
            .orderBy(F.desc("ts_epoch"), F.desc("state_id"))))
    return (marked.filter(F.col("_rn") == 1)
            .select(*_SERIES, (F.col("_h") * 3600).alias("hour_epoch"),
                    (F.col("_run") / 1e6).alias("sum_val")))


def q_ha_statistics_cascade(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """statistics_short_term (5 min) → hourly reduction on the integer
    monoid (see short_term_cascade). The oracle compiles the hour
    DIRECTLY from the same 5-minute-clipped terms — a hash match IS the
    proof that the two-tier reduction loses nothing."""
    return short_term_cascade(_numeric_points(spark, sf_dir))


def q_ha_utility_meter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HA's ``utility_meter`` integration, daily cycle — the energy
    dashboard's per-day consumption view. Each meter update contributes
    ``value - prev`` to the UTC day the update ARRIVES in (that is
    exactly when utility_meter applies the delta), with the recorder's
    counter-reset rule: a decrease restarts the source and the new value
    itself is the day's increment. The first update of a series opens
    the meter and contributes 0. Deltas are micro-quantized BIGINTs, so
    the per-day sum is associative at any partitioning; the plan is the
    `ha_statistics_sum` series window followed by ONE (series, day)
    aggregation with map-side partials — no second wide exchange.
    Applied to the W series (the counter-semantics fixture; the CYCLE
    rule is the deliverable and the oracle pins it value-exactly)."""
    pts = _numeric_points(spark, sf_dir).filter(
        F.col("measurement") == "W")
    w = Window.partitionBy(*_SERIES).orderBy("ts_epoch", "state_id")
    micro = F.round(F.col("value") * 1e6).cast("long")
    prev = F.lag(micro).over(w)
    inc = F.when(prev.isNull(), F.lit(0)).otherwise(
        F.when(micro - prev >= 0, micro - prev).otherwise(micro))
    day = F.floor(F.col("ts_epoch") / 86400).cast("long")
    return (
        pts.select(*_SERIES, day.alias("_d"), inc.alias("_inc"))
        .groupBy(*_SERIES, "_d")
        .agg((F.sum("_inc") / 1e6).alias("consumption"),
             F.count(F.lit(1)).cast("long").alias("n_updates"))
        .select(*_SERIES, (F.col("_d") * 86400).alias("day_epoch"),
                "consumption", "n_updates")
    )


def q_ha_history_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HA's ``history_stats`` sensor (types time + ratio + count) for
    the 'on' state, per entity and UTC day — the "how long was the
    light on today" integration, over the FULL state timeline including
    non-numeric states (everything before this entry compiled numeric
    series only).

    Documented subset, matching the statistics compiler's segment
    model: each state opens a LOCF segment [t_i, t_{i+1}); the final
    unclosed segment and zero-duration flashes carry no time and are
    dropped; segments clip at day boundaries. ``seconds_on`` sums the
    clipped 'on' overlap, ``ratio_on`` divides by ALL tracked seconds
    of that day, and ``n_turn_on`` counts off→on transitions, attributed
    to the day the 'on' segment OPENS (time-carrying segments only —
    the same flash exclusion). Everything rides ONE (domain, entity_id)
    exchange: the lead/lag window, the day explode, and the (entity,
    day) agg whose keys are a superset of the partitioning."""
    from ..operators.transform import points

    pts = points(*_ha_tables(spark, sf_dir), keep_state=True).select(
        "domain", "entity_id", "ts_epoch", "state_id", "state_raw")
    w = Window.partitionBy("domain", "entity_id").orderBy(
        "ts_epoch", "state_id")
    seg = (
        pts.select(
            "domain", "entity_id",
            F.col("ts_epoch").alias("t0"), "state_raw",
            F.lead("ts_epoch").over(w).alias("t1"),
            F.lag("state_raw").over(w).alias("_prev"),
        )
        .filter(F.col("t1").isNotNull() & (F.col("t1") > F.col("t0")))
    )
    day0 = F.floor(F.col("t0") / 86400.0).cast("long")
    d_last = (
        F.floor(F.col("t1") / 86400.0).cast("long")
        - F.when(F.col("t1") == F.floor(F.col("t1") / 86400.0) * 86400.0, 1)
           .otherwise(0)
    )
    ex = seg.select(
        "domain", "entity_id", "t0", "t1", "state_raw", "_prev",
        F.explode(F.sequence(day0, d_last)).alias("d"),
    )
    dur = (F.least(F.col("t1"), (F.col("d") + 1) * F.lit(86400.0))
           - F.greatest(F.col("t0"), F.col("d") * F.lit(86400.0)))
    is_on = F.col("state_raw") == "on"
    turn_on = (is_on
               & (F.col("_prev").isNull() | (F.col("_prev") != "on"))
               & (F.col("d") == F.floor(F.col("t0") / 86400.0).cast("long")))
    terms = ex.select(
        "domain", "entity_id", "d",
        F.round(dur * 1e6).cast("long").alias("_t_micro"),
        F.when(is_on, F.round(dur * 1e6).cast("long"))
         .otherwise(F.lit(0)).alias("_on_micro"),
        F.when(turn_on, 1).otherwise(0).alias("_turn"),
    )
    return terms.groupBy("domain", "entity_id", "d").agg(
        (F.sum("_on_micro") / 1e6).alias("seconds_on"),
        ((F.sum("_on_micro") / 1e6) / (F.sum("_t_micro") / 1e6))
        .alias("ratio_on"),
        F.sum("_turn").cast("long").alias("n_turn_on"),
    ).select(
        "domain", "entity_id", (F.col("d") * 86400).alias("day_epoch"),
        "seconds_on", "ratio_on", "n_turn_on",
    )


def q_ha_energy_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HA energy dashboard COST view: each meter increment priced at a
    time-of-use tariff (peak 08:00-20:00 UTC = 30 ct, off-peak 12 ct —
    a static two-band tariff as the deliverable RULE; a price-entity
    join swaps in real tariffs with the identical plan). Increments use
    the utility-meter counter-reset rule and are priced at the hour the
    update ARRIVES (exactly when HA's cost sensor applies its current
    price). cost_micro_ct accumulates as BIGINT micro-cents =
    inc_micro × integer ct — overflow-safe (Σ|inc| ≤ 1e12 micro × 30)
    and associative; ONE series window + one (series, day) agg."""
    pts = _numeric_points(spark, sf_dir).filter(
        F.col("measurement") == "W")
    w = Window.partitionBy(*_SERIES).orderBy("ts_epoch", "state_id")
    micro = F.round(F.col("value") * 1e6).cast("long")
    prev = F.lag(micro).over(w)
    inc = F.when(prev.isNull(), F.lit(0)).otherwise(
        F.when(micro - prev >= 0, micro - prev).otherwise(micro))
    hour_of_day = F.floor(F.col("ts_epoch") / 3600).cast("long") % 24
    ct = F.when((hour_of_day >= 8) & (hour_of_day < 20), 30).otherwise(12)
    day = F.floor(F.col("ts_epoch") / 86400).cast("long")
    return (
        pts.select(*_SERIES, day.alias("_d"),
                   inc.alias("_inc"), (inc * ct).alias("_cost"))
        .groupBy(*_SERIES, "_d")
        .agg((F.sum("_inc") / 1e6).alias("consumption"),
             (F.sum("_cost") / 1e6 / 100.0).alias("cost_eur"))
        .select(*_SERIES, (F.col("_d") * 86400).alias("day_epoch"),
                "consumption", "cost_eur")
    )


def _ha_tables(spark: SparkSession, sf_dir: str):
    from ..sources.ha_fixture import derive_ha_tables

    t = derive_ha_tables(spark, sf_dir)
    return (t["ha_states"], t["ha_states_meta"],
            t["ha_state_attributes"])


QUERIES = {"ha_statistics_hourly": q_ha_statistics_hourly,
           "ha_statistics_cascade": q_ha_statistics_cascade,
           "stream_ha_statistics": q_stream_ha_statistics,
           "ha_statistics_sum": q_ha_statistics_sum,
           "ha_statistics_daily": q_ha_statistics_daily,
           "ha_utility_meter": q_ha_utility_meter,
           "ha_history_stats": q_ha_history_stats,
           "ha_energy_cost": q_ha_energy_cost}

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
    # direct hourly compile from the 5-MINUTE-clipped terms: equality
    # with the Spark two-tier reduction proves the monoid cascade exact
    "ha_statistics_cascade": f"""{_ORACLE_NUM},
seg AS (
  SELECT measurement, domain, entity_id, ts_epoch AS t0, value,
    lead(ts_epoch) OVER (PARTITION BY measurement, domain, entity_id
                         ORDER BY ts_epoch, state_id) AS t1
  FROM num
),
ex AS (
  SELECT measurement, domain, entity_id, t0, t1, value,
    unnest(generate_series(
      CAST(floor(t0 / 300) AS BIGINT),
      CAST(floor(t1 / 300) AS BIGINT)
        - CASE WHEN t1 = floor(t1 / 300) * 300 THEN 1 ELSE 0 END
    )) AS h
  FROM seg WHERE t1 IS NOT NULL AND t1 > t0
),
terms AS (
  SELECT measurement, domain, entity_id, h, value,
    CAST(round((least(t1, (h + 1) * 300.0)
                - greatest(t0, h * 300.0)) * 1e6) AS BIGINT)
      AS d_micro,
    CAST(round(value * (least(t1, (h + 1) * 300.0)
                        - greatest(t0, h * 300.0)) * 1e6) AS BIGINT)
      AS vd_micro
  FROM ex
)
SELECT measurement, domain, entity_id,
  CAST(floor(h / 12) AS BIGINT) * 3600 AS hour_epoch,
  (CAST(sum(vd_micro) AS BIGINT) / 1e6)
    / (CAST(sum(d_micro) AS BIGINT) / 1e6) AS dw_mean,
  min(value) AS min_val, max(value) AS max_val,
  count(*)::BIGINT AS n_terms
FROM terms
GROUP BY measurement, domain, entity_id, CAST(floor(h / 12) AS BIGINT)
""",
}

# the incremental fold is bit-identical to the batch compiler by monoid
# associativity — same oracle, literally
ORACLES["stream_ha_statistics"] = ORACLES["ha_statistics_hourly"]

ORACLES["ha_statistics_sum"] = f"""{_ORACLE_NUM},
m AS (
  SELECT measurement, domain, entity_id, ts_epoch, state_id,
    CAST(round(value * 1e6) AS BIGINT) AS micro
  FROM num WHERE measurement = 'W'
),
steps AS (
  SELECT measurement, domain, entity_id, ts_epoch, state_id,
    CASE
      WHEN lag(micro) OVER w IS NULL THEN 0
      WHEN micro - lag(micro) OVER w >= 0 THEN micro - lag(micro) OVER w
      ELSE micro END AS step
  FROM m WINDOW w AS (PARTITION BY measurement, domain, entity_id
                      ORDER BY ts_epoch, state_id)
),
run AS (
  SELECT *, CAST(sum(step) OVER (
      PARTITION BY measurement, domain, entity_id
      ORDER BY ts_epoch, state_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS r,
    CAST(floor(ts_epoch / 3600) AS BIGINT) AS h,
    row_number() OVER (PARTITION BY measurement, domain, entity_id,
                       CAST(floor(ts_epoch / 3600) AS BIGINT)
                       ORDER BY ts_epoch DESC, state_id DESC) AS rn
  FROM steps
)
SELECT measurement, domain, entity_id, h * 3600 AS hour_epoch,
  r / 1e6 AS sum_val
FROM run WHERE rn = 1
"""

ORACLES["ha_statistics_daily"] = f"""{_ORACLE_NUM},
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
  SELECT measurement, domain, entity_id, CAST(floor(h / 24) AS BIGINT) AS d,
    value,
    CAST(round((least(t1, (h + 1) * 3600.0)
                - greatest(t0, h * 3600.0)) * 1e6) AS BIGINT)
      AS d_micro,
    CAST(round(value * (least(t1, (h + 1) * 3600.0)
                        - greatest(t0, h * 3600.0)) * 1e6) AS BIGINT)
      AS vd_micro
  FROM ex
)
SELECT measurement, domain, entity_id, d * 86400 AS day_epoch,
  (CAST(sum(vd_micro) AS BIGINT) / 1e6)
    / (CAST(sum(d_micro) AS BIGINT) / 1e6) AS dw_mean,
  min(value) AS min_val, max(value) AS max_val,
  count(*)::BIGINT AS n_segments
FROM terms GROUP BY measurement, domain, entity_id, d
"""

ORACLES["ha_utility_meter"] = f"""{_ORACLE_NUM},
m AS (
  SELECT measurement, domain, entity_id, ts_epoch, state_id,
    CAST(round(value * 1e6) AS BIGINT) AS micro
  FROM num WHERE measurement = 'W'
),
steps AS (
  SELECT measurement, domain, entity_id,
    CAST(floor(ts_epoch / 86400) AS BIGINT) AS d,
    CASE
      WHEN lag(micro) OVER w IS NULL THEN 0
      WHEN micro - lag(micro) OVER w >= 0 THEN micro - lag(micro) OVER w
      ELSE micro END AS step
  FROM m WINDOW w AS (PARTITION BY measurement, domain, entity_id
                      ORDER BY ts_epoch, state_id)
)
SELECT measurement, domain, entity_id, d * 86400 AS day_epoch,
  CAST(sum(step) AS BIGINT) / 1e6 AS consumption,
  count(*)::BIGINT AS n_updates
FROM steps GROUP BY measurement, domain, entity_id, d
"""

from .ha_pipeline import _CTE as _HA_CTE  # noqa: E402
from .ha_pipeline import _JOINED as _HA_JOINED  # noqa: E402
from .ha_pipeline import _POINTS as _HA_POINTS  # noqa: E402

# the FULL point relation (numeric AND string states, state_raw kept) —
# history_stats tracks string states the numeric compilers never see
_CTE_FULL = f"{_HA_CTE},\n{_HA_JOINED},\n{_HA_POINTS}"

ORACLES["ha_history_stats"] = f"""{_CTE_FULL},
seg AS (
  SELECT domain, entity_id, ts_epoch AS t0, state_raw,
    lead(ts_epoch) OVER w AS t1,
    lag(state_raw) OVER w AS prev
  FROM pts
  WINDOW w AS (PARTITION BY domain, entity_id
               ORDER BY ts_epoch, state_id)
),
ex AS (
  SELECT domain, entity_id, t0, t1, state_raw, prev,
    unnest(generate_series(
      CAST(floor(t0 / 86400.0) AS BIGINT),
      CAST(floor(t1 / 86400.0) AS BIGINT)
        - CASE WHEN t1 = floor(t1 / 86400.0) * 86400.0 THEN 1 ELSE 0 END
    )) AS d
  FROM seg WHERE t1 IS NOT NULL AND t1 > t0
),
terms AS (
  SELECT domain, entity_id, d,
    CAST(round((least(t1, (d + 1) * 86400.0)
                - greatest(t0, d * 86400.0)) * 1e6) AS BIGINT) AS t_micro,
    CASE WHEN state_raw = 'on'
         THEN CAST(round((least(t1, (d + 1) * 86400.0)
                          - greatest(t0, d * 86400.0)) * 1e6) AS BIGINT)
         ELSE 0 END AS on_micro,
    CASE WHEN state_raw = 'on'
          AND (prev IS NULL OR prev <> 'on')
          AND d = CAST(floor(t0 / 86400.0) AS BIGINT)
         THEN 1 ELSE 0 END AS turn
  FROM ex
)
SELECT domain, entity_id, d * 86400 AS day_epoch,
  CAST(sum(on_micro) AS BIGINT) / 1e6 AS seconds_on,
  (CAST(sum(on_micro) AS BIGINT) / 1e6)
    / (CAST(sum(t_micro) AS BIGINT) / 1e6) AS ratio_on,
  CAST(sum(turn) AS BIGINT) AS n_turn_on
FROM terms GROUP BY domain, entity_id, d
"""

ORACLES["ha_energy_cost"] = f"""{_ORACLE_NUM},
m AS (
  SELECT measurement, domain, entity_id, ts_epoch, state_id,
    CAST(round(value * 1e6) AS BIGINT) AS micro
  FROM num WHERE measurement = 'W'
),
steps AS (
  SELECT measurement, domain, entity_id,
    CAST(floor(ts_epoch / 86400) AS BIGINT) AS d,
    CASE
      WHEN lag(micro) OVER w IS NULL THEN 0
      WHEN micro - lag(micro) OVER w >= 0 THEN micro - lag(micro) OVER w
      ELSE micro END AS step,
    CASE WHEN (CAST(floor(ts_epoch / 3600) AS BIGINT) % 24) >= 8
          AND (CAST(floor(ts_epoch / 3600) AS BIGINT) % 24) < 20
         THEN 30 ELSE 12 END AS ct
  FROM m WINDOW w AS (PARTITION BY measurement, domain, entity_id
                      ORDER BY ts_epoch, state_id)
)
SELECT measurement, domain, entity_id, d * 86400 AS day_epoch,
  CAST(sum(step) AS BIGINT) / 1e6 AS consumption,
  CAST(sum(step * ct) AS BIGINT) / 1e6 / 100.0 AS cost_eur
FROM steps GROUP BY measurement, domain, entity_id, d
"""


def q_ha_statistics_monthly(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """HA's ``statistics_during_period(period="month")`` — the energy
    dashboard's long-term view. Unlike day/hour, months are VARIABLE
    length, so the reduce key is a real calendar truncation
    (date_trunc under the UTC session tz), not integer bucket math;
    clipping at the finer hour grain keeps the duration-weighted mean
    exact under any coarser reduce (the cascade-proof property). One
    series exchange, as the whole family."""
    terms = _clipped_terms(_numeric_points(spark, sf_dir), 3600)
    month = F.unix_timestamp(
        F.date_trunc("month", F.timestamp_seconds(F.col("h") * 3600)))
    return terms.groupBy(*_SERIES, month.alias("month_epoch")).agg(
        ((F.sum("_vd_micro") / 1e6) / (F.sum("_d_micro") / 1e6))
        .alias("dw_mean"),
        F.min("value").alias("min_val"),
        F.max("value").alias("max_val"),
        F.count(F.lit(1)).alias("n_segments"),
    )


QUERIES["ha_statistics_monthly"] = q_ha_statistics_monthly

ORACLES["ha_statistics_monthly"] = f"""{_ORACLE_NUM},
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
  SELECT measurement, domain, entity_id,
    CAST(epoch(date_trunc('month', to_timestamp(h * 3600))) AS BIGINT)
      AS month_epoch,
    value,
    CAST(round((least(t1, (h + 1) * 3600.0)
                - greatest(t0, h * 3600.0)) * 1e6) AS BIGINT)
      AS d_micro,
    CAST(round(value * (least(t1, (h + 1) * 3600.0)
                        - greatest(t0, h * 3600.0)) * 1e6) AS BIGINT)
      AS vd_micro
  FROM ex
)
SELECT measurement, domain, entity_id, month_epoch,
  (CAST(sum(vd_micro) AS BIGINT) / 1e6)
    / (CAST(sum(d_micro) AS BIGINT) / 1e6) AS dw_mean,
  min(value) AS min_val, max(value) AS max_val,
  count(*)::BIGINT AS n_segments
FROM terms GROUP BY measurement, domain, entity_id, month_epoch
"""
