"""Semantic invariants of the per-series monitoring operators —
known-answer checks on synthetic series (the oracle equality in
test_oracle_parity.py checks cross-engine value parity; these check
the MATH means what it claims)."""

import math

import pytest
from pyspark.sql import functions as F

from ha_sqllite_2_influxdb_spark.operators import monitor


def _series(spark, rows):
    return spark.createDataFrame(
        rows, "state_id long, measurement string, domain string, "
              "entity_id string, ts_epoch double, value double")


def _pts(spark, values, entity="e"):
    return _series(spark, [
        (i, "m", "d", entity, float(i), float(v))
        for i, v in enumerate(values)])


def test_acf_alternating_series_is_negative_at_lag1(spark):
    # x = +1,-1,+1,-1,... -> mean 0, r1 = -1, r2 = +1 (up to the
    # finite-sample n-k/n factor on the numerator sum)
    vals = [1.0, -1.0] * 8
    row = monitor.series_acf(_pts(spark, vals), max_lag=2).collect()[0]
    n = len(vals)
    assert row.acf1 == pytest.approx(-(n - 1) / n, abs=1e-9)
    assert row.acf2 == pytest.approx((n - 2) / n, abs=1e-9)


def test_acf_constant_series_excluded(spark):
    out = monitor.series_acf(_pts(spark, [5.0] * 10), max_lag=2)
    assert out.count() == 0


def test_acf_linear_trend_positive(spark):
    row = monitor.series_acf(
        _pts(spark, [float(i) for i in range(20)]), max_lag=1
    ).collect()[0]
    assert row.acf1 > 0.8


def test_mean_shift_flags_exact_step(spark):
    # 6 points at 0 then 6 at 100: shift detected at the boundary
    vals = [0.0] * 6 + [100.0] * 6
    out = monitor.mean_shift_scores(_pts(spark, vals), w_pts=3,
                                    threshold=50.0).collect()
    # only the first point of the high plateau has before=[0,0,0],
    # after=[100,100,100]
    full = [r for r in out if abs(r.shift) == 100.0]
    assert len(full) == 1 and full[0].state_id == 6
    assert full[0].before_mean == 0.0 and full[0].after_mean == 100.0
    # no detections inside either plateau
    assert all(6 - 3 < r.state_id <= 6 + 2 for r in out)


def test_mean_shift_quiet_series_silent(spark):
    out = monitor.mean_shift_scores(
        _pts(spark, [10.0, 10.1, 9.9] * 6), w_pts=3, threshold=5.0)
    assert out.count() == 0


def test_rolling_quantile_matches_sorted_pick(spark):
    vals = [5.0, 1.0, 9.0, 3.0, 7.0, 2.0]
    out = {r.state_id: r.rolling_q
           for r in monitor.rolling_quantile(_pts(spark, vals), n=4,
                                             p=0.9).collect()}
    # frames (sorted): [1,3,5,9]->9, [1,3,7,9]->9, [2,3,7,9]->9
    assert out == {3: 9.0, 4: 9.0, 5: 9.0}
    out50 = {r.state_id: r.rolling_q
             for r in monitor.rolling_quantile(_pts(spark, vals), n=4,
                                               p=0.5).collect()}
    # ceil(0.5*4)=2nd smallest
    assert out50 == {3: 3.0, 4: 3.0, 5: 3.0}


def test_flatline_runs_exact_spans(spark):
    vals = [1.0, 2.0, 2.0, 2.0, 2.0, 2.0, 3.0, 3.0, 4.0]
    out = monitor.flatline_runs(_pts(spark, vals), min_run=5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.run_start, r.run_end, r.run_len, r.value) == (1.0, 5.0,
                                                            5, 2.0)
    # min_run=2 also catches the 3.0 pair
    out2 = monitor.flatline_runs(_pts(spark, vals), min_run=2)
    assert out2.count() == 2


def test_flatline_interrupted_run_not_merged(spark):
    vals = [2.0, 2.0, 2.0, 9.0, 2.0, 2.0, 2.0]
    assert monitor.flatline_runs(_pts(spark, vals), min_run=4).count() == 0


def test_monitor_ops_single_series_exchange(spark):
    from tests.test_plans import explain_str
    pts = _pts(spark, [float(i) for i in range(8)])
    for df in (monitor.series_acf(pts, max_lag=2),
               monitor.mean_shift_scores(pts, 3, 1.0),
               monitor.rolling_quantile(pts, 4, 0.9),
               monitor.flatline_runs(pts, 2)):
        physical = explain_str(df)
        assert physical.count("hashpartitioning(measurement") == 1, physical


def test_series_correlation_known_answers(spark):
    """Cross-measurement Pearson r on synthetic co-varying series:
    y = 2x (r = 1), z = -x + noise-free inverse (r = -1), and a
    constant series is excluded (undefined r)."""
    rows = []
    for t in range(6):
        x = float(t + 1)
        rows += [(t * 10 + 1, "a", "d", "e", t * 3600.0, x),
                 (t * 10 + 2, "b", "d", "e", t * 3600.0, 2 * x),
                 (t * 10 + 3, "c", "d", "e", t * 3600.0, 10 - x),
                 (t * 10 + 4, "k", "d", "e", t * 3600.0, 5.0)]
    pts = spark.createDataFrame(
        rows, "state_id long, measurement string, domain string, "
              "entity_id string, ts_epoch double, value double")
    out = {(r.meas_a, r.meas_b): r.pearson_r
           for r in monitor.series_correlation(pts,
                                               bucket_s=3600).collect()}
    assert out[("a", "b")] == pytest.approx(1.0)
    assert out[("a", "c")] == pytest.approx(-1.0)
    assert out[("b", "c")] == pytest.approx(-1.0)
    # constant measurement k excluded from every pair
    assert not any("k" in p for p in out)


def test_fleet_correlation_tracks_reference(spark):
    """Entity equal to the fleet trend gets r = 1; an anti-trending
    entity gets r = -1; a constant entity is excluded."""
    rows = []
    for t in range(5):
        x = float(t + 1)
        rows += [(t * 10 + 1, "m", "d", "up1", t * 3600.0, x),
                 (t * 10 + 2, "m", "d", "up2", t * 3600.0, 3 * x),
                 (t * 10 + 3, "m", "d", "down", t * 3600.0, -x),
                 (t * 10 + 4, "m", "d", "flat", t * 3600.0, 7.0)]
    pts = spark.createDataFrame(
        rows, "state_id long, measurement string, domain string, "
              "entity_id string, ts_epoch double, value double")
    out = {r.entity_id: r.pearson_r
           for r in monitor.fleet_correlation(pts,
                                              bucket_s=3600).collect()}
    # fleet mean = (x + 3x - x + 7)/4 = (3x+7)/4: increasing in x
    assert out["up1"] == pytest.approx(1.0)
    assert out["up2"] == pytest.approx(1.0)
    assert out["down"] == pytest.approx(-1.0)
    assert "flat" not in out


def test_hysteresis_alert_episodes(spark):
    """Schmitt trigger: opens only above hi, stays open through the
    band, closes only below lo; the trailing open episode is withheld."""
    from ha_sqllite_2_influxdb_spark.operators.monitor import (
        hysteresis_alerts,
    )

    vals = [50, 85, 70, 90, 55,    # episode 1: opens at 85, closes at 55
            75,                    # band value while CLOSED: no alert
            95, 82,                # episode 2 opens... and never closes
            ]
    pts = spark.createDataFrame(
        [(i, "m", "d", "e", float(i * 10), float(v))
         for i, v in enumerate(vals)],
        "state_id long, measurement string, domain string, "
        "entity_id string, ts_epoch double, value double")
    out = hysteresis_alerts(pts, hi=80.0, lo=60.0).collect()
    assert len(out) == 1                      # open tail withheld
    ep = out[0]
    assert (ep.alert_start, ep.alert_end) == (10.0, 30.0)
    assert ep.n_points == 3 and ep.peak == 90.0
    import pytest as _pt

    with _pt.raises(ValueError):
        hysteresis_alerts(pts, hi=60.0, lo=80.0)


def test_stream_hysteresis_fold_matches_batch(spark):
    """The streaming fold and the batch windowed operator must agree on
    the crafted episode sequence, batch-split across two chunks (an
    episode spanning the split)."""
    import pandas as pd

    from ha_sqllite_2_influxdb_spark.operators.monitor import (
        hysteresis_alerts,
    )
    from ha_sqllite_2_influxdb_spark.streaming.runs import (
        _fold_hysteresis,
    )

    vals = [50, 85, 70, 90, 55, 75, 95, 82]
    pts = spark.createDataFrame(
        [(i, "m", "d", "e", float(i * 10), float(v))
         for i, v in enumerate(vals)],
        "state_id long, measurement string, domain string, "
        "entity_id string, ts_epoch double, value double")
    batch = [(r.alert_start, r.alert_end, r.n_points, r.peak)
             for r in hysteresis_alerts(pts, 80.0, 60.0).collect()]
    # stream: split mid-episode (after index 2) — the carry state must
    # close the episode in chunk 2
    rows = [(i * 10.0, float(v)) for i, v in enumerate(vals)]
    st, done = _fold_hysteresis(
        pd.DataFrame(rows[:3], columns=["ts_epoch", "value"]), None,
        80.0, 60.0)
    st, done2 = _fold_hysteresis(
        pd.DataFrame(rows[3:], columns=["ts_epoch", "value"]), st,
        80.0, 60.0)
    assert sorted(done + done2) == sorted(batch) == [(10.0, 30.0, 3,
                                                      90.0)]
    assert st[0] == 1          # the tail episode is open state, unemitted
