"""Per-series time-series forecasting: additive Holt-Winters.

InfluxQL's ``HOLT_WINTERS(N, S)`` (the one sink-side query function whose
recurrence SQL cannot express) forecasts N points ahead with seasonal
pattern length S from a regularly-spaced series — here the hourly
bucket means the downsample operator produces.

Spark shape: `applyInPandas` with ONE GROUP PER SERIES — the recurrence
is inherently sequential per series but embarrassingly parallel across
series, which is exactly the groupBy-apply execution model. The input is
the DOWNSAMPLED series (one row per hour), so group size is bounded by
the observation span in hours (8 760/yr), not by raw point volume —
at 100 TB the heavy lifting (raw → hourly) happened in the exchange-
efficient bucket aggregate, and this stage touches only the small
regular series. State per group is three floats + an S-vector.

Determinism: the smoothing loop is written as explicit scalar float64
ops in a fixed order (no vectorized reassociation), so results are
bit-identical run-to-run and to any faithful reimplementation of the
same recurrence — pytest pins both (`tests/test_plans.py`).

No DuckDB oracle is possible (iterative recurrence); the registry entry
is a documented rows-only tier like the ANN/sketch/codec ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.shipped import _shipped

_OUT_SCHEMA = T.StructType([
    T.StructField("measurement", T.StringType()),
    T.StructField("domain", T.StringType()),
    T.StructField("entity_id", T.StringType()),
    T.StructField("step", T.LongType()),
    T.StructField("forecast", T.DoubleType()),
])


def hw_additive(vals: list[float], m: int, h: int,
                alpha: float, beta: float, gamma: float) -> list[float]:
    """Additive Holt-Winters on a regular series; returns h forecasts.

    Classic initialization with de-trended seasonals: level = mean of
    season 1, trend = per-step difference of the first two season
    means, seasonal components = season-1 deviations from the fitted
    in-season trend line (subtracting the raw season mean instead
    leaks ±trend·m/2 into the seasonal estimates). Requires
    len(vals) >= 2*m. Scalar float64 throughout, fixed evaluation
    order.
    """
    n = len(vals)
    if n < 2 * m:
        return []
    s1 = sum(vals[:m]) / m
    s2 = sum(vals[m:2 * m]) / m
    level = s1
    trend = (s2 - s1) / m
    season = [vals[i] - (s1 + (i - (m - 1) / 2.0) * trend)
              for i in range(m)]
    for t in range(m, n):
        prev_level = level
        si = season[t % m]
        level = alpha * (vals[t] - si) + (1.0 - alpha) * (level + trend)
        trend = beta * (level - prev_level) + (1.0 - beta) * trend
        season[t % m] = gamma * (vals[t] - level) + (1.0 - gamma) * si
    return [level + (k + 1) * trend + season[(n + k) % m]
            for k in range(h)]


def holt_winters_forecast(hourly: DataFrame, season_len: int = 24,
                          horizon: int = 12, alpha: float = 0.5,
                          beta: float = 0.1,
                          gamma: float = 0.1) -> DataFrame:
    """Forecast `horizon` steps per series from hourly bucket means.

    ``hourly`` needs columns (measurement, domain, entity_id, hour_idx,
    mean_val); series shorter than two seasons produce no rows (the
    InfluxDB behavior for insufficient data).
    """
    import pandas as pd

    # driver-built, shipped by value (r11: the non-repo-cwd registry
    # audit caught this closure importing the package on executors)
    hw = _shipped(hw_additive)
    out_schema = _OUT_SCHEMA

    def fc(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("hour_idx")
        preds = hw(
            [float(v) for v in pdf["mean_val"]],
            season_len, horizon, alpha, beta, gamma)
        if not preds:
            return pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in out_schema})
        head = pdf.iloc[0]
        return pd.DataFrame({
            "measurement": head["measurement"],
            "domain": head["domain"],
            "entity_id": head["entity_id"],
            "step": range(1, horizon + 1),
            "forecast": preds,
        })

    return (
        hourly.select("measurement", "domain", "entity_id",
                      "hour_idx", "mean_val")
        .groupBy("measurement", "domain", "entity_id")
        .applyInPandas(fc, schema=_OUT_SCHEMA)
    )


_EMA_SCHEMA = T.StructType([
    T.StructField("state_id", T.LongType()),
    T.StructField("measurement", T.StringType()),
    T.StructField("domain", T.StringType()),
    T.StructField("entity_id", T.StringType()),
    T.StructField("ts_epoch", T.DoubleType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("ema", T.DoubleType()),
])


def ema_recurrence(vals: list[float], n: int) -> list[float]:
    """Standard exponential moving average, adjust-free form:
    ema_0 = v_0; ema_i = alpha*v_i + (1-alpha)*ema_{i-1},
    alpha = 2/(n+1). Scalar float64, fixed evaluation order —
    bit-identical run-to-run (pytest-pinned)."""
    if not vals:
        return []
    alpha = 2.0 / (n + 1.0)
    out = [float(vals[0])]
    for v in vals[1:]:
        out.append(alpha * float(v) + (1.0 - alpha) * out[-1])
    return out


def ema_points(pts: DataFrame, n: int = 9) -> DataFrame:
    """Per-series EMA over raw points in (ts_epoch, state_id) order —
    InfluxQL's ``EXPONENTIAL_MOVING_AVERAGE`` shape. One group per
    series (`holt_winters_forecast`'s applyInPandas model: sequential
    within a series, parallel across series); HA series are bounded by
    an entity's observation count — for unbounded series, feed the
    DOWNSAMPLED relation instead, exactly as InfluxDB users wrap EMA
    around GROUP BY time()."""
    import pandas as pd

    # driver-built, shipped by value (r11 hermeticity audit)
    rec = _shipped(ema_recurrence)

    def ema(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["ts_epoch", "state_id"]).reset_index(
            drop=True)
        pdf["ema"] = rec([float(v) for v in pdf["value"]], n)
        return pdf

    return (
        pts.select("state_id", "measurement", "domain", "entity_id",
                   "ts_epoch", "value")
        .groupBy("measurement", "domain", "entity_id")
        .applyInPandas(ema, schema=_EMA_SCHEMA)
    )
