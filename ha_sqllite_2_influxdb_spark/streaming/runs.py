"""Streaming stuck-sensor detection: per-series flatline RUN tracking —
the streaming twin of `operators.monitor.flatline_runs`, dual-wired like
`tws.ema_per_user` (transformWithStateInPandas where its protobuf
dependency exists, else applyInPandasWithState; same fold, same state
tuple, same output).

Operator semantics: a run-length fold over each series' points in
ts order — genuinely stateful (a run can span micro-batches) and
APPEND-emitting: a run is emitted exactly once, when a differing value
CLOSES it with length ≥ min_run. The still-open run at end of stream is
never emitted (an alerting stream cannot know the sensor won't change
next batch); the batch operator is the read-side truth for open runs,
and the oracle mirrors this by excluding each series' final run.

State per key is one (value, start, end, len) tuple — O(active series),
stream-length independent. Keys hash-partition on the series columns,
InfluxDB's own shard key.

Ordering contract: within a micro-batch each key's Arrow chunks are
concatenated and sorted once on ts_epoch (the LP point stream has no
ts ties per series — verified at fixture build); across batches the
fold continues in arrival order (same contract as tws.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.shipped import _shipped
from .tws import tws_available

OUT_SCHEMA = ("measurement string, domain string, entity_id string, "
              "run_start double, run_end double, run_len long, "
              "value double")
_STATE_SCHEMA = ("cur_value double, run_start double, run_end double, "
                 "run_len long")
MIN_RUN = 5


def _fold_runs(ordered: pd.DataFrame, st: tuple | None,
               min_run: int) -> tuple[tuple | None, list[tuple]]:
    """The shared fold both state APIs drive. ``ordered`` must already
    be ts-sorted; returns (open-run state, completed runs ≥ min_run)."""
    completed: list[tuple] = []
    for ts, v in zip(ordered["ts_epoch"], ordered["value"]):
        ts, v = float(ts), float(v)
        if st is None:
            st = (v, ts, ts, 1)
        elif v == st[0]:
            st = (st[0], st[1], ts, st[3] + 1)
        else:
            if st[3] >= min_run:
                completed.append(st)
            st = (v, ts, ts, 1)
    return st, completed


def _emit(key: Any, completed: list[tuple]) -> "pd.DataFrame":
    # self-contained for _shipped (r11 hermeticity audit)
    import pandas as pd

    m, d, e = key
    return pd.DataFrame({
        "measurement": [m] * len(completed),
        "domain": [d] * len(completed),
        "entity_id": [e] * len(completed),
        "run_start": [c[1] for c in completed],
        "run_end": [c[2] for c in completed],
        "run_len": [c[3] for c in completed],
        "value": [c[0] for c in completed],
    })


def _make_tws_processor(min_run: int):
    from pyspark.sql.streaming import (
        StatefulProcessor, StatefulProcessorHandle,
    )

    # shipped by value via the factory scope (see _legacy_fn_factory)
    order_chunks_ts = _shipped(_order_chunks_ts)
    fold_runs = _shipped(_fold_runs)
    emit = _shipped(_emit)
    state_schema = _STATE_SCHEMA

    class RunProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("run", state_schema)

        def handleInputRows(
            self, key: Any, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            st = self._state.get() if self._state.exists() else None
            ordered = order_chunks_ts(
                [pdf for pdf in rows if len(pdf)])
            completed: list[tuple] = []
            if ordered is not None:
                st, completed = fold_runs(ordered, st, min_run)
            if st is not None:
                self._state.update(st)
            if completed:
                yield emit(key, completed)

        def close(self) -> None:
            pass

    return RunProcessor()


def _order_chunks_ts(chunks) -> "pd.DataFrame | None":
    # self-contained for _shipped (r11 hermeticity audit)
    import pandas as pd

    if not chunks:
        return None
    whole = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 \
        else chunks[0]
    return whole.sort_values(["ts_epoch"], kind="mergesort")


def _legacy_fn_factory(min_run: int):
    # driver-built, shipped by value (r11 hermeticity audit): module-
    # level helper references inside the state closure would ship a
    # package import executors cannot satisfy
    order_chunks_ts = _shipped(_order_chunks_ts)
    fold_runs = _shipped(_fold_runs)
    emit = _shipped(_emit)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> \
            Iterator[pd.DataFrame]:
        st = tuple(state.get) if state.exists else None
        ordered = order_chunks_ts([pdf for pdf in pdfs if len(pdf)])
        completed: list[tuple] = []
        if ordered is not None:
            st, completed = fold_runs(ordered, st, min_run)
        if st is not None:
            state.update(st)
        if completed:
            yield emit(key, completed)

    return fn


def flatline_per_series(pts: DataFrame, min_run: int = MIN_RUN,
                        force_legacy: bool = False) -> DataFrame:
    """Wire the run fold over (series, ts_epoch, value) through
    whichever stateful API the runtime supports (module docstring)."""
    prepared = pts.select("measurement", "domain", "entity_id",
                          "ts_epoch", "value")
    keys = ["measurement", "domain", "entity_id"]
    if not force_legacy and tws_available():
        return prepared.groupBy(*keys).transformWithStateInPandas(
            statefulProcessor=_make_tws_processor(min_run),
            outputStructType=OUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    from pyspark.sql.streaming.state import GroupStateTimeout

    return prepared.groupBy(*keys).applyInPandasWithState(
        _legacy_fn_factory(min_run),
        OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


# ----------------------------------------------------- hysteresis alerts

HYST_OUT_SCHEMA = ("measurement string, domain string, entity_id string, "
                   "alert_start double, alert_end double, n_points long, "
                   "peak double")
_HYST_STATE_SCHEMA = ("on_state long, ep_start double, ep_end double, "
                      "n_points long, peak double")


def _fold_hysteresis(ordered: pd.DataFrame, st: tuple | None,
                     hi: float, lo: float
                     ) -> tuple[tuple | None, list[tuple]]:
    """Schmitt-trigger fold — the streaming twin of
    `operators.monitor.hysteresis_alerts` (same open->above-hi /
    close->below-lo rule, same episode tuple). State is ONE
    (on, start, end, n, peak) tuple per series; a closed episode emits
    exactly once, the open tail never does (the batch operator is the
    read-side truth for open episodes, and its own output excludes
    them — so stream output ≡ batch output exactly)."""
    completed: list[tuple] = []
    if st is None:
        st = (0, None, None, 0, None)
    on, ep_start, ep_end, n, peak = st
    for ts, v in zip(ordered["ts_epoch"], ordered["value"]):
        ts, v = float(ts), float(v)
        if on == 0:
            if v > hi:
                on, ep_start, ep_end, n, peak = 1, ts, ts, 1, v
        else:
            if v < lo:
                completed.append((ep_start, ep_end, n, peak))
                on, ep_start, ep_end, n, peak = 0, None, None, 0, None
            else:
                ep_end, n = ts, n + 1
                peak = v if v > peak else peak
    return (on, ep_start, ep_end, n, peak), completed


def _emit_hyst(key: Any, completed: list[tuple]) -> "pd.DataFrame":
    # self-contained for _shipped (r11 hermeticity audit)
    import pandas as pd

    m, d, e = key
    return pd.DataFrame({
        "measurement": [m] * len(completed),
        "domain": [d] * len(completed),
        "entity_id": [e] * len(completed),
        "alert_start": [c[0] for c in completed],
        "alert_end": [c[1] for c in completed],
        "n_points": [c[2] for c in completed],
        "peak": [c[3] for c in completed],
    })


def _make_hyst_tws_processor(hi: float, lo: float):
    from pyspark.sql.streaming import (
        StatefulProcessor, StatefulProcessorHandle,
    )

    # shipped by value via the factory scope (r11 hermeticity audit)
    order_chunks_ts = _shipped(_order_chunks_ts)
    fold_hysteresis = _shipped(_fold_hysteresis)
    emit_hyst = _shipped(_emit_hyst)
    state_schema = _HYST_STATE_SCHEMA

    class HystProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("hyst", state_schema)

        def handleInputRows(
            self, key: Any, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            st = self._state.get() if self._state.exists() else None
            ordered = order_chunks_ts([pdf for pdf in rows if len(pdf)])
            completed: list[tuple] = []
            if ordered is not None:
                st, completed = fold_hysteresis(ordered, st, hi, lo)
            if st is not None:
                self._state.update(st)
            if completed:
                yield emit_hyst(key, completed)

        def close(self) -> None:
            pass

    return HystProcessor()


def _hyst_legacy_fn_factory(hi: float, lo: float):
    # driver-built, shipped by value (r11 hermeticity audit)
    order_chunks_ts = _shipped(_order_chunks_ts)
    fold_hysteresis = _shipped(_fold_hysteresis)
    emit_hyst = _shipped(_emit_hyst)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> \
            Iterator[pd.DataFrame]:
        st = tuple(state.get) if state.exists else None
        ordered = order_chunks_ts([pdf for pdf in pdfs if len(pdf)])
        completed: list[tuple] = []
        if ordered is not None:
            st, completed = fold_hysteresis(ordered, st, hi, lo)
        if st is not None:
            state.update(st)
        if completed:
            yield emit_hyst(key, completed)

    return fn


def hysteresis_per_series(pts: DataFrame, hi: float, lo: float,
                          force_legacy: bool = False) -> DataFrame:
    """Wire the Schmitt-trigger fold through whichever stateful API the
    runtime supports (same dual-wiring as `flatline_per_series`)."""
    prepared = pts.select("measurement", "domain", "entity_id",
                          "ts_epoch", "value")
    keys = ["measurement", "domain", "entity_id"]
    if not force_legacy and tws_available():
        return prepared.groupBy(*keys).transformWithStateInPandas(
            statefulProcessor=_make_hyst_tws_processor(hi, lo),
            outputStructType=HYST_OUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    from pyspark.sql.streaming.state import GroupStateTimeout

    return prepared.groupBy(*keys).applyInPandasWithState(
        _hyst_legacy_fn_factory(hi, lo),
        HYST_OUT_SCHEMA,
        _HYST_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
