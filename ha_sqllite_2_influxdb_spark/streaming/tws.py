"""Per-user event-time EMA — arbitrary stateful streaming, dual-wired:

- **transformWithStateInPandas** (Spark 4's successor stateful API:
  typed state handles, timers, TTL, RocksDB state store in production)
  when its Python-side dependency is available, else
- **applyInPandasWithState** (the legacy API stateful.py's sessionizer
  uses) — same fold, same per-key state tuple, same output.

The TWS Python worker speaks a protobuf state-server protocol, so it
needs ``google.protobuf`` at runtime; this container ships without it
(import-gated here, the repo's stub convention — the TWS wiring is
complete and runs wherever the dependency exists).

Operator semantics: an ORDER-DEPENDENT fold (non-associative, unlike
drain_upsert's arg-max), i.e. genuinely needs mutable per-key state and
cannot be expressed as any windowed aggregate. State per key is one
(ema, n) pair — O(active keys), stream-length independent.

Cross-engine exactness: the fold is ``ema*(1-alpha) + value*alpha`` in
float64, seeded with the first value, applied in (ts, event_id) order.
The DuckDB oracle replays the identical fold with ``list_reduce`` over
``list(value ORDER BY ts, event_id)`` — same IEEE ops in the same order →
bit-identical doubles.

Ordering contract: within a micro-batch each key's Arrow chunks are
concatenated and sorted ONCE; across batches the fold continues in
arrival order, so exact batch parity requires event-time-ordered input
files per key (same contract as stateful.py's sessionizer).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.shipped import _shipped

ALPHA = 0.1

OUT_SCHEMA = "user_id long, ema double, n_events long"
_STATE_SCHEMA = "ema double, n_events long"


def tws_available() -> bool:
    """True when transformWithStateInPandas can actually run: its Python
    worker imports google.protobuf for the state-server protocol."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _fold_ema(ordered, ema, n, alpha=ALPHA):
    """The shared fold both state APIs drive — one definition so the two
    wirings cannot diverge. ``ordered`` must already be (ts, event_id)
    sorted. Self-contained for `_shipped` (r11 hermeticity audit):
    ALPHA rides as a defaulted parameter, not a module-global read."""
    for v in ordered["value"]:
        v = float(v)
        ema = v if ema is None else ema * (1.0 - alpha) + v * alpha
        n += 1
    return ema, n


def _order_chunks(chunks):
    """Concatenate a key's Arrow chunks and sort ONCE (chunk-local sorts
    would fold across chunk boundaries out of order); mergesort for a
    deterministic tie order under retry. Self-contained for `_shipped`:
    pandas imported locally."""
    import pandas as pd

    if not chunks:
        return None
    whole = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 \
        else chunks[0]
    return whole.sort_values(["ts_us", "event_id"], kind="mergesort")


def _make_tws_processor():
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    # driver-built, shipped by value (r11 hermeticity audit): the
    # processor class is defined in THIS function scope, so cloudpickle
    # serializes it (and these closure cells) by value — a module-level
    # class or helper reference would ship a package import executors
    # cannot satisfy
    order_chunks = _shipped(_order_chunks)
    fold_ema = _shipped(_fold_ema)
    state_schema = _STATE_SCHEMA

    class EmaProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("ema", state_schema)

        def handleInputRows(
            self, key: Any, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            import pandas as pd

            (user_id,) = key
            ema, n = self._state.get() if self._state.exists() else (None, 0)
            ordered = order_chunks([pdf for pdf in rows if len(pdf)])
            if ordered is not None:
                ema, n = fold_ema(ordered, ema, n)
            self._state.update((ema, n))
            # Update-mode emission: the key's cumulative snapshot after
            # this batch; n_events is monotonic, so a multi-batch drain
            # reduces to the final snapshot via arg-max on n_events
            yield pd.DataFrame(
                {"user_id": [user_id], "ema": [ema], "n_events": [n]}
            )

        def close(self) -> None:
            pass

    return EmaProcessor()


def _make_legacy_fn():
    """Closure form of the legacy fold (r11 hermeticity audit): a
    module-level function handed to applyInPandasWithState is pickled
    as an import reference; this factory's local closure ships by
    value with the shared helpers bound through `_shipped`."""
    order_chunks = _shipped(_order_chunks)
    fold_ema = _shipped(_fold_ema)

    def legacy_fn(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        ema, n = state.get if state.exists else (None, 0)
        ordered = order_chunks([pdf for pdf in pdfs if len(pdf)])
        if ordered is not None:
            ema, n = fold_ema(ordered, ema, n)
        state.update((ema, n))
        yield pd.DataFrame(
            {"user_id": [user_id], "ema": [ema], "n_events": [n]})

    return legacy_fn


def ema_per_user(events: DataFrame, force_legacy: bool = False) -> DataFrame:
    """Wire the EMA fold over (user_id, ts, event_id, value) through
    whichever stateful API this runtime supports (see module docstring).

    State is hash-partitioned by user_id; each key's batch rows arrive
    as Arrow chunks (columnar, not row-at-a-time over the stream).
    """
    prepared = events.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "value",
    )
    if not force_legacy and tws_available():
        return prepared.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_make_tws_processor(),
            outputStructType=OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    from pyspark.sql.streaming.state import GroupStateTimeout

    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_legacy_fn(),
        OUT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
