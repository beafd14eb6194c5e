"""Structured Streaming mode (SURVEY §2.8 T1-T4).

The reference is a bounded micro-batch loop: fetch BATCH_SIZE rows →
transform → write → repeat until drained (sqllite2influxdb.py:183-188).
That IS Structured Streaming's execution model; ``Trigger.AvailableNow``
reproduces "drain everything, then stop" (T2) with checkpointed progress
(the durable analog of the reference's implicit cursor position).

Surface:

- ``events_stream``    — file-source stream over the driver's events table
- ``windowed_agg``     — tumbling event-time window + watermark (T4 gap)
- ``stream_dedup``     — stateful exact dedup within the watermark (T3 gap;
                         the reference has no duplicate handling at all)
- ``drain_*``          — AvailableNow runners: memory sink for verification,
                         ``foreachBatch`` parquet/line-protocol for T2 parity

Every transformation here is the SAME DataFrame expression a batch caller
would use — tests assert stream-drain == batch result on identical input.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import configure

# one footer probe per (session, dir, file-stamp): every events_stream
# consumer in a session shares the probed schema instead of re-reading
# parquet metadata; stale stamps for the same (session, dir) are evicted
# on insert so a long-lived session doesn't accumulate dead entries
_SCHEMA_CACHE: dict[
    tuple[str, str, tuple[int, int] | None], T.StructType
] = {}
#: pytest observability — counts actual footer reads (tests assert == 1
#: per (session, dir) no matter how many streaming queries ran)
PROBE_COUNT = {"n": 0}


def _events_schema(spark: SparkSession, path: str) -> T.StructType:
    import os

    # mtime+size in the key: a regenerated events.parquet under the SAME
    # path (the driver rewrites /root/testdata between rounds) must not
    # be served a stale schema — a stat() is far cheaper than the footer
    # read it guards
    try:
        st = os.stat(os.path.join(path, "events.parquet"))
        stamp = (st.st_mtime_ns, st.st_size)
    except OSError:
        stamp = None
    key = (spark.sparkContext.applicationId, path, stamp)
    if key not in _SCHEMA_CACHE:
        # evict entries for the same (session, dir) with an older stamp —
        # a regenerated fixture replaces, not accumulates
        for stale in [k for k in _SCHEMA_CACHE if k[:2] == key[:2]]:
            del _SCHEMA_CACHE[stale]
        PROBE_COUNT["n"] += 1
        _SCHEMA_CACHE[key] = (
            spark.read.option("pathGlobFilter", "events.parquet")
            .parquet(path).schema
        )
    return _SCHEMA_CACHE[key]


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over events.parquet, normalized to ts: TIMESTAMP (UTC).

    The driver has shipped events.ts as TIMESTAMP(NANOS) (surfacing as
    long under nanosAsLong) and as micros-without-UTC-flag (surfacing as
    TIMESTAMP or TIMESTAMP_NTZ). A file stream needs a declared schema, so
    probe the batch reader's view of the same footer — one metadata read
    per (session, dir), cached for all four streaming consumers — and
    declare exactly that, then normalize ts like the batch loader.
    """
    configure(spark)
    path = sf_dir.rstrip("/")
    probed = _events_schema(spark, path)
    # the file stream source wants a directory; select just the events
    # table out of the shared sf dir with a glob filter
    raw = (
        spark.readStream.schema(probed)
        .option("pathGlobFilter", "events.parquet")
        .parquet(path)
    )
    ts_type = dict((f.name, f.dataType) for f in probed)["ts"]
    if isinstance(ts_type, T.LongType):
        # legacy TIMESTAMP(NANOS): truncate ns → µs like DuckDB
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("cast(ts div 1000 as bigint)"))
        )
    if isinstance(ts_type, T.TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over documents.parquet — the 'arriving shard' source
    for streaming incremental dedup. A file stream needs a declared
    schema; probe the batch reader's footer view (documents carry no
    timestamp column, so no ts normalization applies)."""
    configure(spark)
    path = sf_dir.rstrip("/")
    probed = (
        spark.read.option("pathGlobFilter", "documents.parquet")
        .parquet(path).schema
    )
    return (
        spark.readStream.schema(probed)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(path)
    )


def windowed_agg(events: DataFrame, window: str = "1 hour",
                 watermark: str = "30 minutes") -> DataFrame:
    """Tumbling event-time aggregation, late data bounded by the watermark.

    Works identically on a batch DataFrame (watermark is a no-op there) —
    the parity test runs both.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # integer-cents sum: associative, so partial-agg order can't
            # flip low bits vs any other engine (values are 2-decimal)
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0)
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful exact dedup on event_id.

    State is bounded by the watermark (dropDuplicatesWithinWatermark), so
    it holds one window of ids, not the whole history — the formulation
    that survives an unbounded stream at scale.
    """
    return events.withWatermark("ts", watermark) \
                 .dropDuplicatesWithinWatermark(["event_id"])


def interval_join(purchases: DataFrame, clicks: DataFrame,
                  max_gap: str = "10 minutes",
                  watermark: str = "30 minutes") -> DataFrame:
    """Stream-stream inner join with an event-time range condition:
    each purchase matches the same user's clicks in the ``max_gap``
    window leading up to it (the classic attribution join).

    Both sides carry a watermark and the join predicate bounds c_ts
    relative to p_ts, so Spark derives a state-retention horizon for
    each side — state is watermark+gap bounded, never the whole stream.
    Inner-join rows emit as soon as they match (append mode withholds
    nothing for inner joins), so the drained result equals the batch
    join of identical input — asserted in tests and by the oracle.
    """
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = clicks.withWatermark("ts", watermark).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {max_gap}"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )
    return joined.select(
        "user_id", "purchase_id", "click_id",
        F.unix_micros("p_ts").alias("purchase_us"),
        F.unix_micros("c_ts").alias("click_us"),
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )


_DRAIN_SEQ = itertools.count()


def drain_to_memory(sdf: DataFrame, name: str,
                    output_mode: str = "complete",
                    progress_out: list | None = None) -> DataFrame:
    """Run an AvailableNow drain into a memory sink; return the result.

    complete mode emits every window even though the bounded input never
    advances the watermark past the tail (append would withhold the last
    window — the classic bounded-stream gotcha).

    The memory-sink table gets a per-invocation unique name: a repeated
    drain under the same logical name in one session would otherwise race
    a still-registered (or leaked, on a prior error) query of that name.

    ``progress_out``: when a list is passed, the query's per-micro-batch
    ``recentProgress`` dicts are appended to it after termination —
    diagnostics (numInputRows per batch, state-store metrics) without
    changing the return type.
    """
    import json as _json

    unique = f"{name}_{next(_DRAIN_SEQ)}"
    q = (
        sdf.writeStream.format("memory").queryName(unique)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if progress_out is not None:
        for p in q.recentProgress:
            try:
                progress_out.append(
                    p if isinstance(p, dict) else _json.loads(p.json)
                )
            except Exception:  # noqa: BLE001 — diagnostics never fail a drain
                progress_out.append({"error": "unparseable progress"})
    return sdf.sparkSession.table(unique)


def drain_upsert(sdf: DataFrame, keys: list[str], order_cols: list[str],
                 checkpoint: str) -> DataFrame:
    """Streaming MERGE/upsert sink via foreachBatch: maintain
    latest-per-key state across micro-batches, return the final store.

    The pattern production pipelines run as `foreachBatch + MERGE INTO`
    on a table format, expressed without one: each micro-batch first
    reduces to its own per-key winners (map-side shrink — the store
    never sees more than one row per key per batch), then merges into
    the accumulated store with the same arg-max. Because arg-max under
    a total order is associative/commutative, batch arrival order and
    replayed batches (at-least-once delivery) cannot change the result —
    the idempotence MERGE gives you, recovered algebraically.

    Scale shape: state lives as a distributed DataFrame
    (localCheckpoint breaks lineage so the plan doesn't grow per batch);
    each merge is ONE shuffle on the key, sized by |keys|, not by the
    stream history. The memory-sink equivalent would collect to the
    driver — this never does.
    """
    from ..operators.merge import latest_per_key

    state: dict[str, DataFrame] = {}

    def merge(batch: DataFrame, _epoch: int) -> None:
        winners = latest_per_key(batch, keys, order_cols)
        if "store" in state:
            winners = latest_per_key(
                state["store"].unionByName(winners), keys, order_cols
            )
        state["store"] = winners.localCheckpoint(eager=True)

    drain_foreach_batch(sdf, checkpoint, merge)
    if "store" not in state:  # empty stream
        return sdf.sparkSession.createDataFrame([], sdf.schema)
    return state["store"]


def drain_agg_state(sdf: DataFrame, keys: list[str], value_col: str,
                    checkpoint: str) -> DataFrame:
    """Streaming incremental-aggregate sink via foreachBatch: maintain
    per-key (count/sum/min/max) partial states across micro-batches and
    return the final state relation.

    The batch twin is operators.merge.agg_state + merge_agg_states; the
    SAME monoid algebra makes the streaming fold exact: each micro-batch
    first collapses to its own per-key state (map-side shrink), then
    monoid-merges into the accumulated store — one shuffle sized by
    |keys| per batch, state as a distributed DataFrame (localCheckpoint
    bounds lineage), nothing on the driver. This is how a 100 TB rolling
    dashboard aggregate ingests a stream without ever re-scanning
    history.
    """
    from ..operators.merge import agg_state, merge_agg_states

    state: dict[str, DataFrame] = {}

    def merge(batch: DataFrame, _epoch: int) -> None:
        part = agg_state(batch, keys, value_col)
        if "store" in state:
            part = merge_agg_states([state["store"], part], keys)
        state["store"] = part.localCheckpoint(eager=True)

    drain_foreach_batch(sdf, checkpoint, merge)
    if "store" not in state:  # empty stream
        schema = ", ".join(f"{k} string" for k in keys)
        return sdf.sparkSession.createDataFrame(
            [], schema + ", n long, sum_c long, min_c long, max_c long"
        )
    return state["store"]


def drain_foreach_batch(sdf: DataFrame, checkpoint: str, batch_fn) -> int:
    """T2: the reference's fetch→transform→write loop as foreachBatch.

    ``batch_fn(df, epoch_id)`` receives each micro-batch as a plain batch
    DataFrame (e.g. sinks.influx.write_lines or a parquet append).
    Returns the number of micro-batches executed.
    """
    n_batches = {"n": 0}

    def wrapped(df: DataFrame, epoch_id: int) -> None:
        n_batches["n"] += 1
        batch_fn(df, epoch_id)

    q = (
        sdf.writeStream.foreachBatch(wrapped)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


def staged_fixture_dir(base_dir: str, stage_writers) -> str:
    """Build a multi-stage file-stream fixture ATOMICALLY (ADVICE r7:
    the old `isdir` guard around sequential `mode('append')` writes
    trusted any pre-existing directory — a crash between the first and
    last write left a partial fixture every later run silently consumed
    as complete input).

    Each ``stage_writers[i](path)`` writes one micro-batch's files into
    its own fresh subdir (use ``mode('overwrite')``); the data files
    then move into a staging dir as ``stage-<i>-<name>`` with STRICTLY
    INCREASING mtimes (fixed base epoch, +1 s per file — Spark's file
    source orders by modification time, so arrival order is now an
    explicit property of the fixture, not an accident of three write
    walls — the ADVICE r7 ordering low), and the staging dir renames
    into ``base_dir`` as the LAST step. A directory at ``base_dir``
    therefore either is complete or does not exist; a lost rename race
    means a concurrent session finished the identical build first.
    """
    import errno
    import os
    import shutil
    import uuid

    if os.path.isdir(base_dir):
        return base_dir
    os.makedirs(os.path.dirname(base_dir), exist_ok=True)
    tmp = f"{base_dir}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    build = os.path.join(tmp, "build")
    final = os.path.join(tmp, "final")
    os.makedirs(build)
    os.makedirs(final)
    try:
        t0_ns = 1_700_000_000 * 1_000_000_000
        n = 0
        for i, write in enumerate(stage_writers):
            stage = os.path.join(build, f"stage{i}")
            write(stage)
            for fname in sorted(os.listdir(stage)):
                if fname.startswith(("_", ".")):
                    continue
                dst = os.path.join(final, f"stage-{i:04d}-{fname}")
                shutil.move(os.path.join(stage, fname), dst)
                ns = t0_ns + n * 1_000_000_000
                os.utime(dst, ns=(ns, ns))
                n += 1
        try:
            os.rename(final, base_dir)
        except OSError as e:
            # ONLY the lost concurrent-builder race is benign (the other
            # session's rename landed an identical complete dir first);
            # every other failure must surface here, not as a masked
            # path-not-found in the caller's readStream
            if e.errno not in (errno.ENOTEMPTY, errno.EEXIST):
                raise
            if not os.path.isdir(base_dir):
                raise
    finally:
        # win or crash, the scratch tree never outlives the call — the
        # atomicity contract must not trade partial fixtures for /tmp
        # garbage accumulating across crashed rounds
        shutil.rmtree(tmp, ignore_errors=True)
    return base_dir
