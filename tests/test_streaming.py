"""Streaming tests: stream-drain results equal their batch counterparts.

The transformations are mode-agnostic; these tests run them through real
readStream → writeStream (Trigger.AvailableNow) and assert identity with
the batch execution on the same input (SURVEY §2.8 T2-T4).
"""

import uuid

from ha_sqllite_2_influxdb_spark.sources.tables import load_table
from ha_sqllite_2_influxdb_spark.streaming.stream import (
    drain_foreach_batch,
    drain_to_memory,
    events_stream,
    stream_dedup,
    windowed_agg,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_windowed_agg_equals_batch(spark, sf_dir):
    sdf = windowed_agg(events_stream(spark, sf_dir))
    assert sdf.isStreaming
    got = drain_to_memory(sdf, f"wagg_{uuid.uuid4().hex[:8]}")
    want = windowed_agg(load_table(spark, sf_dir, "events"))
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_dedup_drops_replayed_batch(spark, sf_dir, tmp_path):
    # a "recrawl": the same events delivered twice to the stream source
    src = str(tmp_path / "events_dup")
    ev = load_table(spark, sf_dir, "events")
    ev.write.mode("append").parquet(src)
    ev.write.mode("append").parquet(src)
    raw = (
        spark.readStream.schema(ev.schema).parquet(src)
    )
    deduped = stream_dedup(raw)
    got = drain_to_memory(deduped, f"dedup_{uuid.uuid4().hex[:8]}",
                          output_mode="append")
    n_total = ev.count()
    assert spark.read.parquet(src).count() == 2 * n_total
    assert got.count() == n_total
    assert got.select("event_id").distinct().count() == n_total


def test_foreach_batch_drain_parity(spark, sf_dir, tmp_path):
    """T2: the reference's fetch→transform→write loop via foreachBatch."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    sdf = events_stream(spark, sf_dir).select("event_id", "ts", "value")

    n = drain_foreach_batch(
        sdf, ckpt,
        lambda df, epoch_id: df.write.mode("append").parquet(out),
    )
    assert n >= 1
    want = load_table(spark, sf_dir, "events").count()
    assert spark.read.parquet(out).count() == want


def test_stateful_sessions_state_across_batches(spark, sf_dir, tmp_path):
    """applyInPandasWithState: sessions spanning micro-batch boundaries
    must NOT be split — state carries each user's open session across
    triggers. Three time-ordered files, one file per trigger."""
    import time

    from pyspark.sql import functions as F

    from ha_sqllite_2_influxdb_spark.streaming.stateful import (
        sessionize_stateful,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / 3
    src = str(tmp_path / "ev_parts")
    import os
    os.makedirs(src)
    for i in range(3):
        part = ev.filter(
            (F.col("ts") >= lo + i * span)
            & (F.col("ts") < (hi if i == 2 else lo + (i + 1) * span))
        ) if i < 2 else ev.filter(F.col("ts") >= lo + 2 * span)
        part.coalesce(1).write.mode("overwrite").parquet(f"{src}/b{i}")
        time.sleep(1.1)  # distinct mtimes -> deterministic file order

    raw = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    got = drain_to_memory(
        sessionize_stateful(raw), f"sess_{uuid.uuid4().hex[:8]}",
        output_mode="append",
    )

    # batch reference: closed sessions = all but each user's last session
    from pyspark.sql import Window as W
    us = W.partitionBy("user_id").orderBy("ts")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(us))
    sess = (
        ev.withColumn(
            "new_sess",
            F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_sess").over(
            us.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("start_us"),
            F.max(F.unix_micros("ts")).alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    mx = W.partitionBy("user_id")
    want = sess.withColumn(
        "mx", F.max("session_id").over(mx)
    ).filter(F.col("session_id") < F.col("mx")).drop("mx")

    cols = ["user_id", "session_id", "start_us", "end_us", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_foreach_batch_checkpoint_resume_no_reprocess(spark, tmp_path):
    """T1/T2 parity, streaming side: a second AvailableNow drain from the
    SAME checkpoint must process only files that arrived since the first
    drain — the durable analog of the reference's implicit cursor
    position (and of backfill idempotence on the batch side)."""
    import os

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def mk(lo, n):
        return spark.range(lo, lo + n).select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
        )

    mk(0, 100).coalesce(1).write.parquet(f"{src}/f1")
    raw = lambda: (  # noqa: E731 - tiny local stream factory
        spark.readStream.schema("event_id long, ts timestamp")
        .option("recursiveFileLookup", "true").parquet(src)
    )
    sink = lambda df, _eid: df.write.mode("append").parquet(out)  # noqa: E731

    drain_foreach_batch(raw(), ckpt, sink)
    assert spark.read.parquet(out).count() == 100

    mk(1000, 50).coalesce(1).write.parquet(f"{src}/f2")
    drain_foreach_batch(raw(), ckpt, sink)
    got = spark.read.parquet(out)
    # 150 total and NO duplicates: f1 was not reprocessed
    assert got.count() == 150
    assert got.select("event_id").distinct().count() == 150


def test_stateful_sessions_tolerate_cross_batch_stragglers(spark, tmp_path):
    """Deliberately time-INTERLEAVED input: a later micro-batch delivers
    an event older than the previous batch's tail but inside the open
    session. The drained result must still match the batch oracle — the
    straggler bumps the session's count without moving its bounds
    backwards (stateful.py's max/min clamp)."""
    import os
    import time

    from pyspark.sql import functions as F

    from ha_sqllite_2_influxdb_spark.streaming.stateful import (
        sessionize_stateful,
    )

    minute = 60 * 1_000_000
    batch1 = [(1, 0), (1, 10 * minute), (1, 20 * minute),
              (2, 0), (2, 5 * minute)]
    # 15min is OLDER than batch1's tail (20min) -> cross-batch straggler;
    # 100min then closes user 1's session. User 2 gets a second session
    # entirely, leaving one closed session per user.
    batch2 = [(1, 15 * minute), (1, 100 * minute),
              (2, 90 * minute), (2, 95 * minute)]

    src = str(tmp_path / "interleaved")
    os.makedirs(src)
    for i, rows in enumerate([batch1, batch2]):
        df = spark.createDataFrame(rows, "user_id long, ts_us long").select(
            "user_id", F.timestamp_micros("ts_us").alias("ts")
        )
        df.coalesce(1).write.parquet(f"{src}/b{i}")
        time.sleep(1.1)  # distinct mtimes -> deterministic file order

    raw = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    got = drain_to_memory(
        sessionize_stateful(raw), f"stragg_{uuid.uuid4().hex[:8]}",
        output_mode="append",
    )
    cols = ["user_id", "session_id", "start_us", "end_us", "n_events"]
    assert _rows(got, cols) == [
        (1, 1, 0, 20 * minute, 4),
        (2, 1, 0, 5 * minute, 2),
    ]


def test_stream_to_line_protocol_sink(spark, sf_dir, tmp_path):
    """T2+S4 end-to-end: AvailableNow drain through line-protocol
    rendering into the partitioned file sink — the streaming analog of
    the reference's whole fetch→transform→write loop. Must equal the
    batch rendering of the identical input."""
    import glob

    from ha_sqllite_2_influxdb_spark.sinks.influx import (
        line_protocol, write_lines,
    )
    from pyspark.sql import functions as F

    def to_points(df):
        return df.select(
            F.col("event_id").alias("state_id"),
            F.col("event_type").alias("measurement"),
            F.lit("HA").alias("source"),
            F.lit("stream").alias("domain"),
            F.concat(F.lit("user_"), F.col("user_id").cast("string"))
            .alias("entity_id"),
            F.concat(F.lit("User "), F.col("user_id").cast("string"))
            .alias("friendly_name"),
            (F.unix_micros("ts").cast("double") / 1e6).alias("ts_epoch"),
            F.col("value"),
            F.lit(None).cast("string").alias("state_str"),
        )

    out = str(tmp_path / "lp")
    ckpt = str(tmp_path / "ckpt")
    # each micro-batch writes to its own directory: the file sink's
    # part-<pid> names are per-ATTEMPT unique, not per-batch
    drain_foreach_batch(
        to_points(events_stream(spark, sf_dir)), ckpt,
        lambda df, epoch_id: write_lines(
            line_protocol(df), path=f"{out}/batch-{epoch_id}"
        ),
    )
    got = []
    for f in glob.glob(f"{out}/batch-*/part-*.lp"):
        with open(f) as fh:
            got.extend(ln for ln in fh.read().splitlines() if ln)
    want = [
        r.line for r in
        line_protocol(to_points(load_table(spark, sf_dir, "events"))).collect()
    ]
    assert sorted(got) == sorted(want)


def test_schema_probe_cached_per_session_dir(spark, sf_dir):
    """VERDICT r4 #4: events_stream probes the parquet footer ONCE per
    (session, dir) — repeated streaming consumers reuse the cached
    schema instead of re-reading metadata."""
    from ha_sqllite_2_influxdb_spark.streaming import stream as st

    st.events_stream(spark, sf_dir)  # may or may not be the first probe
    n0 = st.PROBE_COUNT["n"]
    for _ in range(3):
        st.events_stream(spark, sf_dir)
    assert st.PROBE_COUNT["n"] == n0


def test_stream_sessions_crosscheck_matches_and_writes_no_diag(
    spark, sf_dir, monkeypatch
):
    """VERDICT r4 #1 / r5 #3: with SPARK_GRAFT_DIAG=1 the drain runs the
    in-engine cross-check against the batch formulation (no diag artifact
    when they agree) and returns rows in the deterministic
    (user_id, session_id) total order."""
    import glob
    import os

    from ha_sqllite_2_influxdb_spark.plans.streaming_ops import (
        _batch_sessions_closed, q_stream_sessions,
    )

    monkeypatch.setenv("SPARK_GRAFT_DIAG", "1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    before = set(glob.glob(os.path.join(repo, "diag", "stream_sessions_*")))
    got = q_stream_sessions(spark, sf_dir)
    cols = ["user_id", "session_id", "start_us", "end_us", "n_events"]
    rows = [tuple(r) for r in got.select(*cols).collect()]
    assert rows == sorted(rows, key=lambda r: (r[0], r[1]))
    want = sorted(
        tuple(r) for r in _batch_sessions_closed(spark, sf_dir)
        .select(*cols).collect()
    )
    assert sorted(rows) == want
    after = set(glob.glob(os.path.join(repo, "diag", "stream_sessions_*")))
    assert after == before


def test_stream_sessions_diag_default_off(spark, sf_dir, monkeypatch):
    """VERDICT r5 #3: without SPARK_GRAFT_DIAG the drain must NOT invoke
    the cross-check (two exceptAll jobs of pure forensic overhead)."""
    from ha_sqllite_2_influxdb_spark.plans import streaming_ops as so

    monkeypatch.delenv("SPARK_GRAFT_DIAG", raising=False)
    called = []
    monkeypatch.setattr(
        so, "_diag_stream_sessions",
        lambda *a, **k: called.append(True),
    )
    got = so.q_stream_sessions(spark, sf_dir)
    assert got.count() > 0
    assert called == []


def test_stream_dedup_incremental_matches_batch(spark, sf_dir):
    """The drained streaming classification must equal the batch digest
    probe over identical input, and every curated doc must classify as
    exact_dup (its own content IS in the index)."""
    from pyspark.sql import functions as F

    from ha_sqllite_2_influxdb_spark.plans.streaming_ops import (
        q_stream_dedup_incremental,
    )
    from ha_sqllite_2_influxdb_spark.sources.tables import load_table

    got = {r.doc_id: r.status for r in
           q_stream_dedup_incremental(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    curated_digests = {
        r._d for r in docs.filter(F.col("doc_id") % 4 != 0)
        .select(F.md5("text").alias("_d")).collect()
    }
    want = {
        r.doc_id: ("exact_dup" if r._d in curated_digests else "new")
        for r in docs.select("doc_id", F.md5("text").alias("_d")).collect()
    }
    assert got == want
    assert all(got[d] == "exact_dup" for d in got if d % 4 != 0)


def test_drain_upsert_multibatch_equals_batch_argmax(spark, tmp_path):
    """drain_upsert across THREE micro-batches (one file each, forced by
    maxFilesPerTrigger=1) equals the one-shot batch arg-max — the
    associativity the streaming MERGE pattern rests on. Later files
    carry both newer and older versions of the same keys, so the merge
    must keep winners from any batch position."""
    import datetime as dt
    import os

    from ha_sqllite_2_influxdb_spark.operators.merge import latest_per_key
    from ha_sqllite_2_influxdb_spark.streaming.stream import drain_upsert

    src = str(tmp_path / "src")
    os.makedirs(src)

    def mk(rows, name):
        spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, value double"
        ).coalesce(1).write.parquet(f"{src}/{name}")

    rows1 = [(u, 1_000_000 * (u + 1), 10 + u, 1.0) for u in range(5)]
    rows2 = [(u, 1_000_000 * (u + 3), 20 + u, 2.0) for u in range(5)]
    # batch 3 is OLDER than batch 2 for every key (straggler replay)
    rows3 = [(u, 1_000_000 * (u + 2), 30 + u, 3.0) for u in range(5)]

    def ts(us):
        return dt.datetime.fromtimestamp(us / 1e6, dt.timezone.utc).replace(
            tzinfo=None
        )

    mk([(u, ts(a), e, v) for u, a, e, v in rows1], "f1")
    mk([(u, ts(a), e, v) for u, a, e, v in rows2], "f2")
    mk([(u, ts(a), e, v) for u, a, e, v in rows3], "f3")

    sdf = (
        spark.readStream
        .schema("user_id long, ts timestamp, event_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    got = drain_upsert(
        sdf, keys=["user_id"], order_cols=["ts", "event_id"],
        checkpoint=str(tmp_path / "ckpt"),
    )
    want = latest_per_key(
        spark.read.option("recursiveFileLookup", "true").parquet(src),
        ["user_id"], ["ts", "event_id"],
    )
    cols = ["user_id", "ts", "event_id", "value"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.select(cols).collect())
    )
    # every winner is from batch 2 (newest ts)
    assert all(r["event_id"] >= 20 and r["event_id"] < 30
               for r in got.collect())


def test_ema_stream_matches_batch_fold_across_batches(spark, tmp_path):
    """EMA state carries across TWO micro-batches (event-time-ordered
    files): drained snapshots reduce to the same result as one
    pure-python fold over the full ordered input."""
    import datetime as dt
    import os

    from ha_sqllite_2_influxdb_spark.operators.merge import latest_per_key
    from ha_sqllite_2_influxdb_spark.streaming.stream import drain_to_memory
    from ha_sqllite_2_influxdb_spark.streaming.tws import ALPHA, ema_per_user

    src = str(tmp_path / "src")
    os.makedirs(src)

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    sch = "user_id long, ts timestamp, event_id long, value double"
    b1 = [(u, ts(i), u * 100 + i, float(u + i))
          for u in (1, 2) for i in range(3)]
    b2 = [(u, ts(10 + i), u * 100 + 10 + i, float(u * i + 0.25))
          for u in (1, 2) for i in range(3)]
    spark.createDataFrame(b1, sch).coalesce(1).write.parquet(f"{src}/f1")
    spark.createDataFrame(b2, sch).coalesce(1).write.parquet(f"{src}/f2")

    sdf = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    drained = drain_to_memory(
        ema_per_user(sdf), "ema_t", output_mode="update"
    )
    got = {
        r["user_id"]: (r["ema"], r["n_events"])
        for r in latest_per_key(
            drained, ["user_id"], ["n_events"]
        ).collect()
    }

    want = {}
    for u in (1, 2):
        vals = [v for (uu, _t, _e, v) in sorted(b1 + b2, key=lambda r: r[1])
                if uu == u]
        ema = None
        for v in vals:
            ema = v if ema is None else ema * (1.0 - ALPHA) + v * ALPHA
        want[u] = (ema, len(vals))
    assert got == want  # bit-exact: same IEEE ops in the same order


def test_tws_gating_matches_runtime_dependency(spark):
    """tws_available() must reflect whether google.protobuf imports; in
    either case ema_per_user wires a runnable plan (this container lacks
    protobuf, so the legacy applyInPandasWithState path serves)."""
    from ha_sqllite_2_influxdb_spark.streaming import tws

    try:
        from google.protobuf import descriptor  # noqa: F401

        assert tws.tws_available() is True
    except ImportError:
        assert tws.tws_available() is False


def test_drain_agg_state_across_batches_equals_batch(spark, sf_dir,
                                                     tmp_path):
    """The streaming incremental aggregate must be exact across MULTIPLE
    micro-batches (one file per trigger): the per-batch states monoid-
    merge into precisely the one-shot batch aggregate — integer state,
    so not just approximately."""
    import os

    from pyspark.sql import functions as F

    from ha_sqllite_2_influxdb_spark.operators.merge import (
        agg_state, finalize_agg,
    )
    from ha_sqllite_2_influxdb_spark.streaming.stream import drain_agg_state

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    src = str(tmp_path / "ev_parts")
    os.makedirs(src)
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite").parquet(f"{src}/b{i}")

    raw = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    got = sorted(finalize_agg(drain_agg_state(
        raw.select("event_type", "value"), ["event_type"], "value",
        checkpoint=str(tmp_path / "ckpt"),
    )).collect())
    want = sorted(finalize_agg(
        agg_state(ev, ["event_type"], "value")
    ).collect())
    assert got == want


def test_stream_ohlc_drain_equals_batch(spark, sf_dir):
    """min_by/max_by OHLC as a REAL watermarked streaming aggregation:
    the AvailableNow drain must equal the batch form exactly."""
    from ha_sqllite_2_influxdb_spark.plans.streaming_ops import (
        ohlc_windowed, q_stream_ohlc,
    )
    from ha_sqllite_2_influxdb_spark.streaming.stream import (
        drain_to_memory, events_stream,
    )

    got = sorted(map(tuple, drain_to_memory(
        ohlc_windowed(events_stream(spark, sf_dir)),
        f"ohlc_{uuid.uuid4().hex[:8]}",
    ).collect()))
    want = sorted(map(tuple, q_stream_ohlc(spark, sf_dir).collect()))
    assert got == want


def test_flatline_stream_run_spans_batches_emits_once(spark, tmp_path):
    """A flatline run that SPANS two micro-batches closes in batch 2 and
    is emitted exactly once with the full cross-batch length; the
    still-open trailing run is never emitted."""
    import os

    from ha_sqllite_2_influxdb_spark.streaming.runs import (
        flatline_per_series,
    )
    from ha_sqllite_2_influxdb_spark.streaming.stream import drain_to_memory

    src = str(tmp_path / "pts")
    os.makedirs(src)
    sch = ("measurement string, domain string, entity_id string, "
           "ts_epoch double, value double")
    # series e: 7.0 at t=0..2 (batch 1) then 7.0 at t=3,4 (batch 2),
    # change to 9.0 at t=5 closes a 5-long run; 9.0 stays open forever.
    # series f: all distinct values — silent.
    b1 = [("m", "d", "e", float(t), 7.0) for t in range(3)] + \
         [("m", "d", "f", float(t), float(t)) for t in range(3)]
    b2 = [("m", "d", "e", 3.0, 7.0), ("m", "d", "e", 4.0, 7.0),
          ("m", "d", "e", 5.0, 9.0), ("m", "d", "e", 6.0, 9.0),
          ("m", "d", "f", 3.0, 30.0)]
    spark.createDataFrame(b1, sch).coalesce(1).write.parquet(f"{src}/f1")
    spark.createDataFrame(b2, sch).coalesce(1).write.parquet(f"{src}/f2")

    sdf = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = drain_to_memory(
        flatline_per_series(sdf, min_run=4), "flat_t",
        output_mode="append",
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.entity_id, r.run_start, r.run_end, r.run_len, r.value) \
        == ("e", 0.0, 4.0, 5, 7.0)


def test_staged_fixture_dir_atomic_and_ordered(spark, tmp_path):
    """ADVICE r7: stream fixtures must appear atomically (a crashed
    build leaves NO directory at the target, so no later run consumes a
    partial fixture) and with explicit strictly-increasing per-stage
    mtimes (arrival order is a property of the fixture, not of write
    timing)."""
    import os

    from ha_sqllite_2_influxdb_spark.streaming.stream import (
        staged_fixture_dir,
    )

    base = str(tmp_path / "nested" / "fix")

    def w(lo, hi, path):
        (spark.range(lo, hi).coalesce(1)
         .write.mode("overwrite").parquet(path))

    # a writer that crashes mid-build must leave base_dir absent
    def boom(path):
        raise RuntimeError("simulated crash")

    try:
        staged_fixture_dir(base, [lambda p: w(0, 3, p), boom])
    except RuntimeError:
        pass
    assert not os.path.isdir(base), "partial fixture leaked into place"
    import glob as _glob
    assert not _glob.glob(base + ".tmp-*"), (
        "crashed build leaked its scratch tree")

    got = staged_fixture_dir(
        base, [lambda p: w(0, 3, p), lambda p: w(3, 5, p),
               lambda p: w(5, 6, p)])
    assert got == base
    files = sorted(f for f in os.listdir(base) if not f.startswith("_"))
    assert [f.split("-")[1] for f in files] == ["0000", "0001", "0002"]
    mtimes = [os.stat(os.path.join(base, f)).st_mtime_ns for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == len(mtimes)
    # complete dir is trusted as-is: a second call is a no-op cache hit
    assert staged_fixture_dir(base, [boom]) == base
    # and the full content equals the union of the stages
    assert spark.read.parquet(base).count() == 6


def test_stateful_closures_unpickle_without_package():
    """r11 hermeticity audit pin: the state functions handed to
    applyInPandasWithState / transformWithStateInPandas must
    cloudpickle-round-trip in a subprocess WITHOUT this repo on
    sys.path (the executor-without-PYTHONPATH scenario). A module-level
    function reference inside one (the bug class this round fixed in
    tws/runs/forecast) fails here with ModuleNotFoundError instead of
    on executor 1 of 1000. Unpickling alone is the gate — that is the
    moment the worker resolves import references."""
    import base64
    import subprocess
    import sys

    from pyspark import cloudpickle

    from ha_sqllite_2_influxdb_spark.streaming import runs, tws

    targets = {
        "ema_legacy": tws._make_legacy_fn(),
        "ema_tws": tws._make_tws_processor(),
        "flatline_legacy": runs._legacy_fn_factory(5),
        "flatline_tws": runs._make_tws_processor(5),
        "hyst_legacy": runs._hyst_legacy_fn_factory(100.0, 30.0),
        "hyst_tws": runs._make_hyst_tws_processor(100.0, 30.0),
    }
    lines = ["import base64, pickle"]
    for name, obj in targets.items():
        blob = base64.b64encode(cloudpickle.dumps(obj)).decode()
        lines.append(f"pickle.loads(base64.b64decode('{blob}'))\n"
                     f"print('OK {name}')")
    r = subprocess.run([sys.executable, "-c", "\n".join(lines)],
                       capture_output=True, text=True, cwd="/tmp")
    assert r.returncode == 0, r.stderr.strip().splitlines()[-3:]
    assert r.stdout.count("OK ") == len(targets)
