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
