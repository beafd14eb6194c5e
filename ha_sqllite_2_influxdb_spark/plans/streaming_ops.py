"""Streaming-semantics query surface, verified in batch form.

The transformations in `..streaming.stream` are mode-agnostic DataFrame
expressions; here they run over the batch events table so the DuckDB
oracle can check values (the stream-drain == batch identity is asserted
in tests/test_streaming.py with real readStream/writeStream runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from ..streaming.stream import windowed_agg


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: tumbling 1-hour event-time window (+watermark, no-op in batch)."""
    return windowed_agg(load_table(spark, sf_dir, "events"))


QUERIES = {
    "events_hourly": q_events_hourly,
}

ORACLES = {
    "events_hourly": """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, sum(value) AS sum_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
}
