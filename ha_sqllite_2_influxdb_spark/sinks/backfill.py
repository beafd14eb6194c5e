"""Incremental backfill orchestration (T1, SURVEY §2.8).

The reference's control flow (main, sqllite2influxdb.py:163-199):

1. probe the sink for its oldest point (:169, get_oldest_influx_timestamp)
2. migrate only source rows strictly older than that boundary (:173-174)
3. re-running is therefore idempotent — the second run finds the boundary
   at the true minimum and writes nothing.

We implement the *intended* typed comparison, not the REAL<TEXT no-op the
reference actually executes (SURVEY §2.2 P2 quirk).

Spark shape: two jobs. Job 1 is a min-aggregate over the sink (partial
min per partition → one scalar at the driver — the only driver-side value
in the pipeline, same as the reference's one-row Flux probe). Job 2 is the
migration scan with the boundary as a *literal* in the filter, so Catalyst
pushes it into the parquet scan (partition/row-group pruning at scale);
``repartitionByRange + sortWithinPartitions`` reproduces the reference's
oldest-first write order per sink writer (O1) without a global sort.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def sink_boundary(spark: SparkSession, sink_dir: str) -> float | None:
    """Oldest point already in the sink (S5/A1), None if the sink is empty.

    Mirrors get_oldest_influx_timestamp (:54-69) including the
    empty/missing-bucket → None path (:67-69).
    """
    if not os.path.isdir(sink_dir) or not any(
        f.endswith(".parquet") for f in os.listdir(sink_dir)
    ):
        return None
    row = spark.read.parquet(sink_dir).agg(F.min("ts_epoch")).first()
    return None if row[0] is None else float(row[0])


def backfill_once(spark: SparkSession, points_df: DataFrame,
                  sink_dir: str, n_writers: int = 8) -> int:
    """One probe-then-migrate cycle; returns rows written.

    ``points_df`` is the full candidate point set (operators.transform
    .points output). Rows >= the sink's oldest timestamp are already
    covered and skipped (P2, intended semantics).
    """
    boundary = sink_boundary(spark, sink_dir)
    todo = points_df
    if boundary is not None:
        # literal, not a join: Catalyst folds it into the scan's pushed
        # filters — at 100 TB this prunes whole partitions/row groups
        todo = todo.filter(F.col("ts_epoch") < F.lit(boundary))
    from pyspark.sql import Observation

    todo = todo.repartitionByRange(n_writers, "ts_epoch") \
               .sortWithinPartitions("ts_epoch")
    obs = Observation("backfill")
    counted = todo.observe(obs, F.count(F.lit(1)).alias("n"))
    counted.write.mode("append").parquet(sink_dir)
    return int(obs.get["n"])
