"""Small-file compaction — the maintenance operator every long-running
ingest pipeline needs (streaming micro-batches and incremental backfills
both emit many small parquet files; scan cost then becomes per-file
overhead, not bytes).

Spark-first shape: ONE pass — read the directory, `repartitionByRange`
on the sort key into ceil(bytes / target_file_bytes) partitions,
`sortWithinPartitions`, write to a fresh generation directory, then
atomically swap a pointer file (no table format available; Delta/Iceberg
OPTIMIZE is this exact operation with a manifest instead of the
pointer). Range partitioning keeps the output files key-clustered, so
parquet min/max stats prune on the sort key after compaction — the same
property the zorder layout provides for two dimensions.

Correctness: the swap is a rename of a one-line pointer file —
readers resolve the pointer first, so they see the old generation or
the new one, never a mix; re-running compaction is idempotent (same
input → same output generation content).
"""

from __future__ import annotations

import math
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def plan_compaction(path: str, target_file_bytes: int) -> int:
    """Number of output files: ceil(current parquet bytes / target),
    minimum 1. Driver-side directory stat only — no data read."""
    return max(1, math.ceil(_dir_bytes(path) / target_file_bytes))


def compact(spark: SparkSession, table_dir: str, sort_key: str,
            target_file_bytes: int = 128 * 1024 * 1024) -> str:
    """Compact ``table_dir/current`` (resolved via ``table_dir/POINTER``,
    else the directory itself on first run) into a new generation with
    ~``target_file_bytes`` files, sorted by ``sort_key``. Returns the new
    generation path after atomically updating the pointer."""
    pointer = os.path.join(table_dir, "POINTER")
    if os.path.exists(pointer):
        with open(pointer) as fh:
            src = fh.read().strip()
    else:
        src = table_dir
    n_files = plan_compaction(src, target_file_bytes)
    gen = os.path.join(table_dir, f"gen-{uuid.uuid4().hex[:12]}")
    df = spark.read.parquet(src)
    (
        df.repartitionByRange(n_files, sort_key)
        .sortWithinPartitions(sort_key)
        .write.mode("overwrite").parquet(gen)
    )
    tmp = pointer + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(gen)
    os.replace(tmp, pointer)  # atomic on POSIX
    return gen


def read_current(spark: SparkSession, table_dir: str) -> DataFrame:
    """Reader side: resolve the pointer (old or new generation, never a
    mix), falling back to the raw directory before first compaction."""
    pointer = os.path.join(table_dir, "POINTER")
    if os.path.exists(pointer):
        with open(pointer) as fh:
            return spark.read.parquet(fh.read().strip())
    return spark.read.parquet(table_dir)
