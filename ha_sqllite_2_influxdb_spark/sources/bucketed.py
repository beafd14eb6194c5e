"""Bucketed-table writes for co-located (zero-shuffle) joins.

At 100 TB the dominant recurring cost of a star-schema workload is
re-shuffling the fact table for every key join. Bucketing pays that
shuffle ONCE at write time: ``bucketBy(n, key)`` hash-splits each output
partition into n files by key, and every later equi-join or aggregation
on that key reads co-located buckets — the physical plan has NO Exchange
on the bucketed side (asserted in tests/test_bucketing.py).

Sizing rule: n_buckets ≈ table_bytes / (executor-digestible ~128-256 MB);
both join sides need the SAME bucket count (or an integer multiple with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, path: str, key: str,
                   n_buckets: int) -> None:
    """Write ``df`` as an external parquet table bucketed+sorted by key."""
    (
        df.write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back through the catalog — bucket metadata only survives the
    table API (a plain ``spark.read.parquet(path)`` loses it)."""
    return spark.table(table)
