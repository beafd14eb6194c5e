"""Parquet table loading for the driver's synthetic star schema.

Maps the reference's source role (SQLite scan, sqllite2influxdb.py:33-42,
80-90) onto ``spark.read.parquet`` — the declarative scan Catalyst can push
filters/projections into. The reference's cursor batching
(``fetchmany(BATCH_SIZE)``, :183-188) has no analog here: Spark partitions
ARE the batches, sized by ``spark.sql.files.maxPartitionBytes``.

Timestamp normalization: the driver writes ``events.ts`` as parquet
TIMESTAMP(NANOS). Spark 4 reads that only as long (with
``spark.sql.legacy.parquet.nanosAsLong=true``); DuckDB truncates nanos to
micros. We convert with a truncating integer division so both engines see
identical microsecond timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# columns stored as TIMESTAMP(NANOS) that surface as long under nanosAsLong
_NANO_TS_COLS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    for c in _NANO_TS_COLS.get(name, []):
        if dict(df.dtypes).get(c) == "bigint":
            # truncate ns → µs exactly like DuckDB's parquet reader
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"cast({c} div 1000 as bigint)")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL API surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
