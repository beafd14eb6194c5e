"""Parquet table loading for the driver's synthetic star schema.

Maps the reference's source role (SQLite scan, sqllite2influxdb.py:33-42,
80-90) onto ``spark.read.parquet`` — the declarative scan Catalyst can push
filters/projections into. The reference's cursor batching
(``fetchmany(BATCH_SIZE)``, :183-188) has no analog here: Spark partitions
ARE the batches, sized by ``spark.sql.files.maxPartitionBytes``.

Timestamp normalization: the driver has shipped timestamps in two parquet
physical forms across rounds — TIMESTAMP(NANOS) (Spark 4 reads it only as
long, under ``spark.sql.legacy.parquet.nanosAsLong=true``; we ns→µs
truncate like DuckDB) and micros WITHOUT the UTC-adjusted flag (Spark 4
infers TIMESTAMP_NTZ, which epoch functions reject; we disable
``inferTimestampNTZ`` / cast to TIMESTAMP under the UTC session tz).
Both normalizations converge on ts: TIMESTAMP with DuckDB-identical
microsecond values, whichever form the data arrives in.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# columns stored as TIMESTAMP(NANOS) that surface as long under nanosAsLong
_NANO_TS_COLS = {"events": ["ts"]}

# (applicationId, session identity, path) -> (stamp, session, DataFrame).
# A DataFrame is an immutable logical plan, so reusing it is exactly
# re-declaring the same scan — but building it costs ~100 ms of
# file listing + footer schema + dtypes analysis per call, paid by
# EVERY query's plan construction. The stamp mirrors
# streaming.stream._SCHEMA_CACHE (ADVICE r5 #3): a regenerated fixture
# under the SAME path evicts the stale entry instead of serving
# yesterday's schema. id(spark) is in the key because sibling sessions
# (spark.newSession()) share one applicationId but have separate
# catalogs and runtime confs — a DataFrame bound to session A must
# never serve session B (the cached DF holds a reference to its
# session, so the id cannot be recycled while the entry lives).
#
# Lifecycle (ADVICE r8): a cached DataFrame pins its SparkSession, and
# a WeakKeyDictionary can't break that (the value references the key,
# the classic weakref cycle), so instead every insert sweeps entries
# whose session has been STOPPED — the only state in which an entry is
# both useless and a leak — and a hard size bound evicts
# oldest-inserted as a backstop for pathological many-live-session use.
_TABLE_CACHE: dict[
    tuple[str, int, str], tuple[int, SparkSession, DataFrame]] = {}
_TABLE_CACHE_MAX = 256


def _session_stopped(spark: SparkSession) -> bool:
    try:
        return spark.sparkContext._jsc is None
    except Exception:
        return True


def _sweep_cache() -> None:
    dead = [k for k, (_, sess, _) in _TABLE_CACHE.items()
            if _session_stopped(sess)]
    for k in dead:
        del _TABLE_CACHE[k]
    # >= because the sweep runs BEFORE the caller's insert — the cache
    # must end the insert at no more than _TABLE_CACHE_MAX entries
    while len(_TABLE_CACHE) >= _TABLE_CACHE_MAX:
        _TABLE_CACHE.pop(next(iter(_TABLE_CACHE)))


def _stamp(path: str) -> int | None:
    """Change stamp for a parquet file OR directory: the entry's own
    mtime plus each child's name and mtime, recursing one level into
    child directories (partitioned layouts like ``key=v/part.parquet``)
    — an in-place overwrite of a part file changes a child mtime
    without touching the directory entry set, and must still evict.
    Deeper-than-two nesting is outside the stamp's reach; such layouts
    should bypass the cache (none of the driver fixtures nest). Returns
    None when the path cannot be statted locally (file:/hdfs:/s3: URIs
    Spark can read but os.stat cannot): those loads BYPASS the cache
    entirely rather than caching forever under a sentinel."""
    try:
        st = os.stat(path)
        h = st.st_mtime_ns
        if os.path.isdir(path):
            for entry in sorted(os.listdir(path)):
                child = os.path.join(path, entry)
                h = hash((h, entry, os.stat(child).st_mtime_ns))
                if os.path.isdir(child):
                    for sub in sorted(os.listdir(child)):
                        h = hash((h, sub,
                                  os.stat(os.path.join(child, sub))
                                  .st_mtime_ns))
        return h
    except OSError:
        return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # configure BEFORE the cache lookup (ADVICE r8): the runtime confs
    # (session tz, AQE, excluded rules) govern EXECUTION of the cached
    # plan, not just its construction — if anything reset them between
    # calls, a cache hit must still re-pin them. Cost: six conf.set
    # py4j calls, ~1 ms.
    configure(spark)
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    key = (spark.sparkContext.applicationId, id(spark), path)
    stamp = _stamp(path)
    hit = _TABLE_CACHE.get(key) if stamp is not None else None
    if hit is not None and hit[0] == stamp:
        return hit[2]
    df = spark.read.parquet(path)
    for c in _NANO_TS_COLS.get(name, []):
        if dict(df.dtypes).get(c) == "bigint":
            # truncate ns → µs exactly like DuckDB's parquet reader
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"cast({c} div 1000 as bigint)")))
    # Defensive: if inferTimestampNTZ couldn't be disabled on this session
    # (static conf), normalize any NTZ column to TIMESTAMP. Session tz is
    # pinned UTC, so the cast reinterprets the same wall-clock instant that
    # DuckDB's naive reader sees — epoch math stays engine-identical.
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    if stamp is not None:
        _sweep_cache()
        _TABLE_CACHE[key] = (stamp, spark, df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL API surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
