"""Upsert / data-layout operators.

- **upsert_latest** — MERGE-INTO semantics without a table format:
  latest-version-wins reconciliation of an updates batch into a base
  relation. Spark has no MERGE on plain parquet; the scalable shape is
  union + ONE windowed rank per key (a single shuffle on the merge key).
  This generalizes the reference's T1 incremental backfill (append-only,
  boundary-filtered — `/root/reference/sqllite2influxdb.py:80-90`) to
  in-place updates, which a 100 TB ingest pipeline needs for late
  corrections. At scale the window partitioning matches the key shuffle,
  so there is no second exchange; compaction of the winner set back into
  partitioned storage is the same `repartitionByRange` write the sinks
  already use.

- **agg_state / merge_agg_states / finalize_agg** — incremental
  materialized-view maintenance: per-key partial aggregate states
  (count / fixed-point sum / min / max, all commutative monoids) merged
  by a groupBy over STATE rows, so a refresh scans only the delta shard.
  The same algebra Spark uses internally for partial aggregation,
  surfaced as a persistable cross-batch artifact.

- **zorder_key** — bit-interleaved (Morton) sort key over two bounded
  integer dimensions. Sorting/range-partitioning by this key co-locates
  rows that are close in BOTH dimensions, so min/max pruning (parquet
  row-group stats, partition bounds) cuts scans for predicates on either
  column — the standard multi-dimensional layout trick Delta/Iceberg
  expose as OPTIMIZE ZORDER, expressed here as a pure column expression
  (shift/mask/or only, so any engine reproduces it bit-identically).
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

ZBITS = 16


def upsert_latest(base: DataFrame, updates: DataFrame,
                  keys: list[str], version_col: str) -> DataFrame:
    """Latest-wins merge: for every key, keep the row with the highest
    ``version_col``; on a version tie the updates side wins (the MERGE
    convention — an idempotent re-apply of the same batch is a no-op).

    Both inputs must share a schema. `_src` disambiguates ties and is
    dropped from the output.
    """
    tagged = base.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    w = W.partitionBy(*keys).orderBy(
        F.desc(version_col), F.desc("_src")
    )
    return (
        tagged.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "_src")
    )


def latest_per_key(df: DataFrame, keys: list[str],
                   order_cols: list[str]) -> DataFrame:
    """Arg-max per key under the total order ``order_cols`` (descending,
    left-to-right significance): ONE windowed rank on the key shuffle.

    Because the winner under a total order is associative and
    commutative, this reduction can be applied per-micro-batch and then
    across batches (see streaming.stream.drain_upsert) and still equal
    the one-shot batch result — the algebraic property that makes the
    streaming upsert sink idempotent under replay.
    """
    w = W.partitionBy(*keys).orderBy(*[F.desc(c) for c in order_cols])
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def agg_state(facts: DataFrame, keys: list[str], value_col: str,
              scale: int = 100) -> DataFrame:
    """Per-key PARTIAL aggregate state: (n, sum, min, max) with the sum
    held as ``scale``-fixed-point integers (associative — merge order
    cannot flip low bits).

    This is the building block of incremental materialized-view
    maintenance: every component is a commutative monoid, so the state
    of ``base ∪ delta`` equals the monoid-merge of the two states
    (`merge_agg_states`) — a 100 TB rolling aggregate refresh then costs
    one scan of the DELTA plus a groupBy over state rows (|keys| of
    them), never a recompute of the base facts.
    """
    cents = F.round(F.col(value_col).cast("double") * scale).cast("long")
    return facts.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("sum_c"),
        F.min(cents).alias("min_c"),
        F.max(cents).alias("max_c"),
    )


def merge_agg_states(states: list[DataFrame],
                     keys: list[str]) -> DataFrame:
    """Monoid-merge partial states: one groupBy over the (tiny) union of
    state relations. n/sum merge by +, min/max by min/max."""
    merged = reduce(lambda a, b: a.unionByName(b), states)
    return merged.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_c").alias("sum_c"),
        F.min("min_c").alias("min_c"),
        F.max("max_c").alias("max_c"),
    )


def finalize_agg(state: DataFrame, scale: int = 100) -> DataFrame:
    """Resolve the fixed-point state to user-facing doubles. avg divides
    the exact integer sum once (identical IEEE result in any engine)."""
    return state.select(
        *[c for c in state.columns
          if c not in ("n", "sum_c", "min_c", "max_c")],
        F.col("n"),
        (F.col("sum_c").cast("double") / scale).alias("sum_value"),
        (F.col("min_c").cast("double") / scale).alias("min_value"),
        (F.col("max_c").cast("double") / scale).alias("max_value"),
        (F.col("sum_c").cast("double") / scale / F.col("n").cast("double"))
        .alias("avg_value"),
    )


def zorder_key(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    ints: bit b of x lands at position 2b, bit b of y at 2b+1.

    Pure shift/mask/or chain — constant-folds per row inside whole-stage
    codegen and reproduces exactly in any engine with integer bit ops
    (the oracle generates the same 2·bits-term expression).
    """
    terms = []
    for b in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
        )
        terms.append(
            F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return reduce(add, terms).cast("long")


def zorder_layout(df: DataFrame, x_col: str, y_col: str,
                  bits: int = ZBITS) -> DataFrame:
    """Attach the z-key and range-partition by it — the write-side layout
    step: each output partition then covers a compact rectangle in
    (x, y) space, so parquet min/max stats prune on both columns."""
    keyed = df.withColumn(
        "zkey", zorder_key(F.col(x_col), F.col(y_col), bits)
    )
    n_part = df.sparkSession.sparkContext.defaultParallelism
    return keyed.repartitionByRange(n_part, "zkey") \
                .sortWithinPartitions("zkey")
