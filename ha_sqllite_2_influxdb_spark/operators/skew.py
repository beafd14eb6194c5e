"""Skew-resilience operators: salted join and two-phase aggregation.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin``) repairs
sort-merge joins at runtime, but two shapes still need explicit salting
at 100 TB:

- a shuffle join whose hot key exceeds a single task even after AQE
  splitting of the probe side (the build side row group for that key is
  itself huge) → `salted_join` replicates the small side so the hot
  key's rows spread over ``n_salts`` reducers;
- an aggregation onto very few groups (global distinct counts, top-level
  rollups) where every row of a hot group converges on one reducer →
  `two_phase_distinct` spreads phase one over a high-cardinality
  composite key and reduces per-group state to one row per distinct
  value before the tiny final shuffle.

Salts are DETERMINISTIC (hash of the row's own columns, not random/rand)
so task retries and speculative execution reproduce identical output —
a correctness requirement, not a style choice: a rand() salt silently
corrupts results when a lost shuffle block is recomputed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SALT = "__salt"


# joins where an unmatched small-side row is dropped (inner/semi), kept
# exactly once on the BIG side (left/anti), or never emitted from the
# small side — i.e. salting the small side cannot change the output.
# right/full outer would emit every unmatched exploded small row n_salts
# times, silently duplicating output vs the plain join.
_SALT_SAFE_JOINS = frozenset(
    {"inner", "cross", "left", "leftouter", "left_outer",
     "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
)


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join where ``key`` is skewed on the ``big`` side.

    The big side gets a deterministic salt in [0, n_salts) hashed from
    ALL its columns; the small side is exploded ``n_salts``× so every
    (key, salt) combination exists. The join key becomes (key, salt) —
    a hot key's rows now land on ``n_salts`` reducers instead of one.
    Cost: small side bytes × n_salts, the standard trade.

    ``how`` is restricted to salt-invariant join types: for right/full
    outer joins each unmatched small row would survive once PER SALT,
    duplicating output n_salts× vs the unsalted join.
    """
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in _SALT_SAFE_JOINS
    }:
        raise ValueError(
            f"salted_join does not support how={how!r}: right/full outer "
            "joins emit each unmatched small-side row once per salt; "
            f"use one of {sorted(_SALT_SAFE_JOINS)}"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                  F.lit(n_salts)).cast("int")
    big_s = big.withColumn(SALT, salt)
    small_s = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, [key, SALT], how).drop(SALT)


def two_phase_distinct(df: DataFrame, group_col: str,
                       distinct_col: str) -> DataFrame:
    """Exact count-distinct per (few, hot) groups without a hot reducer.

    Phase 1 shuffles on the high-cardinality (group, value) pair and
    dedups; phase 2 counts the deduped rows per group — each phase-1
    reducer holds a slice of a group's values, never the whole group.
    This is the exact-tier counterpart of approx_count_distinct (HLL)
    for when the answer must be exact at 100 TB.
    """
    return (
        df.select(group_col, distinct_col)
        .distinct()
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias(f"n_distinct_{distinct_col}"))
    )


def skew_report(df: DataFrame, keys: list[str],
                top_n: int = 5) -> DataFrame:
    """Shuffle-key skew diagnostics — MEASURE before you salt: per-key
    row counts reduced to the numbers that predict straggler tasks
    (max/mean ratio ≈ the slowdown a key-hashed shuffle eats; the top
    keys are the salting candidates).

    One partial-aggregated groupBy on the key (map-side combine makes
    the counted relation ~|distinct keys|); everything after runs on
    that small relation — the rank window and the global moments ride
    its exchange. Emits top_n rows (rank, key, count, share) plus the
    aggregate row (rank 0): n_keys, max/mean ratio. All integer counts
    → oracle-exact.
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    key_str = F.concat_ws("\x1f", *[F.col(k).cast("string")
                                    for k in keys])
    w = Window.orderBy(F.desc("cnt"), key_str)
    wall = Window.partitionBy()
    ranked = counts.select(
        key_str.alias("key"), "cnt",
        F.row_number().over(w).alias("rank"),
        F.sum("cnt").over(wall).alias("_total"),
        F.count(F.lit(1)).over(wall).alias("_nkeys"),
        F.max("cnt").over(wall).alias("_max"),
    )
    top = ranked.filter(F.col("rank") <= top_n).select(
        "rank", "key", "cnt",
        (F.col("cnt").cast("double") / F.col("_total"))
        .alias("share"),
    )
    summary = ranked.filter(F.col("rank") == 1).select(
        F.lit(0).alias("rank"),
        F.lit("__summary__").alias("key"),
        F.col("_nkeys").alias("cnt"),
        (F.col("_max").cast("double")
         * F.col("_nkeys").cast("double")
         / F.col("_total").cast("double")).alias("share"),
    )
    return top.unionByName(summary)
