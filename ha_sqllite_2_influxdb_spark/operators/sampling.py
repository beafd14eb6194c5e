"""Deterministic sampling for training-data pipelines (beyond-reference).

``df.sample``/``sampleBy`` draw from a per-partition RNG stream, so the
selected ROWS change with partitioning, task retries, and engine — a
training-data pipeline needs the opposite: the same row set on every run,
every engine, every cluster size. These operators decide membership from a
HASH of a stable key (Knuth multiplicative mod 100), making the sample a
pure filter:

- fully parallel, no RNG state, no shuffle;
- pushdown-friendly (a plain comparison predicate on a computed column);
- reproducible in any engine that can multiply and mod — which is what
  lets the DuckDB oracle check the exact row set.

The multiplier is odd → bijective modulo 2^64, so low-bit key patterns
(sequential ids!) spread uniformly across the 100 residues. Arithmetic
stays below 2^63 for ids < ~4e9 at the fixture scales; at true 100 TB key
ranges use ``xxhash64(key) pmod 100`` instead (same shape, engine-native
hash — kept off the oracle tier because DuckDB's hash differs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Knuth multiplicative constant (2654435761 = 2^32 / golden ratio)
KNUTH = 2_654_435_761


def bucket100(key: Column) -> Column:
    """Deterministic [0, 100) bucket for a numeric key."""
    return F.pmod(key.cast("long") * F.lit(KNUTH), F.lit(100))


def deterministic_sample(df: DataFrame, key: str, pct: int) -> DataFrame:
    """Keep ~pct% of rows, decided solely by the key's hash bucket."""
    return df.filter(bucket100(F.col(key)) < pct)


def stratified_sample(df: DataFrame, key: str, stratum: str,
                      rates: dict[str, int],
                      default_pct: int = 0) -> DataFrame:
    """Per-stratum deterministic rates (percent), e.g. downsample the
    majority class of a labeled corpus while keeping all rare strata."""
    rate = F.lit(default_pct)
    for value, pct in sorted(rates.items()):
        rate = F.when(F.col(stratum) == value, pct).otherwise(rate)
    return df.filter(bucket100(F.col(key)) < rate)


def dataset_split(df: DataFrame, key: str, val_pct: int = 5,
                  test_pct: int = 10) -> DataFrame:
    """Deterministic train/val/test assignment: the same document lands
    in the same split on every run, cluster size, and engine — the
    reproducibility contract an eval pipeline depends on (and the reason
    this is a hash assignment, not df.randomSplit). Disjoint by
    construction; a pure projection, no shuffle."""
    b = bucket100(F.col(key))
    return df.withColumn(
        "split",
        F.when(b < val_pct, "val")
         .when(b < val_pct + test_pct, "test")
         .otherwise("train"),
    )


def weighted_sample(df: DataFrame, key: str, weight: Column) -> DataFrame:
    """Quality-weighted deterministic downsampling: each row survives iff
    its hash bucket falls under ``weight``×100 (weight ∈ [0,1] per row) —
    importance sampling where better documents keep proportionally more
    mass, with zero RNG state and exact cross-engine reproducibility.
    Still a pure filter: parallel, shuffle-free, pushdown-friendly."""
    return df.filter(bucket100(F.col(key)).cast("double") < weight * 100.0)


def bucket10000(key: Column) -> Column:
    """Deterministic [0, 10000) bucket — basis-point resolution for rates
    computed from data (see `lang_rebalance`)."""
    return F.pmod(key.cast("long") * F.lit(KNUTH), F.lit(10_000))


def lang_rebalance(df: DataFrame, stratum: str = "lang",
                   key: str = "doc_id") -> DataFrame:
    """Temperature-flattened mixture sampling (T = 2, i.e. exponent ½):
    every stratum keeps rate (n_min/n_l)^½ in basis points, so
    over-represented languages downsample toward the flattened share
    while the rarest stratum keeps everything — the standard multilingual
    rebalancing move (cf. the sampling-temperature schemes of multilingual
    pretraining corpora).

    Deterministic AND cross-engine exact: membership is the hash-bucket
    filter of this module, and the rate is ``floor(10000·sqrt(mn/n))``
    where mn/n is an IEEE double division of two exact longs and sqrt is
    correctly rounded — identical bits in any engine, so the DuckDB
    oracle checks the exact row set. The stratum-count relation is tiny
    and broadcasts; the corpus side stays a pure filter (no shuffle)."""
    counts = df.groupBy(stratum).agg(F.count(F.lit(1)).alias("_n"))
    n_min = counts.agg(F.min("_n").alias("_mn"))
    rate_bp = F.floor(
        F.lit(10_000)
        * F.sqrt(F.col("_mn").cast("double") / F.col("_n").cast("double"))
    )
    return (
        df.join(F.broadcast(counts), stratum)
        .join(F.broadcast(n_min))
        .filter(bucket10000(F.col(key)) < rate_bp)
        .drop("_n", "_mn")
    )


def split_leakage_free(df: DataFrame, text_col: str = "text",
                       val_pct: int = 5, test_pct: int = 10) -> DataFrame:
    """Train/val/test split keyed on CONTENT, not id: every copy of the
    same text lands in the same split, so exact duplicates can never sit
    on both sides of a train/eval boundary (the eval-leakage failure
    mode an id-keyed split cannot prevent). Near-duplicate co-location
    needs cluster labels — pair with `neardup_clusters` and split on the
    cluster id; this exact tier stays a pure projection.

    The content key is the portable rolling hash (`text.char_hash`), so
    the DuckDB oracle reproduces the exact assignment; at 100 TB swap in
    ``xxhash64(text)`` — same shape, engine-native hash."""
    from .text import char_hash

    b = bucket100(char_hash(F.col(text_col)))
    return df.withColumn(
        "split",
        F.when(b < val_pct, "val")
         .when(b < val_pct + test_pct, "test")
         .otherwise("train"),
    )
