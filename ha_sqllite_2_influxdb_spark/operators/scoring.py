"""Hashed-feature linear quality classifier (fastText-style scoring).

Production training-data pipelines gate documents with a cheap linear
classifier over hashed word n-grams (fastText / CCNet-style quality
filters): features are word unigrams + adjacent bigrams, each hashed into
a fixed bucket space, and the document score is the mean of the bucket
weights — no vocabulary, no model file, O(tokens) per document.

Spark-first shape: the whole operator is a per-row column expression
(split → hash → weight lookup → fold), so the plan has NO shuffle and no
Python — it scales to 100 TB as a pure map stage fused into whatever scan
feeds it. The weight table is a pure function of the bucket id (an affine
mix), which stands in for a broadcast weight array: swapping in learned
weights means replacing `_bucket_weight` with `F.element_at(lit(weights),
bucket + 1)` over a broadcast literal — the plan shape is identical.

Two hash tiers, mirroring operators.dedup:
- portable=True  → 31-base rolling `char_hash` (DuckDB-reproducible, the
  oracle-checked tier);
- portable=False → `xxhash64` (JVM codegen, what a real cluster runs).

Reference scope: the reference engine (sqllite2influxdb.py) has no text
scoring; this extends the engine for LLM-corpus curation per the build
brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import char_hash

N_BUCKETS = 4096
_MIX = 2654435761  # Knuth multiplicative mix, shared with sampling ops
_W_RANGE = 2001    # weights are integers in [-1000, 1000]


def _bucket(feat: Column, portable: bool) -> Column:
    if portable:
        return char_hash(feat) % N_BUCKETS
    return F.pmod(F.xxhash64(feat), F.lit(N_BUCKETS)).cast("long")


def _bucket_weight(bucket: Column) -> Column:
    """Deterministic integer weight in [-1000, 1000] for a bucket id.

    bucket < 2^31 and _MIX < 2^32, so the product stays inside int64.
    """
    return (bucket * _MIX) % _W_RANGE - 1000


def quality_classify(docs: DataFrame, text_col: str = "text",
                     portable: bool = True) -> DataFrame:
    """Score every document with the hashed linear model; keep if > 0.

    Features: word unigrams + adjacent word bigrams (both hashed into the
    same bucket space, as fastText does). ``score_int`` is the integer
    sum of feature weights (exact, associative — partial aggregation
    order cannot flip bits); ``score`` is the mean weight per feature in
    [-1, 1] (one double division, bit-identical across engines).
    """
    ws = F.split(F.col(text_col), " ")
    # guard: F.sequence(0, -1) would produce a DESCENDING range for a
    # 1-word doc, so the bigram list is explicitly empty below 2 words
    bigrams = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - 2),
            lambda i: F.concat_ws(" ", F.get(ws, i), F.get(ws, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(ws, bigrams)
    weights = F.transform(feats, lambda e: _bucket_weight(_bucket(e, portable)))
    score_int = F.aggregate(
        weights, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return (
        docs.select(
            "doc_id",
            score_int.alias("score_int"),
            F.size(feats).cast("long").alias("n_features"),
        )
        .withColumn(
            "score",
            F.col("score_int").cast("double")
            / (F.col("n_features") * F.lit(1000)).cast("double"),
        )
        .withColumn("keep", F.col("score_int") > 0)
    )
