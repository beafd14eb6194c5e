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


def _feature_array(ws: Column) -> Column:
    """Word unigrams + adjacent word bigrams from an already-projected
    word-array column (the fastText / DSIR feature set) — shared by the
    quality classifier and the DSIR fit/score passes.

    PERF CONTRACT: ``ws`` must be a COLUMN REFERENCE to a projected
    split, never an inline ``F.split(...)`` expression. HOF lambdas are
    interpreted and do not subexpression-eliminate, so an inline split
    is re-evaluated on every ``F.get(ws, i)`` access — O(words²) per
    document (measured 6.7× slower at sf0.1). A separate projection is
    safe from CollapseProject because the alias is referenced more than
    once."""
    # guard: F.sequence(0, -1) would produce a DESCENDING range for a
    # 1-word doc, so the bigram list is explicitly empty below 2 words
    bigrams = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - 2),
            lambda i: F.concat_ws(" ", F.get(ws, i), F.get(ws, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(ws, bigrams)


def _with_features(docs: DataFrame, text_col: str,
                   *keep: str) -> DataFrame:
    """Project the split + feature array in two stages (split → feats)
    so neither is recomputed inside downstream HOF lambdas."""
    ws = docs.select(*keep, F.split(F.col(text_col), " ").alias("_ws"))
    return ws.select(*keep, _feature_array(F.col("_ws")).alias("_feats"))


def quality_classify(docs: DataFrame, text_col: str = "text",
                     portable: bool = True) -> DataFrame:
    """Score every document with the hashed linear model; keep if > 0.

    Features: word unigrams + adjacent word bigrams (both hashed into the
    same bucket space, as fastText does). ``score_int`` is the integer
    sum of feature weights (exact, associative — partial aggregation
    order cannot flip bits); ``score`` is the mean weight per feature in
    [-1, 1] (one double division, bit-identical across engines).
    """
    feats = F.col("_feats")
    weights = F.transform(feats, lambda e: _bucket_weight(_bucket(e, portable)))
    score_int = F.aggregate(
        weights, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return (
        _with_features(docs, text_col, "doc_id")
        .select(
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


# --------------------------------------------------------------- DSIR

_PAIR_MIX = 1000003  # prime combiner for bigram buckets (wh < 2^31, so
#                      wh * _PAIR_MIX + wh' stays far inside int64)


def _dsir_bucket_cols(docs: DataFrame, text_col: str, portable: bool,
                      *keep) -> DataFrame:
    """Project each doc's DSIR feature BUCKET array, hashing every word
    exactly once: unigram bucket = wh % N_BUCKETS, bigram bucket =
    ((wh_i·_PAIR_MIX + wh_{i+1}) % HASH_MOD) % N_BUCKETS over the
    word-hash array. Hashing words (not feature strings) cuts the hash
    work ~3× — bigrams never materialize as strings — and each stage
    (_ws → _wh → buckets) is its own projection so interpreted HOF
    lambdas never re-evaluate an upstream expression (see
    _feature_array's PERF CONTRACT)."""
    from .text import HASH_MOD

    if portable:
        def wh1(w):
            return char_hash(w)
    else:
        def wh1(w):
            return F.pmod(F.xxhash64(w), F.lit(HASH_MOD)).cast("long")

    wh = F.col("_wh")
    uni = F.transform(wh, lambda h: h % N_BUCKETS)
    big = F.when(
        F.size(wh) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(wh) - 2),
            lambda i: ((F.get(wh, i) * _PAIR_MIX + F.get(wh, i + 1))
                       % HASH_MOD) % N_BUCKETS,
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        docs.select(*keep, F.split(F.col(text_col), " ").alias("_ws"))
        .select(*keep, F.transform(F.col("_ws"), wh1).alias("_wh"))
        .select(*keep, F.concat(uni, big).alias("_b"))
    )


def dsir_bucket_weights(docs: DataFrame, is_target: Column,
                        text_col: str = "text",
                        portable: bool = True) -> list[int]:
    """Fit the two hashed bag-of-n-grams models of DSIR (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling") and return the per-bucket log-likelihood-ratio table.

    Features are word unigrams + adjacent bigrams, bucketed via
    _dsir_bucket_cols (each word hashed once; bigram buckets are an
    arithmetic combine of the two word hashes — no bigram string is
    ever built). One aggregation shuffle bounded by N_BUCKETS keys
    (map-side partials make the exchange ≤ partitions × 4096 rows
    regardless of corpus size), then ≤4096 rows of counts to the driver
    — the same bounded driver state as the ANN codebooks. The ratio table itself is the
    model: log((c_t+1)/(T+B)) - log((c_r+1)/(R+B)) per bucket (Laplace-
    smoothed), micro-quantized to BIGINT via floor(x*1e6 + 0.5) so the
    per-document sum downstream is integer-exact at any partitioning.
    The logs are evaluated in the DRIVER (CPython -> glibc log, the
    same libm the DuckDB oracle calls), never on executors, so the
    quantized table is reproducible cross-engine.
    """
    import math

    # explode_OUTER, then drop the (never-occurring) null rows above the
    # Generate: plain explode triggers InferFiltersFromGenerate, whose
    # inferred size(e)>0 filter gets pushed below the projections with
    # the ALIASES SUBSTITUTED — re-evaluating the whole word-hash
    # pipeline once per row (measured 29 s vs 4 s at sf0.1). The rule
    # skips outer generates, and a predicate on the generate OUTPUT
    # cannot be pushed below the Generate.
    ex = _dsir_bucket_cols(
        docs.select(is_target.alias("_is_t"), text_col),
        text_col, portable, "_is_t",
    ).select("_is_t", F.explode_outer("_b").alias("b"))
    counts = (
        ex.filter(F.col("b").isNotNull())
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c_r"),
             F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).alias("c_t"))
        .collect()
    )
    n = N_BUCKETS
    c_r, c_t = [0] * n, [0] * n
    for row in counts:
        c_r[row["b"]], c_t[row["b"]] = row["c_r"], row["c_t"]
    tot_t, tot_r = sum(c_t), sum(c_r)
    return [
        int(math.floor(
            (math.log(c_t[i] + 1) - math.log(tot_t + n)
             - math.log(c_r[i] + 1) + math.log(tot_r + n)) * 1e6 + 0.5))
        for i in range(n)
    ]


def dsir_score(docs: DataFrame, is_target: Column,
               text_col: str = "text",
               portable: bool = True) -> DataFrame:
    """DSIR importance weights per document: Σ over the doc's hashed
    n-gram features of the bucket's log-likelihood ratio (target model
    over raw model).

    Spark-first shape: after the bounded fit pass the 4096-entry ratio
    table rides the plan as a 32 KB array LITERAL (the broadcast-weight
    pattern quality_classify documents), so scoring is a pure map stage
    — split → hash → element_at → integer fold — with NO shuffle, no
    join, and no Python on the hot path; it fuses into whatever scan
    feeds it at 100 TB. ``weight_micro`` is the exact BIGINT sum;
    ``weight`` the double view (one division).

    The paper selects via Gumbel top-k (sampling ∝ exp(weight)); the
    deterministic variant here ranks by the weight itself — swap in
    seeded Gumbel noise per doc_id for sampled selection. Determinism
    is what makes the operator oracle-checkable.
    """
    lr = dsir_bucket_weights(docs, is_target, text_col, portable)
    return dsir_apply(docs, lr, text_col, portable)


def _dsir_apply_sql(lr: list[int], text_col: str,
                    portable: bool) -> str:
    """One-parse SQL text of `_dsir_apply_df` (r14, guide §1.1/§7.3):
    the chained build cost ~0.15 s/invocation of eager analysis (the
    bucket-transform lambdas are wide trees). The ratio table embeds as
    the same single-parse array literal lit_long_array builds; pinned
    plan-identical by tests/test_plans.py::
    test_bloom_and_dsir_sql_text_plan_equality."""
    from .text import HASH_MOD

    arr = ("array(" + ",".join(f"{int(v)}L" for v in lr) + ")"
           if lr else "CAST(array() AS array<bigint>)")
    if portable:
        wh = ("aggregate(split(w, ''), CAST(0 AS BIGINT), "
              "(acc, c) -> (acc * 31 + ascii(c)) % {m})").format(m=HASH_MOD)
    else:
        wh = "CAST(pmod(xxhash64(w), {m}) AS BIGINT)".format(m=HASH_MOD)
    return f"""
SELECT doc_id, n_features, weight_micro, weight_micro / 1.0E6 AS weight
FROM (
  SELECT doc_id,
         CAST(size(_b) AS BIGINT) AS n_features,
         aggregate(transform(_b, b -> element_at({arr},
                                                 CAST((b + 1) AS INT))),
                   CAST(0 AS BIGINT), (a, x) -> a + x) AS weight_micro
  FROM (
    SELECT doc_id,
           concat(transform(_wh, h -> h % {N_BUCKETS}),
                  CASE WHEN size(_wh) >= 2 THEN
                    transform(sequence(0, size(_wh) - 2),
                              i -> ((get(_wh, i) * {_PAIR_MIX}
                                     + get(_wh, i + 1)) % {HASH_MOD})
                                   % {N_BUCKETS})
                  ELSE CAST(array() AS array<bigint>) END) AS _b
    FROM (
      SELECT doc_id, transform(_ws, w -> {wh}) AS _wh FROM (
        SELECT doc_id, split({text_col}, ' ') AS _ws FROM {{docs}})
    )
  )
)
"""


def dsir_apply(docs: DataFrame, lr: list[int],
               text_col: str = "text",
               portable: bool = True) -> DataFrame:
    """Score a (possibly different) relation with an already-fit ratio
    table, as ONE SQL parse — plan-identical to `_dsir_apply_df`
    (sameResult-pinned); see _dsir_apply_sql."""
    from ..functions.sqlsplice import sql_with_plans

    return sql_with_plans(docs.sparkSession,
                          _dsir_apply_sql(lr, text_col, portable), docs=docs)


def _dsir_apply_df(docs: DataFrame, lr: list[int],
                   text_col: str = "text",
                   portable: bool = True) -> DataFrame:
    """The chained reference build the sameResult pin compares against."""
    # one SQL parse instead of 4096 py4j Literal calls — the plan-build
    # cost was 2.3 s/invocation vs 0.15 s of execution (functions/
    # litarray.py); the expression tree Catalyst sees is identical
    from ..functions.litarray import lit_long_array

    arr = lit_long_array(lr)
    per = F.transform(
        F.col("_b"),
        lambda b: F.element_at(arr, (b + 1).cast("int")),
    )
    w_micro = F.aggregate(per, F.lit(0).cast("long"), lambda a, x: a + x)
    return _dsir_bucket_cols(docs, text_col, portable, "doc_id").select(
        "doc_id",
        F.size("_b").cast("long").alias("n_features"),
        w_micro.alias("weight_micro"),
    ).withColumn("weight", F.col("weight_micro") / F.lit(1e6))
