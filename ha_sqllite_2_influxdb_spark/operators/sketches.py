"""Misra–Gries heavy hitters: bounded-state top-k without a full-vocab
shuffle, plus an exact recount pass (the candidate-then-verify pattern).

The built-in sketch tiers (`approx_count_distinct` HLL++,
`percentile_approx` GK) cover distincts and quantiles; this adds the
third classic: FREQUENT ITEMS. At 100 TB a `groupBy(token).count()`
shuffles one row per distinct token — fine for a 31-word fixture,
ruinous for a web-crawl vocabulary. Misra–Gries keeps at most ``m``
counters per partition (decrement-all when full), shuffles only the
P·m summary rows, and guarantees every item with global count
> n/(m+1) survives into some partition summary.

Stages:
1. per-partition MG summaries — one Arrow `mapInPandas` pass, O(m)
   state per partition regardless of corpus size;
2. candidate union — a groupBy over the TINY summary relation
   (≤ P·m rows);
3. exact recount of the candidates — a map-side broadcast hash-set
   filter feeding a groupBy whose key space is the candidate set, so
   the second corpus pass shuffles ≤ |candidates| groups.

The recount makes the reported counts EXACT; the result equals the
true top-k whenever the k-th true count exceeds n/(m+1) (the MG
guarantee — asserted on a synthetic adversarial corpus in
tests/test_sketches.py, where m < vocab forces the decrement path).

Reference scope: no counterpart in the reference engine
(sqllite2influxdb.py); part of the LLM-corpus analysis surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition_summaries(token_col: str, m: int):
    """mapInPandas fn: one Misra–Gries summary per partition."""

    def summarize(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for tok in pdf[token_col]:
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < m:
                    counters[tok] = 1
                else:
                    # decrement-all; drop zeros (the classic MG step)
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame(
                {"token": list(counters), "est": list(counters.values())}
            )

    return summarize


def heavy_hitters(tokens: DataFrame, token_col: str = "token",
                  m: int = 1024, k: int = 20) -> DataFrame:
    """Top-k tokens by EXACT count, found via MG candidates + recount.

    ``tokens``: one row per token occurrence. Output: (token, n, rank),
    rank by (count desc, token asc) — deterministic under ties.
    """
    summaries = tokens.select(F.col(token_col).alias("token")).mapInPandas(
        _mg_partition_summaries("token", m), "token string, est long"
    )
    candidates = summaries.groupBy("token").agg(F.sum("est").alias("_est"))
    # exact recount: broadcast the bounded candidate set back over the
    # corpus as a LeftSemi hash filter (never the corpus side)
    recount = (
        tokens.select(F.col(token_col).alias("token"))
        .join(F.broadcast(candidates.select("token")), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return (
        recount.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def corpus_bigram_heavy_hitters(docs: DataFrame, m: int = 1024,
                                k: int = 20) -> DataFrame:
    """Heavy hitters over word bigrams of the documents corpus.

    Bigrams come from the codegen'd lookahead-regex pass (the idiom
    text.lm_rare_bigrams / graph.cooccurrence_edges use), NOT an
    interpreted F.get(split(...)) transform — inline splits inside HOF
    lambdas re-evaluate per element access, O(words²) per doc."""
    ws = F.split(F.col("text"), " ")
    pat = "(?:^| )(?=([^ ]* [^ ]*))"
    bigrams = docs.select(
        F.explode(
            F.when(
                F.size(ws) >= 2,
                F.regexp_extract_all(F.col("text"), F.lit(pat), 1),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("token")
    )
    return heavy_hitters(bigrams, m=m, k=k)
