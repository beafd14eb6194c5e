"""Distributed BPE vocabulary training + tokenization (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units") —
the tokenizer-training leg of an LLM data pipeline.

The scalable formulation trains on the DISTINCT-WORD frequency relation,
not the raw corpus: one corpus-wide groupBy collapses 100 TB of text to
(word, count) — typically tens of millions of rows — and every merge
iteration then touches only that relation. Per iteration:

1. adjacent symbol pairs, weighted by word count, via codegen'd
   ``slice``/``arrays_zip``/``explode`` (no lambda HOFs) → ONE groupBy
   shuffle of (a, b, weight);
2. argmax pair to the driver (1 row; ties break deterministically on
   (count desc, a asc, b asc) so training is reproducible anywhere);
3. the merge applied to each word's symbol sequence in an Arrow-batched
   ``mapInPandas`` (the one inherently sequential step — a symbol array
   rewrite — kept off the JVM expression tree on purpose).

Driver state is the merge table only (n_merges rows). The symbol
relation is persisted and swapped per iteration (persist new → unpersist
old), so lineage stays one step deep — the kmeans_lloyd pattern.

No word-end marker is used (documented simplification: merges never
cross word boundaries because training operates word-by-word).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_freq(corpus: DataFrame) -> DataFrame:
    """(w, wc): the distinct-word frequency relation — the ONLY
    corpus-scale shuffle of the whole training run."""
    return (
        corpus.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Adjacent-pair weights from (seq, wc): codegen'd slice/zip/explode
    — symbol pairs shuffle as (a, b, weight), never word text."""
    n = F.size("seq")
    zipped = F.arrays_zip(
        F.slice("seq", 1, n - 1).alias("a"),
        F.slice("seq", 2, n - 1).alias("b"),
    )
    return (
        seqs.filter(n >= 2)
        .select(F.explode(zipped).alias("p"), "wc")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("wc").alias("weight"))
    )


def _apply_merges_fn(ranked: list[tuple[str, str]]):
    """mapInPandas stage applying the full ranked merge list to every
    word's character sequence in ONE pass over the word-freq relation;
    closure captures a plain list of string pairs (hermetic workers —
    no module refs cross the pickle boundary)."""

    def apply(batches):
        import pandas as pd

        def seq_of(word):
            seq = list(word)
            for a, b in ranked:
                if len(seq) < 2:
                    break
                out, i, n = [], 0, len(seq)
                while i < n:
                    if i + 1 < n and seq[i] == a and seq[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                seq = out
            return seq

        for pdf in batches:
            yield pd.DataFrame({
                "w": pdf["w"],
                "wc": pdf["wc"],
                "seq": [seq_of(w) for w in pdf["w"]],
            })

    return apply


def bpe_train(corpus: DataFrame, n_merges: int = 20) -> list[dict]:
    """Learn ``n_merges`` BPE merges over ``corpus.text``; returns the
    ranked merge table as a list of dicts (driver-bounded state):
    [{rank, left, right, merged, weight}, ...]. Stops early when no
    adjacent pair remains. Deterministic: the argmax tie-break is
    (weight desc, left asc, right asc).

    Every iteration RE-DERIVES the symbol relation from the persisted
    word-freq base by applying all merges so far in one mapInPandas pass
    — plan depth stays constant at 1. The chained alternative (one
    mapInPandas layer per merge over the previous iteration's result)
    grows the logical plan by a layer per merge, and eager re-analysis
    of the deepening tree makes driver time QUADRATIC in n_merges
    (measured: 3 merges 10 s, 20 merges did not finish in 400 s at
    sf0.01 — on a 31-row relation). Re-applying k short merge passes
    per word is O(n_merges²·words) of plain CPU, negligible beside one
    Spark job per iteration; at vocab scales where it is not, the fix
    is chaining + a localCheckpoint lineage cut every few merges, not
    a deeper plan."""
    wf = _word_freq(corpus).persist()
    wf.count()
    merges: list[dict] = []
    ranked: list[tuple[str, str]] = []
    try:
        for rank in range(n_merges):
            seqs = wf.mapInPandas(
                _apply_merges_fn(list(ranked)),
                schema="w string, wc long, seq array<string>",
            )
            best = (
                _pair_counts(seqs)
                .orderBy(F.desc("weight"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not best:
                break
            a, b, weight = best[0].a, best[0].b, best[0].weight
            merges.append({"rank": rank, "left": a, "right": b,
                           "merged": a + b, "weight": int(weight)})
            ranked.append((a, b))
    finally:
        wf.unpersist()
    return merges


def bpe_vocab(corpus: DataFrame, n_merges: int = 20) -> DataFrame:
    """The learned merge table as a DataFrame (rank, left, right, merged,
    weight) — training runs eagerly at construction (iterative, driver-
    coordinated, like pq_train / kmeans_lloyd)."""
    spark = corpus.sparkSession
    merges = bpe_train(corpus, n_merges=n_merges)
    schema = "rank long, left string, right string, merged string, weight long"
    if not merges:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["merged"], m["weight"])
         for m in merges],
        schema,
    )


def bpe_tokenize(corpus: DataFrame, merges: list[dict]) -> DataFrame:
    """(doc_id, n_words, n_tokens): apply the ranked merges to every
    word of every document — Arrow-batched, merges broadcast by closure
    (bounded: n_merges strings). The per-word merge loop is the
    reference BPE apply: merges in rank order, each a full left-to-right
    pass."""
    ranked = [(m["left"], m["right"]) for m in
              sorted(merges, key=lambda m: m["rank"])]

    def apply(batches):
        import pandas as pd

        def tokens_of(word):
            seq = list(word)
            for a, b in ranked:
                if len(seq) < 2:
                    break
                out, i, n = [], 0, len(seq)
                while i < n:
                    if i + 1 < n and seq[i] == a and seq[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                seq = out
            return len(seq)

        for pdf in batches:
            n_words, n_tokens = [], []
            for text in pdf["text"]:
                ws = [w for w in (text or "").split(" ") if w]
                n_words.append(len(ws))
                n_tokens.append(sum(tokens_of(w) for w in ws))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_words": n_words,
                "n_tokens": n_tokens,
            })

    return corpus.select("doc_id", "text").mapInPandas(
        apply, schema="doc_id long, n_words long, n_tokens long"
    )
