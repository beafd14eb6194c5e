"""Training-corpus curation operators (beyond-reference, BASELINE.json
north star): the steps that turn raw deduped text into a training set.

- **keep_best_per_cluster** — the consumer of `dedup.neardup_clusters`:
  one canonical document per near-duplicate cluster, chosen by quality
  score. "Dedup" in a real pipeline is not "drop duplicates", it is
  "keep the best copy"; this op closes that loop.
- **decontaminate** — benchmark-overlap detection: flag training
  documents that contain a benchmark document's n-grams (the standard
  eval-leakage guard). The benchmark side is always tiny relative to the
  corpus, so it rides a broadcast into an inverted-index join — the
  corpus never shuffles on shingles.
- **pack_sequences** — token-budget sequence packing (concat-and-chunk):
  assign each document its training-sequence id and offset under a fixed
  SEQ_LEN. Packing needs a total order, which does not scale as ONE
  ordered stream; documents are sharded deterministically and each
  (lang, shard) packs independently — the per-shard running sum is a
  window aggregate over the same partitioning key the shuffle already
  used, and shards parallelize freely at 100 TB.
- **curriculum_topk** — per-language quality selection (top-k by score):
  windowed rank inside each language partition, the standard
  "high-quality subset first" curriculum step.

All scoring expressions are exact-arithmetic (integer counts, fixed
double expression trees), so every op here is value-level oracle-checked
against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from . import dedup
from .text import STOPWORDS, n_words, quality_scores

SEQ_LEN = 2048        # tokens per packed training sequence
N_PACK_SHARDS = 16    # independent packing streams per language
BENCH_EVERY = 20      # every Nth doc seeds the synthetic benchmark set
BENCH_PREFIX_WORDS = 10
CONTAIN_T = 0.5       # flag docs covering >= this fraction of a benchmark


def content_quality(text: Column) -> Column:
    """`text.quality_scores`'s score formula on a bare text column.

    Cluster corpora (e.g. `dedup.recrawl_corpus`) carry no ``lang``
    column, so the scorer is exposed as a pure expression here; the
    arithmetic is identical to the oracle-checked `text_quality` query.
    """
    w = F.split(text, " ")
    nw = F.size(w)
    length = F.length(text)
    stop = F.size(F.filter(w, lambda t: t.isin(*STOPWORDS["en"])))
    punct = length - F.length(F.regexp_replace(text, r"[^A-Za-z0-9 ]", ""))
    return (
        F.least(F.lit(1.0), nw.cast("double") / 100.0) * 0.5
        + (stop.cast("double") / nw.cast("double")) * 0.3
        + (1.0 - punct.cast("double") / length.cast("double")) * 0.2
    )


def keep_best_per_cluster(corpus: DataFrame, threshold: float = 0.5,
                          n_seeds: int = 8,
                          portable: bool = True) -> DataFrame:
    """Canonical document per near-duplicate cluster.

    Pipeline: `neardup_clusters` labels every doc with its component's
    min doc_id; a quality score is computed per doc (narrow projection);
    the winner is the row_number()==1 doc per cluster ordered by
    (quality desc, doc_id asc) — a single windowed rank over the
    cluster_id partitioning. Singleton clusters pass through unchanged,
    so the output is exactly "the training set after dedup".
    """
    clusters = dedup.neardup_clusters(
        corpus, threshold=threshold, n_seeds=n_seeds, portable=portable
    )
    scored = corpus.select(
        "doc_id", content_quality(F.col("text")).alias("quality_score")
    )
    w = W.partitionBy("cluster_id").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return (
        clusters.join(scored, "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("keep_doc_id"),
            "n_members",
            "quality_score",
        )
    )


def benchmark_prefixes(documents: DataFrame, every: int = BENCH_EVERY,
                       prefix_words: int = BENCH_PREFIX_WORDS) -> DataFrame:
    """Deterministic synthetic benchmark set: every Nth document's first
    ``prefix_words`` words. Gives `decontaminate` guaranteed true
    positives (a document always contains its own prefix) while staying
    reproducible in the SQL oracle."""
    w = F.split(F.col("text"), " ")
    return documents.filter(F.col("doc_id") % every == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.array_join(F.slice(w, 1, prefix_words), " ").alias("text"),
    )


def decontaminate(train: DataFrame, bench: DataFrame,
                  threshold: float = CONTAIN_T) -> DataFrame:
    """Flag (train doc, benchmark doc) pairs with n-gram containment
    ``|train ∩ bench| / |bench| >= threshold``.

    The benchmark relation (id, shingle) is exploded and BROADCAST —
    eval sets are a few thousand docs against a 100 TB corpus, so the
    corpus-side shingle relation joins map-side and never shuffles; the
    only exchange is the per-(doc, bench) count aggregation, whose rows
    are bounded by |hits|, not |corpus|.

    Containment (not Jaccard) is the right asymmetric measure: a long
    training doc embedding a whole benchmark item scores 1.0 even though
    its Jaccard is tiny.
    """
    b = dedup.shingle_sets(
        bench.select(F.col("bench_id").alias("doc_id"), "text")
    ).select(
        F.col("doc_id").alias("bench_id"),
        F.size("sh").alias("n_b"),
        F.explode("sh").alias("shingle"),
    )
    t = dedup.shingled(train)
    hits = (
        t.join(F.broadcast(b), "shingle")
        .groupBy("doc_id", "bench_id", "n_b")
        .agg(F.count(F.lit(1)).alias("n_i"))
    )
    return (
        hits.select(
            "doc_id", "bench_id",
            (F.col("n_i").cast("double") / F.col("n_b").cast("double"))
            .alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def chunk_documents(documents: DataFrame, chunk_words: int = 64,
                    overlap: int = 16) -> DataFrame:
    """Sliding-window document chunking — the context-window prep stage
    (RAG corpora, long-doc training): word windows of ``chunk_words``
    advancing by ``chunk_words - overlap``, last partial window kept.

    Declarative on purpose: chunk starts come from ``sequence()`` (one
    explode), each chunk is ``slice`` + ``array_join`` — codegen'd array
    expressions, NOT lambda higher-order functions (those run
    interpreted — see dedup.word_shingles) and NOT a Python UDTF (the
    same fan-out at Python speed). Pure narrow map + explode: zero
    shuffle, linear in output size, trivially partition-parallel.

    Output: (doc_id, chunk_id, chunk_text, n_chunk_words) with chunk_id
    0-based in document order.
    """
    stride = chunk_words - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_words")
    w = F.split(F.col("text"), " ")
    starts = F.sequence(F.lit(1), F.greatest(F.size(w) - overlap, F.lit(1)),
                        F.lit(stride))
    chunked = documents.select(
        "doc_id", w.alias("w"), F.posexplode(starts).alias("chunk_id", "s")
    )
    piece = F.slice(F.col("w"), F.col("s"), chunk_words)
    return chunked.select(
        "doc_id", "chunk_id",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_chunk_words"),
    )


def pack_sequences(documents: DataFrame, seq_len: int = SEQ_LEN,
                   n_shards: int = N_PACK_SHARDS) -> DataFrame:
    """Concat-and-chunk sequence packing: each document's placement in a
    fixed-width token stream, per (lang, shard).

    ``seq_id`` is the sequence the document STARTS in, ``seq_offset``
    its position inside it, ``n_seqs_spanned`` how many sequences the
    document crosses (a doc may straddle a chunk boundary — real packers
    split it). The running token sum is one window aggregate whose
    partitioning (lang, shard) is also the parallelism unit: sharding
    by doc_id keeps assignment deterministic under retries and lets
    every shard pack concurrently — a single global ordered stream would
    serialize the whole corpus through one task. ``seq_len`` is a power
    of two, so the double division inside floor() is exact.
    """
    base = documents.select(
        "doc_id", "lang",
        n_words(F.col("text")).cast("long").alias("n_tokens"),
        F.pmod(F.col("doc_id"), F.lit(n_shards)).alias("shard"),
    )
    w = (
        W.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = cum - F.col("n_tokens")
    seq_id = F.floor(start / seq_len).cast("long")
    end_seq = F.floor((cum - 1) / seq_len).cast("long")
    return base.select(
        "doc_id", "lang", "shard", "n_tokens",
        seq_id.alias("seq_id"),
        F.pmod(start, F.lit(seq_len)).cast("long").alias("seq_offset"),
        (end_seq - seq_id + 1).alias("n_seqs_spanned"),
    )


def curriculum_topk(documents: DataFrame, k: int = 25) -> DataFrame:
    """Per-language quality curriculum: the k best documents by
    `quality_scores`, deterministic tie-break on doc_id. One windowed
    rank per language partition; at scale the rank prunes with
    TakeOrdered semantics inside each partition rather than a global
    sort."""
    q = quality_scores(documents).select("doc_id", "lang", "quality_score")
    w = W.partitionBy("lang").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return (
        q.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def pack_sequences_ffd(documents: DataFrame, seq_len: int = SEQ_LEN,
                       n_shards: int = N_PACK_SHARDS) -> DataFrame:
    """First-fit-decreasing sequence packing — the bin-packing
    alternative to `pack_sequences`' concat-and-chunk: documents are
    never split across sequences, and FFD's sorted greedy keeps padding
    waste near the ceil(total/seq_len) lower bound (the classic ≤
    11/9·OPT+1 guarantee).

    Per (lang, shard) group — the same deterministic sharding and
    parallelism unit as `pack_sequences` — an ``applyInPandas`` FFD:
    sort by (n_tokens desc, doc_id asc), place each doc in the FIRST bin
    with room, else open a new bin. Deterministic under any partitioning
    (the sort inside the group is total). Docs longer than ``seq_len``
    get a bin of their own (a real packer truncates or splits them; the
    assignment stays honest). One shuffle (the groupBy); per-group work
    is O(n·bins) python over Arrow batches — at 100 TB the shard count
    is the parallelism knob, exactly as for the chunk packer."""
    base = documents.select(
        "doc_id", "lang",
        n_words(F.col("text")).cast("long").alias("n_tokens"),
        F.pmod(F.col("doc_id"), F.lit(n_shards)).alias("shard"),
    )

    def pack(pdf):
        import pandas as pd

        rows = sorted(
            zip(pdf["doc_id"], pdf["n_tokens"]),
            key=lambda t: (-t[1], t[0]),
        )
        remaining: list[int] = []
        out_bin = {}
        for doc_id, nt in rows:
            if nt > seq_len:
                out_bin[doc_id] = len(remaining)
                remaining.append(0)
                continue
            for i, cap in enumerate(remaining):
                if cap >= nt:
                    remaining[i] = cap - nt
                    out_bin[doc_id] = i
                    break
            else:
                out_bin[doc_id] = len(remaining)
                remaining.append(seq_len - nt)
        return pd.DataFrame({
            "doc_id": pdf["doc_id"].astype("int64"),
            "lang": pdf["lang"],
            "shard": pdf["doc_id"].astype("int64") % n_shards,
            "n_tokens": pdf["n_tokens"].astype("int64"),
            "bin_id": [out_bin[d] for d in pdf["doc_id"]],
        })

    return base.groupBy("lang", "shard").applyInPandas(
        pack,
        schema="doc_id long, lang string, shard long, n_tokens long, "
               "bin_id long",
    )


def _hex_bucket(col: Column, n_buckets: int) -> Column:
    """Deterministic bucket from the first 4 hex chars of an md5 string,
    via ascii() arithmetic — chosen over xxhash64 because the identical
    expression runs in DuckDB, so the oracle reproduces bucket choices
    bit-for-bit. Slightly lumpy (hex chars occupy 2 ascii ranges) but
    uniform enough for load-spreading, which is all a ring bucket needs.
    """
    b = F.lit(0)
    for i in range(1, 5):
        b = b * 131 + F.ascii(F.substring(col, i, 1))
    return F.pmod(b, F.lit(n_buckets))


def contrastive_triplets(corpus: DataFrame,
                         n_buckets: int = 1024) -> DataFrame:
    """(anchor, positive, negative) triplets for contrastive embedding
    training — the data-prep step behind retrieval/embedding models
    (in-batch negatives need pre-mined positives; hard-negative mining
    comes later in the pipeline).

    - POSITIVES: the anchor's NEXT neighbor on an md5 ring *within its
      (lang, source) group* — the standard "same-cluster/same-source"
      positive proxy (e.g. Contriever-style same-document or
      same-source pairs) made deterministic. Wrap-around via the
      group's first row; groups of 1 produce no triplet. The group key
      shuffles; text never does.
    - NEGATIVES: the NEXT doc on a bucket-local md5 ring (buckets from
      `_hex_bucket`, ordered by (ring_key, doc_id), wrap via the
      bucket's first row). Bucket-local keeps the ring window PARALLEL
      — no global ordering, no single-partition window; at 100 TB each
      bucket is corpus/n_buckets and the windows shard across
      executors. A ring neighbor that shares the anchor's (lang,
      source) group is dropped rather than silently kept as a false
      negative — exactly mirrored in the oracle.

    Derandomized like every sampler here (`sampling.py`): hash rings,
    never rand() — task retries and the DuckDB oracle reproduce the
    same triplets bit-for-bit.
    """
    wg = W.partitionBy("lang", "source").orderBy("ring_key", "doc_id")
    ring = W.partitionBy("bucket").orderBy("ring_key", "doc_id")
    full = (W.unboundedPreceding, W.unboundedFollowing)
    base = corpus.select(
        "doc_id", "lang", "source",
        F.md5(F.concat(F.lit("ring:"), F.col("doc_id").cast("string")))
        .alias("ring_key"),
    ).withColumn("bucket", _hex_bucket(F.col("ring_key"), n_buckets))
    ringed = base.select(
        "doc_id", "lang", "source",
        F.count(F.lit(1)).over(
            W.partitionBy("lang", "source")).alias("_grpn"),
        F.coalesce(
            F.lead("doc_id").over(wg),
            F.first("doc_id").over(wg.rowsBetween(*full)),
        ).alias("positive_id"),
        F.coalesce(
            F.lead("doc_id").over(ring),
            F.first("doc_id").over(ring.rowsBetween(*full)),
        ).alias("negative_id"),
        F.coalesce(
            F.lead(F.concat_ws("\x1f", "lang", "source")).over(ring),
            F.first(F.concat_ws("\x1f", "lang", "source")).over(
                ring.rowsBetween(*full)),
        ).alias("_neg_grp"),
    )
    return (
        ringed.filter(F.col("_grpn") >= 2)
        .filter(F.col("_neg_grp")
                != F.concat_ws("\x1f", "lang", "source"))
        .filter(F.col("negative_id") != F.col("doc_id"))
        .select(F.col("doc_id").alias("anchor_id"),
                "positive_id", "negative_id")
    )


# ------------------------------------------------------- bloom pre-filter

BLOOM_BITS = 32768    # m: filter size in bits (1024 x 32-bit words)
BLOOM_K = 3           # k: independent probe positions per shingle


def _bloom_pos(shingle: Column, j: int, portable: bool) -> Column:
    """j-th probe position in [0, BLOOM_BITS) — independent hashes via a
    per-probe key prefix, portable tier DuckDB-reproducible."""
    from .text import char_hash

    keyed = F.concat(F.lit(f"{j}|"), shingle)
    if portable:
        return char_hash(keyed) % BLOOM_BITS
    return F.pmod(F.xxhash64(keyed), F.lit(BLOOM_BITS)).cast("long")


def bloom_filter_words(bench: DataFrame,
                       portable: bool = True) -> list[int]:
    """Build the benchmark's Bloom filter as 1024 32-bit words packed in
    longs (bit b of word w set iff some bench shingle probes position
    32·w + b). The construction is one bounded aggregation — bit_or is
    the textbook mergeable-monoid — and the collected state is ≤1024
    longs (8 KB): the same bounded-driver-state budget as the ANN
    codebooks. Words use bit positions 0..31 only, so no value ever
    touches the sign bit in either engine."""
    sh = dedup.shingled(
        bench.select(F.col("bench_id").alias("doc_id"), "text")
    ).select("shingle").distinct()
    pos = F.col("pos")
    rows = (
        sh.select(F.explode(F.array(
            *[_bloom_pos(F.col("shingle"), j, portable)
              for j in range(BLOOM_K)])).alias("pos"))
        .select(
            F.floor(pos / 32).cast("long").alias("w"),
            F.pow(F.lit(2.0), F.pmod(pos, F.lit(32)).cast("double"))
            .cast("long").alias("bit"))
        .groupBy("w").agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    words = [0] * (BLOOM_BITS // 32)
    for r in rows:
        words[r["w"]] = r["bits"]
    return words


def bloom_decontaminate(train: DataFrame, bench: DataFrame,
                        portable: bool = True) -> DataFrame:
    """Bloom-filter decontamination pre-filter (the Dolma/BFF shape):
    per training document, how many of its shingles MIGHT appear in the
    benchmark set — zero false negatives by construction, false
    positives bounded by (set_bits/m)^k (≈1e-5 per shingle at the
    default sizing), so `decontaminate`'s exact containment join only
    ever runs on the surviving sliver.

    Spark-first shape for 100 TB: the filter itself is inlined into the
    plan as a 1024-long array LITERAL (the broadcast-weight pattern), so
    the probe is a PURE MAP over each document's shingle array — no
    explode, no join, and no KEYED shuffle; the only exchange ever in
    the plan is `shingle_sets`' round-robin balance repartition, which
    applies only to narrow local inputs (a wide 100 TB scan skips it and
    the probe fuses straight into the scan stage). Compare
    `decontaminate` (operators/curation.py:110), whose exact inverted
    index is what the candidates flow into.
    """
    return bloom_probe(train, bloom_filter_words(bench, portable),
                       portable)


def _char_hash_sql(expr: str) -> str:
    """SQL text of text.char_hash over ``expr`` — same fold, one parse."""
    return ("aggregate(split({e}, ''), CAST(0 AS BIGINT), "
            "(acc, c) -> (acc * 31 + ascii(c)) % {m})").format(
                e=expr, m=2_147_483_647)


def _bloom_pos_sql(j: int, portable: bool) -> str:
    keyed = "concat('{}|', s)".format(j)
    if portable:
        return "{h} % {b}".format(h=_char_hash_sql(keyed), b=BLOOM_BITS)
    return "CAST(pmod(xxhash64({k}), {b}) AS BIGINT)".format(
        k=keyed, b=BLOOM_BITS)


def _bloom_probe_sql(words: list[int], portable: bool) -> str:
    """One-parse SQL text of `_bloom_probe_df` (r14, guide §1.1/§7.3):
    the chained build re-analyzed the K-probe rolling-hash trees at
    every call (~0.19 s/invocation for q_bloom_decontaminate). The
    filter words embed as the same single-parse array literal
    lit_long_array builds; pinned plan-identical by tests/
    test_plans.py::test_bloom_and_dsir_sql_text_plan_equality."""
    from .dedup import SHINGLE_K, shingle_pat

    arr = ("array(" + ",".join(f"{int(v)}L" for v in words) + ")"
           if words else "CAST(array() AS array<bigint>)")
    conds = []
    for j in range(BLOOM_K):
        pos = _bloom_pos_sql(j, portable)
        conds.append(
            "(element_at({arr}, CAST(floor(({pos}) / 32) AS INT) + 1) & "
            "CAST(pow(2.0D, CAST(pmod({pos}, 32) AS DOUBLE)) AS BIGINT))"
            " != 0".format(arr=arr, pos=pos))
    hits = " AND ".join(conds)
    sh = ("array_distinct(CASE WHEN size(w) >= {k} THEN "
          "regexp_extract_all(text, '{pat}', 1) "
          "ELSE array(text) END)").format(k=SHINGLE_K, pat=shingle_pat())
    return f"""
SELECT doc_id, n_shingles, n_candidates, n_candidates > 0 AS candidate
FROM (
  SELECT doc_id,
         CAST(size(sh) AS BIGINT) AS n_shingles,
         CAST(size(filter(sh, s -> {hits})) AS BIGINT) AS n_candidates
  FROM (
    SELECT doc_id, {sh} AS sh FROM (
      SELECT doc_id, text, split(text, ' ') AS w FROM {{train}})
  )
)
"""


def bloom_probe(train: DataFrame, words: list[int],
                portable: bool = True) -> DataFrame:
    """The probe half of `bloom_decontaminate` as ONE SQL parse —
    plan-identical to `_bloom_probe_df` (sameResult-pinned). The
    narrow-input widening stays outside the text, applied to the
    spliced plan exactly as dedup.shingle_sets applies it."""
    from ..memo import input_width

    n_part = train.sparkSession.sparkContext.defaultParallelism
    if input_width(train) < n_part:
        train = train.repartition(n_part)
    from ..functions.sqlsplice import sql_with_plans

    return sql_with_plans(train.sparkSession,
                          _bloom_probe_sql(words, portable), train=train)


def _bloom_probe_df(train: DataFrame, words: list[int],
                    portable: bool = True) -> DataFrame:
    """The chained reference build the sameResult pin compares against."""
    from ..functions.litarray import lit_long_array

    arr = lit_long_array(words)

    def _hits(s: Column) -> Column:
        cond = None
        for j in range(BLOOM_K):
            pos = _bloom_pos(s, j, portable)
            widx = F.floor(pos / 32).cast("int")
            # 2^(pos%32) is exact in a double for 0..31; pyspark's
            # shiftleft wrapper only takes a literal shift, pow doesn't
            bit = (F.pow(F.lit(2.0), F.pmod(pos, F.lit(32)).cast("double"))
                   .cast("long"))
            c = F.element_at(arr, widx + 1).bitwiseAND(bit) != 0
            cond = c if cond is None else cond & c
        return cond

    sets = dedup.shingle_sets(train)
    return (
        sets.select(
            "doc_id",
            F.size("sh").cast("long").alias("n_shingles"),
            F.size(F.filter("sh", _hits)).cast("long")
            .alias("n_candidates"),
        )
        .withColumn("candidate", F.col("n_candidates") > 0)
    )
