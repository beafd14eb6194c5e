"""IR-style relevance ranking over the documents table: TF-IDF term
extraction and BM25 retrieval (beyond-reference, BASELINE.json north star —
keyword search / relevance filtering is a standard corpus-curation stage).

Cross-engine exactness: both scores use the *rational* Robertson idf
surrogate instead of ``ln`` — JVM ``StrictMath.log`` (fdlibm) and DuckDB's
libm ``ln`` are not guaranteed to round identically in the last ulp, while
IEEE-754 ``+ - * /`` are exact-rounded and engine-independent as long as the
expression tree associates identically. Every formula below is written in
the same association order as its oracle SQL, so the doubles are
bit-identical. Monotonicity in (tf, 1/df) — the property ranking needs — is
preserved; swap in ``F.log`` for absolute-score parity with a specific IR
library if required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import words

#: default BM25 free parameters (Robertson et al., public literature values)
BM25_K1 = 1.2
BM25_B = 0.75

#: the fixed query for the registry/bench entry — three mid-frequency
#: corpus terms so scores spread and the top-k is selective
DEFAULT_QUERY = ("spark", "scan", "merge")


def tfidf_topk(documents: DataFrame, k: int = 5) -> DataFrame:
    """Top-k TF-IDF terms per document.

    score = tf * (N + 1) / (df + 1)  — rational idf (see module docstring).

    Scale shape (100 TB): tf aggregates on (doc_id, term) — one shuffle,
    map-side partial combine; df aggregates the already-distinct (doc, term)
    relation on term — second shuffle over the *vocabulary*, not the corpus;
    N is a 1-row broadcast scalar; the per-doc top-k window repartitions on
    doc_id. No collect, no crossJoin beyond the 1-row scalar broadcast.
    """
    toks = documents.select(
        "doc_id", F.explode(words(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = documents.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf").cast("double")
            * (F.col("n_docs") + F.lit(1)).cast("double")
            / (F.col("df") + F.lit(1)).cast("double"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
    )


#: reciprocal-rank-fusion constant (Cormack et al. 2009 public value)
RRF_K = 60


def rrf_fuse(
    documents: DataFrame,
    embeddings: DataFrame,
    query: tuple[str, ...] = DEFAULT_QUERY,
    query_vec_id: int = 0,
    depth: int = 50,
    k: int = 20,
) -> DataFrame:
    """Hybrid retrieval: BM25 lexical top-`depth` fused with cosine
    semantic top-`depth` (query = the `query_vec_id` embedding, which is
    that document's own vector — excluded from both candidate sets) by
    reciprocal-rank fusion: rrf(d) = Σ 1/(RRF_K + rank_list(d)) over the
    lists containing d. The modern RAG retrieval stage, rank-only so the
    two scorers' incomparable scales never mix.

    Float exactness: ranks are integers; each term is one exact IEEE
    division and the two-term sum is written in fixed lexical-then-
    semantic order on both engines.

    Shape (100 TB): each side is its own already-scale-shaped retrieval
    (BM25: broadcast stats + TakeOrdered; cosine: broadcast 1-row query +
    TakeOrdered); fusion then joins two ≤depth-row relations — the
    rank windows and full-outer join run on driver-trivial data, never
    the corpus.
    """
    from .similarity import cosine, dot_chain, norm2_chain

    lex = bm25_topk(
        documents.filter(F.col("doc_id") != query_vec_id), query, k=depth
    )
    wl = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    lexr = lex.select("doc_id", F.row_number().over(wl).alias("r_lex"))

    q = (
        embeddings.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").alias("qv"))
        .withColumn("qn2", norm2_chain("qv"))
    )
    sem = (
        embeddings.filter(F.col("vec_id") != query_vec_id)
        .select(F.col("vec_id").alias("doc_id"),
                F.col("embedding").alias("cv"))
        .withColumn("cn2", norm2_chain("cv"))
        .crossJoin(F.broadcast(q))
        .select(
            "doc_id",
            cosine(dot_chain("qv", "cv"), F.col("qn2"), F.col("cn2"))
            .alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("doc_id"))
        .limit(depth)
    )
    ws = Window.orderBy(F.col("cos_sim").desc(), F.col("doc_id").asc())
    semr = sem.select("doc_id", F.row_number().over(ws).alias("r_sem"))

    one = F.lit(1.0)
    rrf = (
        F.coalesce(one / (F.lit(RRF_K) + F.col("r_lex")).cast("double"),
                   F.lit(0.0))
        + F.coalesce(one / (F.lit(RRF_K) + F.col("r_sem")).cast("double"),
                     F.lit(0.0))
    )
    return (
        lexr.join(semr, "doc_id", "full")
        .select("doc_id", "r_lex", "r_sem", rrf.alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(k)
    )


def _tf(term: str):
    """Row-local term frequency: exact word-match count in the split."""
    return F.size(F.filter(words(F.col("text")), lambda w: w == F.lit(term)))


def bm25_topk(
    documents: DataFrame,
    query: tuple[str, ...] = DEFAULT_QUERY,
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 retrieval for a fixed query: top-k documents by score.

    idf(t) = (N - df + 0.5) / (df + 0.5)        [rational Robertson idf]
    s(d,t) = idf * (tf * (k1+1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    score  = s(d,t1) + s(d,t2) + ...            [FIXED left-to-right order]

    The per-term scores are separate row-local columns summed in query-term
    order — never a groupBy SUM over exploded terms — so float addition
    order is deterministic and identical to the oracle's expression tree.

    Scale shape (100 TB): ONE corpus scan computes the 1-row stats relation
    (per-term document frequencies + total doc count + total corpus length
    via conditional aggregation), broadcast back; scoring is then row-local
    on a second scan and top-k is TakeOrderedAndProject — no wide shuffle at
    any point, which is the plan you want for interactive retrieval over a
    petabyte corpus.
    """
    dl = F.size(words(F.col("text")))
    stats_aggs = [
        F.sum(F.when(_tf(t) > 0, 1).otherwise(0)).alias(f"df_{i}")
        for i, t in enumerate(query)
    ] + [
        F.count("*").alias("n_docs"),
        F.sum(dl.cast("long")).alias("sum_dl"),
    ]
    stats = documents.agg(*stats_aggs)

    scored = documents.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    dl_norm = F.lit(1.0) - F.lit(b) + F.lit(b) * dl.cast("double") / avgdl
    score = None
    for i, t in enumerate(query):
        tf = _tf(t).cast("double")
        idf = (
            (F.col("n_docs").cast("double") - F.col(f"df_{i}").cast("double")
             + F.lit(0.5))
            / (F.col(f"df_{i}").cast("double") + F.lit(0.5))
        )
        s = idf * (tf * F.lit(k1 + 1.0)) / (tf + F.lit(k1) * dl_norm)
        score = s if score is None else score + s
    return (
        scored.select(
            "doc_id",
            dl.alias("doc_len"),
            score.alias("bm25"),
        )
        .filter(F.col("bm25") > 0.0)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def build_inverted_index(documents: DataFrame,
                         n_shards: int = 1) -> DataFrame:
    """Materialize the inverted index itself — the artifact BM25/TF-IDF
    retrieval serves from: per (term, shard) a SORTED posting list of
    doc_ids plus the term's document frequency.

    Scale shape: one corpus-scale shuffle on (term, shard). Posting
    lists are the classic hot-key hazard (a stopword's list is the
    corpus), so lists shard by ``doc_id % n_shards`` — each grouped
    list is bounded by |docs|/n_shards, shards of one term land on
    different reducers, and a serving layer unions shards per term.
    n_shards=1 keeps the fixture tier oracle-exact with whole lists;
    the df column is computed per shard pre-aggregation, and summing
    shards' df recovers the exact corpus df at any shard count (a
    doc_id lands in exactly one shard).

    Output: (term, shard, df, postings) — postings is the ascending
    doc_id list joined with ',' into ONE canonical STRING (lists sort
    before joining, so any engine produces a byte-identical cell; a
    flat string also survives every driver/oracle hash path, unlike a
    LIST column — see CORRECTNESS_r07 inverted_index).
    """
    terms = documents.select(
        "doc_id", F.explode(F.array_distinct(words(F.col("text"))))
        .alias("term")
    )
    return (
        terms.withColumn("shard", F.pmod("doc_id", F.lit(n_shards)))
        .groupBy("term", "shard")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.sort_array(F.collect_list("doc_id")), ","
            ).alias("postings"),
        )
    )
