"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Shapes are designed for 100 TB:

- **exact**: group by a fixed-width digest (md5) of content, never by the
  content itself — the shuffle moves 16-byte keys, not documents.
- **minhash+lsh**: shingle → k minhashes → band buckets → candidate pairs
  via an equi-join on (band, band_hash) → verify Jaccard only on
  candidates. No all-pairs comparison anywhere; the candidate join is a
  plain shuffle-hash join on a high-cardinality key.
- **simhash**: one 48-bit signature per doc; neighbor search is
  xor+bit_count on a subset/bucket, not O(n²) over the corpus.
- **n-gram Jaccard**: inverted-index join (explode shingles, join docs
  sharing one) — the classic scalable candidate generator.

Two hash tiers: `char_hash` (portable 31-base rolling hash) for
oracle-checked parity queries, and `xxhash64` (JVM-native, what you would
run at scale) for the rows-only scale-path variants. Pipeline shape is
identical across tiers.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import HASH_MOD, char_hash

SIMHASH_BITS = 48       # xxhash64 tier (positive in signed int64)
SIMHASH_BITS_PORTABLE = 31  # rolling-hash tier only yields 31 hash bits


def recrawl_corpus(documents: DataFrame) -> DataFrame:
    """Deterministic near/exact-duplicate corpus for dedup demos and tests.

    Simulates a recrawl: every document appears again verbatim
    (doc_id+2_000_000) and once with its last word dropped
    (doc_id+1_000_000). Gives every doc one exact and one near duplicate.
    """
    w = F.split(F.col("text"), " ")
    near = documents.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(F.slice(w, 1, F.size(w) - 1), " ").alias("text"),
    )
    exact = documents.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    )
    return documents.select("doc_id", "text").unionByName(near).unionByName(exact)


def dedup_exact(corpus: DataFrame) -> DataFrame:
    """Exact dedup on md5 digest: one survivor (min doc_id) per content."""
    return (
        corpus.groupBy(F.md5("text").alias("content_md5"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingles(text: Column, k: int = 3, words: Column | None = None) -> Column:
    """Word k-gram shingle array (1-based element_at, same as DuckDB).

    Pass ``words`` as a pre-projected `split(text, ' ')` COLUMN whenever
    possible: an inline `split` expression is re-evaluated for every
    `element_at` inside the transform lambda (no common-subexpression
    elimination through higher-order functions), which costs ~16× on
    realistic documents. `shingled` below does this automatically.
    """
    w = F.split(text, " ") if words is None else words
    n = F.size(w)
    make = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, i + off) for off in range(k)]
        ),
    )
    return F.when(n >= k, make).otherwise(F.array(text))


def shingled(corpus: DataFrame, native_hash: bool = False) -> DataFrame:
    """(doc_id, shingle) exploded rows, de-duplicated per doc.

    Repartitions by doc_id before the ~50× explode so the fan-out runs on
    every core regardless of input file layout (a handful of parquet files
    would otherwise pin the whole pipeline to a handful of tasks).

    native_hash=True replaces the shingle string with its xxhash64 — every
    downstream shuffle (distinct, minhash, intersection joins) then moves
    8-byte longs instead of strings. This is the 100 TB configuration;
    collision probability 2^-64 per pair is negligible. The portable tier
    keeps strings so the DuckDB oracle can reproduce values exactly.
    """
    # explicit partition count: repartition(col) alone is AQE-coalescible,
    # and AQE sees only the tiny pre-explode bytes — it would shrink this
    # exchange to ~1 partition and serialize the ~50× shingle fan-out onto
    # one core. An explicit N pins the explode's parallelism.
    n_part = corpus.sparkSession.sparkContext.defaultParallelism
    ex = (
        corpus.repartition(n_part, F.col("doc_id"))
        # materialize the split ONCE as a physical column; see shingles()
        .select("doc_id", "text", F.split("text", " ").alias("w"))
        .select(
            "doc_id",
            F.explode(
                shingles(F.col("text"), words=F.col("w"))
            ).alias("shingle"),
        )
    )
    if native_hash:
        ex = ex.select("doc_id", F.xxhash64("shingle").alias("shingle"))
    return ex.distinct()


def _mh(hash_col: Column, seed: int) -> Column:
    a, b = 2 * seed + 1, seed * seed + 7
    return F.min((hash_col * a + b) % HASH_MOD)


def minhash_signatures(corpus: DataFrame, n_seeds: int = 8,
                       portable: bool = True) -> DataFrame:
    """(doc_id, seed, minhash): k permutation-mins over the shingle set.

    portable=True → rolling hash (oracle-checkable);
    portable=False → xxhash64 (scale path, JVM native).
    """
    sh = shingled(corpus, native_hash=not portable)
    hashed = sh.select("doc_id", _shingle_hash(portable).alias("h"))
    return _minhash_grouped(hashed, n_seeds)


def _shingle_hash(portable: bool) -> Column:
    """Reduce a shingle column (string or pre-hashed long) to [0, HASH_MOD)."""
    if portable:
        return char_hash(F.col("shingle"))
    return F.pmod(F.col("shingle"), F.lit(HASH_MOD)).cast("long")


def _minhash_grouped(hashed: DataFrame, n_seeds: int) -> DataFrame:
    """groupBy doc with one min-agg per seed, then unpivot to rows."""
    agged = hashed.groupBy("doc_id").agg(
        *[_mh(F.col("h"), s).alias(f"mh{s}") for s in range(n_seeds)]
    )
    pairs = F.array(*[
        F.struct(F.lit(s).alias("seed"), F.col(f"mh{s}").alias("minhash"))
        for s in range(n_seeds)
    ])
    return agged.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.seed", "p.minhash"
    )


def _doc_profile(sh: DataFrame, n_seeds: int, portable: bool) -> DataFrame:
    """ONE groupBy producing everything per-doc the LSH pipeline needs:
    the k minhashes AND the shingle-set size. Folding the size into the
    same aggregation removes a whole extra shuffle over the (much larger)
    shingle relation — at scale the exchange is reused for banding and
    for the union-size lookup."""
    hashed = sh.select("doc_id", _shingle_hash(portable).alias("h"))
    return hashed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sh"),
        *[_mh(F.col("h"), s).alias(f"mh{s}") for s in range(n_seeds)],
    )


def _banded_pairs(agged: DataFrame, n_seeds: int,
                  band_size: int) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing any full minhash band.

    Equi-join on (band, h0..h_{band_size-1}) — cardinality-controlled, no
    cross join. band_size trades candidate volume against recall at the
    threshold boundary: collision P per band ≈ jaccard^band_size, so 4
    keeps near-identical dupes (j≈0.95 → 0.81/band) while suppressing the
    quadratic noise floor that band_size=2 lets through on low-diversity
    corpora.
    """
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            *[F.col(f"mh{b * band_size + j}").alias(f"h{j}")
              for j in range(band_size)],
        )
        for b in range(n_seeds // band_size)
    ])
    banded = agged.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", "b.*"
    )
    keys = ["band"] + [f"h{j}" for j in range(band_size)]
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(right, keys)
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def lsh_candidate_pairs(corpus: DataFrame, n_seeds: int = 8,
                        band_size: int = 4, portable: bool = True,
                        shingle_df: DataFrame | None = None) -> DataFrame:
    """Banded-LSH candidate pairs: docs sharing any full band of minhashes."""
    sh = shingle_df if shingle_df is not None else shingled(
        corpus, native_hash=not portable)
    return _banded_pairs(
        _doc_profile(sh, n_seeds, portable), n_seeds, band_size
    )


def neardup_pairs(corpus: DataFrame, threshold: float = 0.5,
                  n_seeds: int = 8, portable: bool = True) -> DataFrame:
    """MinHash-LSH near-dup pipeline: candidates → exact Jaccard ≥ threshold.

    Jaccard is computed from shingle-set sizes (exact ints): |∩| via a join
    on shingle restricted to candidate pairs, |∪| = |A|+|B|-|∩|.
    """
    # no persist: the shingle relation ends in a distinct (= aggregate over
    # an exchange), and all three consumers share that identical subplan, so
    # Spark's exchange reuse materializes the shuffle once. persist() here
    # actually hurt — every call leaked a cached copy into executor memory
    sh = shingled(corpus, native_hash=not portable)
    agged = _doc_profile(sh, n_seeds, portable)
    cand = _banded_pairs(agged, n_seeds, band_size=4)
    sizes = agged.select("doc_id", "n_sh")
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingle"))
    shared = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(na, "doc_a").join(nb, "doc_b")
        .select(
            "doc_a", "doc_b",
            (F.col("n_inter").cast("double")
             / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
             ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_pairs_inverted_index(corpus: DataFrame,
                                 threshold: float = 0.5) -> DataFrame:
    """n-gram Jaccard near-dup WITHOUT minhash: pure inverted-index join.

    Candidates = any pair sharing ≥1 shingle; exact Jaccard from counts.
    More candidates than LSH (no banding) but zero false negatives.
    """
    sh = shingled(corpus)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        pairs.join(na, "doc_a").join(nb, "doc_b")
        .select(
            "doc_a", "doc_b",
            (F.col("n_inter").cast("double")
             / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
             ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_signatures(corpus: DataFrame, bits: int | None = None,
                       portable: bool = True) -> DataFrame:
    """SimHash: per-bit majority vote over word hashes → one int64 per doc."""
    if bits is None:
        bits = SIMHASH_BITS_PORTABLE if portable else SIMHASH_BITS
    w = corpus.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    h = (
        char_hash(F.col("word"))
        if portable
        else F.pmod(F.xxhash64("word"), F.lit(1 << bits)).cast("long")
    )
    hashed = w.select("doc_id", h.alias("h"))
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1)
                 .otherwise(-1)
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    sig = reduce(
        add,
        [
            F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long"))
             .otherwise(F.lit(0).cast("long"))
            for b in range(bits)
        ],
    )
    return votes.select("doc_id", sig.alias("simhash"))


def simhash_neighbors(corpus: DataFrame, max_hamming: int = 3,
                      bits: int | None = None,
                      portable: bool = True) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance.

    Candidate generation buckets on the top 16 bits of the signature (docs
    differing only in low bits collide) — at scale you'd use multiple
    rotated bucketings; here one bucketing + the recrawl corpus keeps the
    oracle tractable while the shape stays O(n·bucket).
    """
    if bits is None:
        bits = SIMHASH_BITS_PORTABLE if portable else SIMHASH_BITS
    sig = simhash_signatures(corpus, bits=bits, portable=portable)
    bucket = F.shiftright(F.col("simhash"), bits - 16)
    b = sig.select("doc_id", "simhash", bucket.alias("bucket"))
    left, right = b.alias("l"), b.alias("r")
    ham = F.bit_count(
        F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
