"""Similarity search over embedding columns (``array<float>``, dim 64).

Two tiers:

- **Brute-force cosine top-k** (the correctness baseline): query set ×
  candidate set with a broadcast of the (small) query side, cosine as an
  explicit left-associative sum chain. float32→float64 promotion makes each
  product exact, and the fixed evaluation order makes the final double
  bit-identical to the DuckDB oracle's identical expression chain — so
  rankings can be compared exactly.
- **Random-hyperplane LSH ANN** (the scale path): 16 deterministic
  hyperplanes (seeded from xxhash64) → sign-bit bucket per vector → top-k
  within bucket only. At 100 TB the bucket join replaces the all-pairs
  product; recall vs brute force is asserted in tests rather than an SQL
  oracle (approximate ops have no exact oracle).

Design note: at real scale the candidate side stays partitioned by bucket
(or IVF cell) and only queries are broadcast; nothing here ever collects
vectors to the driver.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

DIM = 64
N_PLANES = 16
LSH_TABLES = 8       # hash tables (L)
LSH_PLANES = 4       # sign bits per table (b): recall = 1-(1-p^b)^L


def dot_chain(a: str, b: str, dim: int = DIM) -> Column:
    """Dot product as a left fold over ``zip_with`` products.

    A left fold from 0.0 produces the exact same float result as the
    oracle's explicit left-associative ``a[1]*b[1] + a[2]*b[2] + ...``
    chain (0.0 + p1 == p1), while codegen stays a compact loop instead of
    a 64-term inline expression that would blow janino's 64KB method limit.
    """
    prods = F.zip_with(
        F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm2_chain(a: str, dim: int = DIM) -> Column:
    """Squared norm via the same fold shape as `dot_chain`."""
    return dot_chain(a, a, dim)


def cosine(dot: Column, na2: Column, nb2: Column) -> Column:
    """(dot / sqrt(na2)) / sqrt(nb2) — same shape as the oracle expression."""
    return (dot / F.sqrt(na2)) / F.sqrt(nb2)


def knn_brute_force(embeddings: DataFrame, n_queries: int = 5,
                    k: int = 10) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Queries = vec_id < n_queries (broadcast); candidates = the rest.
    Ranking is fully deterministic: exact-double cosine + vec_id tiebreak.
    """
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = embeddings.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv")
    )
    scored = q.crossJoin(c).select(
        "query_id", "cand_id",
        cosine(dot_chain("qv", "cv"), norm2_chain("qv"), norm2_chain("cv"))
        .alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", "cos_sim", "rk")
    )


def cosine_neardup_pairs(embeddings: DataFrame, threshold: float = 0.35,
                         limit_id: int | None = 1000) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold.

    The oracle-checked variant restricts ids (both engines) to bound the
    O(n²) pair space; the scale path is `ann_lsh_pairs` below.
    """
    e = embeddings
    if limit_id is not None:
        e = e.filter(F.col("vec_id") < limit_id)
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            cosine(dot_chain("va", "vb"), norm2_chain("va"), norm2_chain("vb"))
            .alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _plane(plane: int, dim: int = DIM) -> list[float]:
    """Deterministic pseudo-random hyperplane (md5-seeded, engine-free)."""
    import hashlib

    return [
        ((int(hashlib.md5(f"plane_{plane}_{i}".encode()).hexdigest()[:8], 16)
          % 2000) - 1000) / 1000.0
        for i in range(dim)
    ]


def lsh_bucket(vec_col: str, n_planes: int = N_PLANES,
               plane_offset: int = 0) -> Column:
    """Random-hyperplane signature: one sign bit per plane → int bucket.

    Plane vectors are literal arrays (constant-folded by Catalyst); each
    projection is a zip_with fold, keeping codegen loop-shaped.
    """
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _plane(plane_offset + p)])
        prods = F.zip_with(
            F.col(vec_col), plane, lambda x, y: x.cast("double") * y
        )
        proj = F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)
        bits.append(
            F.when(proj >= 0, F.lit(1 << p).cast("long"))
             .otherwise(F.lit(0).cast("long"))
        )
    return reduce(add, bits)


def ann_lsh_pairs(embeddings: DataFrame, threshold: float = 0.35,
                  n_tables: int = LSH_TABLES,
                  planes_per_table: int = LSH_PLANES) -> DataFrame:
    """Scale-path ANN near-dup: multi-table random-hyperplane LSH.

    L independent tables of b sign bits each; a pair is a candidate if it
    collides in ANY table (recall ≈ 1-(1-p^b)^L where p = 1-θ/π). Exact
    cosine is computed only for candidates. The per-table bucket join is an
    equi-join on (table, signature) — at 100 TB each table's buckets hash-
    partition independently and no all-pairs product ever forms. Recall vs
    `cosine_neardup_pairs` is asserted in tests (approximate op → no exact
    SQL oracle).
    """
    sigs = embeddings.select(
        "vec_id", "embedding",
        F.explode(F.array(*[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket("embedding", planes_per_table, plane_offset=t * planes_per_table)
                .alias("sig"),
            )
            for t in range(n_tables)
        ])).alias("ts"),
    ).select("vec_id", "embedding", "ts.tbl", "ts.sig")
    a = sigs.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
                    "tbl", "sig")
    c = sigs.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
                    "tbl", "sig")
    return (
        a.join(c, ["tbl", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .distinct()
        .select(
            "id_a", "id_b",
            cosine(dot_chain("va", "vb"), norm2_chain("va"), norm2_chain("vb"))
            .alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
