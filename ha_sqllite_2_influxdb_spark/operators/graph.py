"""Distributed graph scoring: integer-exact PageRank power iteration and
TextRank keyword extraction (Mihalcea & Tarau 2004, public paper) over the
corpus word co-occurrence graph.

Why integer-exact: float PageRank sums are partition-order-dependent
(addition is not associative), so two runs — or engine vs oracle — drift
in low bits. Ranks here are quantized to ``rank * 2^30`` BIGINTs, the
damping factor is the rational 17/20, and every per-edge contribution is
the floor division ``rank_q div outdeg``: all operations are exact integer
arithmetic, so the result is bit-identical run-to-run, partition-order
independent, and reproducible by ANY engine — the DuckDB oracle replays
the power iteration as unrolled CTEs and matches exactly (same precedent
as similarity.py's quantized k-means, which is pytest-only; the fixed
iteration count makes THIS iterative operator oracle-checkable).

Scale shape (100 TB corpus): the graph is vocabulary-sized, not
corpus-sized — edges aggregate out of the bigram explode with one
corpus-scale shuffle, then every iteration touches only (edges ⋈ ranks)
at vocab scale: a join on src reusing the edges relation persisted
partitioned-by-src, one groupBy dst. Driver state is two scalars (N,
base_q). localCheckpoint after each iteration keeps the plan flat
(kmeans precedent) instead of 10-deep lazy lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rank quantization scale (2^30: 10-iteration sums stay far below 2^63)
PR_SCALE = 1 << 30
#: damping factor 0.85 as the exact rational 17/20
PR_D_NUM, PR_D_DEN = 17, 20
PR_ITERS = 10


def cooccurrence_edges(documents: DataFrame) -> DataFrame:
    """Undirected word co-occurrence graph from adjacent-word pairs:
    distinct directed edges in BOTH directions, self-loops dropped.

    Extraction is the codegen'd regex bigram pass (no interpreted HOFs);
    the distinct collapses the corpus-scale pair stream to the
    vocab²-bounded edge set in one shuffle."""
    pat = "(?:^| )(?=([^ ]* [^ ]*))"
    w = F.split(F.col("text"), " ")
    bigrams = F.when(
        F.size(w) >= 2, F.regexp_extract_all(F.col("text"), F.lit(pat), 1)
    ).otherwise(F.array().cast("array<string>"))
    pairs = (
        documents.select(F.explode(bigrams).alias("bg"))
        .select(
            F.substring_index("bg", " ", 1).alias("src"),
            F.substring_index("bg", " ", -1).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    return pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def pagerank(edges: DataFrame, iters: int = PR_ITERS,
             checkpoint_every: int = 2) -> DataFrame:
    """Integer-exact PageRank over a directed edge list (src, dst) where
    every node has at least one out- AND in-edge (guaranteed for the
    symmetric co-occurrence graph — no dangling-mass handling needed).

    r_{k+1}(v) = (1-d)/N + d * Σ_{u→v} r_k(u)/outdeg(u), computed as
    BIGINT:  base_q + (17 * Σ (r_q div outdeg)) div 20.

    Returns (node, rank_q, rank)."""
    edges = edges.persist()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = edges.join(deg, "src").persist()
    nodes = edges.select("src").distinct()
    n = nodes.count()
    base_q = ((PR_D_DEN - PR_D_NUM) * PR_SCALE) // (PR_D_DEN * n)

    ranks = nodes.select(
        F.col("src").alias("node"), F.lit(PR_SCALE // n).alias("rq")
    ).localCheckpoint(eager=True)
    for i in range(iters):
        contrib = ed.join(ranks, ed.src == ranks.node).select(
            F.col("dst"), F.expr("rq div outdeg").alias("c")
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(base_q)
                 + F.expr(f"({PR_D_NUM} * s) div {PR_D_DEN}")).alias("rq"),
            )
        )
        # checkpoint every 2nd iteration: a blocking job per iteration is
        # pure scheduling overhead at vocab scale (measured 3.13 -> 2.47 s
        # for 10 iterations at sf0.1, identical output); plan depth stays
        # bounded at `checkpoint_every` exchanges between cuts
        if (i + 1) % checkpoint_every == 0 or i == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    edges.unpersist()
    ed.unpersist()
    return ranks.select(
        "node", F.col("rq").alias("rank_q"),
        (F.col("rq").cast("double") / float(PR_SCALE)).alias("rank"),
    )


def textrank_keywords(documents: DataFrame, k: int = 25,
                      iters: int = PR_ITERS) -> DataFrame:
    """Top-k corpus keywords by PageRank over the co-occurrence graph."""
    pr = pagerank(cooccurrence_edges(documents), iters=iters)
    return (
        pr.select(F.col("node").alias("term"), "rank_q", "rank")
        .orderBy(F.desc("rank_q"), F.asc("term"))
        .limit(k)
    )


def pagerank_oracle_sql(iters: int = PR_ITERS, k: int = 25) -> str:
    """The identical power iteration as DuckDB SQL: the fixed iteration
    count unrolls to ``iters`` chained CTEs over the same integer
    arithmetic — generated from the same constants so the engines cannot
    drift."""
    s, dn, dd = PR_SCALE, PR_D_NUM, PR_D_DEN
    its = []
    for i in range(1, iters + 1):
        its.append(f"""
r{i} AS (
  SELECT e.dst AS node,
    nb.base_q + ({dn} * sum(r{i-1}.rq // d.outdeg)) // {dd} AS rq
  FROM b0 e
  JOIN r{i-1} ON e.src = r{i-1}.node
  JOIN deg d ON e.src = d.src
  CROSS JOIN nb
  GROUP BY e.dst, nb.base_q
)""")
    return f"""
WITH p AS (
  SELECT ws[i] AS src, ws[i+1] AS dst
  FROM (SELECT string_split(text, ' ') AS ws FROM documents),
       unnest(generate_series(1, len(ws) - 1)) AS t(i)
  WHERE ws[i] <> ws[i+1]
),
b0 AS (
  SELECT src, dst FROM p
  UNION
  SELECT dst AS src, src AS dst FROM p
),
deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM b0 GROUP BY src),
nb AS (
  SELECT count(DISTINCT src)::BIGINT AS n,
    (({dd} - {dn}) * {s}::BIGINT) // ({dd} * count(DISTINCT src)) AS base_q
  FROM b0
),
r0 AS (
  SELECT src AS node, ({s}::BIGINT // nb.n) AS rq
  FROM (SELECT DISTINCT src FROM b0) CROSS JOIN nb
),{",".join(its)}
SELECT node AS term, CAST(rq AS BIGINT) AS rank_q,
  CAST(rq AS DOUBLE) / {float(s)!r} AS rank
FROM r{iters}
ORDER BY rank_q DESC, term ASC
LIMIT {k}
"""
