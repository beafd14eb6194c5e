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


def copurchase_edges(lineitem: DataFrame, min_co: int = 2) -> DataFrame:
    """Market-basket co-occurrence graph: canonical undirected edges
    (u < v) between parts bought together in the same order at least
    `min_co` times.

    Scale shape: the pair fan-out is per-order local (quadratic only in
    basket size, bounded by the catalog's max order width) on the
    l_orderkey equi-join; the edge aggregate is one shuffle on the pair
    key with map-side combine, and `min_co` prunes the random-pair noise
    floor before any downstream graph work.
    """
    a = lineitem.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = lineitem.select("l_orderkey", F.col("l_partkey").alias("v"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= min_co)
        .select("u", "v")
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation via the degree-oriented 'forward'
    algorithm (Schank & Wagner 2005, public literature): orient every
    undirected edge from the (degree, id)-smaller endpoint to the larger,
    enumerate wedges from each source's out-neighborhood, and close them
    with ONE equi-join against the canonical (u < v) edge set.

    Why this is the 100 TB plan: degree orientation bounds every
    out-degree by O(sqrt(m)), so the wedge self-join — the only
    super-linear step — is quadratic per *oriented* adjacency list, not
    per raw hub degree; a power-law hub with 10^6 neighbors contributes
    almost nothing as a source because its edges orient INTO it. The
    closing step is a plain equi-join on (x, y), never an OR-condition
    join (which would force a nested-loop), and per-node counts come
    from exploding each triangle's three corners into one aggregate.
    Everything is exact integer arithmetic — oracle-checkable.

    `edges` must be canonical: one row per undirected edge with u < v.
    """
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = (
        edges.join(
            deg.select(F.col("node").alias("u"), F.col("deg").alias("du")),
            "u",
        ).join(
            deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")),
            "v",
        )
    )
    # u < v by construction, so the (deg, id) tie falls to u
    u_first = (F.col("du") < F.col("dv")) | (F.col("du") == F.col("dv"))
    o = e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    wedges = (
        o.select(F.col("src").alias("s"), F.col("dst").alias("x"))
        .join(o.select(F.col("src").alias("s"), F.col("dst").alias("y")), "s")
        .filter(F.col("x") < F.col("y"))
    )
    tri = wedges.join(
        edges.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"],
    )
    corners = tri.select(F.explode(F.array("s", "x", "y")).alias("node"))
    return (
        corners.groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
        .join(deg, "node")
        .select(F.col("node").alias("part_key"), "deg", "n_tri")
        .orderBy(F.desc("n_tri"), F.asc("part_key"))
    )


def triangle_oracle_sql(min_co: int = 2) -> str:
    """Oracle: the identical degree-oriented wedge-close pipeline in SQL,
    generated from the same `min_co` so the graphs cannot drift."""
    return f"""
WITH pr AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a
  JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
e AS (SELECT u, v FROM pr GROUP BY u, v HAVING count(*) >= {min_co}),
deg AS (
  SELECT node, count(*)::BIGINT AS deg FROM (
    SELECT u AS node FROM e UNION ALL SELECT v FROM e
  ) GROUP BY node
),
o AS (
  SELECT CASE WHEN d1.deg <= d2.deg THEN e.u ELSE e.v END AS src,
         CASE WHEN d1.deg <= d2.deg THEN e.v ELSE e.u END AS dst
  FROM e
  JOIN deg d1 ON e.u = d1.node
  JOIN deg d2 ON e.v = d2.node
),
w AS (
  SELECT o1.src AS s, o1.dst AS x, o2.dst AS y
  FROM o o1 JOIN o o2 ON o1.src = o2.src AND o1.dst < o2.dst
),
tri AS (
  SELECT s, x, y FROM w JOIN e ON w.x = e.u AND w.y = e.v
),
corners AS (
  SELECT unnest([s, x, y]) AS node FROM tri
),
cnt AS (SELECT node, count(*)::BIGINT AS n_tri FROM corners GROUP BY node)
SELECT c.node AS part_key, d.deg, c.n_tri
FROM cnt c JOIN deg d ON c.node = d.node
ORDER BY c.n_tri DESC, part_key ASC
"""


LPA_ITERS = 5


def lpa_communities(edges: DataFrame, iters: int = LPA_ITERS,
                    checkpoint_every: int = 2) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007, public
    paper) over a canonical undirected edge list (u < v): every node
    starts as its own label; each iteration it adopts the most frequent
    label among its NEIGHBORS, ties broken by smallest label — fully
    deterministic, so a fixed iteration count makes this iterative
    operator oracle-checkable by unrolled CTEs (the pagerank precedent;
    the usual random-order asynchronous LPA is not).

    Scale shape: per iteration ONE join of the symmetrized edges against
    the label relation (both keyed by node), one (node, label) groupBy
    with map-side combine, one windowed argmax on the node shuffle it
    already has. All integer arithmetic; driver state is nothing.
    localCheckpoint every `checkpoint_every` iterations bounds plan
    depth (pagerank precedent). Returns (node, community, csize).
    """
    from pyspark.sql import Window as W

    sym = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    labels = (
        sym.select(F.col("u").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    w = W.partitionBy("n").orderBy(F.desc("c"), F.asc("label"))
    for i in range(iters):
        votes = sym.join(labels, sym.v == labels.node).select(
            F.col("u").alias("n"), "label"
        )
        labels = (
            votes.groupBy("n", "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(F.col("n").alias("node"), "label")
        )
        if (i + 1) % checkpoint_every == 0 or i == iters - 1:
            labels = labels.localCheckpoint(eager=True)
    sym.unpersist()
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("csize")
    )
    return labels.join(sizes, "label").select(
        "node", F.col("label").alias("community"), "csize"
    )


def lpa_oracle_sql(iters: int = LPA_ITERS, min_co: int = 2) -> str:
    """Oracle: identical synchronous propagation as unrolled CTEs over
    the same co-purchase graph (same `min_co`)."""
    its = []
    for i in range(iters):
        its.append(f"""
v{i} AS (SELECT s.u AS n, l.label FROM sym s JOIN l{i} l ON s.v = l.node),
c{i} AS (SELECT n, label, count(*) AS c FROM v{i} GROUP BY n, label),
l{i + 1} AS (
  SELECT n AS node, label FROM (
    SELECT n, label,
      row_number() OVER (PARTITION BY n ORDER BY c DESC, label ASC) AS rk
    FROM c{i}
  ) WHERE rk = 1
)""")
    return f"""
WITH pr AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a
  JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
e AS (SELECT u, v FROM pr GROUP BY u, v HAVING count(*) >= {min_co}),
sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
l0 AS (SELECT DISTINCT u AS node, u AS label FROM sym),
{",".join(its)},
sz AS (SELECT label, CAST(count(*) AS BIGINT) AS csize
       FROM l{iters} GROUP BY label)
SELECT l.node, l.label AS community, sz.csize
FROM l{iters} l JOIN sz ON l.label = sz.label
"""


def link_prediction(edges: DataFrame, k: int = 50) -> DataFrame:
    """Link prediction by neighborhood Jaccard (Liben-Nowell & Kleinberg
    2003, public literature): for every NON-adjacent pair at distance 2,
    score = |N(u)∩N(v)| / |N(u)∪N(v)| — the classic 'customers who
    bought X also bought Y' candidate feature.

    Shape: wedges enumerate once per common neighbor (mid) via the
    symmetric-adjacency self-join with a < b — unlike triangle counting
    there is no orientation trick, because every wedge contributes to
    its endpoint pair's count; hub mids are therefore the scale risk,
    and at 100 TB the mitigation is the same hot-bucket cap the LSH
    family uses (drop mids above a degree ceiling — they contribute
    near-zero Jaccard anyway since deg(mid) inflates both unions).
    Here the fixture's co-purchase degrees are bounded, so the exact
    tier runs uncapped and stays oracle-checkable. One groupBy on the
    candidate pair, LEFT ANTI against the edge set (predict NEW links
    only), broadcast-size degree relation joined twice, TakeOrdered for
    the top-k.

    Integers end-to-end except the single final division (identical
    IEEE double in any engine). Returns (a, b, common, deg_a, deg_b,
    jaccard) — top-k by (jaccard desc, a, b).
    """
    # the edge relation feeds SEVEN plan subtrees (sym twice, the degree
    # relation, the anti probe); a lazy localCheckpoint materializes the
    # expensive co-purchase aggregation exactly once instead of
    # replaying the corpus self-join per subtree
    edges = edges.localCheckpoint(eager=False)
    sym = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    w1 = sym.select(F.col("v").alias("mid"), F.col("u").alias("a"))
    w2 = sym.select(F.col("v").alias("mid"), F.col("u").alias("b"))
    pairs = (
        w1.join(w2, "mid")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
        .join(edges.select(F.col("u").alias("a"), F.col("v").alias("b")),
              ["a", "b"], "left_anti")
    )
    da = deg.select(F.col("u").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("u").alias("b"), F.col("deg").alias("deg_b"))
    scored = (
        pairs.join(da, "a").join(db, "b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("deg_a") + F.col("deg_b") - F.col("common"))
            .cast("double"),
        )
    )
    return (
        scored.select("a", "b", "common", "deg_a", "deg_b", "jaccard")
        .orderBy(F.desc("jaccard"), F.asc("a"), F.asc("b"))
        .limit(k)
    )


def link_prediction_oracle_sql(k: int = 50, min_co: int = 2) -> str:
    """Oracle: the identical wedge-count + anti-edge + Jaccard pipeline
    over the same co-purchase graph."""
    return f"""
WITH pr AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a
  JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
e AS (SELECT u, v FROM pr GROUP BY u, v HAVING count(*) >= {min_co}),
sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY u),
cand AS (
  SELECT w1.u AS a, w2.u AS b, CAST(count(*) AS BIGINT) AS common
  FROM sym w1 JOIN sym w2 ON w1.v = w2.v AND w1.u < w2.u
  GROUP BY w1.u, w2.u
),
nonedge AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = c.a AND e.v = c.b)
)
SELECT n.a, n.b, n.common,
  da.deg AS deg_a, db.deg AS deg_b,
  CAST(n.common AS DOUBLE)
    / CAST(da.deg + db.deg - n.common AS DOUBLE) AS jaccard
FROM nonedge n
JOIN deg da ON n.a = da.u
JOIN deg db ON n.b = db.u
ORDER BY jaccard DESC, n.a ASC, n.b ASC
LIMIT {k}
"""


BFS_DEPTH = 4


def bfs_distances(edges: DataFrame, depth: int = BFS_DEPTH) -> DataFrame:
    """Frontier BFS over the undirected graph from a deterministic
    source (the minimum node id): (node, dist) for every node within
    ``depth`` hops — the traversal primitive under reachability /
    ego-network features.

    Scale shape: per level ONE join of the CURRENT frontier (not the
    visited set) against the adjacency relation keyed by node, one
    distinct, one anti join against the visited relation — work is
    proportional to the frontier's edge boundary, the textbook
    frontier-BFS bound. Visited state stays a distributed DataFrame
    (localCheckpoint per level bounds lineage depth, the pagerank
    precedent); driver state is the single source id. Fixed depth makes
    the iterative operator oracle-checkable by unrolled CTEs.
    """
    edges = edges.localCheckpoint(eager=False)
    sym = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    source = edges.agg(F.min("u")).first()[0]
    dist = edges.sparkSession.createDataFrame(
        [(source, 0)], "node long, dist int"
    ).localCheckpoint(eager=True)
    frontier = dist
    for d in range(1, depth + 1):
        nxt = (
            frontier.join(sym, frontier.node == sym.u)
            .select(F.col("v").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .withColumn("dist", F.lit(d))
            .localCheckpoint(eager=True)
        )
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return dist


def bfs_oracle_sql(depth: int = BFS_DEPTH, min_co: int = 2) -> str:
    """Oracle: identical frontier expansion as unrolled CTEs over the
    same co-purchase graph, source = min node id."""
    its = []
    for d in range(1, depth + 1):
        its.append(f"""
f{d} AS (
  SELECT DISTINCT s.v AS node, {d} AS dist
  FROM sym s JOIN f{d - 1} p ON s.u = p.node
  WHERE NOT EXISTS (SELECT 1 FROM a{d - 1} x WHERE x.node = s.v)
),
a{d} AS (SELECT node, dist FROM a{d - 1}
         UNION ALL SELECT node, dist FROM f{d})""")
    return f"""
WITH pr AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a
  JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
e AS (SELECT u, v FROM pr GROUP BY u, v HAVING count(*) >= {min_co}),
sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
f0 AS (SELECT min(u) AS node, 0 AS dist FROM e),
a0 AS (SELECT node, dist FROM f0),
{",".join(its)}
SELECT node, CAST(dist AS INT) AS dist FROM a{depth}
"""
