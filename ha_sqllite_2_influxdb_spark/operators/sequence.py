"""Behavioral sequence similarity: top-k users by event-SEQUENCE
trigram Jaccard against a query user — the trajectory-similarity
pattern (REPOSE / trajectory top-k literature): similarity over ORDERED
event streams, not bags, so "view→click→purchase" and
"purchase→click→view" users are far apart even with identical event
counts.

Shape, 100 TB reasoning:
- ONE corpus shuffle builds every user's ordered event-type sequence
  (groupBy user + sort_array over (ts, event_id, type) structs — the
  per-user ordering rides inside the row, never a global sort);
- sequences collapse to DISTINCT trigram sets per row (array ops,
  row-local, bounded by sequence length);
- the query user's trigram set is a 1-row broadcast; scoring is a
  row-local intersect/union — no pairwise join, O(users) not
  O(users²). All-pairs behavioral clustering would compose this with
  the LSH banding machinery in operators.dedup instead.
- TakeOrderedAndProject serves the top-k.

Jaccard is |∩| / (|a|+|b|−|∩|): integer sizes, one final double
division — engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _user_trigrams(events: DataFrame) -> DataFrame:
    """Per user: DISTINCT trigrams of the time-ordered event-type
    sequence (ties broken by event_id — a total order, so any engine
    builds the identical sequence)."""
    seq = (
        events.groupBy("user_id")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s.getField("event_type"),
            ).alias("seq")
        )
    )
    tri = F.when(
        F.size("seq") >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("seq") - 3),
                lambda i: F.concat_ws(
                    ">", F.get("seq", i), F.get("seq", i + 1),
                    F.get("seq", i + 2),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return seq.select("user_id", tri.alias("tri"))


def user_sequence_similarity(events: DataFrame, query_user: int = 0,
                             k: int = 20) -> DataFrame:
    """Top-k users most behaviorally similar to ``query_user``."""
    tris = _user_trigrams(events)
    q = tris.filter(F.col("user_id") == query_user).select(
        F.col("tri").alias("q_tri")
    )
    scored = (
        tris.filter(F.col("user_id") != query_user)
        .join(F.broadcast(q))
        .withColumn("n_common",
                    F.size(F.array_intersect("tri", "q_tri")).cast("long"))
        .withColumn("n_tri", F.size("tri").cast("long"))
        .withColumn("n_query", F.size("q_tri").cast("long"))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_tri") + F.col("n_query") - F.col("n_common"))
            .cast("double"),
        )
    )
    return (
        scored.select("user_id", "n_common", "n_tri", "n_query", "jaccard")
        .orderBy(F.desc("jaccard"), F.asc("user_id"))
        .limit(k)
    )


def sequence_similarity_oracle_sql(query_user: int = 0,
                                   k: int = 20) -> str:
    """Oracle: the identical sequence→trigram→Jaccard pipeline."""
    return f"""
WITH seqs AS (
  SELECT user_id,
         list(event_type ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
),
tris AS (
  SELECT user_id,
    CASE WHEN len(seq) >= 3 THEN list_distinct(list_transform(
      generate_series(1, len(seq) - 2),
      i -> seq[i] || '>' || seq[i+1] || '>' || seq[i+2]))
    ELSE [] END AS tri
  FROM seqs
),
q AS (SELECT tri AS q_tri FROM tris WHERE user_id = {query_user}),
scored AS (
  SELECT t.user_id,
    CAST(len(list_intersect(t.tri, q.q_tri)) AS BIGINT) AS n_common,
    CAST(len(t.tri) AS BIGINT) AS n_tri,
    CAST(len(q.q_tri) AS BIGINT) AS n_query
  FROM tris t CROSS JOIN q
  WHERE t.user_id <> {query_user}
)
SELECT user_id, n_common, n_tri, n_query,
  CAST(n_common AS DOUBLE)
    / CAST(n_tri + n_query - n_common AS DOUBLE) AS jaccard
FROM scored
ORDER BY jaccard DESC, user_id ASC
LIMIT {k}
"""
