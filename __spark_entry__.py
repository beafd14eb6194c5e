"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship HA-points pipeline at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ha_sqllite_2_influxdb_spark.plans.ha_pipeline import q_points

    return q_points(spark, "/root/testdata/sf0.001")


# The round driver correctness-checks the FIRST 50 registry entries in
# insertion order. Every name below has a DuckDB oracle, so all 50 driver
# slots produce a strong rows+schema+hash verdict. Entries past the window
# (no-oracle scale tiers, redundant analytics variants) still run under
# pytest (tests/test_oracle_parity.py covers the whole registry).
_DRIVER_WINDOW = [
    # SURVEY §2 reference pipeline: S/P/J/A/O/F rows + T1 backfill.
    # Rotated r6 per VERDICT r5 #1: 15 three-rounds-green slots
    # (ha_ts_format, events_hourly, stream_dedup, stream_join, dedup_exact,
    # neardup_minhash_lsh, decontaminate, pack_sequences, curriculum_topk,
    # embedding_centroids, tpch_q1/q6/q19, set_ops, window_running) left the
    # window — their pytest oracle coverage stays — to give every round-5
    # addition its first independent driver verdict.
    "ha_points", "ha_attr_fields",
    "ha_oldest_point", "ha_backfill_boundary", "ha_line_protocol",
    # SURVEY §2 T2-T4: sessions stays per VERDICT r5 #1 to confirm the
    # HUGEINT oracle-type fix under the real driver; stream_static_join
    # gets its first driver row.
    # events_sliding rotated out late-r6 (multi-round green) for the
    # composed ingest_pipeline first verdict
    "stream_sessions", "session_window_native",
    "ingest_pipeline",
    "stream_static_join",
    # streaming MERGE sink + stateful EMA fold (new r6, first verdicts)
    "stream_upsert", "stream_ema",
    # LLM data pipeline: deduplication + cluster-canonical selection
    # (ngram_jaccard / simhash_signatures rotated out late-r6 — r5-green —
    # for the two newest scoring/projection ops' first verdicts)
    "ngram_span_dedup",
    "ngram_containment", "quality_classifier", "random_projection",
    "sketch_topk_ngrams",
    # incremental MV maintenance + LPA communities (newest r6 additions;
    # dedup_keep_best / simhash_neighbors rotate out r5-green)
    "incremental_agg", "lpa_communities",
    # IR ranking + quality gates + LM rarity (new r6, first verdicts)
    "tfidf_topk", "bm25_topk", "gopher_rules", "lm_rare_bigrams",
    "textrank_keywords",
    # corpus curation: end-to-end pipeline + training-order ops (first
    # driver verdicts for all three r5 additions)
    "curate_pipeline", "training_shuffle", "dataset_split",
    # similarity search (exact tier; ANN tiers are rows-only, after window)
    # embedding_knn rotated out late-r6 (green r1-r5, still benched
    # with its paired PQ tier) for the per-row quarantine gate
    "quarantine_rows",
    # skew-aware ops + upsert
    "salted_join", "distinct_twophase", "upsert_latest",
    # analytics breadth: TPC-H adaptations, windows, special joins,
    # grouping sets / rollup, pivot, quantiles, range-band join.
    # tpch_q2/q11/q12/q15/q16/q20/q21, full_outer_join and
    # window_time_range enter for their first driver verdict.
    # tpch_q3/q5 rotated out late-r6 (green r1-r5; still benched) for the
    # validation + streaming-topk first verdicts
    "data_expectations", "stream_window_topk",
    "tpch_q2",
    "tpch_q11", "tpch_q12",
    "tpch_q15", "tpch_q16", "tpch_q20", "tpch_q21",
    # InfluxQL post-migration query layer (newest r6 additions — the
    # sink-side functions reference users run on the migrated series;
    # tpch_q7/q8/q9/q10 rotate out green r1-r5, pytest coverage stays)
    "influx_derivative", "influx_integral", "influx_moving_average",
    "influx_series_stats",
    "range_band_join", "full_outer_join",
    "window_time_range", "scd2_intervals",
    # exact robust statistics + time-series resample + funnel (new r6)
    "robust_outliers", "resample_locf", "funnel_steps",
    # pivot_events / quantiles / window_topk / sessionize / asof_join /
    # grouping_sets / rollup_orders / tpch_q13 / tpch_q18 / tpch_q22 /
    # multimodal_frames / embedding_neardup rotated out this round
    # (multi-round green; pytest oracle coverage stays) to give the
    # twelve r6 additions first driver verdicts.
]
assert len(_DRIVER_WINDOW) == 50


def _registry():
    from ha_sqllite_2_influxdb_spark.plans import ha_pipeline

    modules = [ha_pipeline]
    for name in ("analytics", "llm_ops", "streaming_ops", "influxql"):
        try:
            mod = __import__(
                f"ha_sqllite_2_influxdb_spark.plans.{name}", fromlist=[name]
            )
            modules.append(mod)
        except ImportError:
            pass
    pool: dict[str, Callable] = {}
    oracles: dict[str, str] = {}
    for mod in modules:
        pool.update(getattr(mod, "QUERIES", {}))
        oracles.update(getattr(mod, "ORACLES", {}))
    queries: dict[str, Callable] = {n: pool.pop(n) for n in _DRIVER_WINDOW}
    queries.update(pool)
    return queries, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
