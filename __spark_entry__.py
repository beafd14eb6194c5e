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
    # Rotated r4 per VERDICT r2 #7: ha_migration_scan / ha_entity_split /
    # ha_state_route / ha_min_ts left the window (their transforms are
    # exercised INSIDE ha_points / ha_oldest_point, which stay) to give
    # tpch_q7/q10/q22, window_topk and events_sliding a driver verdict.
    "ha_points", "ha_attr_fields",
    "ha_oldest_point", "ha_backfill_boundary", "ha_line_protocol",
    "ha_ts_format",
    # SURVEY §2 T2-T4: streaming drain / dedup / windows / sessions /
    # stream-stream interval join + the native session-window tier
    "events_hourly", "stream_dedup", "stream_sessions", "stream_join",
    "events_sliding", "session_window_native",
    # LLM data pipeline: deduplication + cluster-canonical selection
    # (minhash_signatures rotated out: neardup_minhash_lsh builds on it)
    "dedup_exact", "neardup_minhash_lsh",
    "neardup_clusters", "dedup_keep_best", "ngram_jaccard",
    "simhash_signatures", "simhash_neighbors",
    # corpus curation: decontamination, packing, curriculum
    "decontaminate", "pack_sequences", "curriculum_topk",
    # similarity search (exact tiers; ANN tiers are rows-only, after window)
    "embedding_knn", "embedding_neardup", "embedding_centroids",
    # text analysis (rotated r5 per VERDICT r4 #2: token_stats /
    # text_quality / lang_id / fingerprints / text_clean / top_bigrams /
    # text_scrub / sample_uniform / sample_stratified / multimodal_meta
    # left the window after 3 green rounds; their pytest oracle coverage
    # stays — the slots give the analytics breadth a driver verdict)
    # multimodal columns
    "multimodal_frames",
    # skew-aware ops
    "salted_join", "distinct_twophase",
    # analytics breadth: TPC-H adaptations, windows, special joins,
    # grouping sets / rollup, set ops, pivot, quantiles, range-band join
    # (q4/q17, cube, sketches, upsert, z-order and the ANN tiers sit
    # past the window; all stay covered by the pytest oracle suite)
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q7",
    "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q13", "tpch_q18",
    "tpch_q19", "tpch_q22",
    "grouping_sets", "rollup_orders", "set_ops", "pivot_events",
    "quantiles", "range_band_join",
    "window_running", "window_topk", "sessionize", "asof_join",
]
assert len(_DRIVER_WINDOW) == 50


def _registry():
    from ha_sqllite_2_influxdb_spark.plans import ha_pipeline

    modules = [ha_pipeline]
    for name in ("analytics", "llm_ops", "streaming_ops"):
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
