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
# insertion order. Most slots are oracle-backed (rows+schema+hash
# verdict); the handful that are rows-only BY NATURE (iterative /
# approximate / codec tiers with no exact SQL counterpart) are
# enumerated in ROWS_ONLY_OK in tests/test_oracle_parity.py's
# test_driver_window_contract, each pinned by an exact-counterpart
# pytest instead. Entries past the window still run under pytest
# (tests/test_oracle_parity.py covers the whole registry).
_DRIVER_WINDOW = [
    # r12 window — _NEXT_WINDOW_PLAN_R12 rotated in VERBATIM (VERDICT
    # r11 #1, the fifth byte-verbatim rotation): the two r11-registered
    # codec tiers lead (both oracle-backed, so they land hash-exact),
    # then the 44 oldest stale names (last=r6: TPC-H q11-q21, the
    # streaming tiers, ha_points, quarantine_rows, the curation
    # pipelines) and the first 4 last=r7 entries. Every slot is
    # oracle-backed — ROWS_ONLY_OK is empty for this window.
    "multimodal_png_gray16", "multimodal_jpeg_progressive",
    "tpch_q11", "tpch_q12", "tpch_q15", "tpch_q16", "tpch_q20", "tpch_q21",
    "salted_join", "distinct_twophase", "range_band_join",
    "window_time_range", "full_outer_join", "upsert_latest",
    "scd2_intervals", "robust_outliers", "resample_locf", "funnel_steps",
    "lpa_communities", "data_expectations", "incremental_agg",
    "quarantine_rows", "ingest_pipeline", "ngram_containment",
    "ngram_span_dedup", "curate_pipeline", "tfidf_topk", "bm25_topk",
    "gopher_rules", "lm_rare_bigrams", "textrank_keywords",
    "quality_classifier", "random_projection", "sketch_topk_ngrams",
    "dataset_split", "training_shuffle", "stream_sessions",
    "stream_static_join", "stream_upsert", "stream_ema",
    "session_window_native", "stream_window_topk", "influx_derivative",
    "influx_integral", "influx_moving_average", "influx_series_stats",
    "ha_points", "ha_oldest_point", "tpch_q14", "cohort_retention",
]
assert len(_DRIVER_WINDOW) == 50

# Committed r13 rotation (kept VERBATIM from the r11 commit): the
# remaining 45 last=r7 entries plus the 4 follow-on codec tiers and
# the dHash near-dup registration (all oracle-backed).
_NEXT_WINDOW_PLAN_R13 = [
    # the four r11 follow-on codec registrations (DRI resync, sub-byte
    # palette, 24-bit PCM, tRNS alpha), all oracle-backed
    "multimodal_jpeg_dri", "multimodal_png_palette4",
    "multimodal_wav_pcm24", "multimodal_png_trns",
    "event_transitions", "profile_columns",
    "path_mining", "triangle_copurchase", "link_prediction",
    "bfs_distances", "json_props_stats", "sequence_similarity",
    "cuped_readout", "frequent_triples", "audience_overlap", "ohlc_bars",
    "conversion_latency", "pit_join", "kcore", "data_gaps",
    "ab_proportion_test", "seasonal_anomaly", "zorder_events",
    "daily_new_returning", "dedup_incremental", "bpe_pair_counts",
    "chunk_documents", "curate_mixture_pipeline", "hybrid_rrf",
    "pmi_bigrams", "html_strip", "repetition_stats", "lang_rebalance",
    "split_leakage_free", "sample_weighted", "multimodal_bmp",
    "multimodal_png", "multimodal_wav", "multimodal_jpeg",
    "stream_dedup_incremental", "stream_incremental_agg", "stream_ohlc",
    "influx_cumulative_sum", "influx_difference", "influx_percentile",
    "influx_downsample", "influx_mode", "influx_top3", "influx_sample",
    # the r11-session dHash image-near-dup registration (oracle-backed,
    # lands hash-exact) takes R13's one free slot
    "multimodal_dhash_neardup",
]
assert len(_NEXT_WINDOW_PLAN_R13) == 50

# Committed r14 rotation (r12 re-balance per VERDICT r11 #2 / ADVICE
# r11 #3): the 49 entries whose last driver row is r8 — they age out
# the moment CORRECTNESS_r12.json lands (latest=12 needs last>=9) —
# plus stream_phash_dedup, the first of the six r11 grace-riding
# perceptual registrations (oracle-backed; its batch classifier IS the
# exact oracle).
_NEXT_WINDOW_PLAN_R14 = [
    "stream_phash_dedup",
    "ha_migration_scan", "ha_min_ts", "ha_state_route", "ha_entity_split",
    "tpch_q4", "tpch_q17", "unpivot_part", "window_analytics",
    "cube_orders", "sketch_distinct", "sketch_quantiles",
    "semi_late_orders", "anti_no_orders", "promo_share",
    "small_qty_revenue", "big_orders", "top_customers", "agg_stats",
    "touch_attribution", "behavior_allpairs", "minhash_signatures",
    "ngram_novelty", "bloom_decontaminate", "curate_dsir_pipeline",
    "neardup_xxhash_lsh", "mrl_rerank", "embedding_ann_lsh",
    "embedding_ivf", "dsir_resample", "inverted_index",
    "inverted_index_sharded", "multimodal_decode", "multimodal_gif",
    "multimodal_gif_anim", "stream_knn", "stream_bloom_gate",
    "influxql_show_series", "influxql_text_tz", "influxql_text_math",
    "influxql_text_delete", "influxql_text_multi",
    "flux_window_fill_prev", "ha_statistics_hourly",
    "ha_statistics_cascade", "stream_ha_statistics", "ha_utility_meter",
    "ha_energy_cost", "slo_burn_rate", "series_mean_shift",
]
assert len(_NEXT_WINDOW_PLAN_R14) == 50

# Committed r15 rotation: the remaining five r11 grace-riding
# registrations lead (multimodal_audio_fp, _video_fp, _phash_pipeline,
# _phash_knn oracle-backed; _phash_knn_banded rows-only by nature —
# LSH shortlist recall, pinned vs the exact tier in pytest; add it to
# ROWS_ONLY_OK when this plan rotates into the window), then 45 of the
# 50 last=r9 entries. Committing THREE plans is within the gate's new
# depth-3 bound: the registry (305) outgrew the two-plan capacity
# (50*(4+2)=300), and ceil(305/50)=7 rounds is the rotation floor —
# window + 3 committed plans + FRESH_ROUNDS=4 covers exactly that
# period without weakening the freshness bar (see
# tests/test_advice_regressions.py::test_driver_window_freshness).
# The 5 last=r9 names this plan could not hold (flux_state_duration,
# flux_pivot_fields, flux_histogram, flux_histogram_quantile,
# flux_join_math) stay fresh through the r14 close and MUST lead
# _NEXT_WINDOW_PLAN_R16 at the r13 re-balance.
_NEXT_WINDOW_PLAN_R15 = [
    "multimodal_audio_fp", "multimodal_video_fp",
    "multimodal_phash_pipeline", "multimodal_phash_knn",
    "multimodal_phash_knn_banded",
    "simhash_neighbors_rotated", "token_stats", "text_quality",
    "lang_id", "fingerprints", "text_clean", "top_bigrams", "text_scrub",
    "sample_uniform", "sample_stratified", "multimodal_meta",
    "influxql_text_downsample", "influxql_text_counter_rate",
    "influxql_text_top", "influxql_text_raw", "influxql_text_summary",
    "influxql_text_subquery", "influxql_text_cq",
    "influxql_show_measurements", "influxql_show_tag_values",
    "influxql_show_cardinality", "influxql_text_regex_or",
    "influxql_text_now", "influxql_text_stats", "influxql_text_mode",
    "influxql_text_offset", "influxql_text_elapsed",
    "influxql_text_sample", "influxql_text_integral",
    "influxql_text_bucket_offset", "influxql_show_databases",
    "influxql_show_retention", "influxql_text_scaled",
    "influxql_text_agg_limit", "influxql_rate_of_mean",
    "flux_oldest_point", "flux_oldest_global", "flux_downsample_mean",
    "flux_increase", "flux_derivative_nn", "flux_group_domain_mean",
    "flux_map_scale_mean", "flux_quantile", "flux_last_per_series",
    "flux_top_sensors",
]
assert len(_NEXT_WINDOW_PLAN_R15) == 50


def _registry():
    from ha_sqllite_2_influxdb_spark.plans import ha_pipeline

    modules = [ha_pipeline]
    for name in ("analytics", "llm_ops", "streaming_ops", "influxql",
                 "influxql_text", "flux_text", "ha_stats", "monitoring"):
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
