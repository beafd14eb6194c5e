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
    # r13 window — _NEXT_WINDOW_PLAN_R13 rotated in VERBATIM (VERDICT
    # r12 #1, the sixth byte-verbatim rotation): the four r11 follow-on
    # codec registrations lead (DRI resync, sub-byte palette, 24-bit
    # PCM, tRNS alpha — all pre-swept via tools/codec_sweep.py, all
    # oracle-backed), then the remaining 45 last=r7 entries and the
    # r11-session dHash image-near-dup registration. Every slot is
    # oracle-backed — no ROWS_ONLY_OK exemption is exercised by this
    # window either (second all-oracle window in a row).
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
    "multimodal_dhash_neardup",
]
assert len(_DRIVER_WINDOW) == 50

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
# registrations lead — all five oracle-backed since r13
# (multimodal_phash_knn_banded graduated from rows-only to an exact
# oracle) — then 45 of the 50 last=r9 entries, of which ONE
# (simhash_neighbors_rotated) is rows-only by nature; it is already in
# the pinned ROWS_ONLY_OK set, so this plan still rotates verbatim
# with zero contract edits. Committing THREE plans is within the
# gate's new
# depth-3 bound: the registry (305) outgrew the two-plan capacity
# (50*(4+2)=300), and ceil(305/50)=7 rounds is the rotation floor —
# window + 3 committed plans + FRESH_ROUNDS=4 covers exactly that
# period without weakening the freshness bar (see
# tests/test_advice_regressions.py::test_driver_window_freshness).
# The 5 last=r9 names this plan could not hold lead
# _NEXT_WINDOW_PLAN_R16 below (committed at the r13 re-balance per
# VERDICT r12 #2, and held by the lookahead close simulation in
# tests/test_advice_regressions.py::test_rotation_survives_next_close
# rather than by this comment).
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

# Committed r16 rotation (r13 re-balance per VERDICT r12 #2): the five
# fenced last=r9 flux names LEAD (they age out at the r13 close —
# latest=13 needs last>=10 — so a committed slot, not a comment, is
# what keeps the gate green), then 45 of the 50 last=r10 entries in
# deterministic sorted order. The 5 last=r10 names this plan cannot
# hold (skew_report, stream_cq_downsample, stream_flatline,
# stream_hysteresis, stream_lineprotocol — the sorted-order tail) stay
# fresh through the r13 close and take the lead slots of
# _NEXT_WINDOW_PLAN_R17 at the r14 re-balance; unlike previous rounds
# that obligation is now gate-held, not comment-held — the lookahead
# close simulation (tests/test_advice_regressions.py::
# test_rotation_survives_next_close) fails at round-14 start until R17
# is committed with them.
_NEXT_WINDOW_PLAN_R16 = [
    "flux_state_duration", "flux_pivot_fields", "flux_histogram",
    "flux_histogram_quantile", "flux_join_math",
    "bpe_encode", "bpe_vocab", "contrastive_triplets", "dataset_card",
    "flux_now_relative", "flux_schema_field_keys",
    "flux_schema_m_tag_values", "flux_schema_measurements",
    "flux_schema_tag_values", "flux_task_hourly_mean",
    "flux_union_streams", "ha_energy_daily", "ha_history_stats",
    "ha_lineprotocol_roundtrip", "ha_statistics_daily",
    "ha_statistics_monthly", "ha_statistics_sum", "hard_negatives",
    "influx_bottom3", "influx_distinct", "influx_ema",
    "influx_fill_linear", "influx_holt_winters", "influx_nn_derivative",
    "influx_percentile_approx", "influx_rollup_cascade",
    "influx_state_durations", "influx_state_mode",
    "influx_stddev_median", "influxql_explain", "kmeans_embeddings",
    "line_dedup", "lm_surprise", "multimodal_png_rgb",
    "multimodal_wav_stereo", "ngram_containment_capped", "pack_ffd",
    "pq_ann_topk", "semdedup", "series_acf", "series_flatline_runs",
    "series_fleet_correlation", "series_hysteresis_alerts",
    "series_rolling_quantile", "sketch_hll_partitioned",
]
assert len(_NEXT_WINDOW_PLAN_R16) == 50


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
