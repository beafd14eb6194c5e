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
    # r11 window — _NEXT_WINDOW_PLAN_R11 rotated in VERBATIM (VERDICT
    # r10 #1, the third byte-verbatim rotation): the 6 never-checked
    # codec tiers lead (never-checked debt 6 -> 0 this round), then the
    # 40 entries whose last driver row is r5 (the SURVEY §2 TPC-H /
    # dedup / LSH core) and the first 4 last=r6 entries. Rows-only by
    # nature: multimodal_wav_adpcm, multimodal_thumbnail (see
    # ROWS_ONLY_OK).
    "multimodal_png_adam7", "multimodal_gif_lct", "multimodal_png_palette",
    "multimodal_wav_adpcm", "multimodal_jpeg_color", "multimodal_thumbnail",
    "ha_ts_format", "grouping_sets", "tpch_q7", "tpch_q10", "tpch_q19",
    "tpch_q18", "tpch_q22", "tpch_q8", "tpch_q9", "tpch_q13", "asof_join",
    "quantiles", "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "window_topk",
    "window_running", "sessionize", "set_ops", "pivot_events",
    "rollup_orders", "multimodal_frames", "dedup_exact",
    "neardup_minhash_lsh", "ngram_jaccard", "neardup_clusters",
    "dedup_keep_best", "decontaminate", "pack_sequences", "curriculum_topk",
    "embedding_centroids", "simhash_signatures", "simhash_neighbors",
    "embedding_knn", "embedding_neardup", "events_hourly", "stream_dedup",
    "events_sliding", "stream_join", "ha_attr_fields",
    "ha_backfill_boundary", "ha_line_protocol", "tpch_q2",
]
assert len(_DRIVER_WINDOW) == 50

# Committed r12 rotation (re-balanced at r11 per VERDICT r10 #2). The
# r11 close makes 93 names stale: the 44 last=r6 entries the old R12
# plan already held (stale since r10 close) plus the 49 last=r7
# entries that age out the moment CORRECTNESS_r11.json lands
# (latest=11 needs last>=8). R12 leads with the two r11-registered
# codec tiers, keeps the 44 oldest stale names (last=r6) and takes
# the first 4 last=r7; _NEXT_WINDOW_PLAN_R13 takes the remaining 45.
# 93 stale + 2 new across two <=50 windows — zero
# stale-and-unscheduled at r11 close.
_NEXT_WINDOW_PLAN_R12 = [
    # the two r11-registered codec tiers lead (VERDICT r10 #5): both
    # carry exact DuckDB oracles, so they land hash-exact at r12
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
assert len(_NEXT_WINDOW_PLAN_R12) == 50

# Committed r13 rotation: the remaining 45 last=r7 entries (including
# the two the new codec registrations displaced from R12). The r12
# builder re-balances this list with its own newly-stale set at close.
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

# NOTE for the r12 re-balance: six further r11-session registrations —
# multimodal_audio_fp, multimodal_video_fp, stream_phash_dedup,
# multimodal_phash_pipeline, multimodal_phash_knn (all oracle-backed,
# hash-exact in the r11 sims) and multimodal_phash_knn_banded
# (rows-only by nature — LSH shortlist recall, pinned vs the exact tier
# in pytest) — ride the freshness gate's birth grace (introduced=11)
# because both committed plans are full; slot them when the r12 close
# re-balances R13/R14.


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
