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
    # r10 window — _NEXT_WINDOW_PLAN_R10 rotated in VERBATIM (VERDICT r9
    # #1): 50 of the 55 never-checked entries remaining after the r9
    # window drained its 40, prioritized so the two names losing
    # recent-addition grace at r9 close (kmeans_embeddings, pq_ann_topk)
    # lead. Drains never-checked debt 55 -> 6 (the five deferred codec
    # tiers + multimodal_png_palette, which open _NEXT_WINDOW_PLAN_R11
    # below).
    # Registry growth stays frozen through this round (VERDICT r9 #4).
    "kmeans_embeddings", "pq_ann_topk", "ha_lineprotocol_roundtrip",
    "skew_report", "sketch_hll_partitioned", "bpe_encode", "bpe_vocab",
    "ngram_containment_capped", "pack_ffd", "contrastive_triplets",
    "dataset_card", "line_dedup", "hard_negatives", "semdedup",
    "lm_surprise", "multimodal_png_rgb", "multimodal_wav_stereo",
    "stream_lineprotocol", "stream_cq_downsample", "stream_flatline",
    "stream_hysteresis", "influx_nn_derivative", "influx_stddev_median",
    "influx_fill_linear", "influx_bottom3", "influx_distinct",
    "influx_holt_winters", "influx_percentile_approx", "influx_ema",
    "influx_state_mode", "influx_state_durations", "influx_rollup_cascade",
    "ha_energy_daily", "influxql_explain", "flux_task_hourly_mean",
    "flux_now_relative", "flux_schema_measurements",
    "flux_schema_tag_values", "flux_schema_m_tag_values",
    "flux_schema_field_keys", "flux_union_streams", "ha_statistics_sum",
    "ha_statistics_daily", "ha_history_stats", "ha_statistics_monthly",
    "series_hysteresis_alerts", "series_acf", "series_fleet_correlation",
    "series_rolling_quantile", "series_flatline_runs",
]
assert len(_DRIVER_WINDOW) == 50

# Committed r11 rotation (re-balanced at r10 per VERDICT r9 #2). The
# r10 close makes 94 names stale-or-never-checked: the 6 never-checked
# codec tiers (incl. multimodal_png_palette, scheduled at birth), the
# 40 entries whose last driver row is r5 (stale since r9 close), and
# the 48 whose last row is r6 (stale the moment CORRECTNESS_r10.json
# lands: latest=10 needs last>=7). R11 takes the 6 never-checked +
# all 40 last=r5 + the first 4 last=r6; _NEXT_WINDOW_PLAN_R12 takes
# the remaining 44 last=r6. 94 names across two <=50 windows — after
# r11 runs, never-checked debt is 0.
_NEXT_WINDOW_PLAN_R11 = [
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
assert len(_NEXT_WINDOW_PLAN_R11) == 50

# Committed r12 rotation: the remaining 44 last=r6 entries (everything
# the r10 close leaves stale that R11 doesn't hold). The r11 builder
# re-balances this list with its own newly-stale set at round close.
_NEXT_WINDOW_PLAN_R12 = [
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
]
assert len(_NEXT_WINDOW_PLAN_R12) == 44


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
