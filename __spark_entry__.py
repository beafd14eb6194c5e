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
    # r9 window — _NEXT_WINDOW_PLAN_R9 rotated in VERBATIM (VERDICT r8
    # #1): 11 newly-stale entries (last row r4, plus the rows-only
    # straggler simhash_neighbors_rotated) + the influxql_text remainder
    # (24) + the first 15 flux_* entries. Drains 40 of the 95
    # never-checked (95 -> 55); the committed _NEXT_WINDOW_PLAN_R10 /
    # _R11 below close the rest (r10: the 50 highest-priority
    # never-checked incl. the two losing grace at r9 close; r11: the 5
    # deferred codec tiers + the 40 entries whose last driver row is r5
    # and which go stale the moment CORRECTNESS_r09.json lands).
    # Registry growth stays frozen until the debt is under one window
    # (VERDICT r8 #2).
    "simhash_neighbors_rotated", "token_stats", "text_quality", "lang_id",
    "fingerprints", "text_clean", "top_bigrams", "text_scrub",
    "sample_uniform", "sample_stratified", "multimodal_meta",
    "influxql_text_downsample", "influxql_text_counter_rate",
    "influxql_text_top", "influxql_text_raw", "influxql_text_summary",
    "influxql_text_subquery", "influxql_text_cq", "influxql_text_regex_or",
    "influxql_text_now", "influxql_text_stats", "influxql_text_mode",
    "influxql_text_offset", "influxql_text_elapsed", "influxql_text_sample",
    "influxql_text_integral", "influxql_text_bucket_offset",
    "influxql_text_scaled", "influxql_text_agg_limit",
    "influxql_show_measurements", "influxql_show_tag_values",
    "influxql_show_cardinality", "influxql_show_databases",
    "influxql_show_retention", "influxql_rate_of_mean",
    "flux_oldest_point", "flux_oldest_global", "flux_downsample_mean",
    "flux_increase", "flux_derivative_nn", "flux_group_domain_mean",
    "flux_map_scale_mean", "flux_quantile", "flux_last_per_series",
    "flux_top_sensors", "flux_state_duration", "flux_pivot_fields",
    "flux_histogram", "flux_histogram_quantile", "flux_join_math",
]
assert len(_DRIVER_WINDOW) == 50

# Committed r10 rotation (VERDICT r8 #2: a real, gate-countable list).
# Composition: 50 of the 55 never-checked entries remaining after the
# r9 window drains its 40 — prioritized so the two names losing
# recent-addition grace at r9 close (kmeans_embeddings, pq_ann_topk —
# introduced r5) are included, then the stream_*/influx_*/flux_*/
# ha_stats/series_* tails. The 5 deferred names (the r7/r8 codec tiers,
# which hold recent-addition grace the longest) open
# _NEXT_WINDOW_PLAN_R11. After r10 runs, never-checked debt is 5; r11
# clears it.
_NEXT_WINDOW_PLAN_R10 = [
    "kmeans_embeddings", "pq_ann_topk",
    "ha_lineprotocol_roundtrip", "skew_report", "sketch_hll_partitioned",
    "bpe_encode", "bpe_vocab", "ngram_containment_capped", "pack_ffd",
    "contrastive_triplets", "dataset_card", "line_dedup",
    "hard_negatives", "semdedup", "lm_surprise",
    "multimodal_png_rgb", "multimodal_wav_stereo",
    "stream_lineprotocol", "stream_cq_downsample", "stream_flatline",
    "stream_hysteresis",
    "influx_nn_derivative", "influx_stddev_median", "influx_fill_linear",
    "influx_bottom3", "influx_distinct", "influx_holt_winters",
    "influx_percentile_approx", "influx_ema", "influx_state_mode",
    "influx_state_durations", "influx_rollup_cascade",
    "ha_energy_daily", "influxql_explain",
    "flux_task_hourly_mean", "flux_now_relative",
    "flux_schema_measurements", "flux_schema_tag_values",
    "flux_schema_m_tag_values", "flux_schema_field_keys",
    "flux_union_streams",
    "ha_statistics_sum", "ha_statistics_daily", "ha_history_stats",
    "ha_statistics_monthly",
    "series_hysteresis_alerts", "series_acf", "series_fleet_correlation",
    "series_rolling_quantile", "series_flatline_runs",
]
assert len(_NEXT_WINDOW_PLAN_R10) == 50

# Committed r11 rotation: the 5 never-checked codec tiers deferred from
# r10 (longest recent-addition grace) + the 40 entries whose last
# driver row is r5 — those go stale under the freshness gate the moment
# CORRECTNESS_r09.json lands (latest=9 needs last>=6), so they must sit
# in a committed plan from r9 on. 46 names <= one window; the r10
# builder re-balances with its own newly-stale set.
_NEXT_WINDOW_PLAN_R11 = [
    "multimodal_png_adam7", "multimodal_gif_lct", "multimodal_wav_adpcm",
    "multimodal_thumbnail", "multimodal_jpeg_color",
    # the r9 mandated addition (VERDICT r8 #6), scheduled at birth
    "multimodal_png_palette",
    "ha_ts_format", "grouping_sets", "tpch_q7", "tpch_q10", "tpch_q19",
    "tpch_q18", "tpch_q22", "tpch_q8", "tpch_q9", "tpch_q13",
    "asof_join", "quantiles", "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6",
    "window_topk", "window_running", "sessionize", "set_ops",
    "pivot_events", "rollup_orders", "multimodal_frames", "dedup_exact",
    "neardup_minhash_lsh", "ngram_jaccard", "neardup_clusters",
    "dedup_keep_best", "decontaminate", "pack_sequences",
    "curriculum_topk", "embedding_centroids", "simhash_signatures",
    "simhash_neighbors", "embedding_knn", "embedding_neardup",
    "events_hourly", "stream_dedup", "events_sliding", "stream_join",
]
assert len(_NEXT_WINDOW_PLAN_R11) == 46


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
