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
    # Rotated r7 per VERDICT r6 #1 ("rotate hard: >=40 first-verdict
    # entries, shrink the never-checked set below 20"): every slot except
    # the two ha_* canaries goes to an oracle-backed entry that has NEVER
    # had a real driver row (48 of the 49 such entries; behavior_allpairs
    # waits for r8 — it is the one all-pairs exact tier and the costliest
    # at sf0.01). Everything rotated out keeps full pytest oracle coverage
    # (tests/test_oracle_parity.py runs the whole registry).
    #
    # r8 ROTATION QUEUE (for the next builder): the registry grew to 288
    # this round; after this window lands its 48 first verdicts, the
    # highest-priority never-checked oracle-backed entries are the r7
    # additions — the flux_* family (18 oracle-backed), the ha_stats
    # module (9: statistics hourly/cascade/sum/daily/monthly/stream,
    # ha_utility_meter, ha_history_stats, ha_energy_cost),
    # influxql_text_{tz,math,delete,multi} + influxql_show_series,
    # stream_knn, ngram_novelty, behavior_allpairs, dsir_resample,
    # bloom_decontaminate, curate_dsir_pipeline, stream_bloom_gate,
    # mrl_rerank, slo_burn_rate, multimodal_gif+gif_anim (LZW), touch_attribution
    # and
    # multimodal_png_rgb
    # — plus the r1-r3 STALE_DEBT_R7 names listed in
    # tests/test_advice_regressions.py. Every one already has a green
    # bare-session driver-sim row from the day it landed (see the round's
    # commit messages).
    "ha_points", "ha_oldest_point",  # canaries (6-for-6 green r1-r6)
    # TPC-H remainder + analytics breadth (first verdicts)
    "tpch_q14", "cohort_retention", "event_transitions", "profile_columns",
    "json_props_stats", "ohlc_bars", "conversion_latency", "pit_join",
    "data_gaps", "zorder_events", "daily_new_returning", "seasonal_anomaly",
    # experimentation readouts (first verdicts)
    "cuped_readout", "ab_proportion_test", "audience_overlap",
    # graph analytics tier (first verdicts)
    "path_mining", "triangle_copurchase", "link_prediction",
    "bfs_distances", "kcore", "frequent_triples",
    # sequence / behavior ops (first verdicts)
    "sequence_similarity",
    # LLM-pipeline curation + retrieval (first verdicts)
    "dedup_incremental", "bpe_pair_counts", "chunk_documents",
    "curate_mixture_pipeline", "hybrid_rrf", "pmi_bigrams",
    "inverted_index", "html_strip", "repetition_stats", "lang_rebalance",
    "split_leakage_free", "sample_weighted",
    # multimodal codecs — oracle-backed metadata/stats rows (first verdicts)
    "multimodal_bmp", "multimodal_png", "multimodal_wav", "multimodal_jpeg",
    # streaming incremental tiers (first verdicts)
    "stream_dedup_incremental", "stream_incremental_agg", "stream_ohlc",
    # InfluxQL post-migration layer remainder, incl. bench-headline
    # influx_downsample which was benched r6 but never driver-checked
    "influx_cumulative_sum", "influx_difference", "influx_percentile",
    "influx_downsample", "influx_mode", "influx_top3", "influx_sample",
]
assert len(_DRIVER_WINDOW) == 50


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
