"""Shuffle-count budgets for every bench headline query.

The perf story of this engine is plan SHAPE: each headline query's
keyed-shuffle count is a structural fact (fixture derivation included —
the HA triplet costs 2, which is why ha_* floors sit at 2). A new
Exchange appearing here means a join stopped broadcasting, an
aggregation stopped riding its window's partitioning, or a stage
started re-shuffling — exactly the regressions that are invisible at
sf0.001 walls and catastrophic at 100 TB. Budgets are upper bounds
(assert <=): plans may only get cheaper.

RoundRobinPartitioning is deliberately NOT counted — it is the
narrow-local-input balance repartition (dedup.shingle_sets), absent on
wide production scans and dependent on session parallelism.
"""

import re

import bench

_SHUFFLE = re.compile(
    r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)")

# measured at sf0.001 under the pytest session (fresh fixture: the HA
# triplet derivation contributes 2 keyed shuffles to every ha_*-fed
# plan; a session that has the fixture cached simply comes in under
# budget — only EXCEEDING the bound fails)
BUDGET = {
    "ha_points": 4,
    "ha_attr_fields": 4,
    "tpch_q1": 1,
    "tpch_q3": 1,
    "tpch_q5": 1,
    "window_topk": 1,
    "sessionize": 1,
    "dedup_exact": 1,
    "neardup_xxhash_lsh": 2,
    "simhash_neighbors_rotated": 3,
    "ngram_span_dedup": 2,
    "embedding_knn": 1,
    "pq_ann_topk": 2,
    "token_stats": 0,
    "lang_id": 0,
    "curate_pipeline": 6,
    "influx_downsample": 6,
    "influx_series_stats": 5,
    "series_mean_shift": 5,
    "flux_window_fill_prev": 6,
    # r15: 10 → 1 — the split compiler's segment relation now
    # materializes once through a lazy localCheckpoint (VERDICT r14 #4:
    # the r14 double-spliced shape really executed the points assembly
    # twice; AQE never reused the canonically-identical exchanges —
    # see ha_stats._checkpointed_segments). The query plan itself scans
    # the checkpointed RDD in both union branches; the boundary agg may
    # print one keyed exchange when the RDD's partitioning metadata is
    # not carried. The feeder's single series exchange is pinned in
    # tests/test_ha_stats_plans.py.
    "ha_statistics_hourly": 1,
    "bloom_decontaminate": 0,
    "dsir_resample": 0,
}

# r8: the bench candidates block gets the same structural gate (the
# sharded index is ONE keyed shuffle; attribution is user-window +
# rollup; SLO is hour-agg + the bounded-relation window's single
# exchange)
CANDIDATE_BUDGET = {
    "inverted_index_sharded": 1,
    "touch_attribution": 2,
    "slo_burn_rate": 2,
}


def _over_budget(queries, budgets, spark, sf_dir):
    over = {}
    for name, fn in queries.items():
        plan = (fn(spark, sf_dir)._jdf.queryExecution()
                .executedPlan().toString())
        n = len(_SHUFFLE.findall(plan))
        if n > budgets[name]:
            over[name] = (n, budgets[name])
    return over


def test_headline_shuffle_budgets(spark, sf_dir):
    assert set(BUDGET) == set(bench.HEADLINE), (
        "bench.HEADLINE changed — re-measure and update BUDGET")
    over = _over_budget(bench.HEADLINE, BUDGET, spark, sf_dir)
    assert not over, f"shuffle budget exceeded: {over}"


def test_candidate_shuffle_budgets(spark, sf_dir):
    assert set(CANDIDATE_BUDGET) == set(bench.CANDIDATES), (
        "bench.CANDIDATES changed — re-measure and update "
        "CANDIDATE_BUDGET")
    over = _over_budget(bench.CANDIDATES, CANDIDATE_BUDGET, spark, sf_dir)
    assert not over, f"shuffle budget exceeded: {over}"


# r11: the perceptual-hash near-dup tiers (image dHash + acoustic
# fingerprint) share one join core; the structural fact is ONE pair
# subtree — banded candidate join (broadcast at test scale), ONE
# pair-distinct exchange, the per-doc stats exchange and the final
# doc_id join. A fourth keyed shuffle here means the sym explode
# regressed to a self-union (doubling the band join) or the distinct
# stopped riding its own partitioning.
PERCEPTUAL_BUDGET = {
    "multimodal_dhash_neardup": 3,
    "multimodal_audio_fp": 3,
    # the video leg packs its signature JVM-side: +1 doc-keyed window
    # exchange (the frame-relation lead) ahead of the shared join core
    "multimodal_video_fp": 4,
}


def test_perceptual_neardup_shuffle_budgets(spark, sf_dir):
    import __spark_entry__ as ent

    qs = ent.queries()
    over = _over_budget({n: qs[n] for n in PERCEPTUAL_BUDGET},
                        PERCEPTUAL_BUDGET, spark, sf_dir)
    assert not over, f"shuffle budget exceeded: {over}"


# r14 (guide §3.1): the curation pipelines must drop the flagged
# decontamination sliver with a BROADCAST anti-join — the flagged set
# is bounded by |benchmark hits| (eval-set-sized), while a SortMergeJoin
# here shuffles and sorts the full deduped corpus, text included, by
# doc_id (measured: 1.34 -> 0.88 s at sf0.1 from the flip alone). The
# shuffle budget can't catch this regression (the SMJ shape still fits
# under the bound), so pin the join strategy itself.
def test_curate_anti_join_broadcasts(spark, sf_dir):
    import __spark_entry__ as ent

    qs = ent.queries()
    anti = re.compile(r"(\w+Join) .*LeftAnti")
    for name in ("curate_pipeline", "curate_dsir_pipeline"):
        plan = (qs[name](spark, sf_dir)._jdf.queryExecution()
                .executedPlan().toString())
        kinds = set(anti.findall(plan))
        assert kinds == {"BroadcastHashJoin"}, (name, kinds)


# r14 (guide §1.1/§7.3): the narrow-input width probe used to call
# ``df.rdd.getNumPartitions()`` per build — full physical planning of
# the input subtree on EVERY invocation (~0.2 s for curate_pipeline's
# fresh deduped input, ~3 s for curate_dsir_pipeline's bloom-sliver
# tree). ``memo.input_width`` memoizes the count per (application,
# semanticHash); this pins that (a) the memo answers exactly what the
# direct probe answers, (b) a repeat call is served from the cache,
# and (c) the cache stays bounded.
def test_input_width_memo_matches_direct_probe(spark, sf_dir):
    from pyspark.sql import functions as F

    from ha_sqllite_2_influxdb_spark import memo
    from ha_sqllite_2_influxdb_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    fresh = docs.select("doc_id", "text").filter(F.col("doc_id") >= 0)
    direct = fresh.rdd.getNumPartitions()
    memo._WIDTH_CACHE.clear()
    assert memo.input_width(fresh) == direct
    key = (spark.sparkContext.applicationId, fresh.semanticHash())
    assert memo._WIDTH_CACHE[key] == direct
    # a semantically identical FRESH build hits the same entry
    fresh2 = docs.select("doc_id", "text").filter(F.col("doc_id") >= 0)
    assert memo.input_width(fresh2) == direct
    assert len(memo._WIDTH_CACHE) == 1
    # bound: a miss on a full cache evicts down to _WIDTH_CAP via
    # input_width's own eviction loop
    memo._WIDTH_CACHE.clear()
    for i in range(memo._WIDTH_CAP + 5):
        memo._WIDTH_CACHE[("synthetic", i)] = 1
    memo.input_width(fresh)
    assert len(memo._WIDTH_CACHE) <= memo._WIDTH_CAP
    assert memo._WIDTH_CACHE[key] == direct
    memo._WIDTH_CACHE.clear()
