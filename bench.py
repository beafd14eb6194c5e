"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Materialization uses the noop sink (full execution, no driver collect), so
timings measure engine throughput, not result serialization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ha_sqllite_2_influxdb_spark.plans import (
    analytics, flux_text, ha_pipeline, ha_stats, influxql, llm_ops,
    monitoring,
)
from ha_sqllite_2_influxdb_spark.session import get_spark

HEADLINE = {
    "ha_points": ha_pipeline.q_points,
    "ha_attr_fields": ha_pipeline.q_attr_fields,
    "tpch_q1": analytics.q_tpch_q1,
    "tpch_q3": analytics.q_tpch_q3,
    "tpch_q5": analytics.q_tpch_q5,
    "window_topk": analytics.q_window_topk,
    "sessionize": analytics.q_sessionize,
    "dedup_exact": llm_ops.q_dedup_exact,
    "neardup_xxhash_lsh": llm_ops.q_neardup_xxhash_lsh,
    "simhash_neighbors_rotated": llm_ops.q_simhash_neighbors_rotated,
    "ngram_span_dedup": llm_ops.q_ngram_span_dedup,
    "embedding_knn": llm_ops.q_embedding_knn,
    # the ANN scale tier benched NEXT TO the exact crossJoin tier
    # (VERDICT r5 #2): embedding_knn stays as the recall oracle, but the
    # 100× plan is the PQ shortlist + exact re-rank
    "pq_ann_topk": llm_ops.q_pq_ann_topk,
    "token_stats": llm_ops.q_token_stats,
    "lang_id": llm_ops.q_lang_id,
    # the end-to-end curation plan — the closest headline to the
    # product's real workload (VERDICT r5 #7)
    "curate_pipeline": llm_ops.q_curate_pipeline,
    # the post-migration InfluxQL dashboard workload (r6): hourly
    # downsample + FILL(previous) over every numeric series
    "influx_downsample": influxql.q_influx_downsample,
    # r7 (VERDICT r6 #4): the SPREAD/FIRST/LAST summary every Grafana
    # variable panel issues — tracks the per-series window shuffle in a
    # second shape beside the downsample
    "influx_series_stats": influxql.q_influx_series_stats,
    # r7: the monitoring family's representative — two window frames +
    # full-window counts on the one series shuffle (operators/monitor.py)
    "series_mean_shift": monitoring.q_mean_shift,
    # r7: the Flux text layer's heaviest compiled shape — text parse →
    # aggregateWindow(createEmpty) grid + LOCF fill (the Grafana Flux
    # dashboard staple); tracks parser overhead + the grid join
    "flux_window_fill_prev": flux_text.QUERIES["flux_window_fill_prev"],
    # r7: the HA recorder statistics compiler — was the heaviest
    # headline until the r14 boundary/interior split (VERDICT r13 #3):
    # interior hours are sole-occupant by segment disjointness, so only
    # boundary terms (~2×segments) flow through the agg; the ~2M
    # interior rows are a pure explode+projection. Stage-split profile
    # localized 1.66 s of the 2.51 s wall to twin 2M-entry hash maps
    # averaging 1.008 rows per group; measured 2.27 → 0.76 s at sf0.1
    # (within-JVM A/B), bit-identical output.
    "ha_statistics_hourly": ha_stats.q_ha_statistics_hourly,
    # r7 late: the two new curation primitives — Bloom pre-filter
    # (zero-shuffle probe over a literal filter) and DSIR importance
    # selection (bounded fit pass + zero-shuffle scoring map). Their
    # walls include the per-invocation fit/build collect jobs — the
    # honest serving shape (probe: 1.56× / 1.26× at 10×).
    "bloom_decontaminate": llm_ops.q_bloom_decontaminate,
    "dsir_resample": llm_ops.q_dsir_resample,
}

# r8 (VERDICT r7 #8): the 23-query HEADLINE set is FROZEN so
# round-over-round totals are directly comparable for the first time;
# new tiers enter a separate candidates block (timed identically,
# reported under their own keys, excluded from the headline total)
# and only graduate into HEADLINE at a round boundary with a verdict.
CANDIDATES = {
    # VERDICT r7 #5: the hot-key-sharded posting-list build (probe
    # 1.36× at 10× on the viral corpus)
    "inverted_index_sharded": llm_ops.q_inverted_index_sharded,
    # VERDICT r7 #7: the two newest headline families, now probed
    # (1.24× / 0.99× at 10×)
    "touch_attribution": analytics.q_touch_attribution,
    "slo_burn_rate": monitoring.q_slo_burn_rate,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    # Contention gate (VERDICT r8 #3): same-host load swings per-query
    # walls ±30-60%, which has made every round's regression triage
    # start with "is it load?". Wait (up to a bounded timeout) for the
    # 1-min loadavg to drop below the threshold before measuring; if it
    # never does, proceed — a number is better than no number — but
    # stamp the JSON `contended: true` and raise the steady-state pass
    # count so min-of-N has more chances to dodge interference.
    # r10 (VERDICT r9 #5): threshold 1.5 admitted ±10-30% per-query
    # drift between "gate-clean" rounds (r8→r9 moved +5.1% with zero
    # plan changes). Now that the gate waits anyway, start quieter:
    # 1.0 default, and every query stamps the 1-min loadavg at its own
    # measure() start (queries_load below) so a reader can attribute
    # any single query's drift to the load band at that moment instead
    # of the round-start snapshot.
    LOAD_THRESHOLD = float(os.environ.get("SPARK_GRAFT_LOAD_MAX", "1.0"))
    # r13 (VERDICT r12 "wrong" #3): the r12 driver gate opened at
    # loadavg [0.93, 2.58, 2.97] — the 1-min average had dipped under
    # the threshold while the host was still busy, and 11/23 queries
    # then stamped query_contended. Gate on the 5-min average too: it
    # cannot dip-fake a quiet host. A 5-min average decays slowly, so
    # the default wait budget doubles (600 s) to give it time to fall;
    # if it never does, proceed with the honest contended stamp as
    # before.
    LOAD_WAIT_S = int(os.environ.get("SPARK_GRAFT_LOAD_WAIT", "600"))

    def _busy():
        la = os.getloadavg()
        return max(la[0], la[1]) >= LOAD_THRESHOLD

    waited = 0.0
    contended = False
    try:
        while _busy() and waited < LOAD_WAIT_S:
            time.sleep(10)
            waited += 10
        contended = _busy()
    except OSError:
        pass
    try:
        load_start = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load_start = None
    spark = get_spark("bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JIT/codegen + parquet footers + page cache, so timings
    # measure engine throughput rather than first-query JVM start cost
    from ha_sqllite_2_influxdb_spark.sources.ha_fixture import derive_ha_tables
    from ha_sqllite_2_influxdb_spark.sources.tables import load_tables
    for df in load_tables(spark, sf_dir).values():
        df.count()
    # materialize the persisted shared inputs (HA fixture triplet, recrawl
    # corpus) so per-query timings measure the operator, not input synthesis
    for df in derive_ha_tables(spark, sf_dir).values():
        df.count()
    llm_ops.recrawl(spark, sf_dir).count()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # generic engine warm-up (standard JMH-style): drive the broadcast-join
    # machinery, regex evaluator and noop writer through enough executions
    # that C2 compiles the shared codegen infrastructure BEFORE the first
    # timed query. Without this the first headline queries sample the JIT
    # ramp (profiled r5: identical ha_points plan runs 1.85 → 0.74 → 0.66
    # → 0.58 → … → 0.21 s at sf0.1) and per-round numbers measure warm-up
    # position, not engine throughput. Shapes here are generic (events ⋈
    # tiny dim, rlike filter), not any headline query's own plan.
    from pyspark.sql import functions as F
    from ha_sqllite_2_influxdb_spark.sources.tables import load_table
    ev = load_table(spark, sf_dir, "events")
    dim = ev.select("user_id").distinct().limit(500)
    for _ in range(3):
        (ev.join(F.broadcast(dim), "user_id")
           .filter(F.col("event_type").rlike("^[a-z]+$"))
           .select("event_id", "user_id", "event_type")
           .write.format("noop").mode("overwrite").save())

    # Fit-cost stamps (VERDICT r12 "wrong" #1): the bloom/DSIR/PQ memo
    # levers moved each one-time fit out of the per-query walls — the
    # honest serving shape, but it left the relocated cost visible only
    # in BASELINE.md prose. Time each fit EXPLICITLY (cache cleared
    # first, so the stamp measures a genuinely fresh build) and commit
    # the stamps in both bench records: a fit-path regression now flips
    # a committed artifact instead of contradicting prose. Side effect:
    # the caches are pre-warmed, so the headline cold passes measure
    # serving-cold (codegen + first exec) uniformly with every other
    # query rather than folding one query's fit into its cold number.
    fits: dict[str, float] = {}
    for fit_name, cache, build in (
        ("bloom_words", llm_ops._BLOOM_WORDS_CACHE,
         lambda: llm_ops._bloom_words(spark, sf_dir)),
        ("dsir_lr", llm_ops._DSIR_LR_CACHE,
         lambda: llm_ops._dsir_lr(spark, sf_dir)),
        ("pq_books", llm_ops._PQ_BOOKS_CACHE,
         lambda: llm_ops._pq_books(spark, sf_dir)),
    ):
        cache.clear()
        t0 = time.time()
        build()
        fits[fit_name] = round(time.time() - t0, 3)

    # Fit-band gate (VERDICT r13 "wrong" #3): the stamps above are
    # committed artifacts, but nothing GATED on them — a fit-path
    # regression would sit in the record without tripping anything.
    # Bands are the quiet-host ranges measured across the r13 session
    # (BASELINE.md); the alarm fires at 2× the band ceiling — generous
    # enough that the ±30% same-day host spread never false-positives,
    # tight enough that an accidental re-fit-per-call or a collect-path
    # regression (both would be ≥5×) flips the committed artifact.
    # r15 (VERDICT r14 #8): bands are keyed PER SF — a fit stamp at an
    # SF with no measured band is explicitly stamped unjudged
    # (`fit_sf_judged: false`) instead of silently skipping the gate.
    # Only sf0.1 has a quiet-host measured band today; record a band
    # here when another SF is measured.
    FIT_BANDS_BY_SF = {
        0.1: {"bloom_words": (1.3, 1.9), "dsir_lr": (0.84, 1.08),
              "pq_books": (3.4, 4.4)},
    }
    FIT_BANDS = FIT_BANDS_BY_SF.get(sf, {})
    fit_sf_judged = sf in FIT_BANDS_BY_SF
    fit_alarms = [
        f"{n}: {fits[n]}s > 2x band ceiling {FIT_BANDS[n][1]}s"
        for n in fits
        if n in FIT_BANDS and fits[n] > 2 * FIT_BANDS[n][1]
    ]

    steady_runs = 5 if contended else 3

    # Per-query re-gate (VERDICT r10 #4): the run-start gate checks load
    # ONCE, but r10's stamps proved load rises mid-run (three warm
    # "regressions" +11-19% all stamped 1.7-2.0 vs 0.94 at gate-open).
    # After a query measures under a stamp above the threshold, wait
    # (bounded, shared budget) for the load to drop and re-measure the
    # steady passes once; keep the min. Queries still hot after the
    # budget carry a per-query contended flag instead of silently
    # polluting the round-over-round comparison.
    QLOAD_WAIT_S = int(os.environ.get("SPARK_GRAFT_QLOAD_WAIT", "60"))
    # VERDICT r11 #5: the flat 240 s budget ran dry mid-list at both r11
    # closes (neardup_xxhash_lsh and influx_downsample were left flagged
    # query_contended while within band). Scale the default with the
    # measured set so the re-gate can finish its job: 10 s per query
    # across headliners + candidates (260 s today, grows with the set).
    requeue_budget = [float(os.environ.get(
        "SPARK_GRAFT_QLOAD_BUDGET",
        str(10 * (len(HEADLINE) + len(CANDIDATES)))))]
    requeued: list[str] = []
    query_contended: list[str] = []

    def measure(fn) -> tuple[float, float, float | None, bool]:
        # cold = first materialization (pays one-off whole-stage-codegen
        # compilation + AQE re-planning for THIS query shape, ~2s on
        # sub-second queries); steady-state = min over repeated warm runs
        # (the min filters same-host scheduling noise, which measures
        # ±30% run-to-run on this container, and the tail of the C2 JIT
        # ramp — see the warm-up note above), the sustained per-query
        # throughput a long-running cluster actually delivers. BOTH are
        # reported so rounds stay comparable (BENCH_r01 was cold-only,
        # BENCH_r02 steady-only, r4 min-of-2, r5+ min-of-3). The ONE
        # protocol applies to headliners and candidates alike — that
        # identity is what lets a candidate graduate comparably.
        # per-query load stamp (VERDICT r9 #5): 1-min loadavg at THIS
        # query's measurement start. It includes the bench's own JVM
        # load, so read it as drift relative to neighboring queries in
        # the same run, not as an absolute quiet-box test. The re-gate
        # TRIGGER additionally considers the 5-min average (q_busy) —
        # the stamp stays 1-min for round-over-round continuity, but a
        # momentary 1-min dip on a busy host must not skip the re-gate
        # (the run-start dip-fake, one level down).
        try:
            q_load = round(os.getloadavg()[0], 2)
            q_busy = _busy()
        except OSError:
            q_load, q_busy = None, False
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = round(time.time() - t0, 3)
        best = float("inf")
        for _ in range(steady_runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3), cold, q_load, q_busy

    def measure_gated(name, fn) -> tuple[float, float, float | None]:
        best, cold, q_load, q_busy = measure(fn)
        if not q_busy:
            return best, cold, q_load
        # stamp exceeded the threshold: wait for quiet (shared budget),
        # then re-run the steady passes once and keep the min. Quiet
        # means BOTH the 1- and 5-min averages (r13: the run-start gate
        # got the 5-min check, but this re-gate still read only the
        # 1-min average — the same dip-fake, one level down: a re-run
        # recorded as clean while the host was still busy)
        waited_q = 0.0
        try:
            while (_busy() and waited_q < QLOAD_WAIT_S
                   and requeue_budget[0] > 0):
                time.sleep(5)
                waited_q += 5
                requeue_budget[0] -= 5
            still_busy = _busy()
            now = os.getloadavg()[0]
        except OSError:
            return best, cold, q_load
        if still_busy:
            query_contended.append(name)
            return best, cold, q_load
        requeued.append(name)
        re_load = round(now, 2)
        for _ in range(steady_runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, round(time.time() - t0, 3))
        return round(best, 3), cold, re_load

    timings: dict[str, float] = {}
    timings_cold: dict[str, float] = {}
    timings_load: dict[str, float | None] = {}
    for name, fn in HEADLINE.items():
        timings[name], timings_cold[name], timings_load[name] = (
            measure_gated(name, fn))

    # candidates get the identical protocol INCLUDING the recorded cold
    # pass, so a graduating candidate can be compared cold-for-cold;
    # their load stamps live in their OWN dict mirroring the
    # candidates/candidates_cold split (a graduating name must never
    # silently overwrite a headline stamp)
    cand: dict[str, float] = {}
    cand_cold: dict[str, float] = {}
    cand_load: dict[str, float | None] = {}
    for name, fn in CANDIDATES.items():
        cand[name], cand_cold[name], cand_load[name] = (
            measure_gated(name, fn))

    total = round(sum(timings.values()), 3)
    # host-load context: same-host interference measured up to 5× on
    # individual queries this round — loadavg at start/end lets a reader
    # tell a real regression from a contended box
    try:
        load_end = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load_end = None
    # Truncation-proofing (VERDICT r10 #3): the round driver keeps only
    # a ~2000-char TAIL of stdout; r10's per-query load stamps pushed
    # the one-line JSON past that and the artifact lost its own headline
    # (`parsed: null`). The PRINTED line now carries just the headline
    # scalars + steady timings (~1.4 KB, inside the budget), and the
    # full record — cold timings, per-query load stamps, requeue log —
    # is written to bench_last.json at the repo root, committed with the
    # round so the complete record can never lose itself.
    full = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "mode": f"steady_state_min_of_{steady_runs}",
        "value_cold": round(sum(timings_cold.values()), 3),
        "queries": timings,
        "queries_cold": timings_cold,
        "candidates": cand,
        "candidates_cold": cand_cold,
        "queries_load": timings_load,
        "candidates_load": cand_load,
        "fits": fits,
        "fit_bands": FIT_BANDS,
        "fit_sf_judged": fit_sf_judged,
        "fit_alarms": fit_alarms,
        "loadavg_start": load_start,
        "loadavg_end": load_end,
        "contended": contended,
        "load_wait_sec": round(waited, 1),
        "requeued": requeued,
        "query_contended": query_contended,
        "sf": sf,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_last.json"), "w") as f:
        json.dump(full, f, indent=1)
        f.write("\n")
    all_loads = [v for v in list(timings_load.values())
                 + list(cand_load.values()) if v is not None]
    print(json.dumps({
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "mode": f"steady_state_min_of_{steady_runs}",
        "value_cold": round(sum(timings_cold.values()), 3),
        "queries": timings,
        "candidates": cand,
        "fits": fits,
        "fit_sf_judged": fit_sf_judged,
        "fit_alarms": fit_alarms,
        "loadavg_start": load_start,
        "loadavg_end": load_end,
        "max_query_load": max(all_loads) if all_loads else None,
        "contended": contended,
        "load_wait_sec": round(waited, 1),
        "requeued": requeued,
        "query_contended": query_contended,
        "full_record": "bench_last.json",
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
