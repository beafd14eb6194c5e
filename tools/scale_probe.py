"""Scale-linearity probe (VERDICT r5 #5): do the dedup/ANN scale tiers
stay ~linear from 1× to 10× corpus, with flat driver state?

Corpus construction — replication that PRESERVES workload shape:
replicating text verbatim would make every replica an exact duplicate of
the base, so near-dup pair output (and hot-bucket membership) would grow
QUADRATICALLY in the replica count — a 10× input with a ~100× workload is
not a linearity probe. Instead every replica k prefixes each WORD with
``r<k>`` (one regexp_replace at word starts): all shingles/word-hashes
become disjoint across replicas, so each replica carries the SAME internal
duplicate structure as the base and nothing pairs across replicas — 10×
input, exactly 10× work and 10× output. Embeddings replicate with offset
vec_ids (identical vectors are fine for ANN scoring cost, which is linear
in candidates; ties resolve deterministically by cand_id).

Measures, per tier, steady-state wall (min of RUNS) at 1× and 10×, the
wall ratio vs the 10.0 linear ideal, JVM used-heap delta and Python driver
RSS. Fails (exit 1) if any tier's ratio exceeds LINEAR_SLACK × 10 or
driver RSS grows by more than RSS_CAP_MB during the 10× pass.

Run: ``python tools/scale_probe.py`` (≈4 min at sf0.1 on local[32]).
Optional argv: tier names to probe (default all) — re-measuring a subset
in a fresh JVM isolates a tier from heap/GC pressure accumulated by the
tiers that ran before it in a full-session run.
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SCALE_PROBE_DIR", "/tmp/scale_probe")
REPLICAS = 10
RUNS = 3
LINEAR_SLACK = 1.3
RSS_CAP_MB = 1500

# r11, perceptual-hash replication: XOR is an isometry of hamming space,
# so replica k's hashes (h XOR mask_k) keep every WITHIN-replica pair
# distance bit-exact while pushing CROSS-replica pairs out of reach —
# these 10 masks differ pairwise by >6 bits in EVERY 16-bit band
# (verified by the assert below), so a cross-replica candidate can only
# band-collide when the two docs' own band difference exactly cancels
# the mask difference, and even then its full distance exceeds the
# join's max_dist. 10× input ⇒ 10× clusters of unchanged size ⇒ 10×
# output — a valid linearity probe for the banded hamming join. (Naive
# doc_id replication would NOT be: the fixture has 64 global groups, so
# growing the corpus grows each cluster and pair output quadratically.)
_PHASH_MASKS = [
    0xF3200A7C4B0ADB49, 0x53F6A536E391B7B6, 0xDE18A3EFBFE30F23,
    0xC66DA0C0A0774154, 0x1A420DCD5EA014DF, 0x0AAC956851DC9A93,
    0xAF7E35911D6E80C8, 0x8585D6A7F8053758, 0xFD93ED8AA68C2AE4,
    0x64BA707A541379BA,
]
assert all(
    bin(((a ^ b) >> (16 * j)) & 0xFFFF).count("1") > 6
    for i, a in enumerate(_PHASH_MASKS)
    for b in _PHASH_MASKS[i + 1:] for j in range(4)
)


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def jvm_used_mb(spark) -> float:
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    return (rt.totalMemory() - rt.freeMemory()) / 1e6


def build_corpora(spark):
    """Write 1× and 10× corpora to parquet ONCE so every tier reads the
    same physical input (scan included in the measurement, like bench)."""
    from ha_sqllite_2_influxdb_spark.operators.dedup import recrawl_corpus
    from ha_sqllite_2_influxdb_spark.sources.tables import load_table

    base = recrawl_corpus(
        load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    )
    # viral variant (r7): the SAME boilerplate sentence prefixed to EVERY
    # doc — the web-corpus shape (cookie banners, nav chrome) that makes
    # the uncapped containment tier's Σ df² quadratic. Prepended BEFORE
    # replication so each replica's viral shingles stay replica-local
    # (word-prefixing applies to them too): 10× input ⇒ 10× viral
    # groups of the same size, a valid linearity probe.
    boiler = " ".join(f"boil{i}" for i in range(12))
    viral_base = base.select(
        "doc_id", F.concat(F.lit(boiler + " "), F.col("text")).alias("text")
    )
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    # point-series corpus (r7, for the InfluxQL family): replicas suffix
    # entity_id, so a 10× corpus has 10× SERIES of unchanged length —
    # exactly how a larger device fleet scales, and series stay
    # replica-local so per-series windows do 10× work, never wider ones.
    from ha_sqllite_2_influxdb_spark.plans.influxql import _numeric_points
    pts_base = _numeric_points(spark, SF_DIR)
    ev_base = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts", "event_type", "value")
    paths = {}
    for scale, n in (("x1", 1), ("x10", REPLICAS)):
        for tag, src in (("docs", base), ("viral", viral_base)):
            reps = [
                src.select(
                    (F.col("doc_id") + 10_000_000 * k).alias("doc_id"),
                    (F.col("text") if k == 0 else
                     F.regexp_replace("text", "(^| )", f"$1r{k}"))
                    .alias("text"),
                )
                for k in range(n)
            ]
            docs = reps[0]
            for r in reps[1:]:
                docs = docs.unionByName(r)
            docs.repartition(32).write.mode("overwrite").parquet(
                f"{WORK}/{tag}_{scale}.parquet")
        dp = f"{WORK}/docs_{scale}.parquet"
        ereps = [
            emb.select((F.col("vec_id") + 1_000_000 * k).alias("vec_id"),
                       "embedding")
            for k in range(n)
        ]
        e = ereps[0]
        for r in ereps[1:]:
            e = e.unionByName(r)
        ep = f"{WORK}/emb_{scale}.parquet"
        e.repartition(32).write.mode("overwrite").parquet(ep)
        preps = [
            pts_base.select(
                (F.col("state_id") + 10_000_000 * k).alias("state_id"),
                "measurement", "domain",
                F.concat("entity_id", F.lit(f"_r{k}")).alias("entity_id"),
                "ts_epoch", "value",
            )
            for k in range(n)
        ]
        p = preps[0]
        for r in preps[1:]:
            p = p.unionByName(r)
        pp = f"{WORK}/points_{scale}.parquet"
        p.repartition(32).write.mode("overwrite").parquet(pp)
        # event corpus (r8, for attribution/SLO tiers): replicas shift
        # user_id AND time (+k×35 d, past the 30-day base span), so a
        # 10× corpus has 10× users and 10× distinct hours — both the
        # user-window shuffle and the hour-collapsed relation scale,
        # never widen.
        ereps2 = [
            ev_base.select(
                (F.col("event_id") + 10_000_000 * k).alias("event_id"),
                (F.col("user_id") + 10_000_000 * k).alias("user_id"),
                (F.col("ts") + F.expr(f"INTERVAL {35 * k} DAYS")).alias("ts"),
                "event_type", "value",
            )
            for k in range(n)
        ]
        evd = ereps2[0]
        for r in ereps2[1:]:
            evd = evd.unionByName(r)
        evp = f"{WORK}/events_{scale}.parquet"
        evd.repartition(32).write.mode("overwrite").parquet(evp)
        # perceptual-hash corpus (r11): hashes come from the REAL codec
        # path once (payload render → BMP decode → dHash — a pure map,
        # trivially linear and excluded from the join measurement), then
        # replicate via the XOR-isometry masks above. The halves stay
        # non-negative: masks apply per 32-bit half.
        from ha_sqllite_2_influxdb_spark.operators import multimodal as mm
        ph_base = mm.image_dhash(mm.dhash_payloads(
            load_table(spark, SF_DIR, "documents"))).select(
            "doc_id", "dhash_lo", "dhash_hi")
        phreps = [
            ph_base.select(
                (F.col("doc_id") + 10_000_000 * k).alias("doc_id"),
                F.col("dhash_lo").bitwiseXOR(
                    F.lit(_PHASH_MASKS[k] & 0xFFFFFFFF)).alias("dhash_lo"),
                F.col("dhash_hi").bitwiseXOR(
                    F.lit(_PHASH_MASKS[k] >> 32)).alias("dhash_hi"),
            )
            for k in range(n)
        ]
        ph = phreps[0]
        for r in phreps[1:]:
            ph = ph.unionByName(r)
        php = f"{WORK}/phash_{scale}.parquet"
        ph.repartition(32).write.mode("overwrite").parquet(php)
        # viral perceptual corpus (r11): the masked replicas PLUS a
        # one-image flood (|base|/5 rows per replica, constant hash,
        # NO mask — placeholder thumbnails look the same in every
        # crawl shard). 10× replicas ⇒ 10× flood rows all sharing one
        # bucket per band: the uncapped exact tier is |flood|² ≈ 100×
        # here and is deliberately NOT probed (the allpairs/containment
        # precedent); the capped tier keeps ~cap members per bucket, so
        # its candidate work is CONSTANT and wall must track the scan.
        flood = [
            ph_base.filter(F.col("doc_id") % 5 == 0).select(
                (F.col("doc_id") + 10_000_000 * k + 500_000_000)
                .alias("doc_id"),
                F.lit(123456789).alias("dhash_lo"),
                F.lit(987654321).alias("dhash_hi"),
            )
            for k in range(n)
        ]
        phv = ph
        for fdf in flood:
            phv = phv.unionByName(fdf)
        phvp = f"{WORK}/phash_viral_{scale}.parquet"
        phv.repartition(32).write.mode("overwrite").parquet(phvp)
        paths[scale] = (dp, ep, f"{WORK}/viral_{scale}.parquet", pp, evp,
                        php, phvp)
    return paths


def tiers(spark, docs_path, emb_path, books, viral_path=None,
          pts_path=None, events_path=None, phash_path=None,
          phash_viral_path=None):
    from ha_sqllite_2_influxdb_spark.operators import (
        dedup, graph, monitor, ranking, scoring, similarity, sketches, text,
    )
    from ha_sqllite_2_influxdb_spark.plans import influxql
    from ha_sqllite_2_influxdb_spark.plans.analytics import (
        last_touch_attribution,
    )

    docs = spark.read.parquet(docs_path)
    emb = spark.read.parquet(emb_path)
    viral = spark.read.parquet(viral_path or docs_path)
    pts = spark.read.parquet(pts_path or docs_path)
    evts = spark.read.parquet(events_path or docs_path)
    ph = (spark.read.parquet(phash_path) if phash_path else None)
    phv = (spark.read.parquet(phash_viral_path)
           if phash_viral_path else None)
    return {
        "neardup_xxhash_lsh": lambda: dedup.neardup_pairs(
            docs, threshold=0.5, n_seeds=8, portable=False),
        "simhash_neighbors_rotated": lambda: dedup.simhash_neighbors_rotated(
            docs, max_hamming=3, portable=False),
        "ngram_span_dedup": lambda: dedup.ngram_span_stats(docs, n=8),
        # r15 (VERDICT r14 #3): the r14 window shape ships EVERY raw
        # (doc_id, g) position of a duplicated n-gram to the one
        # reducer owning g, and the whole-partition window buffers the
        # group per task — on a boilerplate corpus the viral n-grams
        # (here: 5 fully-boilerplate 8-grams per doc, df ≈ corpus
        # size) are exactly the hot keys guide §2.2 warns about. The
        # viral corpus prepends the boilerplate BEFORE replication, so
        # 10× input ⇒ 10× viral groups of the same size — wall must
        # stay ~linear and RSS flat, else the partial-agg/salted
        # variant ships (see OPTIMIZATION_r15.md).
        "ngram_span_dedup_viral": lambda: dedup.ngram_span_stats(
            viral, n=8),
        "pq_rerank_topk": lambda: similarity.pq_rerank_topk(
            emb, n_queries=5, k=10, shortlist_factor=10, books=books),
        # r6 additions: the word-prefix replication keeps shingle groups,
        # bigram vocab and the co-occurrence graph disjoint per replica,
        # so inverted-index pair work, LM joins and PageRank iterations
        # all scale with replica count — a valid linearity probe for each
        "ngram_containment": lambda: dedup.containment_pairs_inverted_index(
            docs, threshold=0.9),
        # r7: the df-capped candidate stage (VERDICT r6 #2) — candidates
        # from rare shingles only, exact rescore; per-shingle join work is
        # bounded at max_df² so the Σm² blowup of the exact tier cannot
        # occur. native_hash: 8-byte shingle ids on the wire (100 TB config)
        "ngram_containment_capped": lambda: dedup.containment_pairs_df_capped(
            docs, threshold=0.9, native_hash=True),
        # the cap's REASON, measured: a corpus where every doc shares a
        # 12-word boilerplate prefix (viral shingles, df ≈ corpus size).
        # The uncapped tier is Σ df² ≈ quadratic here and is deliberately
        # NOT probed on this corpus (a single 10× run materializes ~1e8
        # pair rows); the capped tier prunes the viral shingles from
        # candidate generation and must stay ~linear.
        "ngram_containment_capped_viral":
            lambda: dedup.containment_pairs_df_capped(
                viral, threshold=0.9, native_hash=True),
        # r7: novelty rides the same inverted-index exchange; replica
        # shingle spaces are disjoint so dfs stay replica-local — work
        # and output scale with replica count. native_hash: 8-byte
        # shingle ids on the wire (the 100 TB config, like the LSH
        # family; the registry entry keeps the portable string tier for
        # its oracle)
        "ngram_novelty": lambda: dedup.ngram_novelty(docs,
                                                     native_hash=True),
        "lm_rare_bigrams": lambda: text.lm_rare_bigrams(docs),
        "textrank_keywords": lambda: graph.textrank_keywords(docs),
        # PMI collocations: one bigram-count shuffle + broadcast marginals;
        # the word-prefix replication keeps each replica's bigram space
        # disjoint, so counts AND vocabulary scale with replica count
        "pmi_bigrams": lambda: text.pmi_bigrams(docs),
        # r6 late additions: row-local scorer (pure map stage — the probe's
        # closest thing to a linearity control) and MG heavy hitters
        # (bounded per-partition state; replication grows the bigram vocab
        # 10×, so candidate sets and recount groups scale with replicas)
        "quality_classifier": lambda: scoring.quality_classify(
            docs, portable=False),
        "sketch_topk_ngrams": lambda: sketches.corpus_bigram_heavy_hitters(
            docs),
        # exact all-pairs similarity (prefix filter): replication keeps
        # per-replica shingle vocabularies disjoint, so global dfs —
        # and with them every doc's prefix — are replica-local: work
        # scales with replica count, pairs never cross replicas
        "allpairs_jaccard": lambda: dedup.allpairs_jaccard(
            docs, threshold=0.5),
        # r7: the InfluxQL read family's heaviest shape — hourly bucket
        # agg + lag/sequence gap expansion + LOCF on one series window.
        # Replicas suffix entity_id, so 10× = 10× series of unchanged
        # length (a larger device fleet), and both exchanges are keyed
        # on the series columns — InfluxDB's own shard key.
        "influx_downsample": lambda: influxql.downsample_fill_previous(
            pts),
        # r7: the monitoring family's most stateful shape — a trailing
        # collect_list frame (O(n) per row) on the one series window.
        # Same replica layout as influx_downsample: 10× = 10× series,
        # frame size fixed, so wall must stay ~linear and executor state
        # flat.
        "series_rolling_quantile": lambda: monitor.rolling_quantile(
            pts, n=4, p=0.9),
        # r7: the two-stage correlation shape — downsample shuffle, then
        # the fleet reference aggregates the ALREADY-SMALL bucket
        # relation and broadcasts back. 10× series grows both stages
        # linearly; the broadcast side stays measurements × buckets.
        "series_fleet_correlation": lambda: monitor.fleet_correlation(
            pts, bucket_s=604800),
        # r7: C4-style span dedup — explode + content-keyed rank +
        # doc re-agg. The word-prefix replication keeps every replica's
        # segment space disjoint, so rank groups never cross replicas
        # and the whole pipeline must scale with replica count.
        "line_dedup": lambda: dedup.line_dedup_corpus(docs,
                                                      seg_words=5),
        # r7: the Flux text layer's one NEW physical shape vs the
        # InfluxQL family — aggregateWindow(createEmpty: true): bucket
        # partial-agg, a calendar grid exploded over the DISTINCT series
        # relation (tiny), one left join back keyed on the series
        # columns, LOCF on the series window. 10× series = 10× buckets
        # and 10× grid rows; nothing widens.
        "flux_window_grid": lambda: _flux_grid_tier(pts),
        # r7: the HA statistics compiler — lead() segments on the series
        # window, hour-clipped explode (rows ≈ points + gap-hours),
        # (series, hour) agg. Same fleet layout: 10× = 10× series.
        "ha_statistics_hourly": lambda: _ha_stats_tier(pts),
        # r7: the Flux join() shape — two independently-downsampled
        # sides joined on (bucket, tags). Both inputs AND the join key
        # scale with series count; the big scans never join each other.
        "flux_join_math": lambda: _flux_join_tier(pts),
        # r7 late: DSIR — fit is a 4096-key bounded agg (the collect is
        # 32 KB whatever the corpus), scoring a pure map with the ratio
        # table inlined; the closest thing to a linearity control after
        # quality_classifier, but WITH a fit pass in the measured wall.
        "dsir_score": lambda: scoring.dsir_score(
            docs, F.col("doc_id") % 2 == 0, portable=False),
        # r7 late: Bloom pre-filter — build from the every-20th-doc
        # benchmark (10× corpus ⇒ 10× bench shingles folded into the
        # same 1024-word filter via bit_or), probe as a pure map.
        # r12 (VERDICT r11 #6): the filter is a BUILD ARTIFACT (the PQ
        # codebook precedent) — built ONCE per scale outside the timed
        # loop, so the gated measurement is the SERVING map a 100 TB
        # ingest actually repeats. The fit itself is a linear 5%-prefix
        # scan into a bounded 8 KB bit_or state and is covered by the
        # registry query's own wall (q_bloom_decontaminate memoizes the
        # same artifact per application).
        "bloom_decontaminate": lambda: _bloom_tier(docs, docs_path),
        # r8 (VERDICT r7 #7): last-touch attribution — one user-window
        # shuffle (running last_value) + a rollup onto the fixed
        # touch-type key space. Replicas shift user_id, so 10× = 10×
        # independent user partitions of unchanged length; the rollup
        # relation stays 4 rows whatever the corpus.
        "touch_attribution": lambda: last_touch_attribution(evts),
        # r8 (VERDICT r7 #7): SLO burn-rate — the event stream collapses
        # to |hours| rows in one hour-keyed partial agg before the
        # unpartitioned trailing window. Replicas shift time by 35 d, so
        # 10× events = 10× distinct hours: BOTH stages scale; the
        # window relation stays bounded (≈7.2 k rows at 10×).
        "slo_burn_rate": lambda: monitor.slo_burn_rate(evts),
        # r8 (VERDICT r7 #5): the SHARDED inverted index on the VIRAL
        # corpus — every doc carries the same 12-word boilerplate, so a
        # dozen terms have df ≈ corpus size. n_shards=8 splits each hot
        # posting list by doc_id%8 across reducers: per-group state is
        # bounded at |docs|/8 per replica, and the word-prefix
        # replication makes 10× = 10× disjoint hot groups of unchanged
        # size — the exact hot-key scenario the sharding exists for.
        "inverted_index_sharded": lambda: ranking.build_inverted_index(
            viral, n_shards=8),
        # r11: the perceptual-hash banded hamming join (shared by the
        # image dHash and audio fingerprint tiers) over the XOR-masked
        # hash corpus (see _PHASH_MASKS — within-replica structure
        # bit-preserved, cross-replica pairs unreachable). The codec
        # stage is a pure map and probes as such via quality_classifier;
        # what can go superlinear is THIS join, so it is what's measured.
        "dhash_neardup": lambda: dedup.dhash_neardup(ph),
        # the cap's REASON, measured (the containment_capped_viral
        # precedent): the one-image flood puts 10× rows in one bucket
        # per band at 10×; the capped tier's candidate work is bounded
        # at ~cap² whatever the flood, so wall must track the scan.
        # The uncapped exact tier is |flood|² here and NOT probed.
        "dhash_neardup_capped_viral": lambda: dedup.dhash_neardup(
            phv, bucket_cap=256),
        # r12 (VERDICT r11 #3): the classifier's shuffle-join branch —
        # the billion-image-index configuration where the band table
        # cannot broadcast. The INDEX side grows 10× (the masked-replica
        # corpus); the ARRIVING side is pinned to replica 0, so the
        # measured work is the index scan + band-keyed exchange + the
        # arriving side's bounded candidate join: wall must track the
        # index scan, never |arriving|x|index|.
        "phash_classify_shuffle": lambda: dedup.phash_classify(
            ph.filter(F.col("doc_id") < 10_000_000), ph,
            broadcast_index=False),
    }


_BLOOM_WORDS: dict = {}


def _bloom_tier(docs, docs_path):
    from ha_sqllite_2_influxdb_spark.operators import curation

    # filter words are a build artifact: fit once per corpus (keyed by
    # path), time only the serving probe — the PQ-books convention
    if docs_path not in _BLOOM_WORDS:
        _BLOOM_WORDS[docs_path] = curation.bloom_filter_words(
            curation.benchmark_prefixes(docs), portable=False)
    return curation.bloom_probe(docs, _BLOOM_WORDS[docs_path],
                                portable=False)


def _flux_join_tier(pts):
    from pyspark.sql import Window as _W  # noqa: F401

    def side(meas):
        hr = (F.floor(F.col("ts_epoch") / 21600).cast("long") * 21600)
        return (pts.filter(F.col("measurement") == meas)
                .groupBy("domain", "entity_id", hr.alias("bucket"))
                .agg(((F.sum(F.round(F.col("value") * 1e6).cast("long"))
                       / 1e6) / F.count(F.lit(1))).alias("mv")))

    a, b = side("W"), side("%")
    return (a.join(b, ["domain", "entity_id", "bucket"])
            .select("domain", "entity_id", "bucket",
                    (a["mv"] / b["mv"]).alias("ratio")))


def _ha_stats_tier(pts):
    from ha_sqllite_2_influxdb_spark.plans.ha_stats import (
        hourly_statistics,
    )

    return hourly_statistics(pts)


def _flux_grid_tier(pts):
    """flux: range(aligned) |> aggregateWindow(every:6h, fn:mean,
    createEmpty:true) |> fill(usePrevious:true) on an arbitrary point
    relation, via the compiled stage functions."""
    from ha_sqllite_2_influxdb_spark.plans import flux_text as fx

    df = pts.select(
        "state_id",
        F.col("measurement").alias("_measurement"),
        "domain", "entity_id",
        F.lit("value").alias("_field"),
        F.col("ts_epoch").alias("_time"),
        F.col("value").alias("_value"),
    )
    st = fx._State(df)
    fx._stage_range(st, {"start": ("num", 1704067200.0),
                         "stop": ("num", 1706659200.0)})
    fx._stage_aggregate_window(
        st, {"every": ("dur", 21600.0), "fn": ("ident", "mean"),
             "createEmpty": ("bool", True)})
    fx._stage_fill(st, {"usePrevious": ("bool", True)})
    return st.df


MAX_TIERS_PER_JVM = 10


def tier_names() -> list[str]:
    """Static tier list without a SparkSession (for batch planning)."""
    import inspect
    import re

    src = inspect.getsource(tiers)
    return re.findall(r'^\s{8}"([a-z0-9_]+)":', src, re.M)


def run_batched(names: list[str]) -> None:
    """VERDICT r6 #8: a single JVM accumulates heap/GC pressure across
    tiers, which inflated 15-tier runs into false linearity positives
    mid-r6. Enforce the documented ≤10-tiers-per-JVM cap structurally:
    re-exec this tool per batch and merge the per-batch JSON reports."""
    import subprocess

    merged_tiers: dict = {}
    failures: list[str] = []
    meta: dict = {}
    for i in range(0, len(names), MAX_TIERS_PER_JVM):
        batch = names[i:i + MAX_TIERS_PER_JVM]
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), *batch],
            capture_output=True, text=True)
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.startswith("{")), None)
        if line is None:
            failures.append(f"batch {batch}: no report "
                            f"(rc={proc.returncode}, "
                            f"stderr tail: {proc.stderr[-300:]})")
            continue
        rep = json.loads(line)
        meta = {k: rep[k] for k in ("sf_dir", "replicas")}
        merged_tiers.update(rep["tiers"])
        failures.extend(rep["failures"])
    print(json.dumps({**meta, "batched": True,
                      "jvm_batches": (len(names) + MAX_TIERS_PER_JVM - 1)
                      // MAX_TIERS_PER_JVM,
                      "tiers": merged_tiers, "failures": failures}))
    sys.exit(1 if failures else 0)


def main() -> None:
    names = tier_names()
    requested = sys.argv[1:] or names
    if len(requested) > MAX_TIERS_PER_JVM:
        run_batched(requested)
        return

    from ha_sqllite_2_influxdb_spark.operators import similarity
    from ha_sqllite_2_influxdb_spark.session import get_spark

    spark = get_spark("scale_probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    paths = build_corpora(spark)
    # PQ books are a build artifact; the probe measures SERVING at both
    # scales with the same codebooks (replica vectors are identical, so
    # base-trained books are exact for the 10× corpus too)
    books = similarity.pq_train(spark.read.parquet(paths["x1"][1]))

    only = set(sys.argv[1:])
    # VERDICT r13 #2 / "What's missing" #2: the old loop measured ALL
    # tiers at x1, then ALL at x10 — minutes of host-load drift between
    # a tier's two passes made cross-pass ratios swing 1.6×–9.2× on the
    # SAME tree (BASELINE.md, the neardup re-measure spread). The
    # within-one-JVM A/B that diagnosed it by hand is now the
    # instrument: each tier's x1 and x10 runs INTERLEAVE back-to-back
    # (x1,x10,x1,x10,...), so both sides of the ratio see the same host
    # seconds. The reported ratio is min(x10)/min(x1) over interleaved
    # samples (primary number); ratio_samples exposes the per-pair
    # spread so residual noise is visible instead of averaged away.
    def tiers_at(scale):
        dp, ep, vp, pp, evp, php, phvp = paths[scale]
        return tiers(spark, dp, ep, books, vp, pp, evp, php, phvp)

    t1, t10 = tiers_at("x1"), tiers_at("x10")
    failures = []
    report = {}
    for name in t1:
        if only and name not in only:
            continue
        make1, make10 = t1[name], t10[name]
        for make in (make1, make10):   # one warm-up per shape
            make().write.format("noop").mode("overwrite").save()
        # memory baseline AFTER the warm-ups: one-time build allocations
        # (broadcasts, Arrow workers) are not "growth"; what the gate
        # hunts is state that accumulates across the interleaved runs.
        # With interleaving the x1/x10 attribution is inherently joint —
        # the delta is reported for the whole interleaved block.
        rss0, jvm0 = rss_mb(), jvm_used_mb(spark)
        w1, w10 = [], []
        for _ in range(RUNS):
            t0 = time.time()
            make1().write.format("noop").mode("overwrite").save()
            w1.append(time.time() - t0)
            t0 = time.time()
            make10().write.format("noop").mode("overwrite").save()
            w10.append(time.time() - t0)
        ratio = round(min(w10) / min(w1), 2)
        samples = [round(b / a, 2) for a, b in zip(w1, w10)]
        report[name] = {
            "wall_x1": round(min(w1), 3), "wall_x10": round(min(w10), 3),
            "ratio": ratio,
            "ratio_samples": samples,
            # r14 honesty stamp: a >2x spread across the interleaved
            # pairs means THIS tier's reading absorbed host contention
            # (the two-run reproducibility audit caught exactly one such
            # reading — the first tier after a busy-host wait); re-run
            # it isolated before quoting the ratio.
            "unstable": max(samples) / min(samples) > 2,
            "linear_ideal": float(REPLICAS),
            # post-warm-up delta over the whole interleaved x1/x10
            # block (the interleave makes per-scale attribution joint)
            "rss_delta_x10": round(rss_mb() - rss0, 1),
            "jvm_delta_x10": round(jvm_used_mb(spark) - jvm0, 1),
        }
        if ratio > LINEAR_SLACK * REPLICAS:
            failures.append(f"{name}: ratio {ratio} > "
                            f"{LINEAR_SLACK * REPLICAS}")
        if report[name]["rss_delta_x10"] > RSS_CAP_MB:
            failures.append(f"{name}: driver RSS grew "
                            f"{report[name]['rss_delta_x10']} MB across "
                            f"the interleaved x1/x10 runs")
    print(json.dumps({"sf_dir": SF_DIR, "replicas": REPLICAS,
                      "interleaved": True,
                      "tiers": report, "failures": failures}))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
