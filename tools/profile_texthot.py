"""Stage-split profile of the four text-family headline queries that
remain heaviest after the r14 surgeries (guide §1.1): neardup_xxhash_lsh,
simhash_neighbors_rotated, ngram_span_dedup, curate_pipeline. Each
query's wall is decomposed into cumulative plan prefixes (noop sink,
min-of-N, ONE JVM — cross-run walls on this host drift ±30-75%).

The shipped scale tiers are one-parse SQL texts; their DataFrame builds
are sameResult-pinned, so DataFrame-built prefixes attribute the same
physical stages. Run quiet: ``python tools/profile_texthot.py [runs]``.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def main() -> None:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ha_sqllite_2_influxdb_spark.operators import curation, dedup
    from ha_sqllite_2_influxdb_spark.plans import llm_ops
    from ha_sqllite_2_influxdb_spark.session import get_spark

    spark = get_spark("profile_texthot", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    corpus = llm_ops.recrawl(spark, SF_DIR)
    corpus.count()  # materialize the persisted input
    docs = llm_ops._docs(spark, SF_DIR)

    # --- neardup prefixes (mirror _neardup_pairs_df, sameResult tier)
    nd_sets = dedup.shingle_sets(corpus, native_hash=True)
    nd_prof = dedup._doc_profile(nd_sets, llm_ops.N_SEEDS, portable=False)
    nd_pairs = dedup._bucket_pairs(
        nd_prof, llm_ops.N_SEEDS, band_size=4, payload=["sh", "n_sh"])

    # --- simhash prefixes
    sh_sig = dedup.simhash_signatures(
        corpus.select("doc_id", "text"), portable=False)

    # --- ngram prefixes (mirror ngram_span_stats internals, n=8)
    n = 8
    ws = F.split(F.col("text"), " ")
    n_ngrams = F.greatest(F.size(ws) - (n - 1), F.lit(0)).cast("long")
    pat = "(?:^| )(?=(" + "[^ ]* " * (n - 1) + "[^ ]*))"
    grams = F.when(
        n_ngrams > 0, F.regexp_extract_all(F.col("text"), F.lit(pat), 1)
    ).otherwise(F.array().cast("array<string>"))
    g = corpus.select(
        "doc_id", F.explode(grams).alias("gs")
    ).select("doc_id", F.xxhash64(F.col("gs")).alias("g"))
    wg = W.partitionBy("g")
    ng_window = (
        g.repartition(F.col("g"))
        .select("doc_id",
                F.min("doc_id").over(wg).alias("_mn"),
                F.max("doc_id").over(wg).alias("_mx"))
        .filter(F.col("_mn") != F.col("_mx"))
    )

    # --- curate prefixes
    keep = (
        docs.groupBy(F.md5(F.encode("text", "UTF-8")).alias("_d"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    deduped = docs.join(keep, "doc_id", "left_semi")
    bench = curation.benchmark_prefixes(docs.select("doc_id", "text"))
    cu_train_sh = dedup.shingle_sets(deduped.select("doc_id", "text"))
    flagged = curation.decontaminate(
        deduped.select("doc_id", "text"), bench
    ).select("doc_id").distinct()
    clean = deduped.join(F.broadcast(flagged), "doc_id", "left_anti")
    cu_quality = curation.curriculum_topk(clean)

    variants = {
        "corpus_scan": lambda: corpus,
        "nd1_shingle_sets": lambda: nd_sets,
        "nd2_doc_profile": lambda: nd_prof,
        "nd3_bucket_pairs": lambda: nd_pairs,
        "nd4_full": lambda: llm_ops.q_neardup_xxhash_lsh(spark, SF_DIR),
        "sh1_signatures": lambda: sh_sig,
        "sh2_full": lambda: llm_ops.q_simhash_neighbors_rotated(spark, SF_DIR),
        "ng1_explode_hash": lambda: g,
        "ng2_window_flags": lambda: ng_window,
        "ng3_full": lambda: llm_ops.q_ngram_span_dedup(spark, SF_DIR),
        "cu1_dedup": lambda: deduped,
        "cu2_train_shingles": lambda: cu_train_sh,
        "cu3_flagged": lambda: flagged,
        "cu4_quality": lambda: cu_quality,
        "cu5_full": lambda: llm_ops.q_curate_pipeline(spark, SF_DIR),
    }

    walls: dict[str, float] = {}
    for name, make in variants.items():
        make().write.format("noop").mode("overwrite").save()  # warm-up
        best = float("inf")
        for _ in range(RUNS):
            spark.sparkContext.setJobDescription(f"texthot:{name}")
            t0 = time.time()
            make().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        walls[name] = round(best, 3)
        print(f"{name:22s} {walls[name]:6.3f}", flush=True)
    spark.sparkContext.setJobDescription(None)

    print(json.dumps({
        "sf_dir": SF_DIR, "runs": RUNS,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "walls": walls,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
