"""Within-JVM A/B (guide §2.2/§6): the shared recrawl corpus is persisted
in however many partitions the documents parquet scan produced; every
dedup-family consumer then (a) decompresses the cached text column in
that few tasks and (b) pays a round-robin repartition exchange to widen
it before the heavy per-row shingle/hash work. Persisting the corpus
ALREADY widened to the session's parallelism moves the decompress into
every core and removes the widening exchange from every consumer.

A/B inside ONE JVM, min-of-N noop walls, value-parity via exceptAll.
Run quiet: ``python tools/profile_corpus_width.py [runs]``.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def main() -> None:
    from ha_sqllite_2_influxdb_spark.operators import dedup
    from ha_sqllite_2_influxdb_spark.plans import llm_ops
    from ha_sqllite_2_influxdb_spark.session import get_spark

    spark = get_spark("profile_corpus_width", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = llm_ops._docs(spark, SF_DIR)

    narrow = dedup.recrawl_corpus(docs).persist()
    n_rows = narrow.count()
    wide = (dedup.recrawl_corpus(docs)
            .repartition(spark.sparkContext.defaultParallelism).persist())
    wide.count()

    variants = {}
    for label, corpus in (("narrow", narrow), ("wide", wide)):
        variants[f"scan_{label}"] = (lambda c=corpus: c)
        variants[f"neardup_{label}"] = (lambda c=corpus: dedup.neardup_pairs(
            c, threshold=llm_ops.JACCARD_T, n_seeds=llm_ops.N_SEEDS,
            portable=False))
        variants[f"simhash_{label}"] = (
            lambda c=corpus: dedup.simhash_neighbors_rotated(
                c, max_hamming=llm_ops.HAMMING_T, portable=False))
        variants[f"ngram_{label}"] = (
            lambda c=corpus: dedup.ngram_span_stats(c, n=8))

    # value parity first (order-insensitive)
    parity = {}
    for q in ("neardup", "simhash", "ngram"):
        a = variants[f"{q}_narrow"]()
        b = variants[f"{q}_wide"]()
        parity[q] = a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    walls: dict[str, float] = {}
    for name, make in variants.items():
        make().write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(RUNS):
            spark.sparkContext.setJobDescription(f"cwidth:{name}")
            t0 = time.time()
            make().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        walls[name] = round(best, 3)
        print(f"{name:18s} {walls[name]:6.3f}", flush=True)
    spark.sparkContext.setJobDescription(None)

    print(json.dumps({
        "sf_dir": SF_DIR, "runs": RUNS, "rows": n_rows,
        "narrow_parts": narrow.rdd.getNumPartitions(),
        "wide_parts": wide.rdd.getNumPartitions(),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "walls": walls, "parity": parity,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
