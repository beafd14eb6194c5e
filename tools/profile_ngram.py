"""Stage-split profile + formulation A/B of the ngram_span_dedup
engine plan (r14 optimization pass, guide §1/§2.3/§2.4).

The pre-r14 plan referenced the exploded-and-hashed position relation
``g`` TWICE (a dup-set groupBy("g") aggregate broadcast back onto a
semi-join probe), so the regex-lookahead shingle extraction + explode
ran twice per query — and because n-grams are nearly all unique, the
dup-set aggregation built a ~|positions|-entry hash map to reduce
almost nothing (the same term:group ≈ 1 disease the ha_statistics
split fixed). The shipped r14 shape exchanges raw (doc_id, g) pairs
by g ONCE and reads the duplication flags from a whole-partition
window min/max over the sorted runs.

Variants timed side by side (min-of-N, one JVM, noop sink):

  explode_only — the shared explode+hash pass alone (the floor).
  old_aggsemi  — the pre-r14 shape (two explode passes, g-agg hash
                 map + broadcast semi-join), kept for regression
                 comparison.
  shipped      — dedup.ngram_span_stats as committed (one exchange +
                 window flags). sameResult-verified equal to the
                 prototype that measured 1.07 -> 0.62 s at sf0.1.
  shared_rej   — the REJECTED alternative (repartition(g) reused by
                 both old consumers): saves the second explode but
                 keeps the corpus-scale hash map; measured ~1.1-1.2 s,
                 no better than old_aggsemi.

old_aggsemi is exceptAll-pinned against shipped in-run before timing
(the standing pytest pin is
tests/test_llm_ops.py::test_ngram_window_equals_agg_semijoin).
Run on a quiet host: ``python tools/profile_ngram.py [runs]``;
one JSON line out.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
N = 8


def main() -> None:
    from pyspark.sql import functions as F

    from ha_sqllite_2_influxdb_spark.operators import dedup
    from ha_sqllite_2_influxdb_spark.plans.llm_ops import recrawl
    from ha_sqllite_2_influxdb_spark.session import get_spark

    spark = get_spark("profile_ngram", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = recrawl(spark, SF_DIR)
    docs.write.format("noop").mode("overwrite").save()  # corpus warm

    ws = F.split(F.col("text"), " ")
    n_ngrams = F.greatest(F.size(ws) - (N - 1), F.lit(0)).cast("long")
    pat = "(?:^| )(?=(" + "[^ ]* " * (N - 1) + "[^ ]*))"
    grams = F.when(
        n_ngrams > 0, F.regexp_extract_all(F.col("text"), F.lit(pat), 1)
    ).otherwise(F.array().cast("array<string>"))
    g = docs.select("doc_id", F.explode(grams).alias("gs")).select(
        "doc_id", F.xxhash64(F.col("gs")).alias("g"))
    base = docs.select("doc_id", n_ngrams.alias("n_ngrams"))

    def finish(dup_per_doc):
        return base.join(dup_per_doc, "doc_id", "left").select(
            "doc_id", "n_ngrams",
            F.coalesce(F.col("n_dup_ngrams"), F.lit(0)).alias("n_dup_ngrams"),
            F.when(
                F.col("n_ngrams") > 0,
                F.coalesce(F.col("n_dup_ngrams"), F.lit(0)).cast("double")
                / F.col("n_ngrams"),
            ).alias("dup_ratio"),
        )

    def dup_set():
        return (
            g.groupBy("g")
            .agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
            .filter(F.col("_mn") != F.col("_mx"))
            .select("g")
        )

    def old_aggsemi():
        per_doc = (
            g.join(dup_set(), "g", "left_semi")
            .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_dup_ngrams"))
        )
        return finish(per_doc)

    def shared_rej():
        g1 = g.repartition(F.col("g"))
        dup = (
            g1.groupBy("g")
            .agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
            .filter(F.col("_mn") != F.col("_mx"))
            .select("g")
        )
        per_doc = (
            g1.join(dup, "g", "left_semi")
            .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_dup_ngrams"))
        )
        return finish(per_doc)

    variants = {
        "explode_only": lambda: g,
        "old_aggsemi": old_aggsemi,
        "shipped": lambda: dedup.ngram_span_stats(docs, n=N),
        "shared_rej": shared_rej,
    }

    ref = variants["shipped"]().cache()
    n_ref = ref.count()
    old = variants["old_aggsemi"]()
    parity = {"old_aggsemi": (
        old.exceptAll(ref).isEmpty() and ref.exceptAll(old).isEmpty()
    )}
    ref.unpersist()

    walls: dict[str, float] = {}
    for name, make in variants.items():
        make().write.format("noop").mode("overwrite").save()  # warm-up
        best = float("inf")
        for _ in range(RUNS):
            spark.sparkContext.setJobDescription(f"ngram:{name}")
            t0 = time.time()
            make().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        walls[name] = round(best, 3)
    spark.sparkContext.setJobDescription(None)

    print(json.dumps({
        "sf_dir": SF_DIR, "runs": RUNS, "rows": n_ref,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "walls": walls, "parity": parity,
        "shipped_vs_old": round(walls["shipped"] / walls["old_aggsemi"], 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
