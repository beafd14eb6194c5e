"""Stage-split profile + anti-join A/B of the curate_pipeline engine
plan (r14 optimization pass, guide §1/§3.1).

The shipped pre-r14 shape drops contaminated docs with
``deduped.join(flagged, "doc_id", "left_anti")``; the planner picks a
SortMergeJoin, which shuffles and sorts the ENTIRE deduped corpus —
full document text included — by doc_id (Exchange + Sort on the plan's
widest relation) to eliminate a flagged set bounded by |benchmark
hits|, a few rows. Guide §3.1: broadcast the small side — a broadcast
hash anti-join leaves the corpus un-shuffled.

Stages (cumulative, noop sink, min-of-N):
  deduped — md5 exact-dedup semi-join
  flagged — + decontaminate pair flags (distinct doc_ids)
  full    — the shipped q_curate_pipeline
  bcast   — same pipeline with F.broadcast(flagged) on the anti-join

bcast is exceptAll-pinned against full in-run before timing.
Run on a quiet host: ``python tools/profile_curate.py [runs]``.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def main() -> None:
    from pyspark.sql import functions as F

    from ha_sqllite_2_influxdb_spark.operators import curation
    from ha_sqllite_2_influxdb_spark.plans import llm_ops
    from ha_sqllite_2_influxdb_spark.session import get_spark

    spark = get_spark("profile_curate", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = llm_ops._docs(spark, SF_DIR)

    keep = (
        docs.groupBy(F.md5(F.encode("text", "UTF-8")).alias("_d"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    deduped = docs.join(keep, "doc_id", "left_semi")
    flagged = curation.decontaminate(
        deduped.select("doc_id", "text"),
        curation.benchmark_prefixes(docs.select("doc_id", "text")),
    ).select("doc_id").distinct()

    def bcast():
        clean = deduped.join(F.broadcast(flagged), "doc_id", "left_anti")
        return curation.curriculum_topk(clean)

    variants = {
        "deduped": lambda: deduped,
        "flagged": lambda: flagged,
        "full": lambda: llm_ops.q_curate_pipeline(spark, SF_DIR),
        "bcast": bcast,
    }

    ref = variants["full"]().cache()
    n_ref = ref.count()
    got = variants["bcast"]()
    parity = {"bcast": (
        got.exceptAll(ref).isEmpty() and ref.exceptAll(got).isEmpty()
    )}
    ref.unpersist()

    walls: dict[str, float] = {}
    for name, make in variants.items():
        make().write.format("noop").mode("overwrite").save()  # warm-up
        best = float("inf")
        for _ in range(RUNS):
            spark.sparkContext.setJobDescription(f"curate:{name}")
            t0 = time.time()
            make().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        walls[name] = round(best, 3)
    spark.sparkContext.setJobDescription(None)

    print(json.dumps({
        "sf_dir": SF_DIR, "runs": RUNS, "rows": n_ref,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "walls": walls, "parity": parity,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
