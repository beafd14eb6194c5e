"""Stage-split profile of pq_ann_topk (r14 optimization pass, guide
§1/§4.1/§4.2).

The r13 shape normalized embeddings with the interpreted JVM HOF pass
(`_normalized`: the transform lambda re-evaluates the O(dim) norm fold
per ELEMENT — measured 0.36-0.41 s alone per 10k rows at sf0.1, ~40%
of the query; CollapseProject re-inlines any materialized norm column,
so it cannot be projected away) and then serialized the normalized
vector back OUT of the assign pass only to drop it. The r14 shape
normalizes in numpy INSIDE the assign pass (bit-identical sequential
fold, pinned by test_np_normalized_bit_identical_to_jvm) and emits
codes without nv.

Stages (noop sink, min-of-N, memoized codebooks — the bench state):
  normalized_jvm — the retired JVM HOF normalization pass alone
                   (the regression reference)
  codes_train    — the train-path assign pass (normalize+assign in
                   numpy, nv riding back for the k-means update)
  adc            — the shipped FUSED assign+score pass + rank window
                   (neither nv nor codes cross the Arrow boundary)
  full           — the shipped q_pq_ann_topk (ADC + exact rerank)

Run on a quiet host: ``python tools/profile_pq.py [runs]``.
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

    from ha_sqllite_2_influxdb_spark.operators import similarity
    from ha_sqllite_2_influxdb_spark.plans import llm_ops
    from ha_sqllite_2_influxdb_spark.session import get_spark

    spark = get_spark("profile_pq", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = llm_ops._emb(spark, SF_DIR)
    books = llm_ops._pq_books(spark, SF_DIR)
    m, ksub, dim = 8, 16, similarity.DIM
    dsub = dim // m
    n_queries = 5

    # the r13 shape's stages, kept for regression comparison: JVM HOF
    # normalization (interpreted, O(dim²)/row — see _normalized's r14
    # note) feeding an assign pass that round-trips nv over Arrow
    norm = similarity._normalized(emb)

    # the train-path assign pass (nv rides back for the k-means update)
    codes_train = emb.select("vec_id", "embedding").mapInPandas(
        similarity._pq_assign(books, m, dsub),
        "vec_id long, codes array<int>, nv array<double>",
    ).select("vec_id", "codes")

    variants = {
        "normalized_jvm": lambda: norm,
        "codes_train": lambda: codes_train,
        "adc": lambda: similarity.pq_adc_topk(
            emb, n_queries=n_queries, k=50, books=books),
        "full": lambda: llm_ops.q_pq_ann_topk(spark, SF_DIR),
    }

    walls: dict[str, float] = {}
    for name, make in variants.items():
        make().write.format("noop").mode("overwrite").save()  # warm-up
        best = float("inf")
        for _ in range(RUNS):
            spark.sparkContext.setJobDescription(f"pq:{name}")
            t0 = time.time()
            make().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        walls[name] = round(best, 3)
    spark.sparkContext.setJobDescription(None)

    print(json.dumps({
        "sf_dir": SF_DIR, "runs": RUNS,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "walls": walls,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
