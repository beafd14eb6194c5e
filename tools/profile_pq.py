"""Stage-split profile of pq_ann_topk (r14 optimization pass, guide
§1/§4.1).

Stages (noop sink, min-of-N, memoized codebooks — the bench state):
  normalized — the JVM-side L2 normalization pass alone
  codes      — + the _pq_assign Arrow pass (the Python boundary)
  adc        — + per-batch partial top-k + global rank window
  full       — the shipped q_pq_ann_topk (ADC shortlist + exact rerank)

The candidate fix measured here: _pq_assign serializes the full
normalized vector (nv, 64 doubles/row) back OUT of the Python worker;
pq_train's k-means iteration consumes it, but the ADC query path drops
it immediately — `codes_slim` times the assign pass with nv omitted
from the output schema (guide §4.1: move only the columns the
consumer needs across the boundary).

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

    norm = similarity._normalized(emb)
    codes = norm.filter(F.col("vec_id") >= n_queries).mapInPandas(
        similarity._pq_assign(books, m, dsub),
        "vec_id long, codes array<int>, nv array<double>",
    ).select("vec_id", "codes")

    def assign_slim(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf["nv"]), dtype=np.float64)
            out = np.empty((len(x), m), dtype=np.int32)
            for s in range(m):
                xs = x[:, s * dsub:(s + 1) * dsub]
                cs = books[s]
                d = ((xs * xs).sum(1)[:, None] - 2.0 * (xs @ cs.T)
                     + (cs * cs).sum(1)[None, :])
                out[:, s] = d.argmin(1)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].astype("int64"),
                "codes": list(out),
            })

    codes_slim = norm.filter(F.col("vec_id") >= n_queries).mapInPandas(
        assign_slim, "vec_id long, codes array<int>")

    variants = {
        "normalized": lambda: norm,
        "codes": lambda: codes,
        "codes_slim": lambda: codes_slim,
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
