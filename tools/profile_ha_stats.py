"""Stage-split profile of the hourly statistics compiler (VERDICT
r13 #3) — the method that localized the r14 boundary/interior split:
materialize cumulative plan prefixes of the NAIVE one-agg formulation
to the noop sink and read per-stage walls from the cumulative deltas,
then time the current (split) implementation beside it.

Naive-chain stages (each includes everything before it):
  scan      — the memoized numeric-points projection
  segments  — + the one series-key window (lead) + open-segment filter
  terms     — + the bucket-span explode + micro-quantized term columns
  direct    — + the (series, hour) aggregation over ALL terms

`split` is the shipped `hourly_statistics` (boundary agg + interior
projection) — NOT a superset of `terms`, so it is reported as its own
wall next to `direct`, not as a delta in the chain. This is the
comparison that motivated the r14 surgery (2.27 → 0.76 s at sf0.1).

Run on a QUIET host: ``python tools/profile_ha_stats.py [runs]``.
Prints one JSON line with min-of-N walls, naive-chain deltas, and the
direct-vs-split comparison.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ha_sqllite_2_influxdb_spark.plans import ha_stats
    from ha_sqllite_2_influxdb_spark.plans.influxql import (
        _SERIES, _numeric_points,
    )
    from ha_sqllite_2_influxdb_spark.session import get_spark

    spark = get_spark("profile_ha_stats", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    pts = _numeric_points(spark, SF_DIR)

    w = Window.partitionBy(*_SERIES).orderBy("ts_epoch", "state_id")
    seg = (
        pts.select(
            *_SERIES, F.col("ts_epoch").alias("t0"), "value",
            F.lead("ts_epoch").over(w).alias("t1"),
        )
        .filter(F.col("t1").isNotNull() & (F.col("t1") > F.col("t0")))
    )
    terms = ha_stats._clipped_terms(pts, 3600)
    direct = terms.groupBy(*_SERIES, "h").agg(
        ((F.sum("_vd_micro") / 1e6) / (F.sum("_d_micro") / 1e6))
        .alias("dw_mean"),
        F.min("value").alias("min_val"),
        F.max("value").alias("max_val"),
        F.count(F.lit(1)).alias("n_segments"),
    ).select(
        *_SERIES, (F.col("h") * 3600).alias("hour_epoch"),
        "dw_mean", "min_val", "max_val", "n_segments",
    )
    stages = {
        "scan": lambda: pts,
        "segments": lambda: seg,
        "terms": lambda: terms,
        "direct": lambda: direct,
        "split": lambda: ha_stats.hourly_statistics(pts),
    }

    walls: dict[str, float] = {}
    for name, make in stages.items():
        make().write.format("noop").mode("overwrite").save()  # warm-up
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.time()
            make().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        walls[name] = round(best, 3)

    chain = ["scan", "segments", "terms", "direct"]
    deltas = {
        n: round(walls[n] - walls[p], 3)
        for n, p in zip(chain[1:], chain[:-1])
    }
    rows = {n: stages[n]().count() for n in stages}
    print(json.dumps({
        "sf_dir": SF_DIR, "runs": RUNS,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "cumulative_walls": walls, "naive_chain_deltas": deltas,
        "split_vs_direct": round(walls["split"] / walls["direct"], 3),
        "rows": rows,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
