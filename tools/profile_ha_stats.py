"""Stage-split profile of ha_statistics_hourly (VERDICT r13 #3) —
the method that localized the simhash pair-HOF: materialize cumulative
plan prefixes to the noop sink and read per-stage walls from the
cumulative deltas.

Stages (each includes everything before it):
  scan      — the memoized numeric-points projection
  segments  — + the one series-key window (lead) + open-segment filter
  terms     — + the hour-span explode + micro-quantized term columns
  full      — + the (series, hour) aggregation (the registry query)

Run on a QUIET host: ``python tools/profile_ha_stats.py [runs]``.
Prints one JSON line with min-of-N cumulative walls and stage deltas.
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
    stages = {
        "scan": lambda: pts,
        "segments": lambda: seg,
        "terms": lambda: ha_stats._clipped_terms(pts, 3600),
        "full": lambda: ha_stats.hourly_statistics(pts),
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

    names = list(stages)
    deltas = {
        n: round(walls[n] - walls[p], 3)
        for n, p in zip(names[1:], names[:-1])
    }
    rows = {n: stages[n]().count() for n in names}
    print(json.dumps({
        "sf_dir": SF_DIR, "runs": RUNS,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "cumulative_walls": walls, "stage_deltas": deltas,
        "rows": rows,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
