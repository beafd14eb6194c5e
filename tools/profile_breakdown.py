"""Per-headline-query wall decomposition (guide §1.1/§7.3): split each
query's steady wall into DRIVER-side work (DataFrame construction +
Catalyst analysis, measured by building the plan and forcing analysis
via schema access) and EXECUTION (the noop sink on a pre-built
DataFrame). At sf0.1 the data is small enough that per-call plan
build/analysis is a real fraction of several walls — the r12 simhash
profile found 1.45 s of analysis on a 0.8 s execution, fixed with a
one-parse SQL text. This tool finds any remaining such cases.

All numbers are min-of-N inside ONE JVM (cross-run walls on this host
drift ±30-75%). Run quiet: ``python tools/profile_breakdown.py [runs]``.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None


def main() -> None:
    import bench
    from ha_sqllite_2_influxdb_spark.session import get_spark

    spark = get_spark("profile_breakdown", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    # identical warm-up to bench.py so steady walls are comparable
    from ha_sqllite_2_influxdb_spark.plans import llm_ops
    from ha_sqllite_2_influxdb_spark.sources.ha_fixture import derive_ha_tables
    from ha_sqllite_2_influxdb_spark.sources.tables import load_table, load_tables
    for df in load_tables(spark, SF_DIR).values():
        df.count()
    for df in derive_ha_tables(spark, SF_DIR).values():
        df.count()
    llm_ops.recrawl(spark, SF_DIR).count()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as F
    ev = load_table(spark, SF_DIR, "events")
    dim = ev.select("user_id").distinct().limit(500)
    for _ in range(3):
        (ev.join(F.broadcast(dim), "user_id")
           .filter(F.col("event_type").rlike("^[a-z]+$"))
           .select("event_id", "user_id", "event_type")
           .write.format("noop").mode("overwrite").save())

    out = {}
    items = bench.HEADLINE.items()
    if ONLY:
        items = [(n, f) for n, f in items if n in ONLY]
    for name, fn in items:
        spark.sparkContext.setJobDescription(f"breakdown: {name}")
        # one untimed full pass: codegen + AQE plan cache warm
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        build_s, exec_s, total_s = [], [], []
        for _ in range(RUNS):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.schema  # force analysis
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            build_s.append(t1 - t0)
            exec_s.append(t2 - t1)
            total_s.append(t2 - t0)
        out[name] = {
            "build": round(min(build_s), 3),
            "exec": round(min(exec_s), 3),
            "total": round(min(total_s), 3),
        }
        print(f"{name:28s} build={out[name]['build']:6.3f} "
              f"exec={out[name]['exec']:6.3f} total={out[name]['total']:6.3f}",
              flush=True)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
