"""Dump `.explain("formatted")` plans for named registry queries to
plans/<outdir>/<name>_<tag>.txt — the judge-checkable plan artifacts.

Usage: python tools/dump_plans.py <outdir> <tag> <query> [query ...]
  e.g. python tools/dump_plans.py r15 before ha_attr_fields window_topk

With --executed, each query is additionally RUN (noop sink is not used
here: the dataframe's own queryExecution must execute so the AQE final
plan materializes — a small collect via toArrow) and the adaptive FINAL
plan (isFinalPlan=true, showing ReusedExchange / AQEShuffleRead nodes)
is appended to the artifact. This is how runtime subtree reuse is
demonstrated rather than asserted from the printed initial plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    executed = "--executed" in sys.argv
    outdir, tag, names = args[0], args[1], args[2:]
    base = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", outdir)
    os.makedirs(base, exist_ok=True)

    import __spark_entry__ as ent
    from ha_sqllite_2_influxdb_spark.session import get_spark

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"dump_plans: {name}")
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        if executed:
            # execute THIS dataframe's queryExecution so the adaptive
            # plan finalizes, then re-explain: the second block shows
            # isFinalPlan=true with runtime reuse nodes
            n = df.toArrow().num_rows
            fin = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            txt += (f"\n\n===== EXECUTED (AQE final plan; rows={n}) "
                    f"=====\n\n{fin}")
        path = os.path.join(base, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
