"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship HA-points pipeline at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ha_sqllite_2_influxdb_spark.plans.ha_pipeline import q_points

    return q_points(spark, "/root/testdata/sf0.001")


def _registry():
    from ha_sqllite_2_influxdb_spark.plans import ha_pipeline

    modules = [ha_pipeline]
    for name in ("analytics", "llm_ops", "streaming_ops"):
        try:
            mod = __import__(
                f"ha_sqllite_2_influxdb_spark.plans.{name}", fromlist=[name]
            )
            modules.append(mod)
        except ImportError:
            pass
    queries: dict[str, Callable] = {}
    oracles: dict[str, str] = {}
    for mod in modules:
        queries.update(getattr(mod, "QUERIES", {}))
        oracles.update(getattr(mod, "ORACLES", {}))
    return queries, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
