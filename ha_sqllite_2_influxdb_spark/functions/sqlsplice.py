"""Cache-safe DataFrame splicing for one-parse SQL texts.

PySpark's parameterized ``spark.sql(text, name=df)`` registers a temp
view per DataFrame argument and DROPS it after parsing — and
``dropTempView`` un-caches every cached plan that canonically matches
the view's plan (the same CacheManager behavior as the r14
register-test leak: entries are keyed by canonicalized logical plan,
not by object). Splicing a PERSISTED DataFrame therefore silently
unpersists it: the r14 one-parse conversion of ``points()`` passed the
persisted HA fixture tables through the formatter and every build
evicted the fixture cache, tripling downstream HA-query walls (flux
fill-previous 0.42 → 1.44 s) while every sameResult pin stayed green —
canonical comparison strips nothing the cache loss shows. The
pre-existing one-parse texts (simhash, neardup) never hit this because
they splice *derived* ``select`` plans whose canonical form matches no
cached entry.

``sql_with_plans`` substitutes each ``{name}`` placeholder with an
idempotent temp view that is re-registered on every call and NEVER
dropped: the catalog entry is bounded per (name, plan) pair for the
session, and the cache survives. Placeholders are replaced literally
(no ``str.format``), so texts may contain any other braces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def sql_with_plans(spark: SparkSession, text: str,
                   **dfs: DataFrame) -> DataFrame:
    for key, df in dfs.items():
        marker = "{" + key + "}"
        if marker not in text:
            raise KeyError(f"placeholder {marker} not found in SQL text")
        name = f"_graft_splice_{key}_{df.semanticHash() & 0xFFFFFFFF:08x}"
        df.createOrReplaceTempView(name)
        text = text.replace(marker, f"`{name}`")
    return spark.sql(text)
