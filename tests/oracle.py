"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side-by-side, compares row count,
column-name set, and an order-insensitive value multiset (columns sorted by
name, like the driver's hash). Exact float equality — if this passes, any
tolerance-based driver hash passes too.
"""

from __future__ import annotations

import math

import duckdb

from ha_sqllite_2_influxdb_spark.sources.tables import TABLE_NAMES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return f"bool:{v}"
    return repr(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str) -> dict:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    out = {
        "rows_spark": len(s_rows),
        "rows_duck": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_duck": sorted(d_cols),
    }
    out["count_match"] = out["rows_spark"] == out["rows_duck"]
    out["schema_match"] = out["cols_spark"] == out["cols_duck"]
    if out["count_match"] and out["schema_match"]:
        cs, cd = _canon(s_rows, s_cols), _canon(d_rows, d_cols)
        out["value_match"] = cs == cd
        if not out["value_match"]:
            diff = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
            out["first_diffs"] = diff
    else:
        out["value_match"] = False
    out["ok"] = out["count_match"] and out["schema_match"] and out["value_match"]
    return out
