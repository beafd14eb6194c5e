"""Skew operators: salted join must equal the plain join on any input
(incl. a pathologically hot key) and actually spread the hot key."""

from pyspark.sql import functions as F

from ha_sqllite_2_influxdb_spark.operators.skew import (
    salted_join,
    two_phase_distinct,
)
from ha_sqllite_2_influxdb_spark.sources.tables import load_table


def _skewed(spark):
    # 10k rows, 90% on key 0 — the classic hot-key fact table
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )


def test_salted_join_equals_plain_join(spark):
    big = _skewed(spark)
    small = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim"),
    )
    plain = big.join(small, "k").select("k", "payload", "dim")
    salted = salted_join(big, small, "k", n_salts=8).select(
        "k", "payload", "dim")
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))


def test_salt_is_deterministic_and_spreads(spark):
    big = _skewed(spark)
    s1 = big.withColumn(
        "s", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8))
    )
    a = s1.groupBy("s").count().collect()
    b = s1.groupBy("s").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # retry-stable
    # the hot key's 9k rows must hit every salt bucket
    hot = s1.filter(F.col("k") == 0).select("s").distinct().count()
    assert hot == 8


def test_two_phase_distinct_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {r.event_type: r.n_distinct_user_id
           for r in two_phase_distinct(ev, "event_type", "user_id").collect()}
    want = {r.event_type: r.n
            for r in ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert got == want


def test_salted_join_rejects_outer_joins(spark):
    """right/full outer would emit unmatched small rows once per salt."""
    import pytest

    from ha_sqllite_2_influxdb_spark.operators.skew import salted_join

    big = spark.range(10).withColumnRenamed("id", "k")
    small = spark.range(5).withColumnRenamed("id", "k")
    for how in ("right", "full", "outer", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(big, small, "k", how=how)
    # safe kinds still construct
    for how in ("inner", "left", "left_semi", "left_anti"):
        salted_join(big, small, "k", how=how)


def test_skew_report_summary_and_ranks(spark):
    from ha_sqllite_2_influxdb_spark.operators.skew import skew_report

    rows = [("hot",)] * 60 + [("warm",)] * 30 + [("a",)] * 5 \
        + [("b",)] * 3 + [("c",)] * 1 + [("d",)] * 1
    df = spark.createDataFrame(rows, "k string")
    out = {r.rank: r for r in skew_report(df, ["k"], top_n=3).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert (out[1].key, out[1].cnt) == ("hot", 60)
    assert (out[2].key, out[2].cnt) == ("warm", 30)
    assert out[1].share == 0.6
    s = out[0]
    # 6 keys; max/mean = 60 / (100/6) = 3.6
    assert s.cnt == 6 and s.share == 60.0 * 6.0 / 100.0
