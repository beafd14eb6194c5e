"""Unit tests for the parity-critical scalar functions (SURVEY §5 #1/#4).

The oracle for routing/splitting is the *reference's own predicate logic*
re-executed in-process (functions.numeric.py_is_numeric mirrors
sqllite2influxdb.py:122; partition semantics mirror :106).
"""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ha_sqllite_2_influxdb_spark.functions.entity import entity_domain, entity_short
from ha_sqllite_2_influxdb_spark.functions.numeric import (
    is_numeric_str, py_is_numeric,
)

EDGE_STATES = [
    "-5", "1.2.3", "1e3", "007", "42.0", "", "on", "21.5", ".5", "5.", ".",
    "0", "unknown", "1..2", " 5", "5 ", "+5", "nan", "inf", "1.0.0.0",
]


def test_numeric_regex_edge_cases(spark):
    df = spark.createDataFrame([(s,) for s in EDGE_STATES], "s string")
    got = {
        r.s: r.m
        for r in df.select("s", is_numeric_str(F.col("s")).alias("m")).collect()
    }
    for s in EDGE_STATES:
        assert got[s] == py_is_numeric(s), f"route mismatch for {s!r}"


# Alphabet includes the three Unicode-digit classes that expose the F8
# divergence (VERDICT r8 #4): ٥ (ARABIC-INDIC FIVE, category Nd —
# reference routes to float), １ (FULLWIDTH ONE, Nd — same), ² (SUPER-
# SCRIPT TWO, category No — isdigit()-true but float() raises, so the
# reference DROPS the row). The engine contract (SURVEY §7.4 #2) is
# ASCII-only: every non-ASCII state routes to the string field.
@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="0123456789.-e ٥１²", max_size=8))
def test_numeric_regex_property(reference_batch, s):
    # collected lazily via the session-scoped batch fixture
    reference_batch.append(s)


def expected_engine_route(s: str) -> bool:
    """The engine's DOCUMENTED numeric-route contract: the reference
    predicate on the ASCII domain; False (string field) outside it."""
    return py_is_numeric(s) if s.isascii() else False


def test_numeric_regex_property_batch(spark, reference_batch):
    cases = sorted(set(reference_batch + EDGE_STATES))
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = {
        r.s: r.m
        for r in df.select("s", is_numeric_str(F.col("s")).alias("m")).collect()
    }
    for s in cases:
        assert got[s] == expected_engine_route(s), f"route mismatch for {s!r}"


def test_numeric_unicode_divergence_pinned(spark):
    """SURVEY §7.4 #2: the F8 Unicode-digit divergence, pinned on BOTH
    sides so a change to either contract fails loudly. Reference
    behavior is three-way (Nd→float field, No→row dropped via float()
    raise, other→string); engine behavior is two-way (ASCII-numeric→
    float, everything else→string, never a drop)."""
    cases = {
        "٥": (True, "nd_float"),      # reference: float('٥') == 5.0
        "１": (True, "nd_float"),
        "１２.５": (True, "nd_float"),
        "²": (True, "no_dropped"),    # reference: float('²') raises
        "42": (True, "nd_float"),     # ASCII control: both engines agree
    }
    for s, (ref_accepts, _) in cases.items():
        assert py_is_numeric(s) is ref_accepts, s
    try:
        float("٥")
        float("１２.５")
    except ValueError as e:          # documents WHY nd_float is real
        raise AssertionError("Python float() no longer parses Nd digits") from e
    import pytest
    with pytest.raises(ValueError):
        float("²")                    # the reference's row-drop path
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = {r.s: r.m for r in
           df.select("s", is_numeric_str(F.col("s")).alias("m")).collect()}
    assert got == {"٥": False, "１": False, "１２.５": False,
                   "²": False, "42": True}


def test_entity_partition_parity(spark):
    ids = ["sensor.kitchen", "sensor.esp32.kitchen", "nodot", "a.b.c.d", "x.", ".y"]
    df = spark.createDataFrame([(e,) for e in ids], "e string")
    got = {
        r.e: (r.d, r.s)
        for r in df.select(
            "e",
            entity_domain(F.col("e")).alias("d"),
            entity_short(F.col("e")).alias("s"),
        ).collect()
    }
    for e in ids:
        domain, _, short = e.partition(".")
        assert got[e] == (domain, short), f"partition mismatch for {e!r}"


def test_scan_health_drop_accounting(spark, sf_dir):
    """Observed metrics must equal directly-computed counts (P7 parity:
    the reference's warning log lines, as exact numbers)."""
    from pyspark.sql import functions as F

    from ha_sqllite_2_influxdb_spark.operators.transform import (
        SENTINEL_STATES, joined_scan, scan_health,
    )
    from ha_sqllite_2_influxdb_spark.sources.ha_fixture import derive_ha_tables

    t = derive_ha_tables(spark, sf_dir)
    args = (t["ha_states"], t["ha_states_meta"], t["ha_state_attributes"])
    m = scan_health(*args)
    df = joined_scan(*args)
    assert m["n_scanned"] == df.count()
    assert m["n_sentinel"] == df.filter(
        F.col("state").isin(*SENTINEL_STATES)).count()
    assert m["n_missing_attrs"] == df.filter(
        F.col("shared_attrs").isNull()).count()
    assert m["n_malformed_attrs"] == df.filter(
        F.col("shared_attrs").isNotNull()
        & F.try_parse_json("shared_attrs").isNull()).count()
    assert m["n_malformed_attrs"] > 0  # fixture plants '{not json'
    assert m["n_sentinel"] > 0


def test_etl_config_fail_fast():
    """S6 parity: all-or-nothing env validation, names listed, defaults
    applied, DEBUG_MODE string forms (reference :19-31)."""
    import pytest

    from ha_sqllite_2_influxdb_spark.config import ConfigError, EtlConfig

    good = {
        "SQLITE_DB": "/data/ha.db", "INFLUXDB_URL": "http://i:8086",
        "INFLUXDB_TOKEN": "t", "INFLUXDB_ORG": "o", "INFLUXDB_BUCKET": "b",
    }
    cfg = EtlConfig.from_env(good)
    assert cfg.batch_size == 10_000 and cfg.debug_mode is False

    with pytest.raises(ConfigError) as e:
        EtlConfig.from_env({k: v for k, v in good.items()
                            if k not in ("INFLUXDB_TOKEN", "INFLUXDB_ORG")})
    assert "INFLUXDB_TOKEN" in str(e.value) and "INFLUXDB_ORG" in str(e.value)

    assert EtlConfig.from_env({**good, "DEBUG_MODE": "True"}).debug_mode
    assert EtlConfig.from_env({**good, "DEBUG_MODE": "1"}).debug_mode
    assert not EtlConfig.from_env({**good, "DEBUG_MODE": "no"}).debug_mode
    assert EtlConfig.from_env({**good, "BATCH_SIZE": "500"}).batch_size == 500
    with pytest.raises(ConfigError):
        EtlConfig.from_env({**good, "BATCH_SIZE": "xyz"})
    with pytest.raises(ConfigError):
        EtlConfig.from_env({**good, "BATCH_SIZE": "0"})


def test_strip_markup_edges(spark):
    """Hand-built pages pin each stripping rule: whole-block script/style
    removal (including tags INSIDE the script string), tag strip, entity
    decode with amp-last double-decode protection, space collapse."""
    from pyspark.sql import functions as F

    from ha_sqllite_2_influxdb_spark.operators.text import strip_markup

    cases = [
        (1, '<p>hello <b>world</b></p>', 'hello world'),
        (2, '<script>var a = "<div>"; </script>after', 'after'),
        (3, '<style>h1 {color: blue}</style>text', 'text'),
        # &amp;lt; must decode to the LITERAL &lt;, never twice to <
        (4, 'x &amp;lt; y &lt; z', 'x &lt; y < z'),
        (5, 'a&nbsp;&nbsp;b', 'a b'),
        (6, 'no markup at all', 'no markup at all'),
        (7, '<SCRIPT>upper</SCRIPT>kept', 'kept'),  # (?i) case-fold
        (8, '', ''),
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s, _ in cases], "doc_id long, text string"
    ).select("doc_id", strip_markup(F.col("text")).alias("clean"))
    got = {r.doc_id: r.clean for r in df.collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_load_table_cache_evicts_on_regenerated_fixture(spark, tmp_path):
    """sources.tables._TABLE_CACHE mirrors the streaming schema cache
    (ADVICE r5 #3): same-session same-path loads reuse ONE DataFrame,
    but a regenerated parquet under the SAME path (new mtime) must
    rebuild — never serve yesterday's schema/plan — and the cache must
    replace, not accumulate."""
    import os
    import shutil

    from ha_sqllite_2_influxdb_spark.sources import tables as tb

    spark.range(3).selectExpr("id", "id * 2 as v").coalesce(1) \
        .write.mode("overwrite").parquet(str(tmp_path / "_gen1"))
    spark.range(5).selectExpr("id", "cast(id as string) as v") \
        .coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "_gen2"))
    tdir = str(tmp_path / "region.parquet")

    def install(src, mtime_ns):
        if os.path.isdir(tdir):
            shutil.rmtree(tdir)
        shutil.copytree(str(tmp_path / src), tdir)
        os.utime(tdir, ns=(mtime_ns, mtime_ns))

    install("_gen1", 1_000_000_000)
    n0 = len(tb._TABLE_CACHE)
    a = tb.load_table(spark, str(tmp_path), "region")
    b = tb.load_table(spark, str(tmp_path), "region")
    assert a is b                      # cache hit: the SAME plan object
    assert a.count() == 3
    install("_gen2", 2_000_000_000)    # regenerated fixture, same path
    c = tb.load_table(spark, str(tmp_path), "region")
    assert c is not a                  # stale entry evicted
    assert dict(c.dtypes)["v"] == "string"
    assert c.count() == 5
    assert len(tb._TABLE_CACHE) == n0 + 1   # replaced, not accumulated
    # in-place overwrite of a PART file (directory entry set and dir
    # mtime unchanged) must still evict: the stamp hashes child mtimes
    part = next(f for f in os.listdir(tdir) if f.endswith(".parquet"))
    os.utime(os.path.join(tdir, part), ns=(3_000_000_000, 3_000_000_000))
    os.utime(tdir, ns=(2_000_000_000, 2_000_000_000))  # pin dir mtime
    d = tb.load_table(spark, str(tmp_path), "region")
    assert d is not c, "child-mtime change did not evict"
    # sibling sessions share an applicationId but must not share
    # cached plans (separate catalogs + runtime confs)
    sib = spark.newSession()
    e = tb.load_table(sib, str(tmp_path), "region")
    assert e is not d
    e.createOrReplaceTempView("_cache_probe_sib")
    assert sib.sql("select count(*) from _cache_probe_sib").collect()[0][0] == 5
