"""Every queries() entry must hash-match its oracle_sql() — the same check
the driver runs at sf0.01 (here at the sf set by SPARK_GRAFT_TEST_SF_DIR)."""

import pytest

import __spark_entry__ as entrymod
from tests.oracle import compare, duck_connect

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    result = compare(df, duck, ORACLES[name])
    assert result["ok"], result


def test_no_lossy_oracle_types(duck):
    """VERDICT r5 #8: no oracle may project a DuckDB type that degrades
    in a pandas/arrow fetch. HUGEINT (DuckDB's type for integer sum()
    and sum() OVER) becomes float64, so the driver's repr-exact value
    hash sees 1.0 vs Spark's 1 — rows/schema green, values red (the
    rounds-2..4 stream_sessions failure). fetchall() returns lossless
    Python ints and CANNOT catch this, so audit the DECLARED projected
    types; a future oracle edit reintroducing one fails here, locally."""
    lossy = ("HUGEINT", "UHUGEINT", "UBIGINT")
    offenders = {}
    for name, sql in sorted(ORACLES.items()):
        desc = duck.execute(f"DESCRIBE SELECT * FROM ({sql})").fetchall()
        bad = [(c, t) for c, t, *_ in desc if t in lossy]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"lossy projected oracle types (cast to BIGINT): {offenders}"
    )


def test_no_nested_oracle_types(duck):
    """VERDICT r7 #1b: the round driver's pandas canonicalizer throws
    `unhashable type: 'list'` on LIST/MAP/STRUCT output columns (the r7
    inverted_index red row) — our sim's str(v) normalization silently
    accepted what the driver rejects. Audit every oracle's DECLARED
    projected types: nested types at top level are forbidden; emit a
    sorted delimiter-joined string instead (canonical because sorted)."""
    offenders = {}
    for name, sql in sorted(ORACLES.items()):
        desc = duck.execute(f"DESCRIBE SELECT * FROM ({sql})").fetchall()
        # '[' (not '[]') so fixed-size ARRAY types like BIGINT[3] —
        # which DESCRIBE prints without the empty-bracket form — are
        # caught too; pandas receives them as unhashable numpy arrays
        bad = [(c, t) for c, t, *_ in desc
               if "[" in t or t.startswith("STRUCT")
               or t.startswith("MAP") or t.startswith("UNION")]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"nested projected oracle types (driver cannot hash them — "
        f"join to a sorted string): {offenders}"
    )


def test_driver_window_contract():
    """The driver correctness-checks the FIRST 50 registry entries: that
    prefix must be exactly the curated window, and every slot oracle-
    backed EXCEPT the pinned rows-only debt tiers (sketch/LSH-recall/
    codec ops with no exact SQL counterpart — VERDICT r7 #2 mandated
    rotating them in; the driver records its weaker rows-only verdict
    for those, and the judge sees which). A registry reorder must fail
    here, not silently in the round run."""
    ROWS_ONLY_OK = {
        # Rows-only-BY-NATURE tiers permitted in any driver window (the
        # r12 window itself is 50/50 oracle-backed). ADPCM is a
        # stateful predictor recurrence with no SQL counterpart, pinned
        # by tests/test_formats.py::
        # test_wav_adpcm_hand_pinned_golden_and_roundtrip; the banded
        # pHash kNN is an LSH shortlist whose recall>=0.9 + soundness
        # are pinned vs the exact tier in tests (it enters the window
        # at r15 per _NEXT_WINDOW_PLAN_R15).
        "multimodal_wav_adpcm", "multimodal_phash_knn_banded",
    }
    names = list(QUERIES)[:50]
    assert names == entrymod._DRIVER_WINDOW
    missing = [n for n in names if n not in ORACLES and n not in ROWS_ONLY_OK]
    assert not missing, f"window slots without an oracle: {missing}"
    assert all(n not in ORACLES for n in ROWS_ONLY_OK), (
        "a ROWS_ONLY_OK name gained an oracle — remove it from the "
        "exemption list")


def test_every_query_runs(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.limit(1).count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
