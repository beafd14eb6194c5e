"""Adversarial pre-registration sweeps for the R13 codec tiers
(VERDICT r11 #8): DRI-restart JPEG, depth-4 paletted PNG, 24-bit PCM
WAV, tRNS alpha — the 2,000-image convention the gray16 / progressive
/ ADPCM tiers entered their driver rounds with (the r11 sweep found a
real crash in r7-era GIF code, which is why this runs BEFORE a tier's
window lands, not after).

Per tier, over one seeded corpus of N random texts (printable ASCII
with deliberate empty + non-ASCII minorities, dims cycling the fixture
formulas via doc_id):

1. VALID decode: every synthesized payload decodes under STRICT mode
   (exception classes outside the decoder's documented corruption
   tuple raise through — a masked raise is how the _lzw_decode
   KeyError hid for a round) and matches the analytic fixture
   contract bit-for-bit (cross-variant equality for DRI; the
   index/palette/alpha formulas for the PNG tiers; the
   (b-128)*65536 sample rule for PCM24).
2. MUTATION: 1-4 random byte flips per payload — strict decode must
   return None or a result tuple, never raise.
3. SLOW-DECODE: no single driver-side decode may exceed 2 s.

Prints one JSON line; exit 1 on any failure.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N = int(os.environ.get("SPARK_GRAFT_SWEEP_N", "2000"))
SEED = 0xC0DEC12
SLOW_S = 2.0


def make_texts(rng: random.Random, n: int) -> list[str]:
    out = []
    for i in range(n):
        if i % 53 == 0:
            out.append("")                       # empty-text fallback path
            continue
        ln = rng.randint(1, 80)
        s = "".join(chr(rng.randint(32, 126)) for _ in range(ln))
        if i % 41 == 0:
            s += "é世"                  # non-ASCII minority
        out.append(s)
    return out


def mutate(rng: random.Random, p: bytes) -> bytes:
    b = bytearray(p)
    for _ in range(rng.randint(1, 4)):
        b[rng.randrange(len(b))] = rng.randrange(256)
    return bytes(b)


def timed(dec, payload, slow: list):
    t0 = time.time()
    out = dec(payload)
    dt = time.time() - t0
    if dt > SLOW_S:
        slow.append(round(dt, 2))
    return out


def main() -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from ha_sqllite_2_influxdb_spark.operators import multimodal as mm
    from ha_sqllite_2_influxdb_spark.session import get_spark

    spark = get_spark("codec_sweep", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(SEED)
    texts = make_texts(rng, N)
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")

    def payloads(df):
        return {r.doc_id: bytes(r.payload) for r in df.collect()}

    report: dict = {"n": N}
    failures: list[str] = []

    # ---- jpeg_dri: restart markers must not change a single pixel ----
    import numpy as np

    dri = payloads(mm.jpeg_payloads(docs, per_block_constant=False,
                                    restart_interval=2))
    base = payloads(mm.jpeg_payloads(docs, per_block_constant=False))
    dec = mm._jpeg_pixels_fn(strict=True)
    ok = mut_ok = 0
    slow: list = []
    for d in range(N):
        a, b = timed(dec, dri[d], slow), dec(base[d])
        if (a is not None and b is not None and a[:3] == b[:3]
                and np.array_equal(a[3], b[3])):
            ok += 1
        out = dec(mutate(rng, dri[d]))
        mut_ok += out is None or isinstance(out, tuple)
    report["jpeg_dri"] = {"cross_variant_exact": ok, "mutation_ok": mut_ok,
                          "slow": slow}
    if ok != N or mut_ok != N or slow:
        failures.append("jpeg_dri")

    # ---- png_palette4: MSB-first sub-byte unpack vs the analytics ----
    p4 = payloads(mm.png_palette_payloads(docs, bit_depth=4))
    dec = mm._png_plte_pixels_fn(strict=True)
    ok = mut_ok = 0
    slow = []
    for d in range(N):
        r = timed(dec, p4[d], slow)
        w, h = (d % 12) + 4, (d % 6) + 3
        src = texts[d].encode("utf-8") or b"\x00"
        want_idx = np.array([src[i % len(src)] % 16
                             for i in range(w * h)],
                            dtype=np.uint8).reshape(h, w)
        want_plte = np.array([((d * 5 + j * 17) % 256,
                               (j * 29 + d) % 256,
                               (d * 3 + j * 7) % 256)
                              for j in range(16)], dtype=np.uint8)
        if (r is not None and r[:3] == (w, h, 16)
                and np.array_equal(r[3], want_idx)
                and np.array_equal(r[4], want_plte)):
            ok += 1
        out = dec(mutate(rng, p4[d]))
        mut_ok += out is None or isinstance(out, tuple)
    report["png_palette4"] = {"analytic_exact": ok, "mutation_ok": mut_ok,
                              "slow": slow}
    if ok != N or mut_ok != N or slow:
        failures.append("png_palette4")

    # ---- png_trns: short alpha chunk + bit-unchanged index decode ----
    pt = payloads(mm.png_palette_payloads(docs, with_trns=True))
    pn = payloads(mm.png_palette_payloads(docs))
    ok = mut_ok = 0
    slow = []
    for d in range(N):
        r = timed(dec, pt[d], slow)
        rn = dec(pn[d])
        nc = 16 + (d % 2) * 16
        cov = (nc + 1) // 2
        want_alpha = np.full(nc, 255, dtype=np.uint8)
        want_alpha[:cov] = [(d + j * 11) % 256 for j in range(cov)]
        if (r is not None and rn is not None and r[2] == nc
                and np.array_equal(r[5], want_alpha)
                and np.array_equal(r[3], rn[3])      # indices unchanged
                and np.array_equal(r[4], rn[4])):    # palette unchanged
            ok += 1
        out = dec(mutate(rng, pt[d]))
        mut_ok += out is None or isinstance(out, tuple)
    report["png_trns"] = {"alpha_and_shared_decode_exact": ok,
                          "mutation_ok": mut_ok, "slow": slow}
    if ok != N or mut_ok != N or slow:
        failures.append("png_trns")

    # ---- wav_pcm24: sign-extension path, via the operator (the WAV
    # decoder lives inline in decode_wav), strict bound at plan build
    p24 = payloads(mm.wav_payloads(docs, sample_format="pcm24"))
    old = mm._STRICT_DECODE
    try:
        mm._STRICT_DECODE = True
        valid = {r.doc_id: r for r in mm.decode_wav(
            spark.createDataFrame(sorted(p24.items()),
                                  "doc_id long, payload binary")
        ).collect()}
        mut_rows = [(d, mutate(rng, p24[d])) for d in range(N)]
        muts = mm.decode_wav(spark.createDataFrame(
            mut_rows, "doc_id long, payload binary")).collect()
    finally:
        mm._STRICT_DECODE = old
    ok = 0
    for d in range(N):
        src = texts[d].encode("ascii", errors="replace")
        r = valid[d]
        want_mean = (sum((b - 128) * 65536 for b in src) / len(src)
                     if src else None)
        if (r.bits_per_sample == 24 and r.n_samples == len(src)
                and ((r.mean_amplitude is None and want_mean is None)
                     or (r.mean_amplitude is not None
                         and want_mean is not None
                         and abs(r.mean_amplitude - want_mean) == 0.0))):
            ok += 1
    # strict mapInPandas did not raise across all mutated rows, and
    # every row came back (None-dimension or decoded) — the P7 contract
    mut_ok = len(muts)
    report["wav_pcm24"] = {"analytic_exact": ok, "mutation_rows": mut_ok}
    if ok != N or mut_ok != N:
        failures.append("wav_pcm24")

    report["failures"] = failures
    print(json.dumps(report))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
