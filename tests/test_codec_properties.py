"""Property tests for the dependency-free codec cores (pure Python —
no SparkSession): the module-level LZW encoder/decoder pair, the IMA
ADPCM step, and the Adam7 pass geometry. These run in milliseconds and
fuzz the exact helpers every payload synthesizer and decoder now
shares, so an edit to a shared core fails here before any Spark tier
runs."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ha_sqllite_2_influxdb_spark.operators.multimodal import (
    _ADAM7,
    _GIF_ILACE,
    _gif_subblocks,
    _ima_encode_nibble,
    _ima_step,
    _lzw_decode,
    _lzw_encode,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 15), min_size=1, max_size=600))
def test_lzw_roundtrip_any_index_stream(idxs):
    """decode(encode(s)) == s for arbitrary 4-bit index streams —
    covers the KwKwK one-behind case and every width bump the fixture
    corpus may not reach."""
    assert _lzw_decode(_lzw_encode(idxs), 4) == idxs


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 3), min_size=1, max_size=400),
       st.integers(2, 6))
def test_lzw_roundtrip_other_code_sizes(idxs, min_cs):
    """The width rule must hold at every legal minimum code size, not
    just the GIF fixtures' 4."""
    idxs = [i % (1 << min_cs) for i in idxs]
    assert _lzw_decode(_lzw_encode(idxs, min_cs), min_cs) == idxs


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_lzw_decode_never_raises_on_garbage(data):
    """Corrupt code streams return None (or a list) — never raise; the
    mapInPandas null-row contract depends on it."""
    out = _lzw_decode(data, 4)
    assert out is None or isinstance(out, list)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=1000))
def test_gif_subblock_framing_roundtrip(data):
    """Sub-block framing is invertible and always zero-terminated."""
    framed = _gif_subblocks(data)
    assert framed.endswith(b"\x00")
    pos, out = 0, bytearray()
    while framed[pos]:
        ln = framed[pos]
        out += framed[pos + 1:pos + 1 + ln]
        pos += ln + 1
    assert bytes(out) == data and pos == len(framed) - 1


@settings(max_examples=200, deadline=None)
@given(st.integers(-32768, 32767), st.integers(0, 88),
       st.integers(0, 15))
def test_ima_step_stays_in_range(pred, idx, nib):
    """Reconstruction clamps to int16 and the step index to 0..88 for
    EVERY (state, nibble) — the decoder can never leave its domain on
    corrupt nibbles."""
    p2, i2 = _ima_step(pred, idx, nib)
    assert -32768 <= p2 <= 32767
    assert 0 <= i2 <= 88


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(-30000, 30000), min_size=2, max_size=200),
       st.integers(0, 88))
def test_ima_encode_decode_tracks_within_step(samples, idx0):
    """Encoder and decoder share state by construction: decoding the
    encoder's nibbles reproduces the encoder's own reconstruction
    EXACTLY (bit-for-bit), whatever the input waveform."""
    pred_e, idx_e = samples[0], idx0
    nibs = []
    for s in samples[1:]:
        nib = _ima_encode_nibble(s, pred_e, idx_e)
        pred_e, idx_e = _ima_step(pred_e, idx_e, nib)
        nibs.append((nib, pred_e, idx_e))
    pred_d, idx_d = samples[0], idx0
    for nib, pe, ie in nibs:
        pred_d, idx_d = _ima_step(pred_d, idx_d, nib)
        assert (pred_d, idx_d) == (pe, ie)


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 64), st.integers(1, 64))
def test_adam7_passes_partition_every_pixel_once(w, h):
    """The seven passes tile the full raster exactly — every (r, c)
    appears in exactly one pass (the scatter is a bijection)."""
    seen = set()
    for c0, r0, cs, rs in _ADAM7:
        for r in range(r0, h, rs):
            for c in range(c0, w, cs):
                assert (r, c) not in seen
                seen.add((r, c))
    assert len(seen) == w * h


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 128))
def test_gif_interlace_rows_partition_once(h):
    """GIF's 4 interlace passes emit every row exactly once."""
    order = [r for r0, rs in _GIF_ILACE for r in range(r0, h, rs)]
    assert sorted(order) == list(range(h))


def test_bitflip_corruption_never_raises(spark, sf_dir):
    """The P7 null-row contract at depth: every decoder factory, fed
    VALID payloads with random single/multi-byte mutations (header
    survives often enough to reach the deep parse paths random bytes
    never touch), must return None or a result tuple — never raise.
    The mapInPandas wrappers catch broad exceptions, but the factories'
    own contracts say None; a masked raise is how the _lzw_decode
    KeyError hid for a round."""
    import random

    from ha_sqllite_2_influxdb_spark.operators import multimodal as mm
    from ha_sqllite_2_influxdb_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text").limit(8)
    corpora = {
        "bmp": (mm.bmp_payloads(docs), mm._bmp_pixels_fn(strict=True)),
        "png": (mm.png_payloads(docs), mm._png_pixels_fn(strict=True)),
        "png_adam7": (mm.png_adam7_payloads(docs),
                      mm._png_adam7_pixels_fn(strict=True)),
        "png_gray16": (mm.png_gray16_payloads(docs),
                       mm._png_gray16_pixels_fn(strict=True)),
        "png_plte": (mm.png_palette_payloads(docs),
                     mm._png_plte_pixels_fn(strict=True)),
        "png_plte4": (mm.png_palette_payloads(docs, bit_depth=4),
                      mm._png_plte_pixels_fn(strict=True)),
        "png_plte_i": (mm.png_palette_payloads(docs, interlaced=True,
                                               with_trns=True),
                       mm._png_plte_pixels_fn(strict=True)),
        "gif": (mm.gif_payloads(docs), mm._gif_pixels_fn(strict=True)),
        "jpeg": (mm.jpeg_payloads(docs), mm._jpeg_pixels_fn(strict=True)),
        "jpeg_color": (mm.jpeg_color_payloads(docs),
                       mm._jpeg_ycbcr_fn(strict=True)),
        "jpeg_prog": (mm.jpeg_progressive_payloads(docs),
                      mm._jpeg_prog_pixels_fn(strict=True)),
        "jpeg_dri": (mm.jpeg_payloads(docs, restart_interval=2),
                     mm._jpeg_pixels_fn(strict=True)),
    }
    rng = random.Random(0xC0DEC)
    # strict mode bound AT CONSTRUCTION above (ADVICE r9 low): an
    # exception class OUTSIDE the decoder's documented corruption tuple
    # raises through (a real finding) instead of being absorbed by the
    # production backstop (ADVICE r8) — no shared module state mutated,
    # so parallel test runners can't race on the flag
    for name, (pay_df, decode) in corpora.items():
        payloads = [bytes(r.payload) for r in pay_df.collect()]
        assert payloads, name
        for p in payloads:
            assert decode(p) is not None, f"{name}: valid payload nulled"
            for _ in range(12):
                b = bytearray(p)
                for _k in range(rng.randint(1, 4)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
                out = decode(bytes(b))    # None or tuple — no raise
                assert out is None or isinstance(out, tuple), name
            # truncations hit every length-check path
            for cut in (0, 1, len(p) // 3, len(p) - 1):
                out = decode(p[:cut])
                assert out is None or isinstance(out, tuple), name


@settings(max_examples=120, deadline=None)
@given(st.integers(1, 2**31 - 1), st.integers(1, 18), st.integers(1, 12))
def test_png_unfilter_roundtrip_all_filter_types(seed, w, h):
    """Property pin for the r9-shared `_png_unfilter_1bpp` core (now
    serving BOTH the grayscale and paletted decoders): a random uint8
    image filtered row-by-row with a seed-chosen mix of all five PNG
    §9 filter types (None/Sub/Up/Average/Paeth) must round-trip
    exactly; a truncated or over-long stream returns None."""
    import random as _random

    import numpy as np

    from ha_sqllite_2_influxdb_spark.operators.multimodal import (
        _png_unfilter_1bpp,
    )

    rng = _random.Random(seed)
    img = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
    stream = bytearray()
    prior = [0] * w
    for r in range(h):
        row = img[r]
        ft = rng.randrange(5)
        stream.append(ft)
        for i in range(w):
            a = row[i - 1] if i else 0
            b = prior[i]
            c = prior[i - 1] if i else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
            stream.append((row[i] - pred) & 0xFF)
        prior = row
    got = _png_unfilter_1bpp(bytes(stream), w, h)
    assert got is not None
    assert np.array_equal(got, np.array(img, dtype=np.uint8))
    assert _png_unfilter_1bpp(bytes(stream[:-1]), w, h) is None
    assert _png_unfilter_1bpp(bytes(stream) + b"\x00", w, h) is None


def test_decoder_closures_are_hermetic(tmp_path):
    """The module's 'driver-built, shipped by value' convention, pinned
    end-to-end: every decode factory's closure must cloudpickle-
    round-trip and RUN in a subprocess that does NOT have this repo on
    sys.path (the executor-without-PYTHONPATH scenario). A module-level
    function reference inside a closure (the bug class: `_lzw_decode`,
    `_png_unfilter_1bpp` before `_shipped`) fails here with
    ModuleNotFoundError."""
    import base64
    import subprocess
    import sys

    from pyspark import cloudpickle

    from ha_sqllite_2_influxdb_spark.operators import multimodal as mm

    factories = {
        "bmp": mm._bmp_pixels_fn, "png": mm._png_pixels_fn,
        "png_plte": mm._png_plte_pixels_fn,
        "png_adam7": mm._png_adam7_pixels_fn,
        "png_gray16": mm._png_gray16_pixels_fn,
        "jpeg": mm._jpeg_pixels_fn, "jpeg_color": mm._jpeg_ycbcr_fn,
        "jpeg_prog": mm._jpeg_prog_pixels_fn, "gif": mm._gif_pixels_fn,
    }
    helpers = {
        "png_chunk": (mm._shipped(mm._png_chunk), "(b'IEND', b'')"),
        "lzw_encode": (mm._shipped(mm._lzw_encode), "([1, 2, 3],)"),
        "lzw_decode": (mm._shipped(mm._lzw_decode), "(b'', 4)"),
        "gif_subblocks": (mm._shipped(mm._gif_subblocks), "(b'xyz',)"),
        "unfilter": (mm._shipped(mm._png_unfilter_1bpp), "(b'', 1, 1)"),
        "unfilter2": (mm._shipped(mm._png_unfilter_2bpp), "(b'', 1, 1)"),
        "filter_row": (mm._shipped(mm._png_filter_row),
                       "(b'ab', b'cd', 4, 2)"),
        # r11: the ADPCM pair — the one tier whose closures referenced
        # module globals directly (caught by the non-repo-cwd sweep);
        # the spec tables now ride as defaulted parameters
        "ima_step": (mm._shipped(mm._ima_step), "(100, 10, 5)"),
        "ima_encode": (mm._shipped(mm._ima_encode_nibble),
                       "(500, 100, 10)"),
    }
    lines = []
    for name, fac in factories.items():
        blob = base64.b64encode(cloudpickle.dumps(fac())).decode()
        lines.append(f"fn = pickle.loads(base64.b64decode('{blob}'))\n"
                     f"assert fn(b'garbage') is None or fn(b'garbage') == []\n"
                     f"print('OK {name}')")
    for name, (fn, args) in helpers.items():
        blob = base64.b64encode(cloudpickle.dumps(fn)).decode()
        lines.append(f"fn = pickle.loads(base64.b64decode('{blob}'))\n"
                     f"fn(*{args})\n"
                     f"print('OK {name}')")
    script = "import base64, pickle\n" + "\n".join(lines)
    r = subprocess.run([sys.executable, "-c", script],
                       capture_output=True, text=True, cwd=str(tmp_path))
    assert r.returncode == 0, (
        f"closure not hermetic:\n{r.stderr.strip().splitlines()[-3:]}")
    assert r.stdout.count("OK ") == len(factories) + len(helpers)


def test_decode_backstop_absorbs_exotic_exception_classes():
    """ADVICE r8: in production mode an exception class OUTSIDE the
    typed corruption tuple (here a TypeError from a non-bytes payload)
    nulls the one row instead of killing the batch; strict mode
    re-raises it so fuzz tests see it as a finding."""
    from ha_sqllite_2_influxdb_spark.operators import multimodal as mm

    decode = mm._gif_pixels_fn()
    assert mm._STRICT_DECODE is False     # module default stays lenient
    assert decode(12345) is None          # TypeError absorbed → null row
    # ADVICE r9 low: strict is a CONSTRUCTION-time binding now — a
    # strict decoder re-raises, and flipping the module flag after
    # construction does NOT change an existing decoder's behavior
    # (matching what executors see via cloudpickle's by-value capture)
    with pytest.raises(TypeError):
        mm._gif_pixels_fn(strict=True)(12345)
    mm._STRICT_DECODE = True
    try:
        assert decode(12345) is None      # bound at construction
    finally:
        mm._STRICT_DECODE = False


def test_corrupt_payloads_in_batch_never_kill_the_task(spark, sf_dir):
    """Production-path corruption contract: a batch MIXING valid and
    mutated payloads must come back with one row per input — corrupt
    rows as nulls, valid rows decoded — for EVERY decoder, including
    the WAV family whose parse functions live inside the mapInPandas
    closures (out of reach of the factory-level fuzz above). One bad
    row killing its Arrow batch is the 100 TB failure mode this pins."""
    import random

    from pyspark.sql import functions as F

    from ha_sqllite_2_influxdb_spark.operators import multimodal as mm
    from ha_sqllite_2_influxdb_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text").limit(6)
    cases = [
        (mm.wav_payloads(docs), mm.decode_wav, "sample_rate"),
        (mm.wav_payloads(docs, n_channels=2),
         mm.decode_wav_multichannel, "n_channels"),
        (mm.wav_adpcm_payloads(docs), mm.decode_wav_adpcm, "n_samples"),
        (mm.bmp_payloads(docs), mm.decode_bmp, "width"),
        (mm.gif_payloads(docs), mm.decode_gif, "width"),
        (mm.png_adam7_payloads(docs), mm.decode_png_adam7, "width"),
    ]
    rng = random.Random(0xBADF00D)
    for pay_df, decoder, probe_col in cases:
        rows = pay_df.collect()
        mutated = []
        for r in rows:
            p = bytearray(bytes(r.payload))
            for _ in range(rng.randint(1, 5)):
                p[rng.randrange(len(p))] = rng.randrange(256)
            mutated.append((int(r.doc_id) + 1_000_000, bytes(p)))
        mixed = spark.createDataFrame(
            [(int(r.doc_id), bytes(r.payload)) for r in rows] + mutated,
            "doc_id long, payload binary")
        out = decoder(mixed).collect()       # must not raise
        assert len(out) == 2 * len(rows), decoder.__name__
        by_id = {r.doc_id: r for r in out}
        for r in rows:                       # valid rows still decode
            assert by_id[r.doc_id][probe_col] is not None, decoder.__name__


def test_lzw_roundtrip_beyond_dictionary_cap():
    """Streams needing >4095 dictionary codes: both sides FREEZE the
    table at 4096 (the deferred-clear variant), so high-entropy frames
    far beyond the fixtures' sizes still round-trip exactly. Before the
    freeze, code 4096+ wrote an unmasked 13th bit and silently shifted
    every later code."""
    import random

    rng = random.Random(0x4096)
    for n in (5_000, 20_000, 50_000):
        idxs = [rng.randint(0, 15) for _ in range(n)]
        assert _lzw_decode(_lzw_encode(idxs), 4) == idxs
    # and at a small code size, where the cap is reached sooner
    idxs = [rng.randint(0, 3) for _ in range(30_000)]
    assert _lzw_decode(_lzw_encode(idxs, 2), 2) == idxs


def test_png_inflate_is_header_bounded():
    """ADVICE r9 (medium + low): (a) a corrupt paletted PNG whose IHDR
    claims 40000x40000 with a tiny IDAT must null the row WITHOUT ever
    reaching the h*w allocation — the exact-length gate now runs before
    np.zeros on both the interlaced and sequential paths; (b) an IDAT
    that inflates to MORE than the header-implied stream length (the
    decompression-bomb shape) is rejected by the max_length-bounded
    decompressobj, not inflated in full and then length-checked."""
    import struct
    import zlib

    from ha_sqllite_2_influxdb_spark.operators import multimodal as mm

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    def png(ihdr, idat, plte=b"\x00\x00\x00"):
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"PLTE", plte) + chunk(b"IDAT", idat)
                + chunk(b"IEND", b""))

    one = mm._png_plte_pixels_fn()
    # (a) huge claimed dims, interlaced and sequential, depth 8: the
    # tiny IDAT can never satisfy the expected stream length, so the
    # decode must return None — under strict mode too (a MemoryError
    # from a header-sized allocation would re-raise there)
    tiny = zlib.compress(b"\x00" * 16)
    one_strict = mm._png_plte_pixels_fn(strict=True)
    for interlace in (0, 1):
        ihdr = struct.pack(">IIBBBBB", 40000, 40000, 8, 3, 0, 0, interlace)
        assert one_strict(png(ihdr, tiny)) is None
    # (b) bomb shape: a 2x2 image whose IDAT inflates to ~1 MB; the
    # bounded inflate stops at expect+1 bytes and rejects
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * (1 << 20))
    assert one(png(ihdr, bomb)) is None
    # and a well-formed 2x2 still decodes (the gate is exact, not <=)
    good = zlib.compress(b"\x00\x00\x00" + b"\x00\x00\x00")
    got = one(png(ihdr, good))
    assert got is not None and got[0] == 2 and got[1] == 2


def test_png_gray_and_rgb_inflate_header_bounded(spark):
    """ADVICE r9 follow-through: the grayscale, truecolor, and Adam7
    grayscale decoders share the same header-bounded inflate — a bomb
    IDAT on a small-dims header nulls the row in all three."""
    import struct
    import zlib

    from ha_sqllite_2_influxdb_spark.operators import multimodal as mm

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    def png(ctype, interlace, idat):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, ctype, 0, 0, interlace)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", idat) + chunk(b"IEND", b""))

    bomb = zlib.compress(b"\x00" * (1 << 20))
    assert mm._png_pixels_fn()(png(0, 0, bomb)) is None
    assert mm._png_adam7_pixels_fn()(png(0, 1, bomb)) is None
    # truecolor's decoder is nested in the operator; drive it end-to-end
    df = spark.createDataFrame([(1, png(2, 0, bomb))],
                               "doc_id long, payload binary")
    row = mm.decode_png_rgb(df).collect()[0]
    assert row.width is None


def test_shipped_rejects_non_self_contained_helper():
    """VERDICT r9 #7: _shipped must fail AT DECORATION TIME for a
    helper that loads a non-builtin global (it would NameError on an
    executor under the rebound empty globals), including loads hidden
    inside nested code objects — and must keep accepting the
    self-contained shapes the codec cores actually use."""
    import pytest

    from ha_sqllite_2_influxdb_spark.operators import multimodal as mm

    def bad_helper(x):
        return _module_level_dep(x)  # noqa: F821 — the point

    with pytest.raises(ValueError, match="_module_level_dep"):
        mm._shipped(bad_helper)

    def bad_nested(xs):
        return [_module_level_dep(x) for x in xs]  # noqa: F821

    with pytest.raises(ValueError, match="_module_level_dep"):
        mm._shipped(bad_nested)

    def good_helper(x):
        import struct
        return len(struct.pack("<I", x)) + max(0, x)

    assert mm._shipped(good_helper)(3) == 7

    # and every real factory still constructs (decoration-time check
    # runs inside each _shipped call they make)
    for fac in (mm._png_pixels_fn, mm._png_adam7_pixels_fn,
                mm._png_plte_pixels_fn, mm._jpeg_pixels_fn,
                mm._jpeg_ycbcr_fn, mm._gif_pixels_fn, mm._bmp_pixels_fn):
        assert callable(fac())


@settings(max_examples=120, deadline=None)
@given(st.integers(1, 2**31 - 1), st.integers(1, 14), st.integers(1, 10))
def test_png_unfilter_2bpp_roundtrip_all_filter_types(seed, w, h):
    """Property pin for the r10 `_png_unfilter_2bpp` core (16-bit
    grayscale): a random 2w-byte-row image filtered with a seed-chosen
    mix of all five filter types — using the spec's bpp=2 left-neighbor
    offset, independently reimplemented here — must round-trip exactly
    through the forward bank AND the hand-rolled reference below;
    truncated/over-long streams return None."""
    import random as _random

    import numpy as np

    from ha_sqllite_2_influxdb_spark.operators.multimodal import (
        _png_filter_row,
        _png_unfilter_2bpp,
    )

    rng = _random.Random(seed)
    n = 2 * w
    img = [[rng.randrange(256) for _ in range(n)] for _ in range(h)]
    stream = bytearray()
    prior = [0] * n
    for r in range(h):
        row = img[r]
        ft = rng.randrange(5)
        stream.append(ft)
        filtered = _png_filter_row(bytes(row), bytes(prior), ft, bpp=2)
        # independent reference for the bpp=2 offset (catches a shared
        # off-by-bpp bug in BOTH banks at once)
        for i in range(n):
            a = row[i - 2] if i >= 2 else 0
            b = prior[i]
            c = prior[i - 2] if i >= 2 else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
            assert filtered[i] == (row[i] - pred) & 0xFF
        stream += filtered
        prior = row
    got = _png_unfilter_2bpp(bytes(stream), w, h)
    assert got is not None
    assert np.array_equal(got, np.array(img, dtype=np.uint8))
    assert _png_unfilter_2bpp(bytes(stream[:-1]), w, h) is None
    assert _png_unfilter_2bpp(bytes(stream) + b"\x00", w, h) is None


def test_png_inflate_rejects_truncated_adler_trailer():
    """r10 review finding (confirmed repro): a PNG whose IDAT deflate
    body is complete but whose 4-byte adler32 trailer is truncated —
    a cut-off transfer, or a bit-flipped chunk length shortening the
    IDAT slice — must stay corrupt. zlib.decompress raised Error -5
    there; the header-bounded decompressobj gate needs the explicit
    `not dec.eof` check, on every PNG decoder."""
    import struct
    import zlib

    from ha_sqllite_2_influxdb_spark.operators import multimodal as mm

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    def png(ihdr_fields, idat):
        return (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields))
                + chunk(b"PLTE", b"\x00\x00\x00")
                + chunk(b"IDAT", idat) + chunk(b"IEND", b""))

    cases = [
        # (decoder factory, ihdr fields, raw filtered stream)
        (mm._png_pixels_fn(strict=True), (2, 2, 8, 0, 0, 0, 0),
         b"\x00\x01\x02" + b"\x00\x03\x04"),
        (mm._png_gray16_pixels_fn(strict=True), (2, 2, 16, 0, 0, 0, 0),
         b"\x00\x01\x02\x03\x04" + b"\x00\x05\x06\x07\x08"),
        (mm._png_plte_pixels_fn(strict=True), (2, 2, 8, 3, 0, 0, 0),
         b"\x00\x00\x00" + b"\x00\x00\x00"),
    ]
    for decode, ihdr, raw in cases:
        full = zlib.compress(raw)
        assert decode(png(ihdr, full)) is not None, "valid payload nulled"
        # deflate body complete, adler32 trailer cut: corrupt
        assert decode(png(ihdr, full[:-4])) is None
        # trailer present but wrong: zlib raises internally -> corrupt
        bad = full[:-4] + bytes(b ^ 0xFF for b in full[-4:])
        assert decode(png(ihdr, bad)) is None
        # bytes AFTER the complete stream (junk or a second stream):
        # a valid IDAT is exactly one zlib stream (dec.unused_data)
        assert decode(png(ihdr, full + b"JUNKJUNK")) is None
        assert decode(png(ihdr, full + full)) is None


def test_codec_pipelines_run_without_package_on_workers(tmp_path):
    """r11: the factory-level hermeticity test above cannot see a
    module-global reference inside an operator's INLINE mapInPandas
    closure — exactly how the ADPCM tier shipped a package import to
    executors for three rounds (every pytest/driver run has the repo
    as cwd, which local-mode Python workers inherit onto sys.path, so
    the leak was invisible until a sweep ran from /tmp). This test IS
    that scenario: a subprocess whose cwd is NOT the repo and whose
    PYTHONPATH is empty (driver gets the repo via sys.path only, which
    does NOT propagate to workers) runs every codec tier end-to-end —
    payload synthesis AND decode. A leaky closure dies with
    ModuleNotFoundError here, on this laptop, instead of on executor 1
    of 1000."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = f"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from ha_sqllite_2_influxdb_spark.operators import multimodal as mm
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
docs = spark.createDataFrame(
    [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta iota")],
    "doc_id long, text string")
tiers = [
    ("bmp", mm.decode_bmp, mm.bmp_payloads(docs)),
    ("png", mm.decode_png, mm.png_payloads(docs)),
    ("png_rgb", mm.decode_png_rgb, mm.png_rgb_payloads(docs)),
    ("png_gray16", mm.decode_png_gray16, mm.png_gray16_payloads(docs)),
    ("png_adam7", mm.decode_png_adam7, mm.png_adam7_payloads(docs)),
    ("png_palette", mm.decode_png_palette, mm.png_palette_payloads(docs)),
    ("png_trns", mm.decode_png_palette_trns,
     mm.png_palette_payloads(docs, with_trns=True)),
    ("jpeg", mm.decode_jpeg, mm.jpeg_payloads(docs)),
    ("jpeg_color", mm.decode_jpeg_color, mm.jpeg_color_payloads(docs)),
    ("jpeg_prog", mm.decode_jpeg_progressive,
     mm.jpeg_progressive_payloads(docs)),
    ("gif", mm.decode_gif, mm.gif_payloads(docs)),
    ("gif_lct", mm.decode_gif_lct, mm.gif_lct_payloads(docs)),
    ("wav", mm.decode_wav, mm.wav_payloads(docs)),
    ("wav_stereo", mm.decode_wav_multichannel,
     mm.wav_payloads(docs, n_channels=2)),
    ("wav_adpcm", mm.decode_wav_adpcm, mm.wav_adpcm_payloads(docs)),
    ("thumbnail", mm.image_thumbnails, mm.bmp_payloads(docs)),
    ("dhash", mm.image_dhash, mm.dhash_payloads(docs)),
    ("audio_fp", mm.audio_fingerprint, mm.audio_fp_payloads(docs)),
    ("video_fp", mm.decode_gif_frames, mm.video_fp_payloads(docs)),
    ("phash_pipe",
     lambda df: mm.thumbnail_dhash(mm.image_thumbnails(df, width=9,
                                                       height=8)),
     mm.dhash_hires_payloads(docs)),
]
for name, decode, payloads in tiers:
    rows = decode(payloads).collect()
    # per-doc tiers emit 2 rows; per-frame tiers (gif_lct) emit more —
    # the assertion here is "the closure RAN on workers", not the shape
    assert len(rows) >= 2, name
    print("OK", name, flush=True)
print("ALL TIERS HERMETIC")
"""
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run([sys.executable, "-c", script],
                       capture_output=True, text=True,
                       cwd=str(tmp_path), env=env, timeout=600)
    assert r.returncode == 0 and "ALL TIERS HERMETIC" in r.stdout, (
        f"non-hermetic codec closure:\n{r.stdout[-500:]}\n"
        f"{r.stderr.strip().splitlines()[-5:]}")


def test_dhash_random_image_roundtrip_and_mutation_contract():
    """dHash tier sweep pin (the gray16/DRI precedent, CI-sized): (a)
    random full-range 9x8 grayscale images, encoded as BMPs by an
    INDEPENDENT encoder in this test, hash through the decode path to
    exactly the numpy-reference dHash; (b) one random byte mutation per
    image under a strict-mode factory holds the None-or-tuple contract
    (the mutation may corrupt the header, the gray contract, or the
    dims — never raise). Driver-side: exercises the factory closures
    directly, no Spark session needed."""
    import random
    import struct

    import numpy as np

    from ha_sqllite_2_influxdb_spark.operators import multimodal as mm

    rng = random.Random(0xD4A5)
    pixels_of = mm._bmp_pixels_fn(strict=True)
    W, H = mm._DHASH_W, mm._DHASH_H
    stride = (3 * W + 3) & ~3

    def encode(gray: np.ndarray) -> bytes:
        px = bytearray()
        for r in range(H):
            for x in range(W):
                v = int(gray[r, x])
                px += bytes((v, v, v))
            px += b"\x00" * (stride - 3 * W)
        off = 14 + 40
        return (struct.pack("<2sIHHI", b"BM", off + len(px), 0, 0, off)
                + struct.pack("<IiiHHIIiiII", 40, W, H, 1, 24, 0,
                              len(px), 2835, 2835, 0, 0) + bytes(px))

    def ref_dhash(gray: np.ndarray):
        bits = (gray[:, 1:] > gray[:, :-1]).astype(np.uint8)
        lo = int.from_bytes(np.packbits(bits[:4], bitorder="little")
                            .tobytes(), "little")
        hi = int.from_bytes(np.packbits(bits[4:], bitorder="little")
                            .tobytes(), "little")
        return lo, hi

    def decode_hash(b: bytes):
        r = pixels_of(b)
        if r is None:
            return None
        w, h, _bpp, _n, samples = r
        if (w, h) != (W, H):
            return None
        px = samples.reshape(h, w, 3)
        if not ((px[:, :, 0] == px[:, :, 1]).all()
                and (px[:, :, 0] == px[:, :, 2]).all()):
            return None
        return ref_dhash(px[:, :, 0].astype(np.int64))

    for _ in range(64):
        gray = np.array([[rng.randrange(256) for _ in range(W)]
                         for _ in range(H)], dtype=np.int64)
        payload = encode(gray)
        assert decode_hash(payload) == ref_dhash(gray)

        mutated = bytearray(payload)
        pos = rng.randrange(len(mutated))
        mutated[pos] = (mutated[pos] + 1 + rng.randrange(255)) % 256
        got = decode_hash(bytes(mutated))  # must not raise
        assert got is None or (isinstance(got, tuple) and len(got) == 2)


def test_inline_parser_decoders_survive_batch_corruption(spark):
    """r11 structural gap-closer: `test_bitflip_corruption_never_raises`
    fuzzes the FACTORY decoders, but several decode paths parse inline
    inside their mapInPandas closures (the WAV family, the animated-GIF
    frame walk, the fingerprint parsers, thumbnails, frame sampling) —
    and the video mutation sweep proved the gap real (the GCE-less
    delay=None crash killed a whole Arrow batch through exactly such an
    inline path). Feed every inline-parser decoder a batch of mutated +
    truncated payloads THROUGH Spark: the batch must come back (null
    rows / dropped frames fine), never raise."""
    import random

    from ha_sqllite_2_influxdb_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta eta")],
        "doc_id long, text string")
    suites = [
        ("wav16", mm.decode_wav, mm.wav_payloads(docs)),
        ("wav24", mm.decode_wav,
         mm.wav_payloads(docs, sample_format="pcm24")),
        ("wavf32", mm.decode_wav,
         mm.wav_payloads(docs, sample_format="float32")),
        ("wav_mc", mm.decode_wav_multichannel,
         mm.wav_payloads(docs, n_channels=2)),
        ("wav_adpcm", mm.decode_wav_adpcm, mm.wav_adpcm_payloads(docs)),
        ("audio_fp", mm.audio_fingerprint, mm.audio_fp_payloads(docs)),
        ("gif_frames", mm.decode_gif_frames, mm.gif_anim_payloads(docs)),
        ("gif_lct", mm.decode_gif_lct, mm.gif_lct_payloads(docs)),
        ("thumb_bmp", mm.image_thumbnails, mm.bmp_payloads(docs)),
        ("thumb_png", mm.image_thumbnails, mm.png_payloads(docs)),
        ("frames", mm.sample_frames, mm.payloads(docs)),
        ("phash_pipe",
         lambda df: mm.thumbnail_dhash(
             mm.image_thumbnails(df, width=9, height=8)),
         mm.dhash_hires_payloads(docs)),
    ]
    rng = random.Random(0x1111E)
    for name, decode, paydf in suites:
        payloads = [bytes(r.payload) for r in paydf.collect()]
        assert payloads, name
        rows, i = [], 0
        for p in payloads:
            for _ in range(10):
                b = bytearray(p)
                for _k in range(rng.randint(1, 4)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
                rows.append((i, bytes(b)))
                i += 1
            for cut in (0, 1, len(p) // 3, len(p) - 1):
                rows.append((i, p[:cut]))
                i += 1
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        assert decode(df).count() >= 0, name  # must not raise


@settings(max_examples=300, deadline=None)
@given(st.integers(0, (1 << 64) - 1),
       st.lists(st.integers(0, 63), min_size=1, max_size=3,
                unique=True))
def test_banded_join_completeness_floor(h, flips):
    """The recall contract of the perceptual banded join, as a theorem
    over the banding math: two 64-bit hashes at hamming distance <= 3
    ALWAYS share at least one exact 16-bit band (3 differing bits
    cannot touch all 4 bands — pigeonhole), so the band equi-join finds
    every such pair; distance 4..6 pairs are found unless their bits
    spread over all four bands (the documented LSH recall edge, shared
    bit-for-bit by the DuckDB oracle so the two engines can never
    disagree about WHICH pairs exist)."""
    h2 = h
    for b in flips:
        h2 ^= 1 << b
    bands = [(h >> (16 * i)) & 0xFFFF for i in range(4)]
    bands2 = [(h2 >> (16 * i)) & 0xFFFF for i in range(4)]
    assert any(a == b for a, b in zip(bands, bands2))
