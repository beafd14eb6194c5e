"""Multimodal column handling: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is a ``binary`` column
(or a pointer to object storage), metadata is typed columns, and
decode/feature-extract runs as Arrow-batched ``mapInPandas`` so Python sees
whole record batches, never rows. JPEG/video codec libraries are not in
this container, so `decode_features`/`resize_images` use a deterministic
fake clearly marked as a stub; `decode_bmp` is the REAL codec tier — BMP's
layout is public and trivial enough to parse dependency-free (header, DIB,
stride-padded pixel array), so one honest decode path exists end-to-end.

``payloads`` synthesizes binary from ``documents.text`` (UTF-8 bytes) so
byte-level results are oracle-checkable: byte length and byte sum computed
by the pandas path must equal the pure-SQL values.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("byte_sum", T.LongType()),
    T.StructField("fake_width", T.LongType()),
    T.StructField("fake_height", T.LongType()),
])


def payloads(documents: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary, media_type, n_bytes)."""
    return documents.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )


def decode_features(payload_df: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column.

    ``mapInPandas`` keeps the Python boundary at record-batch granularity;
    partitioning of the input is preserved (no shuffle introduced).

    The batch function is defined *nested* on purpose: cloudpickle then
    serializes it by value, so executor Python workers do not need this
    package importable on their sys.path (the driver harness owns the
    session and sets no PYTHONPATH for workers).
    """

    def _decode_batches(batches: Iterator):
        import pandas as pd

        for pdf in batches:
            if real_decode:
                # Real codecs (PIL/libav/...) are not installed in this
                # environment; the plumbing around this is the deliverable.
                raise NotImplementedError("codec libraries unavailable; use stub")
            raw = pdf["payload"]
            n_bytes = raw.str.len().astype("int64")
            byte_sum = raw.map(lambda b: sum(b)).astype("int64")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": n_bytes,
                "byte_sum": byte_sum,
                # deterministic fake dimensions derived from content
                "fake_width": (byte_sum % 64) + 1,
                "fake_height": (n_bytes % 64) + 1,
            })

    return payload_df.mapInPandas(_decode_batches, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("thumbnail", T.BinaryType()),
])

FRAME_BYTES = 64

FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.LongType()),
    T.StructField("frame", T.BinaryType()),
])


def resize_images(payload_df: DataFrame, width: int = 8,
                  height: int = 8) -> DataFrame:
    """Thumbnail 'resize': 1 row in → 1 row out, output binary has the
    exact target size. STUB decode (no codec libs in this container) —
    the deterministic fake cycles payload bytes to width*height; the
    plumbing (Arrow batches, binary-in/binary-out, fixed output schema,
    partition preservation) is the real deliverable.
    """
    target = width * height

    def _resize_batches(batches: Iterator):
        import pandas as pd

        for pdf in batches:
            thumbs = pdf["payload"].map(
                lambda b: bytes(b[i % len(b)] for i in range(target))
                if len(b) else b"\x00" * target
            )
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "width": width,
                "height": height,
                "thumbnail": thumbs,
            })

    return payload_df.mapInPandas(_resize_batches, schema=RESIZE_SCHEMA)


def sample_frames(payload_df: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling: 1 'video' row fans out to one row per kept frame
    (every_n-th fixed-size chunk) — the mapInPandas 1→many shape. The
    frame content is the actual payload slice; at 100 TB the fan-out
    happens inside the batch iterator, so no exploded relation is ever
    shuffled (downstream consumers decide their own partitioning).
    """

    def _frame_batches(batches: Iterator):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            raw = pdf["payload"]
            lens = raw.str.len().astype("int64").to_numpy()
            n_frames = np.maximum(1, -(-lens // FRAME_BYTES))
            # columnar slice table: iterate kept FRAME INDICES (a few
            # dozen), not rows×frames — each pass is one vectorized
            # .str.slice over every doc long enough to own that frame
            out = []
            max_frames = int(n_frames.max()) if len(n_frames) else 0
            for i in range(0, max_frames, every_n):
                mask = n_frames > i
                out.append(pd.DataFrame({
                    "doc_id": pdf["doc_id"][mask].astype("int64"),
                    "frame_idx": np.int64(i),
                    "frame": raw[mask].str.slice(
                        i * FRAME_BYTES, (i + 1) * FRAME_BYTES
                    ),
                }))
            if out:
                yield pd.concat(out, ignore_index=True)

    return payload_df.mapInPandas(_frame_batches, schema=FRAME_SCHEMA)


BMP_DECODE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("bpp", T.LongType()),
    T.StructField("n_pixel_bytes", T.LongType()),
    T.StructField("mean_pixel", T.DoubleType()),
])


def bmp_payloads(documents: DataFrame) -> DataFrame:
    """Synthesize a VALID 24-bit BMP per document (dimensions from
    doc_id, pixel bytes cycling the UTF-8 text) so the decode stage can
    run a real parser. Synthesis is the test fixture; the deliverable is
    `decode_bmp`'s honest codec over the binary column."""

    def _make(batches: Iterator):
        import struct

        import pandas as pd

        def one(doc_id: int, text: str) -> bytes:
            w = (doc_id % 16) + 4
            h = (doc_id % 8) + 2
            stride = (3 * w + 3) & ~3
            src = text.encode("utf-8") or b"\x00"
            px = bytearray()
            for _r in range(h):
                row = bytes(src[i % len(src)]
                            for i in range(len(px), len(px) + 3 * w))
                px += row + b"\x00" * (stride - 3 * w)
            off = 14 + 40
            header = struct.pack("<2sIHHI", b"BM", off + len(px), 0, 0, off)
            dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                              len(px), 2835, 2835, 0, 0)
            return header + dib + bytes(px)

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": [
                    one(int(d), t)
                    for d, t in zip(pdf["doc_id"], pdf["text"])
                ],
            })

    return documents.select("doc_id", "text").mapInPandas(
        _make, schema="doc_id long, payload binary"
    )


def decode_bmp(payload_df: DataFrame) -> DataFrame:
    """REAL image decode in the Arrow batch: parse the BMP file header,
    DIB header and pixel array (row stride + padding) with no codec
    library — BMP's layout is public and trivial, which makes it the one
    format an hermetic container can decode honestly. Malformed payloads
    yield a null-dimension row instead of failing the batch (the P7
    bad-row convention). The mean is over actual pixel samples,
    EXCLUDING row padding — i.e. the parser must understand the stride,
    not just slice bytes."""

    def _decode(batches: Iterator):
        import struct

        import numpy as np
        import pandas as pd

        def one(b: bytes):
            try:
                if len(b) < 54 or b[:2] != b"BM":
                    return None
                off = struct.unpack_from("<I", b, 10)[0]
                w, h = struct.unpack_from("<ii", b, 18)
                bpp = struct.unpack_from("<H", b, 28)[0]
                comp = struct.unpack_from("<I", b, 30)[0]
                if bpp != 24 or comp != 0 or w <= 0 or h <= 0:
                    return None
                stride = (3 * w + 3) & ~3
                arr = np.frombuffer(b, dtype=np.uint8,
                                    count=stride * h, offset=off)
                pixels = arr.reshape(h, stride)[:, :3 * w]
                return (w, h, bpp, stride * h,
                        float(pixels.astype(np.float64).mean()))
            except (struct.error, ValueError):
                return None

        for pdf in batches:
            rows = [one(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "width": [r[0] if r else None for r in rows],
                "height": [r[1] if r else None for r in rows],
                "bpp": [r[2] if r else None for r in rows],
                "n_pixel_bytes": [r[3] if r else None for r in rows],
                "mean_pixel": [r[4] if r else None for r in rows],
            })

    return payload_df.mapInPandas(_decode, schema=BMP_DECODE_SCHEMA)


PNG_DECODE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("bit_depth", T.LongType()),
    T.StructField("color_type", T.LongType()),
    T.StructField("n_pixels", T.LongType()),
    T.StructField("mean_pixel", T.DoubleType()),
])


def png_payloads(documents: DataFrame) -> DataFrame:
    """Synthesize a VALID compressed PNG per document (8-bit grayscale,
    dimensions from doc_id, pixels cycling the UTF-8 text): signature,
    CRC-correct IHDR/IDAT/IEND chunks, zlib-deflated scanline stream with
    the filter type CYCLING 0..4 per row — so `decode_png` must run the
    full inverse filter set (None/Sub/Up/Average/Paeth), not just slice
    bytes. Synthesis is the fixture; the codec is the deliverable."""

    def _make(batches: Iterator):
        import struct
        import zlib

        import pandas as pd

        def chunk(tag: bytes, data: bytes) -> bytes:
            return (struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", zlib.crc32(tag + data)))

        def one(doc_id: int, text: str) -> bytes:
            w = (doc_id % 16) + 4
            h = (doc_id % 8) + 2
            src = text.encode("utf-8") or b"\x00"
            raw = [
                bytes(src[(r * w + i) % len(src)] for i in range(w))
                for r in range(h)
            ]
            stream = bytearray()
            prior = bytes(w)
            for r, row in enumerate(raw):
                ft = r % 5
                stream.append(ft)
                if ft == 0:
                    stream += row
                elif ft == 1:    # Sub
                    stream += bytes(
                        (row[i] - (row[i - 1] if i else 0)) & 0xFF
                        for i in range(w))
                elif ft == 2:    # Up
                    stream += bytes((row[i] - prior[i]) & 0xFF
                                    for i in range(w))
                elif ft == 3:    # Average
                    stream += bytes(
                        (row[i] - ((row[i - 1] if i else 0) + prior[i]) // 2)
                        & 0xFF for i in range(w))
                else:            # Paeth
                    out = bytearray()
                    for i in range(w):
                        a = row[i - 1] if i else 0
                        b = prior[i]
                        c = prior[i - 1] if i else 0
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if (pa <= pb and pa <= pc) else (
                            b if pb <= pc else c)
                        out.append((row[i] - pred) & 0xFF)
                    stream += out
                prior = row
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
            return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", zlib.compress(bytes(stream)))
                    + chunk(b"IEND", b""))

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": [
                    one(int(d), t)
                    for d, t in zip(pdf["doc_id"], pdf["text"])
                ],
            })

    return documents.select("doc_id", "text").mapInPandas(
        _make, schema="doc_id long, payload binary"
    )


def decode_png(payload_df: DataFrame) -> DataFrame:
    """REAL compressed-image decode, dependency-free (stdlib zlib): walk
    the chunk stream, parse IHDR, concatenate IDAT, inflate, and run the
    full scanline inverse-filter set (None/Sub/Up/Average/Paeth) to
    recover pixels — 8-bit grayscale (color type 0), the PNG subset an
    hermetic container can still decode honestly end-to-end. Malformed
    payloads yield a null-dimension row instead of failing the batch (the
    P7 bad-row convention). mean_pixel is over RECONSTRUCTED samples, so
    a wrong inverse filter is observable, not cosmetic."""

    def _decode(batches: Iterator):
        import struct
        import zlib

        import numpy as np
        import pandas as pd

        def one(b: bytes):
            try:
                if b[:8] != b"\x89PNG\r\n\x1a\n":
                    return None
                pos, idat, meta = 8, b"", None
                while pos + 8 <= len(b):
                    (ln,) = struct.unpack_from(">I", b, pos)
                    tag = b[pos + 4:pos + 8]
                    data = b[pos + 8:pos + 8 + ln]
                    if tag == b"IHDR":
                        meta = struct.unpack(">IIBBBBB", data)
                    elif tag == b"IDAT":
                        idat += data
                    elif tag == b"IEND":
                        break
                    pos += 12 + ln
                if meta is None:
                    return None
                w, h, depth, ctype, comp, filt, interlace = meta
                if (depth, ctype, comp, filt, interlace) != (8, 0, 0, 0, 0):
                    return None  # outside the supported grayscale subset
                if w <= 0 or h <= 0:
                    return None  # zero-area: P7 null row, not a NaN mean
                raw = zlib.decompress(idat)
                if len(raw) != h * (w + 1):
                    return None
                img = np.zeros((h, w), dtype=np.uint8)
                prior = np.zeros(w, dtype=np.uint8)
                for r in range(h):
                    ft = raw[r * (w + 1)]
                    line = np.frombuffer(
                        raw, np.uint8, count=w, offset=r * (w + 1) + 1)
                    if ft == 0:
                        cur = line.copy()
                    elif ft == 2:    # Up — vectorized
                        cur = line + prior
                    else:            # Sub/Average/Paeth — sequential
                        cur = np.zeros(w, dtype=np.uint8)
                        for i in range(w):
                            a = int(cur[i - 1]) if i else 0
                            if ft == 1:
                                pred = a
                            elif ft == 3:
                                pred = (a + int(prior[i])) // 2
                            elif ft == 4:
                                bb = int(prior[i])
                                c = int(prior[i - 1]) if i else 0
                                p = a + bb - c
                                pa, pb, pc = (abs(p - a), abs(p - bb),
                                              abs(p - c))
                                pred = a if (pa <= pb and pa <= pc) else (
                                    bb if pb <= pc else c)
                            else:
                                return None
                            cur[i] = (int(line[i]) + pred) & 0xFF
                    img[r] = cur
                    prior = cur
                return (w, h, depth, ctype, w * h,
                        float(img.astype(np.float64).mean()))
            except (struct.error, ValueError, zlib.error):
                return None

        for pdf in batches:
            rows = [one(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "width": [r[0] if r else None for r in rows],
                "height": [r[1] if r else None for r in rows],
                "bit_depth": [r[2] if r else None for r in rows],
                "color_type": [r[3] if r else None for r in rows],
                "n_pixels": [r[4] if r else None for r in rows],
                "mean_pixel": [r[5] if r else None for r in rows],
            })

    return payload_df.mapInPandas(_decode, schema=PNG_DECODE_SCHEMA)


def multimodal_meta(documents: DataFrame) -> DataFrame:
    """Pure-SQL metadata over the payloads (the oracle for the pandas path).

    byte_sum == Σ ascii(char) for ASCII text — expressed as the same
    left-fold used by `text.char_hash`, portable to DuckDB.
    """
    byte_sum = F.aggregate(
        F.split(F.col("text"), ""),
        F.lit(0).cast("long"),
        lambda acc, c: acc + F.ascii(c),
    )
    p = payloads(documents)
    meta = documents.select("doc_id", byte_sum.alias("byte_sum"))
    return (
        p.join(meta, "doc_id")
        .select(
            "doc_id", "media_type", "n_bytes", "byte_sum",
            ((F.col("byte_sum") % 64) + 1).alias("fake_width"),
            ((F.col("n_bytes") % 64) + 1).alias("fake_height"),
        )
    )


WAV_DECODE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("sample_rate", T.LongType()),
    T.StructField("n_channels", T.LongType()),
    T.StructField("bits_per_sample", T.LongType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("duration_ms", T.DoubleType()),
    T.StructField("mean_amplitude", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
])


def wav_payloads(documents: DataFrame, sample_rate: int = 8000) -> DataFrame:
    """Synthesize a VALID 16-bit mono PCM WAV per document (RIFF/fmt/data
    chunks; samples derived from the UTF-8 text bytes, centered and
    scaled to int16) so `decode_wav` exercises a real audio parser —
    the audio leg of the BMP/PNG real-codec pattern."""

    def _make(batches: Iterator):
        import struct

        import pandas as pd

        def one(text: str) -> bytes:
            # empty text -> a valid zero-sample WAV (decoder: n_samples=0,
            # NULL stats — the same NULL the oracle's 0/0 division yields).
            # ascii/replace: one sample per CHARACTER (non-ASCII -> '?'),
            # so the SQL oracle's per-character fold stays exact even if a
            # regenerated fixture introduces non-ASCII text (utf-8 bytes
            # would diverge from DuckDB's code-point functions there).
            src = text.encode("ascii", errors="replace")
            samples = struct.pack(
                "<%dh" % len(src), *(((b - 128) * 256) for b in src)
            )
            fmt = struct.pack("<HHIIHH", 1, 1, sample_rate,
                              sample_rate * 2, 2, 16)
            data_sz = len(samples)
            return (b"RIFF"
                    + struct.pack("<I", 4 + 8 + len(fmt) + 8 + data_sz)
                    + b"WAVE"
                    + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", data_sz) + samples)

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": [one(t) for t in pdf["text"]],
            })

    return documents.select("doc_id", "text").mapInPandas(
        _make, schema="doc_id long, payload binary"
    )


def decode_wav(payload_df: DataFrame) -> DataFrame:
    """REAL audio decode, dependency-free: walk the RIFF chunk list,
    parse the fmt chunk (rate/channels/width), locate data, and read
    int16 PCM samples via numpy — mean amplitude and RMS come from the
    DECODED samples, so an endianness or offset mistake is observable.
    Malformed/unsupported payloads yield null-dimension rows (the P7
    bad-row convention)."""

    def _decode(batches: Iterator):
        import struct

        import numpy as np
        import pandas as pd

        def one(b: bytes):
            try:
                if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    return None
                pos, fmt, data = 12, None, None
                while pos + 8 <= len(b):
                    tag = b[pos:pos + 4]
                    (ln,) = struct.unpack_from("<I", b, pos + 4)
                    if tag == b"fmt ":
                        fmt = struct.unpack_from("<HHIIHH", b, pos + 8)
                    elif tag == b"data":
                        data = b[pos + 8:pos + 8 + ln]
                    pos += 8 + ln + (ln & 1)  # RIFF chunks pad to even
                if fmt is None or data is None:
                    return None
                codec, nch, rate, _br, _ba, width = fmt
                # mono only: interleaved-stream stats vs per-channel frame
                # counts would mix conventions for nch > 1, so multichannel
                # is outside the honest subset (bad-row → null, like any
                # unsupported codec) until a per-channel de-interleave lands
                if codec != 1 or width != 16 or nch != 1:
                    return None  # outside the PCM-int16 mono subset
                s = np.frombuffer(data, dtype="<i2").astype(np.float64)
                n = len(s) // nch
                if n == 0:
                    return (rate, nch, width, 0, 0.0, None, None)
                return (rate, nch, width, n, n * 1000.0 / rate,
                        float(s.mean()), float(np.sqrt((s * s).mean())))
            except (struct.error, ValueError):
                return None

        for pdf in batches:
            rows = [one(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "sample_rate": [r[0] if r else None for r in rows],
                "n_channels": [r[1] if r else None for r in rows],
                "bits_per_sample": [r[2] if r else None for r in rows],
                "n_samples": [r[3] if r else None for r in rows],
                "duration_ms": [r[4] if r else None for r in rows],
                "mean_amplitude": [r[5] if r else None for r in rows],
                "rms": [r[6] if r else None for r in rows],
            })

    return payload_df.mapInPandas(_decode, schema=WAV_DECODE_SCHEMA)
