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
