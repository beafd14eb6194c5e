"""Source-format round-trips: the engine must ingest the format zoo a
production pipeline brings (columnar ORC, delimited CSV, JSON lines)
without value drift vs the parquet baseline — schema-explicit reads,
timestamp fidelity, and null preservation checked on the events table.
"""

from pyspark.sql import functions as F

from ha_sqllite_2_influxdb_spark.sources.tables import load_table


def _multiset(df):
    return sorted(
        tuple(str(v) for v in r)
        for r in df.select("event_id", "ts", "user_id", "event_type",
                           "value", "props").collect()
    )


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_orc")
    ev.write.orc(path)
    back = spark.read.orc(path)
    assert dict(back.dtypes) == dict(ev.dtypes)
    assert _multiset(back) == _multiset(ev)


def test_csv_roundtrip_with_explicit_schema(spark, sf_dir, tmp_path):
    """CSV drops types; an explicit schema + microsecond timestampFormat
    must recover the exact values (including NULL-vs-empty distinction)."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_csv")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    ev.write.options(header=True, timestampFormat=fmt, nullValue="\\N") \
        .csv(path)
    back = spark.read.schema(ev.schema).options(
        header=True, timestampFormat=fmt, nullValue="\\N"
    ).csv(path)
    assert _multiset(back) == _multiset(ev)


def test_json_lines_roundtrip(spark, sf_dir, tmp_path):
    """JSON lines: schema-explicit read (inference would widen types)
    with microsecond timestamp fidelity."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_json")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    ev.write.option("timestampFormat", fmt).json(path)
    back = spark.read.schema(ev.schema) \
        .option("timestampFormat", fmt).json(path)
    assert _multiset(back) == _multiset(ev)


def test_csv_malformed_rows_route_to_corrupt_column(spark, tmp_path):
    """P7 analog at the source boundary: bad CSV rows land in
    _corrupt_record under PERMISSIVE mode instead of failing the scan."""
    p = tmp_path / "bad.csv"
    p.write_text("event_id,value\n1,2.5\nnot_a_long,3.5\n2,oops\n")
    schema = ("event_id long, value double, _corrupt_record string")
    df = spark.read.schema(schema).options(
        header=True, mode="PERMISSIVE", columnNameOfCorruptRecord="_corrupt_record"
    ).csv(str(p)).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 1 and bad.count() == 2
    assert {r.event_id for r in good.collect()} == {1}


def test_partitioned_write_prunes_partitions_on_read(spark, sf_dir,
                                                     tmp_path):
    """Hive-style partitioned layout: writing events partitioned by
    event_type and filtering one type on read must prune at PLANNING
    time — the scan's partitionFilters carry the predicate and only the
    matching directory is listed. This is the layout contract that makes
    a 100 TB store readable by type without scanning the other types."""
    from pyspark.sql import functions as F

    from ha_sqllite_2_influxdb_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    out = str(tmp_path / "by_type")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(out)

    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    want = ev.filter(F.col("event_type") == "click").count()
    assert back.count() == want

    plan = back._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    scan = next(l for l in final.splitlines() if "FileScan" in l)
    assert "PartitionFilters" in scan and "event_type" in scan.split(
        "PartitionFilters")[1].split("]")[0], scan


def test_gif_lzw_round_trip_and_malformed(spark, sf_dir):
    """GIF tier contracts: (1) decoded index stream equals the
    synthesizer's source indices exactly (full LZW round-trip,
    variable-width growth included); (2) malformed payloads and
    out-of-subset flags (interlace bit) yield null rows, not errors;
    (3) a mid-stream CLEAR code resets the dictionary correctly."""
    from ha_sqllite_2_influxdb_spark.operators import multimodal
    from ha_sqllite_2_influxdb_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    got = {r.doc_id: r for r in multimodal.decode_gif(
        multimodal.gif_payloads(docs)).collect()}
    for r_ in docs.select("doc_id", "text").collect():
        w = (r_.doc_id % 12) + 4
        h = (r_.doc_id % 6) + 2
        src = r_.text.encode("utf-8") or b"\x00"
        expect = sum(src[i % len(src)] % 16 for i in range(w * h))
        row = got[r_.doc_id]
        assert (row.width, row.height, row.n_pixels, row.idx_sum) == (
            w, h, w * h, expect), r_.doc_id

    one = multimodal._gif_pixels_fn()
    assert one(b"NOTAGIF") is None
    assert one(b"GIF89a\x00") is None
    # interlace flag -> out of documented subset -> null
    import struct
    hdr = (b"GIF89a" + struct.pack("<HHBBB", 2, 1, 0xF3, 0, 0)
           + bytes(48)
           + b"\x2C" + struct.pack("<HHHHB", 0, 0, 2, 1, 0x40))
    assert one(hdr + b"\x04\x01\x00\x00\x3b") is None

    # hand-packed stream with a mid-stream clear: codes (5-bit)
    # [clear, 3, 7, clear, 7, 3, eoi] decode to [3, 7, 7, 3]
    codes = [16, 3, 7, 16, 7, 3, 17]
    acc = nbits = 0
    data = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += 5
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    payload = (b"GIF89a" + struct.pack("<HHBBB", 4, 1, 0xF3, 0, 0)
               + bytes(48)
               + b"\x2C" + struct.pack("<HHHHB", 0, 0, 4, 1, 0)
               + bytes((4, len(data))) + bytes(data) + b"\x00\x3B")
    r = one(payload)
    assert r is not None and r[3] == [3, 7, 7, 3], r


def test_gif_anim_frames_contract(spark, sf_dir):
    """Animated tier: 3 frames per doc with GCE delays 10/20/30 cs and
    per-frame text-shifted pixel sums; a payload truncated inside the
    second frame's data emits NO rows for that doc (frame relations
    drop bad sources whole)."""
    from ha_sqllite_2_influxdb_spark.operators import multimodal
    from ha_sqllite_2_influxdb_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(10)
    rows = multimodal.decode_gif_frames(
        multimodal.gif_anim_payloads(docs)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    src_text = {r.doc_id: r.text
                for r in docs.select("doc_id", "text").collect()}
    assert set(by_doc) == set(src_text)
    for did, frs in by_doc.items():
        frs.sort(key=lambda r: r.frame_idx)
        assert [r.delay_cs for r in frs] == [10, 20, 30]
        w = (did % 12) + 4
        h = (did % 6) + 2
        src = src_text[did].encode("utf-8")
        for f, r in enumerate(frs):
            assert r.idx_sum == sum(
                src[(i + 7 * f) % len(src)] % 16 for i in range(w * h))

    payload = multimodal.gif_anim_payloads(docs.limit(1)).collect()[0]
    trunc = bytes(payload.payload)[:len(payload.payload) * 2 // 3]
    tdf = spark.createDataFrame([(0, bytearray(trunc))],
                                "doc_id long, payload binary")
    assert multimodal.decode_gif_frames(tdf).count() == 0
