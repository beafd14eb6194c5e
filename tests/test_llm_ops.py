"""Behavioral tests for the approximate / non-SQL-expressible operators."""

from pyspark.sql import functions as F

from ha_sqllite_2_influxdb_spark.operators import dedup, multimodal, similarity
from ha_sqllite_2_influxdb_spark.sources.tables import load_table


def test_ann_lsh_recall(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    exact = {(r.id_a, r.id_b) for r in
             similarity.cosine_neardup_pairs(e).collect()}
    approx = {(r.id_a, r.id_b) for r in similarity.ann_lsh_pairs(e).collect()}
    assert approx <= exact, "ANN must not produce pairs below threshold"
    recall = len(exact & approx) / max(1, len(exact))
    assert recall >= 0.5, f"LSH recall too low: {recall:.2f}"


def test_ann_lsh_no_embedding_table_broadcast(spark, sf_dir):
    """The vector re-attach must broadcast the candidate PAIRS, never the
    embeddings relation (a full-table broadcast is impossible at 100 TB).
    With auto-broadcast disabled, the only BroadcastExchanges left are the
    explicit hints — each must sit on the candidate-pair lineage (the
    FlatMapGroupsInPandas bucket scorer), not on a raw embeddings scan."""
    def _get(key):
        try:
            return spark.conf.get(key)
        except Exception:
            return None

    prev = _get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = _get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        e = load_table(spark, sf_dir, "embeddings")
        df = similarity.ann_lsh_pairs(e)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # split the tree at each BroadcastExchange; its build subtree is
        # the indented block that follows, which must contain the pair
        # generator and no parquet scan of the embeddings table
        chunks = plan.split("BroadcastExchange")[1:]
        assert chunks, "expected the explicit candidate-pair broadcast"
        for chunk in chunks:
            subtree = chunk.split("\n\n")[0]
            assert "FlatMapGroupsInPandas" in subtree
    finally:
        for key, old in [
            ("spark.sql.autoBroadcastJoinThreshold", prev),
            ("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe),
        ]:
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)


def test_simhash_rotated_recall_dominates_single(spark, sf_dir):
    """At equal (enabled) cap, rotated bucketing must recover at least the
    single-bucketing recall on the recrawl corpus — rotations only ADD
    candidate routes."""
    corpus = dedup.recrawl_corpus(load_table(spark, sf_dir, "documents"))
    single = {(r.doc_a, r.doc_b) for r in dedup.simhash_neighbors(
        corpus, bucket_cap=dedup.DEFAULT_BUCKET_CAP).collect()}
    rotated = {(r.doc_a, r.doc_b) for r in dedup.simhash_neighbors_rotated(
        corpus, bucket_cap=dedup.DEFAULT_BUCKET_CAP).collect()}
    uncapped = {(r.doc_a, r.doc_b) for r in
                dedup.simhash_neighbors(corpus, bucket_cap=None).collect()}
    assert len(rotated) >= len(single)
    # every rotated pair is a true <=hamming neighbor that shares the
    # uncapped single bucket OR was found via a rotation (superset route)
    recall_single = len(single & uncapped) / max(1, len(uncapped))
    recall_rotated = len(rotated & uncapped) / max(1, len(uncapped))
    assert recall_rotated >= recall_single


def test_ivf_recall(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    exact = {(r.query_id, r.cand_id) for r in
             similarity.knn_brute_force(e).collect()}
    approx = {(r.query_id, r.cand_id) for r in
              similarity.ivf_topk(e).collect()}
    recall = len(exact & approx) / max(1, len(exact))
    assert recall >= 0.5, f"IVF recall too low: {recall:.2f}"


def test_ivf_prunes_to_probed_cells(spark, sf_dir):
    """Every IVF result must come from a probed cell — i.e. the searched
    candidate set is a strict subset of the corpus (the pruning works)."""
    e = load_table(spark, sf_dir, "embeddings")
    res = similarity.ivf_topk(e, n_cells=16, n_probe=2).collect()
    assert len(res) > 0
    assert all(r.rk <= 10 for r in res)


def test_xxhash_lsh_matches_portable_pipeline(spark, sf_dir):
    """Both hash tiers must find the recrawl duplicates (pipeline-shape
    equivalence even though hash functions differ)."""
    corpus = dedup.recrawl_corpus(load_table(spark, sf_dir, "documents"))
    portable = {(r.doc_a, r.doc_b) for r in
                dedup.neardup_pairs(corpus, portable=True).collect()}
    native = {(r.doc_a, r.doc_b) for r in
              dedup.neardup_pairs(corpus, portable=False).collect()}
    # exact-copy pairs (jaccard 1.0) can never be missed by either tier
    must_have = {(r.doc_id, r.doc_id + 2_000_000) for r in
                 load_table(spark, sf_dir, "documents").select("doc_id").collect()}
    assert must_have <= portable
    assert must_have <= native


def test_dedup_exact_finds_all_recrawl_copies(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    result = dedup.dedup_exact(dedup.recrawl_corpus(docs))
    # every original text appears twice (original + verbatim recrawl)
    assert result.filter(F.col("n_copies") >= 2).count() == n_docs
    # within duplicated groups the survivor is the original (lowest id);
    # near-copy texts form their own singleton groups (keep_doc_id ≥ 1M)
    assert (
        result.filter(
            (F.col("n_copies") >= 2) & (F.col("keep_doc_id") >= 1_000_000)
        ).count()
        == 0
    )


def test_multimodal_decode_equals_sql_meta(spark, sf_dir):
    """The Arrow/pandas decode path must agree with the pure-SQL oracle."""
    docs = load_table(spark, sf_dir, "documents")
    via_pandas = {
        r.doc_id: (r.n_bytes, r.byte_sum, r.fake_width, r.fake_height)
        for r in multimodal.decode_features(multimodal.payloads(docs)).collect()
    }
    via_sql = {
        r.doc_id: (r.n_bytes, r.byte_sum, r.fake_width, r.fake_height)
        for r in multimodal.multimodal_meta(docs).collect()
    }
    assert via_pandas == via_sql


def test_multimodal_resize_shapes_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = multimodal.resize_images(multimodal.payloads(docs), 8, 8)
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == docs.count()
    texts = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, r in rows.items():
        assert len(r.thumbnail) == 64
        raw = texts[doc_id].encode()
        assert bytes(r.thumbnail) == bytes(raw[i % len(raw)] for i in range(64))


def test_multimodal_frames_reassemble_payload(spark, sf_dir):
    """Sampling every frame (every_n=1) must reassemble the exact payload
    bytes in frame order — the fan-out loses nothing."""
    docs = load_table(spark, sf_dir, "documents").limit(20)
    frames = multimodal.sample_frames(
        multimodal.payloads(docs), every_n=1
    ).collect()
    by_doc = {}
    for r in sorted(frames, key=lambda r: (r.doc_id, r.frame_idx)):
        by_doc.setdefault(r.doc_id, []).append(bytes(r.frame))
    for r in docs.collect():
        assert b"".join(by_doc[r.doc_id]) == r.text.encode()


def test_multimodal_real_decode_is_gated(spark, sf_dir):
    import pytest

    docs = load_table(spark, sf_dir, "documents").limit(2)
    with pytest.raises(Exception):  # NotImplementedError inside the worker
        multimodal.decode_features(
            multimodal.payloads(docs), real_decode=True
        ).collect()


def test_bmp_decode_golden(spark, sf_dir):
    """The BMP parser must recover exactly the dimensions the synthesizer
    encoded, and mean_pixel must equal an independent stride-aware numpy
    recomputation of the same bytes."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").limit(50)
    payloads = {r.doc_id: bytes(r.payload)
                for r in multimodal.bmp_payloads(docs).collect()}
    decoded = {r.doc_id: r for r in
               multimodal.decode_bmp(
                   multimodal.bmp_payloads(docs)).collect()}
    assert decoded.keys() == payloads.keys()
    for doc_id, b in payloads.items():
        r = decoded[doc_id]
        w, h = (doc_id % 16) + 4, (doc_id % 8) + 2
        assert (r.width, r.height, r.bpp) == (w, h, 24)
        stride = (3 * w + 3) & ~3
        off = int.from_bytes(b[10:14], "little")
        arr = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off)
        want_mean = float(arr.reshape(h, stride)[:, :3 * w]
                          .astype(np.float64).mean())
        assert r.mean_pixel == want_mean


def test_bmp_decode_rejects_malformed(spark):
    """Garbage / truncated / non-BMP payloads become null-dimension rows
    (the P7 bad-row convention), never batch failures."""
    df = spark.createDataFrame(
        [(1, b"not a bmp at all"), (2, b"BM"), (3, b""),
         (4, b"BM" + b"\x00" * 100)],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in multimodal.decode_bmp(df).collect()}
    assert len(rows) == 4
    assert all(rows[i].width is None for i in rows)


def test_hot_bucket_cap_bounds_adversarial_corpus(spark):
    """An all-identical corpus puts every doc in ONE band bucket; the cap
    must bound the bucket (and its pair array) while still finding pairs."""
    n = 900  # > DEFAULT_BUCKET_CAP
    corpus = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("same boilerplate text repeated across the corpus").alias("text"),
    )
    pairs = dedup.neardup_pairs(corpus, threshold=0.9, bucket_cap=64)
    rows = pairs.collect()
    # bucket sampled to ~64 members -> at most ~C(64+slack, 2) pairs, far
    # below the uncapped C(900,2) = 404550
    assert 0 < len(rows) < 10_000
    assert all(r.jaccard == 1.0 for r in rows)
    # determinism: the sampling coin is hash-based, not RNG-based
    again = dedup.neardup_pairs(corpus, threshold=0.9, bucket_cap=64).collect()
    assert {(r.doc_a, r.doc_b) for r in rows} == \
        {(r.doc_a, r.doc_b) for r in again}


def test_hot_bucket_cap_noop_on_normal_data(spark, sf_dir):
    """Buckets below the cap must pass through untouched: capped and
    uncapped pipelines emit identical pairs on the real corpus."""
    corpus = dedup.recrawl_corpus(load_table(spark, sf_dir, "documents"))
    capped = {(r.doc_a, r.doc_b) for r in
              dedup.neardup_pairs(corpus).collect()}
    uncapped = {(r.doc_a, r.doc_b) for r in
                dedup.neardup_pairs(corpus, bucket_cap=None).collect()}
    assert capped == uncapped


def test_ann_bucket_cap_bounds_adversarial_embeddings(spark):
    """Near-identical embeddings collapse every vector into one
    (table, signature) bucket per table; the cap bounds the in-group
    matmul while keeping the op functional."""
    n = 600
    base = [1.0] + [0.0] * (similarity.DIM - 1)
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(x) for x in base]).cast("array<float>")
        .alias("embedding"),
    )
    pairs = similarity.ann_lsh_pairs(emb, threshold=0.99, bucket_cap=64)
    rows = pairs.collect()
    # each of the 8 tables samples its one hot bucket independently, so
    # the union tops out near 8 * C(64+slack, 2) ~ 20k — far below the
    # uncapped C(600,2) = 179700, and each in-group matmul is O(64²)
    assert 0 < len(rows) < 40_000


def test_neardup_clusters_group_recrawl_copies(spark, sf_dir):
    """Every exact recrawl copy (doc_id+2M) must land in its original's
    cluster with the original as the canonical (min) label; labels are a
    fixpoint (one more propagation round changes nothing)."""
    corpus = dedup.recrawl_corpus(load_table(spark, sf_dir, "documents"))
    labels = {r.doc_id: (r.cluster_id, r.n_members)
              for r in dedup.neardup_clusters(corpus).collect()}
    originals = [d for d in labels if d < 1_000_000]
    assert originals
    for d in originals:
        # distinct originals may legitimately merge into one component
        # (chained similarity), but a copy can never leave its original's
        # cluster, labels are component minima, and no cluster with an
        # exact copy is a singleton
        assert labels[d + 2_000_000][0] == labels[d][0], \
            "exact copy must share its original's cluster"
        assert labels[d][0] <= d, "label must be a reachable minimum"
        assert labels[d][1] >= 2


def test_png_decode_golden(spark, sf_dir):
    """The PNG decoder must chunk-walk, inflate and INVERSE-FILTER back to
    exactly the pixels the synthesizer encoded: mean_pixel must equal an
    independent recomputation from the document text (pixel k = utf-8
    byte k mod len) — a wrong Sub/Up/Average/Paeth inverse shows up here."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").limit(50)
    texts = {r.doc_id: r.text for r in docs.collect()}
    decoded = {r.doc_id: r for r in
               multimodal.decode_png(
                   multimodal.png_payloads(docs)).collect()}
    assert decoded.keys() == texts.keys()
    for doc_id, text in texts.items():
        r = decoded[doc_id]
        w, h = (doc_id % 16) + 4, (doc_id % 8) + 2
        assert (r.width, r.height, r.bit_depth, r.color_type,
                r.n_pixels) == (w, h, 8, 0, w * h)
        src = text.encode("utf-8") or b"\x00"
        want = np.array([src[k % len(src)] for k in range(w * h)],
                        dtype=np.float64)
        assert r.mean_pixel == float(want.mean()), doc_id


def test_png_decode_exercises_every_filter_type(spark):
    """Heights >= 5 guarantee scanline filters 0..4 all occur (the
    synthesizer cycles them per row); a crafted 6-row doc plus golden
    pixel check pins each inverse filter individually."""
    import numpy as np

    df = spark.createDataFrame(
        # doc_id 20: w=(20%16)+4=8, h=(20%8)+2=6 -> filters 0,1,2,3,4,0
        [(20, "The quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    r = multimodal.decode_png(multimodal.png_payloads(df)).collect()[0]
    assert (r.width, r.height) == (8, 6)
    src = "The quick brown fox jumps over the lazy dog".encode()
    want = np.array([src[k % len(src)] for k in range(8 * 6)], np.float64)
    assert r.mean_pixel == float(want.mean())


def test_png_decode_rejects_malformed(spark):
    """Garbage / truncated / wrong-subset payloads become null-dimension
    rows (the P7 bad-row convention), never batch failures."""
    import struct
    import zlib

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    sig = b"\x89PNG\r\n\x1a\n"
    rgb_ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 2, 8, 2, 0, 0, 0))
    bad_idat = chunk(b"IDAT", b"not deflate data")
    ok_ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 2, 8, 0, 0, 0, 0))
    df = spark.createDataFrame(
        [(1, b"not a png"), (2, sig), (3, b""),
         (4, sig + rgb_ihdr),            # unsupported color type
         (5, sig + ok_ihdr + bad_idat)],  # corrupt deflate stream
        "doc_id long, payload binary",
    )
    zero = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 0, 0, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"")))
    df = df.unionByName(spark.createDataFrame(
        [(6, zero)], "doc_id long, payload binary"))
    rows = {r.doc_id: r for r in multimodal.decode_png(df).collect()}
    assert len(rows) == 6
    assert all(rows[i].width is None for i in rows)
    assert rows[6].mean_pixel is None  # zero-area: null row, never NaN


def test_ngram_span_stats_crafted_and_formulation_parity(spark, sf_dir):
    """A shared 8-word span must count as duplicated in BOTH docs and in
    neither singleton position; the xxhash64-grouping scale path must
    produce identical stats to the string-grouping oracle formulation."""
    shared = "a b c d e f g h"
    df = spark.createDataFrame(
        [(1, shared + " x y z"), (2, "p q r " + shared), (3, "u v w"),
         (4, "only seven words here so no grams")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in dedup.ngram_span_stats(df, 8).collect()}
    # doc1: 4 ngrams, only position 0 ("a..h") appears in doc2 -> 1 dup
    assert (got[1].n_ngrams, got[1].n_dup_ngrams) == (4, 1)
    assert (got[2].n_ngrams, got[2].n_dup_ngrams) == (4, 1)
    assert got[1].dup_ratio == 0.25
    # doc3: shorter than n -> zero ngrams, NULL ratio
    assert (got[3].n_ngrams, got[3].n_dup_ngrams) == (0, 0)
    assert got[3].dup_ratio is None
    assert got[4].n_ngrams == 0
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(tuple(r) for r in
               dedup.ngram_span_stats(docs, 8, use_hash=True).collect())
    b = sorted(tuple(r) for r in
               dedup.ngram_span_stats(docs, 8, use_hash=False).collect())
    assert a == b


def test_ngram_window_equals_agg_semijoin(spark, sf_dir):
    """r14 plan-surgery pin: the shipped one-exchange window formulation
    must stay row-identical to the original dup-set aggregate +
    broadcast-semi-join formulation (the shape it replaced — see
    ngram_span_stats; exceptAll both ways, crafted edges + real docs)."""
    from pyspark.sql import functions as F

    def direct(documents, n=8):
        ws = F.split(F.col("text"), " ")
        n_ngrams = F.greatest(F.size(ws) - (n - 1), F.lit(0)).cast("long")
        pat = "(?:^| )(?=(" + "[^ ]* " * (n - 1) + "[^ ]*))"
        grams = F.when(
            n_ngrams > 0, F.regexp_extract_all(F.col("text"), F.lit(pat), 1)
        ).otherwise(F.array().cast("array<string>"))
        g = documents.select(
            "doc_id", F.explode(grams).alias("gs")
        ).select("doc_id", F.xxhash64(F.col("gs")).alias("g"))
        dup = (
            g.groupBy("g")
            .agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
            .filter(F.col("_mn") != F.col("_mx"))
            .select("g")
        )
        dup_per_doc = (
            g.join(dup, "g", "left_semi")
            .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_dup_ngrams"))
        )
        base = documents.select("doc_id", n_ngrams.alias("n_ngrams"))
        return base.join(dup_per_doc, "doc_id", "left").select(
            "doc_id", "n_ngrams",
            F.coalesce(F.col("n_dup_ngrams"), F.lit(0)).alias("n_dup_ngrams"),
            F.when(
                F.col("n_ngrams") > 0,
                F.coalesce(F.col("n_dup_ngrams"), F.lit(0)).cast("double")
                / F.col("n_ngrams"),
            ).alias("dup_ratio"),
        )

    crafted = spark.createDataFrame(
        [(1, "a b c d e f g h x y z"), (2, "p q r a b c d e f g h"),
         (3, "a b c d e f g h"), (4, "short"),
         (5, "a b c d e f g h a b c d e f g h")],
        "doc_id long, text string",
    )
    docs = load_table(spark, sf_dir, "documents")
    for df in (crafted, docs):
        got = dedup.ngram_span_stats(df, 8)
        want = direct(df, 8)
        assert got.exceptAll(want).isEmpty()
        assert want.exceptAll(got).isEmpty()


def test_kmeans_deterministic_and_matches_numpy_reference(spark, sf_dir):
    """The distributed fixpoint must be bit-reproducible run-to-run AND
    exactly equal an independent single-machine numpy implementation of
    the same algorithm (same init, same fixed-point quantization) — the
    quantized-integer update is what makes partition order irrelevant."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    k, iters, scale = 4, 3, 1_000_000
    a = sorted(tuple(r) for r in
               similarity.kmeans_lloyd(emb, k=k, iters=iters).collect())
    b = sorted(tuple(r) for r in
               similarity.kmeans_lloyd(emb, k=k, iters=iters).collect())
    assert a == b
    rows = sorted((r.vec_id, list(r.embedding)) for r in
                  emb.select("vec_id", "embedding").collect())
    ids = np.array([i for i, _ in rows])
    x = np.array([v for _, v in rows], dtype=np.float64)
    def round_half_up(v):
        # Spark F.round is HALF_UP away from zero; np.round is
        # half-to-even — an exact .5 quantization value would diverge
        return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))

    c = x[:k].copy()  # k smallest vec_ids, in order
    for _ in range(iters):
        d = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
        cl = d.argmin(1)
        for j in range(k):
            m = cl == j
            if m.any():
                q = round_half_up(
                    x[m].astype(np.float64) * scale).astype(np.int64)
                c[j] = (q.sum(0) / scale) / m.sum()
    d = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
    cl = d.argmin(1)
    want = sorted(zip(ids.tolist(), cl.tolist()))
    got = sorted((v, cc) for v, cc, _ in a)
    assert got == want


def test_kmeans_inertia_non_increasing(spark, sf_dir):
    """More Lloyd iterations can only tighten the clustering: total
    within-cluster squared distance must be non-increasing in iters."""
    emb = load_table(spark, sf_dir, "embeddings")
    inertias = []
    for iters in (1, 3, 5):
        df = similarity.kmeans_lloyd(emb, k=4, iters=iters)
        inertias.append(df.agg({"dist2": "sum"}).collect()[0][0])
    assert inertias[0] >= inertias[1] >= inertias[2]


def test_pq_codebooks_and_codes_shape(spark, sf_dir):
    """Codebooks are [m, ksub, dim/m]; training is bit-reproducible."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    b1 = similarity.pq_train(emb, m=8, ksub=16, iters=2)
    b2 = similarity.pq_train(emb, m=8, ksub=16, iters=2)
    assert b1.shape == (8, 16, 8)
    assert np.array_equal(b1, b2)


def test_pq_rerank_recall_vs_brute_force(spark, sf_dir):
    """ADC shortlist + exact re-rank must recover most of the exact
    cosine top-10 (conservative bound: synthetic near-uniform embeddings
    are PQ's worst case; measured 0.88 at factor 10) and every reported
    neighbor must carry its TRUE cosine (same value the brute-force tier
    reports for that pair)."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = similarity.knn_brute_force(emb, n_queries=5, k=10).collect()
    approx = similarity.pq_rerank_topk(
        emb, n_queries=5, k=10, shortlist_factor=10).collect()
    ex, exval = {}, {}
    for r in exact:
        ex.setdefault(r.query_id, set()).add(r.cand_id)
        exval[(r.query_id, r.cand_id)] = r.cos_sim
    ap = {}
    for r in approx:
        ap.setdefault(r.query_id, set()).add(r.cand_id)
        if (r.query_id, r.cand_id) in exval:
            assert r.cos_sim == exval[(r.query_id, r.cand_id)]
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_wav_decode_golden(spark, sf_dir):
    """The WAV parser must recover the synthesizer's format constants and
    sample stats; mean/RMS must equal an independent numpy recomputation
    from the document text ((byte-128)*256 int16 samples)."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").limit(50)
    texts = {r.doc_id: r.text for r in docs.collect()}
    decoded = {r.doc_id: r for r in
               multimodal.decode_wav(
                   multimodal.wav_payloads(docs)).collect()}
    assert decoded.keys() == texts.keys()
    for doc_id, text in texts.items():
        r = decoded[doc_id]
        src = text.encode("ascii", errors="replace")
        s = np.array([(b - 128) * 256 for b in src], dtype=np.float64)
        assert (r.sample_rate, r.n_channels, r.bits_per_sample,
                r.n_samples) == (8000, 1, 16, len(src))
        assert r.duration_ms == len(src) * 1000.0 / 8000
        assert r.mean_amplitude == float(s.mean())
        assert r.rms == float(np.sqrt((s * s).mean()))
    # non-ASCII chars clamp to '?' — one sample per CHARACTER, so the
    # per-character SQL oracle stays exact on any unicode fixture
    uni = spark.createDataFrame([(7, "aé☃b")], "doc_id long, text string")
    r = multimodal.decode_wav(multimodal.wav_payloads(uni)).collect()[0]
    assert r.n_samples == 4
    src = "aé☃b".encode("ascii", errors="replace")
    s = np.array([(b - 128) * 256 for b in src], dtype=np.float64)
    assert r.mean_amplitude == float(s.mean())


def test_wav_decode_rejects_malformed(spark):
    """Garbage / truncated / out-of-subset payloads become null rows
    (P7); a zero-sample WAV decodes to n_samples=0 with NULL stats.
    Since r9 IEEE float32 (tag 3, width 32) is IN subset — a zero-
    sample float WAV decodes like the int16 one — while a tag-3 width
    mismatch (float16) still nulls."""
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    empty = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
             + b"fmt " + struct.pack("<I", len(fmt)) + fmt
             + b"data" + struct.pack("<I", 0))
    float_fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    float_wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(float_fmt) + 8)
                 + b"WAVE" + b"fmt " + struct.pack("<I", len(float_fmt))
                 + float_fmt + b"data" + struct.pack("<I", 0))
    half_fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
    half_wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(half_fmt) + 8)
                + b"WAVE" + b"fmt " + struct.pack("<I", len(half_fmt))
                + half_fmt + b"data" + struct.pack("<I", 0))
    df = spark.createDataFrame(
        [(1, b"not a wav"), (2, b"RIFF"), (3, b""),
         (4, float_wav),  # r9: float32 decodes (zero samples here)
         (5, empty),      # valid but zero samples
         (6, half_wav)],  # tag-3 width 16: still out of subset
        "doc_id long, payload binary",
    )
    # odd-length data chunk in a 16-bit PCM WAV: structurally corrupt,
    # must null rather than decode a truncated prefix
    odd = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 3) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", 3) + b"\x01\x02\x03")
    df = df.unionByName(spark.createDataFrame(
        [(7, odd)], "doc_id long, payload binary"))
    rows = {r.doc_id: r for r in multimodal.decode_wav(df).collect()}
    assert all(rows[i].sample_rate is None for i in (1, 2, 3, 6, 7))
    assert rows[4].n_samples == 0 and rows[4].bits_per_sample == 32
    assert rows[5].n_samples == 0 and rows[5].mean_amplitude is None


def test_wav_multichannel_golden(spark, sf_dir):
    """r7 honest-subset extension (VERDICT r6 #3): stereo payloads
    de-interleave under the frames convention; per-channel mean/RMS must
    equal an independent numpy recomputation, and a mono payload through
    the multichannel decoder must reproduce `decode_wav`'s scalars as
    1-element arrays (the mono tier itself is bit-unchanged)."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").limit(30)
    texts = {r.doc_id: r.text for r in docs.collect()}
    decoded = {r.doc_id: r for r in multimodal.decode_wav_multichannel(
        multimodal.wav_payloads(docs, n_channels=2)).collect()}
    for d, text in texts.items():
        r = decoded[d]
        src = text.encode("ascii", errors="replace")
        assert (r.n_channels, r.n_frames) == (2, len(src))
        for c in range(2):
            s = np.array([((b + 17 * c) % 256 - 128) * 256 for b in src],
                         dtype=np.float64)
            assert r.channel_mean[c] == float(s.mean()), (d, c)
            assert r.channel_rms[c] == float(np.sqrt((s * s).mean())), (d, c)
    mono_scalar = {r.doc_id: r for r in multimodal.decode_wav(
        multimodal.wav_payloads(docs)).collect()}
    mono_mc = {r.doc_id: r for r in multimodal.decode_wav_multichannel(
        multimodal.wav_payloads(docs)).collect()}
    for d in texts:
        a, b = mono_scalar[d], mono_mc[d]
        assert b.n_channels == 1 and b.n_frames == a.n_samples
        assert b.channel_mean == [a.mean_amplitude]
        assert b.channel_rms == [a.rms]


def test_wav_multichannel_partial_frame_dropped(spark):
    """A truncated stream loses at most the final instant — a trailing
    partial frame is DROPPED, never allowed to shift channel alignment."""
    import struct

    nch, rate = 2, 8000
    vals = [100, -100, 200, -200, 300]  # 2.5 frames: last sample partial
    samples = struct.pack("<%dh" % len(vals), *vals)
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * 4, 4, 16)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(samples))
           + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(samples)) + samples)
    df = spark.createDataFrame([(1, wav)], "doc_id long, payload binary")
    r = multimodal.decode_wav_multichannel(df).collect()[0]
    assert r.n_frames == 2
    assert r.channel_mean == [150.0, -150.0]   # ch0: 100,200; ch1: -100,-200


def test_jpeg_color_planes_exact(spark, sf_dir):
    """4:2:0 fixture planes are per-MCU-constant, so the decode is
    lossless per plane: every reconstructed pixel must equal its MCU's
    constant — full-plane equality, not just means — and the query-level
    means must match the doc_id formulas. A grayscale stream through the
    color decoder yields identical pixels to the grayscale factory (that
    path is bit-unchanged) with NULL chroma."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").limit(24)
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    pays = {r.doc_id: bytes(r.payload) for r in
            multimodal.jpeg_color_payloads(docs).collect()}
    one = multimodal._jpeg_ycbcr_fn()
    for d in ids:
        w, h = 16 * (d % 2 + 1), 16 * (d % 3 + 1)
        mx, my = w // 16, h // 16
        res = one(pays[d])
        assert res is not None, d
        rw, rh, nm, ypl, cbpl, crpl = res
        assert (rw, rh, nm) == (w, h, mx * my)
        for mr in range(my):
            for mc in range(mx):
                m = mr * mx + mc
                sl = np.s_[mr * 16:(mr + 1) * 16, mc * 16:(mc + 1) * 16]
                assert (ypl[sl] == (d * 31 + m * 7) % 256).all(), (d, m)
                assert (cbpl[sl] == (d * 13 + m * 5) % 256).all(), (d, m)
                assert (crpl[sl] == (d * 7 + m * 11) % 256).all(), (d, m)
    # grayscale payloads: color decoder ≡ grayscale decoder, NULL chroma
    gray = {r.doc_id: bytes(r.payload) for r in
            multimodal.jpeg_payloads(docs.limit(8)).collect()}
    gone = multimodal._jpeg_pixels_fn()
    for d, b in gray.items():
        rw, rh, nb, ypl, cbpl, crpl = one(b)
        gw, gh, gnb, gpix = gone(b)
        assert (rw, rh, nb) == (gw, gh, gnb)
        assert (ypl == gpix).all(), d
        assert cbpl is None and crpl is None


def test_jpeg_color_rejects_malformed(spark):
    """Out-of-subset color streams (e.g. 4:2:2 sampling) and truncated
    scans become null rows, never batch failures."""
    base = spark.createDataFrame([(3, "x")], "doc_id long, text string")
    good = bytes(multimodal.jpeg_color_payloads(base).collect()[0].payload)
    # corrupt the Y sampling byte 0x22 -> 0x21 (4:2:2, outside subset):
    # SOF0 component 1 sampling is at a fixed offset in our stream
    i = good.index(b"\xff\xc0")  # sampling byte: marker+len(4) + 7 into body
    assert good[i + 11] == 0x22
    bad_sampling = good[:i + 11] + b"\x21" + good[i + 12:]
    df = spark.createDataFrame(
        [(1, b"junk"), (2, good[:60]), (3, bad_sampling), (4, good)],
        "doc_id long, payload binary")
    rows = {r.doc_id: r for r in multimodal.decode_jpeg_color(df).collect()}
    assert all(rows[i].width is None for i in (1, 2, 3))
    assert rows[4].width == 32 and rows[4].mean_cb is not None


def test_pq_rerank_deterministic_across_partitionings(spark, sf_dir):
    """The (dist, cand_id) total order in the per-batch partial top-k
    makes results identical run-to-run AND across repartitionings —
    identical-code ties at the batch cut must resolve the same way in
    every batch layout."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(tuple(r) for r in similarity.pq_rerank_topk(
        emb, n_queries=3, k=5, shortlist_factor=4).collect())
    b = sorted(tuple(r) for r in similarity.pq_rerank_topk(
        emb.repartition(7), n_queries=3, k=5, shortlist_factor=4).collect())
    assert a == b


def test_pq_rerank_sql_text_plan_equals_dataframe_build(spark, sf_dir):
    """The shipped one-parse re-rank text must stay plan-identical to
    the chained DataFrame reference build (optimizer sameResult) and
    value-identical — the r14.2 lever's standing pin."""
    emb = load_table(spark, sf_dir, "embeddings")
    short = similarity.pq_adc_topk(
        emb, n_queries=3, k=20, m=8, ksub=16, iters=2).select(
        "query_id", "cand_id")
    df_build = similarity._pq_rerank_df(emb, short, 3, 5)
    sql_build = similarity._pq_rerank_sql(emb, short, 3, 5)
    assert (df_build._jdf.queryExecution().optimizedPlan().sameResult(
        sql_build._jdf.queryExecution().optimizedPlan()))
    assert sorted(map(tuple, df_build.collect())) == sorted(
        map(tuple, sql_build.collect()))


def test_pq_rerank_norms_after_join_value_identical(spark, sf_dir):
    """r14.2 moved the candidate/query norm folds ABOVE the shortlist
    joins (|shortlist| folds instead of |corpus|). Same left folds over
    the same doubles ⇒ bit-identical cosines: the pre-change shape,
    rebuilt here verbatim, must match the shipped query exactly."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ha_sqllite_2_influxdb_spark.operators.similarity import (
        cosine, dot_chain, norm2_chain)

    emb = load_table(spark, sf_dir, "embeddings")
    short = similarity.pq_adc_topk(
        emb, n_queries=3, k=20, m=8, ksub=16, iters=2).select(
        "query_id", "cand_id")
    cand = emb.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv")
    ).withColumn("cn2", norm2_chain("cv"))
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    ).withColumn("qn2", norm2_chain("qv"))
    scored = (
        cand.join(F.broadcast(short), "cand_id")
        .join(F.broadcast(q), F.col("query_id") == F.col("qid"))
        .select(
            "query_id", "cand_id",
            cosine(dot_chain("qv", "cv"), F.col("qn2"), F.col("cn2"))
            .alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    old = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "cand_id", "cos_sim", "rk")
    )
    new = similarity._pq_rerank_sql(emb, short, 3, 5)
    assert old.exceptAll(new).isEmpty() and new.exceptAll(old).isEmpty()


def test_jpeg_decode_flat_blocks_exact(spark, sf_dir):
    """Per-block-constant fixture + DC quant step 8 make baseline JPEG
    LOSSLESS (constant block → DC = 8·(v−128), an exact step multiple;
    AC exactly 0): decoded dims, block count and mean must equal an
    independent recomputation from doc_id alone — a wrong Huffman walk,
    dequant, zigzag or IDCT breaks exact equality."""
    docs = load_table(spark, sf_dir, "documents").limit(60)
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    decoded = {r.doc_id: r for r in
               multimodal.decode_jpeg(
                   multimodal.jpeg_payloads(docs)).collect()}
    assert set(decoded) == set(ids)
    for d in ids:
        r = decoded[d]
        bx, by = (d % 3) + 1, (d % 2) + 1
        assert (r.width, r.height, r.n_blocks, r.n_pixels) == (
            8 * bx, 8 * by, bx * by, 64 * bx * by), d
        vals = [(d * 31 + i * 7) % 256 for i in range(bx * by)]
        assert r.mean_pixel == sum(vals) / len(vals), d


def test_jpeg_lossy_roundtrip_bounded(spark, sf_dir):
    """Varying pixels exercise the full AC path (categories, ZRL, EOB):
    the decode is lossy but must stay within the quantization error
    budget — per-block DC error ≤ (q_dc/2)/8 = 0.5 grey levels on the
    mean, so a decoded mean drifting further means a real codec bug."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").limit(40)
    texts = {r.doc_id: r.text for r in docs.collect()}
    decoded = {r.doc_id: r for r in
               multimodal.decode_jpeg(multimodal.jpeg_payloads(
                   docs, per_block_constant=False)).collect()}
    for d, text in texts.items():
        r = decoded[d]
        w, h = 8 * ((d % 3) + 1), 8 * ((d % 2) + 1)
        assert (r.width, r.height) == (w, h), d
        src = (text or "?").encode("ascii", errors="replace") or b"?"
        want = np.frombuffer(
            (src * (h * w // len(src) + 1))[:h * w], np.uint8
        ).astype(np.float64).mean()
        assert abs(r.mean_pixel - want) <= 2.0, (d, r.mean_pixel, want)


def test_jpeg_encoder_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    a = {r.doc_id: bytes(r.payload)
         for r in multimodal.jpeg_payloads(docs).collect()}
    b = {r.doc_id: bytes(r.payload)
         for r in multimodal.jpeg_payloads(docs).collect()}
    assert a == b


def test_jpeg_decode_rejects_malformed(spark):
    """Garbage / truncated / out-of-subset payloads become null rows
    (the P7 bad-row convention), never batch failures."""
    import struct

    # a valid stream to mutate: take one real payload
    base_df = spark.createDataFrame([(7, "x")], "doc_id long, text string")
    good = bytes(multimodal.jpeg_payloads(base_df).collect()[0].payload)
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)  # SOF2
    truncated = good[:len(good) // 2]
    df = spark.createDataFrame(
        [(1, b"not a jpeg"), (2, b"\xff\xd8"), (3, b""),
         (4, progressive), (5, truncated), (6, good)],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in multimodal.decode_jpeg(df).collect()}
    assert len(rows) == 6
    assert all(rows[i].width is None for i in (1, 2, 3, 4, 5))
    assert rows[6].width == 8 * (7 % 3 + 1) and rows[6].mean_pixel is not None


def test_thumbnail_identity_resize_exact(spark):
    """An 8×8 grayscale PNG resized to 8×8 must reproduce its pixels
    EXACTLY (every bucket is one pixel) — pins the dispatch, decode and
    index math end-to-end with zero averaging slack."""
    import numpy as np

    # doc_id 4 -> PNG dims (4%16)+4=8, (4%8)+2=6... need 8x8: doc 12:
    # w=(12%16)+4=16 no. Craft via jpeg: doc 0 -> w=8,h=8 (bx=by=1)
    df = spark.createDataFrame([(0, "ignored")], "doc_id long, text string")
    payload = multimodal.jpeg_payloads(df)  # block-constant 8x8, lossless
    r = multimodal.image_thumbnails(payload).collect()[0]
    assert (r.src_format, r.src_width, r.src_height) == ("jpeg", 8, 8)
    want = (0 * 31 + 0 * 7) % 256  # single block constant
    thumb = np.frombuffer(bytes(r.thumbnail), np.uint8).reshape(8, 8)
    assert (thumb == want).all()
    assert r.thumb_mean == float(want)


def test_thumbnail_block_aligned_exact(spark):
    """A 24×16 block-constant JPEG downsampled to 8×8: row buckets are
    2 rows inside one block row; column buckets of 3 may STRADDLE block
    columns — expected values computed by an independent numpy
    area-average over the known source image."""
    import numpy as np

    # doc 5: w=8*((5%3)+1)=24, h=8*((5%2)+1)=16, bx=3, by=2
    df = spark.createDataFrame([(5, "ignored")], "doc_id long, text string")
    r = multimodal.image_thumbnails(
        multimodal.jpeg_payloads(df)).collect()[0]
    assert (r.src_width, r.src_height) == (24, 16)
    img = np.empty((16, 24))
    for br in range(2):
        for bc in range(3):
            img[br * 8:(br + 1) * 8, bc * 8:(bc + 1) * 8] = (
                5 * 31 + (br * 3 + bc) * 7) % 256
    want = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            want[i, j] = img[i * 2:(i + 1) * 2, j * 3:(j + 1) * 3].mean()
    thumb = np.frombuffer(bytes(r.thumbnail), np.uint8).reshape(8, 8)
    assert (thumb == np.round(want).astype(np.uint8)).all()


def test_thumbnail_dispatch_all_formats(spark, sf_dir):
    """The mixed-format registry query must decode EVERY in-contract
    doc (no null rows on valid payloads; since r12 the query filters to
    non-empty ASCII docs — the oracle's indexing contract) and tag the
    right codec per doc_id % 3, projecting non-null exact axes."""
    from ha_sqllite_2_influxdb_spark.plans.llm_ops import (
        q_multimodal_thumbnail,
    )

    rows = {r.doc_id: r for r in q_multimodal_thumbnail(
        spark, sf_dir).collect()}
    n_docs = (load_table(spark, sf_dir, "documents")
              .filter((F.length("text") > 0)
                      & (F.octet_length("text") == F.length("text")))
              .count())
    assert len(rows) == n_docs
    fmts = {0: "bmp", 1: "png", 2: "jpeg"}
    for d, r in rows.items():
        assert r.src_format == fmts[d % 3], d
        assert r.width == 8 and r.height == 8
        assert r.gray3_sum is not None and r.gray3_sum > 0
        assert r.region_weighted_gray3 is not None


def test_thumbnail_bmp_matches_numpy_reference(spark, sf_dir):
    """BMP thumbnails vs an independent numpy pipeline (decode from the
    known fixture layout → channel-mean gray → same bucket edges)."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").limit(20)
    texts = {r.doc_id: r.text for r in docs.collect()}
    got = {r.doc_id: r for r in multimodal.image_thumbnails(
        multimodal.bmp_payloads(docs)).collect()}
    for d, text in texts.items():
        w, h = (d % 16) + 4, (d % 8) + 2
        src = text.encode("utf-8") or b"\x00"
        stride = (3 * w + 3) & ~3
        # the fixture's cycle index advances over the PADDED stream
        # (bmp_payloads indexes from len(px), which includes row padding)
        sam = np.array([[src[(rr * stride + i) % len(src)]
                         for i in range(3 * w)]
                        for rr in range(h)], np.float64)
        gray = sam.reshape(h, w, 3).mean(axis=2)
        want = np.empty((8, 8))
        re = [i * h // 8 for i in range(9)]
        ce = [j * w // 8 for j in range(9)]
        for i in range(8):
            r0, r1 = re[i], max(re[i + 1], re[i] + 1)
            for j in range(8):
                c0, c1 = ce[j], max(ce[j + 1], ce[j] + 1)
                want[i, j] = gray[min(r0, h - 1):r1, min(c0, w - 1):c1].mean()
        thumb = np.frombuffer(bytes(got[d].thumbnail), np.uint8)
        assert (thumb.reshape(8, 8) == np.round(want).astype(np.uint8)).all(), d


def test_thumbnail_gray3_axes_match_numpy_at_nondefault_dims(spark, sf_dir):
    """r12 (the thumbnail hash-exact upgrade): the exact BIGINT axes —
    gray3_sum and the region-weighted fold — must equal an independent
    integer recomputation from the fixture layout, at NON-default
    target dims too (the registered query only exercises 8x8, so a
    width/height-coupling bug in the axis loop would pass the oracle).
    Checked on BMP (3-channel sum lane, padded-stride cycling) and PNG
    (3x single-channel lane) at 8x8, 5x7 and 16x4."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").limit(12)
    texts = {r.doc_id: r.text for r in docs.collect()}

    def axes(g3, h, w, th, tw):
        re = [i * h // th for i in range(th + 1)]
        ce = [j * w // tw for j in range(tw + 1)]
        tot = wtot = 0
        for i in range(th):
            r0, r1 = re[i], max(re[i + 1], re[i] + 1)
            for j in range(tw):
                c0, c1 = ce[j], max(ce[j + 1], ce[j] + 1)
                s3 = int(g3[min(r0, h - 1):r1, min(c0, w - 1):c1].sum())
                tot += s3
                wtot += s3 * (i * tw + j + 1)
        return tot, wtot

    for tw, th in ((8, 8), (5, 7), (16, 4)):
        bmp = {r.doc_id: r for r in multimodal.image_thumbnails(
            multimodal.bmp_payloads(docs), width=tw, height=th).collect()}
        png = {r.doc_id: r for r in multimodal.image_thumbnails(
            multimodal.png_payloads(docs), width=tw, height=th).collect()}
        for d, text in texts.items():
            w, h = (d % 16) + 4, (d % 8) + 2
            src = text.encode("utf-8") or b"\x00"
            stride = (3 * w + 3) & ~3
            bg3 = np.array([[sum(src[(rr * stride + 3 * c + ch) % len(src)]
                                 for ch in range(3))
                             for c in range(w)]
                            for rr in range(h)], np.int64)
            pg3 = np.array([[3 * src[(rr * w + c) % len(src)]
                             for c in range(w)]
                            for rr in range(h)], np.int64)
            assert (bmp[d].gray3_sum, bmp[d].region_weighted_gray3) \
                == axes(bg3, h, w, th, tw), (d, tw, th, "bmp")
            assert (png[d].gray3_sum, png[d].region_weighted_gray3) \
                == axes(pg3, h, w, th, tw), (d, tw, th, "png")


def test_thumbnail_rejects_malformed(spark):
    df = spark.createDataFrame(
        [(1, b"garbage"), (2, b""), (3, b"BMnot really a bmp"),
         (4, b"\xff\xd8trunc")],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in multimodal.image_thumbnails(df).collect()}
    assert len(rows) == 4
    assert all(rows[i].src_format is None for i in rows)
    assert all(rows[i].thumbnail is None for i in rows)


def test_thumbnail_dispatch_covers_r9_codecs(spark, sf_dir):
    """r9: the magic-byte dispatch falls through to the progressive
    JPEG and paletted PNG decoders (same FFD8 / PNG signatures as
    their baseline forms). Progressive thumbnails must be BYTE-EQUAL
    to the baseline-encoding thumbnails of the same docs (the decoded
    planes bit-match, so the resize must too); paletted thumbnails
    match a numpy reference through the palette channel-mean."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").limit(12)
    texts = {r.doc_id: r.text for r in docs.collect()}
    prog = {r.doc_id: r for r in multimodal.image_thumbnails(
        multimodal.jpeg_progressive_payloads(docs)).collect()}
    base = {r.doc_id: r for r in multimodal.image_thumbnails(
        multimodal.jpeg_payloads(docs, per_block_constant=False)).collect()}
    for d in texts:
        assert prog[d].src_format == "jpeg_prog", d
        assert base[d].src_format == "jpeg", d
        assert bytes(prog[d].thumbnail) == bytes(base[d].thumbnail), d
    plte = {r.doc_id: r for r in multimodal.image_thumbnails(
        multimodal.png_palette_payloads(docs)).collect()}
    for d, text in texts.items():
        r = plte[d]
        assert r.src_format == "png_plte", d
        w, h = (d % 12) + 4, (d % 6) + 3
        nc = 16 + (d % 2) * 16
        src = text.encode("utf-8") or b"\x00"
        pal = np.array([[(d * 5 + j * 17) % 256, (j * 29 + d) % 256,
                         (d * 3 + j * 7) % 256] for j in range(nc)],
                       np.float64)
        idx = np.array([src[i % len(src)] % nc for i in range(w * h)],
                       np.int64).reshape(h, w)
        gray = pal.mean(axis=1)[idx]
        want = np.empty((8, 8))
        re = [i * h // 8 for i in range(9)]
        ce = [j * w // 8 for j in range(9)]
        for i in range(8):
            r0, r1 = re[i], max(re[i + 1], re[i] + 1)
            for j in range(8):
                c0, c1 = ce[j], max(ce[j + 1], ce[j] + 1)
                want[i, j] = gray[min(r0, h - 1):r1,
                                  min(c0, w - 1):c1].mean()
        thumb = np.frombuffer(bytes(r.thumbnail), np.uint8)
        assert (thumb.reshape(8, 8)
                == np.round(want).astype(np.uint8)).all(), d


def test_dedup_incremental_crafted_statuses(spark):
    """All three classifications on a hand-built shard: content already
    curated -> exact_dup; duplicated within the shard -> the smallest
    doc_id is new, the rest incoming_dup; fresh content -> new."""
    existing = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string")
    incoming = spark.createDataFrame(
        [(10, "alpha"),          # exact_dup (curated)
         (11, "gamma"), (12, "gamma"),  # new + incoming_dup
         (13, "delta")],         # new
        "doc_id long, text string")
    got = {r.doc_id: r.status for r in dedup.dedup_incremental(
        existing, incoming).collect()}
    assert got == {10: "exact_dup", 11: "new",
                   12: "incoming_dup", 13: "new"}


def _reference_bpe(word_counts, n_merges):
    """Independent pure-python BPE (Sennrich): argmax pair by (count
    desc, left asc, right asc), full re-count each round."""
    seqs = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(n_merges):
        counts = {}
        for w, seq in seqs.items():
            wc = word_counts[w]
            for i in range(len(seq) - 1):
                counts[(seq[i], seq[i + 1])] = (
                    counts.get((seq[i], seq[i + 1]), 0) + wc)
        if not counts:
            break
        (a, b), weight = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, a, b, a + b, weight))
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


def test_bpe_train_matches_pure_python_reference(spark, sf_dir):
    """The distributed trainer must produce EXACTLY the reference merge
    table — same pairs, same order, same weights — over the real corpus
    word-frequency relation (ties resolved identically)."""
    from ha_sqllite_2_influxdb_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    wc = {}
    for r in docs.collect():
        for w in (r.text or "").split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    want, ref_seqs = _reference_bpe(wc, 12)
    got = bpe.bpe_train(docs, n_merges=12)
    assert [(m["rank"], m["left"], m["right"], m["merged"], m["weight"])
            for m in got] == want


def test_bpe_tokenize_matches_reference_apply(spark, sf_dir):
    """Token counts from the learned merges must equal the reference
    apply's final symbol-sequence lengths per document."""
    from ha_sqllite_2_influxdb_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents").limit(80)
    wc = {}
    texts = {}
    for r in docs.collect():
        texts[r.doc_id] = r.text or ""
        for w in texts[r.doc_id].split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    merges = bpe.bpe_train(docs, n_merges=8)
    ranked = [(m["left"], m["right"]) for m in merges]

    def ref_tokens(word):
        seq = list(word)
        for a, b in ranked:
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        return len(seq)

    got = {r.doc_id: (r.n_words, r.n_tokens)
           for r in bpe.bpe_tokenize(docs, merges).collect()}
    for d, text in texts.items():
        ws = [w for w in text.split(" ") if w]
        assert got[d] == (len(ws), sum(ref_tokens(w) for w in ws)), d


def test_bpe_deterministic_across_partitionings(spark, sf_dir):
    from ha_sqllite_2_influxdb_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    a = bpe.bpe_train(docs, n_merges=6)
    b = bpe.bpe_train(docs.repartition(7), n_merges=6)
    assert a == b


def test_semdedup_keep_rule_and_determinism(spark, sf_dir):
    """SemDeDup invariants: (1) run-to-run identical (kmeans + cosine
    are deterministic); (2) every semantic_dup has a LOWER-id kept-or-dup
    partner within threshold in its own cluster; (3) any exact-duplicate
    embedding pair that k-means co-clusters is never both-kept."""
    from pyspark.sql import functions as F

    from ha_sqllite_2_influxdb_spark.operators.similarity import (
        cosine, dot_chain, norm2_chain, semdedup,
    )
    from ha_sqllite_2_influxdb_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    r1 = sorted(map(tuple, semdedup(emb, threshold=0.9).collect()))
    r2 = sorted(map(tuple, semdedup(
        emb.repartition(7, "vec_id"), threshold=0.9).collect()))
    assert r1 == r2 and len(r1) == emb.count()

    out = semdedup(emb, threshold=0.9)
    e = emb.join(out.select("vec_id", "cluster", "status"), "vec_id")
    a = e.select("cluster", F.col("vec_id").alias("id_a"),
                 F.col("embedding").alias("va")) \
         .withColumn("na2", norm2_chain("va"))
    b = e.select("cluster", F.col("vec_id").alias("id_b"),
                 F.col("embedding").alias("vb"),
                 F.col("status").alias("status_b")) \
         .withColumn("nb2", norm2_chain("vb"))
    close = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cosine(dot_chain("va", "vb"),
                                      F.col("na2"), F.col("nb2")))
        .filter(F.col("cos_sim") >= 0.9)
    )
    # (2) every dup id appears as the id_b of at least one close pair
    dups = {r["vec_id"] for r in out.filter(
        F.col("status") == "semantic_dup").collect()}
    partnered = {r["id_b"] for r in close.select("id_b").collect()}
    assert dups == partnered
    # (3) the higher id of every close pair is marked dup
    bad = close.filter(F.col("status_b") != "semantic_dup").count()
    assert bad == 0


def test_allpairs_prefix_filter_equals_brute_force(spark, sf_dir):
    """The prefix-filter theorem in practice: allpairs_jaccard must
    produce EXACTLY the brute-force cross-join pairs >= t — zero false
    negatives (the property LSH trades away) and zero extras."""
    from ha_sqllite_2_influxdb_spark.operators.dedup import (
        allpairs_jaccard, shingle_sets,
    )

    t = 0.35
    ev = load_table(spark, sf_dir, "events")
    corpus = (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda x: x.getField("event_type"),
                ),
                " ",
            ).alias("text")
        )
        .select(F.col("user_id").alias("doc_id"), "text")
    )
    got = {(r.doc_a, r.doc_b): r.n_inter
           for r in allpairs_jaccard(corpus, threshold=t).collect()}

    sh = shingle_sets(corpus)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("ni", F.size(F.array_intersect("sa", "sb")))
        .withColumn(
            "j",
            F.col("ni").cast("double")
            / (F.size("sa") + F.size("sb") - F.col("ni")).cast("double"),
        )
        .filter(F.col("j") >= t)
    )
    want = {(r.doc_a, r.doc_b): r.ni for r in brute.collect()}
    assert got == want and len(got) > 0


def test_hard_negatives_are_hardest_cross_label(spark, sf_dir):
    """Every mined negative has a different label than its query, and
    rank-1 really is the maximum-cosine different-label candidate
    (checked against an independent full scoring)."""
    from ha_sqllite_2_influxdb_spark.operators import similarity

    e = load_table(spark, sf_dir, "embeddings")
    mined = similarity.hard_negatives(e, n_queries=5, k=2).collect()
    assert mined, "no negatives mined"

    labels = {r.vec_id: r.label for r in e.select("vec_id",
                                                  "label").collect()}
    for r in mined:
        assert labels[r.query_id] != labels[r.cand_id]

    # independent check: rank-1 matches brute-force kNN restricted to
    # different-label candidates
    full = similarity.knn_brute_force(e, n_queries=5, k=50).collect()
    best = {}
    for r in sorted(full, key=lambda r: r.rk):
        if labels[r.query_id] != labels[r.cand_id] \
                and r.query_id not in best:
            best[r.query_id] = r.cand_id
    got1 = {r.query_id: r.cand_id for r in mined if r.rk == 1}
    for qid, cid in best.items():
        assert got1[qid] == cid


def test_line_dedup_c4_semantics(spark):
    """On the recrawl corpus: originals (first in doc_id order) keep
    every span; exact recrawls keep none; near recrawls keep at most
    their divergent tail span; reconstruction equals the original
    text for originals."""
    from ha_sqllite_2_influxdb_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"),       # 2 segments of 5
         (2, "k l m n o p q r s t")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.line_dedup_corpus(
        dedup.recrawl_corpus(docs), seg_words=5).collect()}
    for d in (1, 2):
        assert out[d].n_kept == out[d].n_segs == 2
        assert out[d].clean_text == dict(
            ((1, "a b c d e f g h i j"), (2, "k l m n o p q r s t")))[d]
        # exact recrawl: everything said before
        assert out[d + 2_000_000].n_kept == 0
        assert out[d + 2_000_000].clean_text == ""
        # near recrawl (last word dropped): first span duplicate,
        # 4-word tail span is new
        assert out[d + 1_000_000].n_segs == 2
        assert out[d + 1_000_000].n_kept == 1
    assert out[1_000_001].clean_text == "f g h i"


def test_png_rgb_decode_golden(spark):
    """Truecolor decode must invert the bpp=3 filter set back to exactly
    the encoded bytes: per-channel means equal an independent numpy
    recomputation from the text-cycling rule. A height ≥ 5 doc cycles
    all five filters; a grayscale-decoder-style bpp=1 inverse would
    corrupt Sub/Average/Paeth rows and fail the channel means."""
    import numpy as np

    text = "The quick brown fox jumps over the lazy dog"
    # doc_id 9: w=(9%12)+3=12, h=(9%6)+2=5 -> filters 0,1,2,3,4
    df = spark.createDataFrame([(9, text)], "doc_id long, text string")
    r = multimodal.decode_png_rgb(
        multimodal.png_rgb_payloads(df)).collect()[0]
    w, h = 12, 5
    assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
    src = text.encode()
    n = 3 * w
    img = np.array([[src[(row * n + i) % len(src)] for i in range(n)]
                    for row in range(h)], np.float64).reshape(h, w, 3)
    assert r.mean_r == float(img[:, :, 0].mean())
    assert r.mean_g == float(img[:, :, 1].mean())
    assert r.mean_b == float(img[:, :, 2].mean())


def test_png_subset_boundaries_are_honest(spark):
    """The grayscale decoder nulls on truecolor payloads and vice versa
    — each subset refuses rather than mis-decodes."""
    df = spark.createDataFrame([(3, "abcdef")], "doc_id long, text string")
    gray_on_rgb = multimodal.decode_png(
        multimodal.png_rgb_payloads(df)).collect()[0]
    assert gray_on_rgb.width is None
    rgb_on_gray = multimodal.decode_png_rgb(
        multimodal.png_payloads(df)).collect()[0]
    assert rgb_on_gray.width is None


def test_ngram_novelty_known_answer(spark):
    """Two docs sharing exactly one 3-gram: that shingle has df=2 for
    both; everything else df=1 — novelty = (n-1)/n per doc; a third
    fully-unique doc scores 1.0."""
    docs = spark.createDataFrame(
        [(1, "a b c d e"),          # shingles: abc bcd cde
         (2, "x y a b c z"),        # shingles: xya yab abc bcz
         (3, "p q r s")],           # shingles: pqr qrs
        "doc_id long, text string")
    from ha_sqllite_2_influxdb_spark.operators.dedup import ngram_novelty

    got = {r.doc_id: (r.n_shingles, r.n_unique, r.novelty)
           for r in ngram_novelty(docs).collect()}
    assert got[1] == (3, 2, 2 / 3)       # 'a b c' shared with doc 2
    assert got[2] == (4, 3, 0.75)
    assert got[3] == (2, 2, 1.0)


def test_ngram_novelty_native_hash_identical(spark, sf_dir):
    """The 100 TB config (xxhash64 shingle ids on the wire) must produce
    identical novelty rows to the portable string tier — hashing only
    renames shingle identities (no fixture collisions)."""
    from ha_sqllite_2_influxdb_spark.operators.dedup import (
        ngram_novelty,
        recrawl_corpus,
    )

    docs = recrawl_corpus(load_table(spark, sf_dir, "documents"))
    a = {r.doc_id: (r.n_shingles, r.n_unique, r.novelty)
         for r in ngram_novelty(docs).collect()}
    b = {r.doc_id: (r.n_shingles, r.n_unique, r.novelty)
         for r in ngram_novelty(docs, native_hash=True).collect()}
    assert a == b


def test_mrl_rerank_funnel_contract(spark, sf_dir):
    """MRL two-stage retrieval: (1) with the shortlist widened to the
    whole candidate set the funnel must equal exact brute-force kNN
    BIT-FOR-BIT (stage 2 is the same cosine+tiebreak); (2) the default
    funnel is partitioning-invariant; (3) on this corpus the prefix
    shortlist keeps a documented floor of the exact top-10 — random
    synthetic vectors are the WORST case for prefix truncation (no
    MRL front-loading), so the floor is deliberately modest."""
    from pyspark.sql import functions as F

    from ha_sqllite_2_influxdb_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    n_cand = emb.filter(F.col("vec_id") >= 5).count()
    wide = similarity.mrl_rerank_topk(emb, shortlist=n_cand).collect()
    exact = similarity.knn_brute_force(emb).collect()
    assert sorted(map(tuple, wide)) == sorted(map(tuple, exact))

    one = similarity.mrl_rerank_topk(emb.coalesce(1)).collect()
    many = similarity.mrl_rerank_topk(emb.repartition(7)).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))

    got = {(r.query_id, r.cand_id) for r in one}
    ex = {(r.query_id, r.cand_id) for r in exact}
    recall = len(got & ex) / len(ex)
    assert recall >= 0.4, recall


def test_mrl_stage1_carries_only_prefix_slices(spark, sf_dir):
    """ADVICE r7 low: the stage-1 quadratic join must NOT carry the
    full-width vectors — the 4x prefix-only I/O claim is a plan fact,
    not a docstring. Pin it: the cross join's output attributes are the
    ids + prefix slices only (qv/cv/embedding enter the plan after the
    bounded-shortlist broadcast join)."""
    from ha_sqllite_2_influxdb_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    df = similarity.mrl_rerank_topk(emb)
    root = df._jdf.queryExecution().executedPlan()
    if root.getClass().getSimpleName().startswith("AdaptiveSparkPlan"):
        root = root.initialPlan()

    def walk(node):
        yield node
        it = node.children().iterator()
        while it.hasNext():
            yield from walk(it.next())

    cross = [n for n in walk(root)
             if "NestedLoopJoin" in n.getClass().getSimpleName()
             or "CartesianProduct" in n.getClass().getSimpleName()]
    assert cross, "stage-1 cross join node not found in the plan"
    for n in cross:
        names = set()
        it = n.output().iterator()
        while it.hasNext():
            names.add(it.next().name())
        assert not names & {"qv", "cv", "embedding", "qn2", "cn2"}, (
            f"full-width vectors flow through the quadratic stage: {names}")


def test_thumbnail_dispatch_covers_png_gray16(spark, sf_dir):
    """r10 (VERDICT r9 #8): the IHDR depth-byte peek routes 16-bit
    grayscale PNGs to the bpp=2 decoder, and the /257 range scaling
    makes a scale257-encoded 16-bit image's thumbnail BYTE-EQUAL to
    its own 8-bit encoding's thumbnail (v*257/257 is exact in
    float64, so the resize sees identical planes)."""
    docs = load_table(spark, sf_dir, "documents").limit(12)
    g16 = {r.doc_id: r for r in multimodal.image_thumbnails(
        multimodal.png_gray16_payloads(docs, scale257=True)).collect()}
    g8 = {r.doc_id: r for r in multimodal.image_thumbnails(
        multimodal.png_payloads(docs)).collect()}
    assert g16 and set(g16) == set(g8)
    for d in g16:
        assert g16[d].src_format == "png_gray16", d
        assert g8[d].src_format == "png", d
        assert bytes(g16[d].thumbnail) == bytes(g8[d].thumbnail), d
        assert g16[d].thumb_mean == g8[d].thumb_mean, d


def test_dhash_bucket_cap_bounds_viral_image_and_noop_otherwise(spark):
    """The perceptual join's viral-corpus guard (r11): (a) on a corpus
    flooded with ONE image hash (placeholder-thumbnail reality), the
    capped tier's candidate volume is bounded by ~4*cap² while the
    uncapped exact tier goes |flood|²; (b) on the normal fixture, where
    no bucket reaches the cap, capped output is IDENTICAL to the exact
    tier; (c) the deterministic coin makes the capped sample stable
    across re-runs."""
    from pyspark.sql import functions as F

    from ha_sqllite_2_influxdb_spark.operators import dedup, multimodal as mm

    flood = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.lit(123456789).alias("dhash_lo"),
        F.lit(987654321).alias("dhash_hi"))
    exact_pairs = dedup.dhash_neardup(flood).agg(
        F.sum("n_near")).collect()[0][0]
    assert exact_pairs == 400 * 399  # the quadratic flood, sym-counted
    cap = 32
    capped = dedup.dhash_neardup(flood, bucket_cap=cap)
    capped_pairs = capped.agg(F.sum("n_near")).collect()[0][0]
    # 4 bands x at-most-~2cap kept members each (the coin keeps ~cap):
    # far below the 159,600 exact count, far above zero
    assert 0 < capped_pairs < 4 * (2 * cap) * (2 * cap - 1)
    again = dedup.dhash_neardup(flood, bucket_cap=cap).agg(
        F.sum("n_near")).collect()[0][0]
    assert again == capped_pairs  # deterministic coin

    docs = spark.createDataFrame(
        [(d,) for d in range(0, 120)], "doc_id long")
    hashes = mm.image_dhash(mm.dhash_payloads(docs)).select(
        "doc_id", "dhash_lo", "dhash_hi")
    a = sorted(map(tuple, dedup.dhash_neardup(hashes).collect()))
    b = sorted(map(tuple, dedup.dhash_neardup(
        hashes, bucket_cap=dedup.DEFAULT_BUCKET_CAP).collect()))
    assert a == b  # cap not binding on the normal fixture


def test_pair_rows_equals_reference_combinations(spark):
    """r13 (VERDICT r12 #7): `_pair_rows` — the generator-streamed
    in-bucket pair stage that replaced the flatten/transform/slice HOF
    across the banded family — must emit EXACTLY the ordered 2-element
    combinations of each bucket's sorted array, as itertools defines
    them. Property-pinned over randomized bucket populations including
    the edge shapes (empty bucket array never occurs by construction of
    collect_list, singleton buckets emit nothing, duplicate payloads
    pair by position)."""
    import itertools
    import random

    from ha_sqllite_2_influxdb_spark.operators.dedup import _pair_rows

    rng = random.Random(13)
    buckets = []
    for bid in range(40):
        m = rng.choice([1, 1, 2, 2, 3, 5, 8, 13, 40])
        docs = sorted(rng.sample(range(10_000), m))
        buckets.append((bid, [(d, d * 3 + 1) for d in docs]))
    df = spark.createDataFrame(
        buckets,
        "b int, ds array<struct<doc_id: long, payload: long>>")
    got = sorted(
        (r.p.a.doc_id, r.p.a.payload, r.p.b.doc_id, r.p.b.payload)
        for r in _pair_rows(df).collect())
    want = sorted(
        (a[0], a[1], b[0], b[1])
        for _, ds in buckets
        for a, b in itertools.combinations(ds, 2))
    assert got == want and len(want) > 800


def test_allpairs_linear_swapin_value_parity(spark):
    """VERDICT r13 "wrong" #2: allpairs_jaccard is a documented
    exact-contract quadratic tier whose registered linear escape hatch
    is the banded MinHash tier (neardup_pairs, xxhash64 scale config).
    The hatch is only a hatch if its survivors are trustworthy, so pin
    the equality-of-survivors contract at the DRIVER's sf (0.01), in
    the probe-board configuration (threshold 0.5, n_seeds 8): every
    pair the swap-in emits must appear in the exact tier's output with
    the IDENTICAL jaccard double (the LSH tier rescores candidates
    exactly, so approx ⊆ exact with value equality — zero false
    positives by construction; recall is the documented banded
    trade-off and is NOT asserted here). Deterministic both sides:
    the pin either always holds or always fails."""
    from ha_sqllite_2_influxdb_spark.operators.dedup import (
        allpairs_jaccard, neardup_pairs,
    )
    from ha_sqllite_2_influxdb_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    t = 0.5
    exact = {(r.doc_a, r.doc_b): r.jaccard
             for r in allpairs_jaccard(docs, threshold=t).collect()}
    approx = {(r.doc_a, r.doc_b): r.jaccard
              for r in neardup_pairs(docs, threshold=t, n_seeds=8,
                                     portable=False).collect()}
    assert exact, "exact tier found no pairs — vacuous fixture"
    assert approx, "swap-in found no pairs — vacuous pin"
    extras = {k: v for k, v in approx.items() if k not in exact}
    assert not extras, f"swap-in emitted non-exact pairs: {extras}"
    diff = {k: (approx[k], exact[k])
            for k in approx if approx[k] != exact[k]}
    assert not diff, f"swap-in jaccard values diverge: {diff}"


def test_np_normalized_bit_identical_to_jvm(spark, sf_dir):
    """r14 guide-§4.2 surgery pin: the numpy normalization used inside
    the PQ Arrow passes must stay BIT-identical to the JVM reference
    formulation (_normalized) — the sequential per-dim fold mirrors the
    interpreted left fold exactly; numpy's pairwise sum() would not."""
    emb = load_table(spark, sf_dir, "embeddings")
    rows = sorted(
        (r.vec_id, list(r.embedding))
        for r in emb.select("vec_id", "embedding").collect()
    )
    want = {r.vec_id: list(r.nv)
            for r in similarity._normalized(emb).collect()}
    got = similarity._np_normalized([v for _, v in rows])
    for (vid, _), g in zip(rows, got):
        assert list(g) == want[vid], vid
