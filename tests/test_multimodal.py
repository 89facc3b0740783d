"""Multimodal plumbing: schemas, Arrow batch shapes, deterministic fake
decode vs numpy, 1:N frame sampling, and the decode stub contract."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from udacitycapstonedataengineer_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    FRAME_BYTES,
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    fake_decode,
    sample_frames,
    synthesize_media,
)
from udacitycapstonedataengineer_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    m = synthesize_media(docs).cache()
    yield m
    m.unpersist()


def _types(schema):
    return [(f.name, f.dataType.simpleString()) for f in schema.fields]


def test_media_schema_and_metadata(media):
    assert _types(media.schema) == _types(MEDIA_SCHEMA)
    rows = media.collect()
    assert rows, "documents table empty?"
    for r in rows:
        assert r.media_type in {"image", "audio", "video"}
        assert r.meta.n_bytes == len(r.payload)
        if r.media_type == "image":
            assert r.meta.width and r.meta.height and r.meta.sample_rate_hz is None
        elif r.media_type == "audio":
            assert r.meta.sample_rate_hz == 16_000 and r.meta.width is None
        else:
            assert r.meta.width is None and r.meta.sample_rate_hz is None


def test_feature_extraction_matches_numpy(media):
    feats = extract_features(media)
    assert feats.schema == FEATURE_SCHEMA
    payloads = {r.doc_id: bytes(r.payload) for r in media.collect()}
    for r in feats.collect():
        raw = payloads[r.doc_id]
        assert r.n_bytes == len(raw)
        assert r.content_md5 == hashlib.md5(raw).hexdigest()
        expect = float(np.frombuffer(raw, np.uint8).mean()) if raw else 0.0
        assert r.mean_byte == pytest.approx(expect)


def test_frame_sampling_one_to_n(media):
    frames = sample_frames(media, frame_bytes=FRAME_BYTES, every=4)
    payloads = {r.doc_id: bytes(r.payload) for r in media.collect()}
    got = {}
    for r in frames.collect():
        got.setdefault(r.doc_id, []).append(r)
        assert r.byte_offset == r.frame_no * FRAME_BYTES
        assert r.frame_bytes == FRAME_BYTES
        assert r.byte_offset + FRAME_BYTES <= len(payloads[r.doc_id])
    for doc_id, raw in payloads.items():
        n_expected = len(range(0, len(raw) // FRAME_BYTES, 4))
        assert len(got.get(doc_id, [])) == n_expected


def test_mapinpandas_is_narrow(media):
    # mapInPandas must not introduce a shuffle: no Exchange in the plan
    plan = extract_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_resize_images_fixed_grid(media):
    from udacitycapstonedataengineer_spark.operators.multimodal import (
        RESIZED_SCHEMA,
        resize_images,
    )

    resized = resize_images(media, width=16, height=16)
    assert _types(resized.schema) == _types(RESIZED_SCHEMA)
    payloads = {
        r.doc_id: bytes(r.payload)
        for r in media.filter(media.media_type == "image").collect()
    }
    rows = resized.collect()
    assert {r.doc_id for r in rows} == set(payloads)
    for r in rows:
        assert (r.width, r.height) == (16, 16)
        assert len(r.pixels) == 256
        raw = np.frombuffer(payloads[r.doc_id], np.uint8)
        idx = (np.arange(256) * raw.size) // 256
        assert bytes(r.pixels) == raw[idx].tobytes()
    # narrow: no shuffle introduced
    plan = resized._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_run_pipeline_end_to_end(spark, sf_dir, tmp_path):
    import os

    from udacitycapstonedataengineer_spark.plans.pipeline import run_pipeline

    metrics = run_pipeline(spark, sf_dir, str(tmp_path / "out"))
    assert metrics["unresolved_fks"] == 0
    assert metrics["rows_after"] == metrics["rows_before"]  # testdata has no null keys
    for t in ("priority_dim", "country_dim", "calendar_dim", "fact"):
        assert spark.read.parquet(os.path.join(tmp_path, "out", t)).count() > 0


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_media(b"xx", "image")
    with pytest.raises(NotImplementedError):
        decode_media(b"xx", "video")
    assert fake_decode(b"\x00\xff").tolist() == [0, 255]


def test_audio_corpus_is_ascii_for_varchar_oracle(spark, sf_dir):
    """The audio-window oracle slices VARCHAR; that is byte-exact ONLY
    while the corpus is pure ASCII. Pin that precondition."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    n_mismatch = docs.filter(
        F.octet_length("text") != F.length("text")
    ).count()
    assert n_mismatch == 0


def test_window_signal_numpy_twin(media):
    """Window arithmetic + digests against a direct python recompute."""
    import hashlib

    from udacitycapstonedataengineer_spark.operators.multimodal import (
        window_signal,
    )

    payloads = {
        r.doc_id: bytes(r.payload)
        for r in media.filter(media.media_type == "audio").collect()
    }
    rows = window_signal(media, window_bytes=128, hop_bytes=64).collect()
    got = {(r.doc_id, r.window_no): (r.byte_offset, r.window_md5) for r in rows}
    want = {}
    for doc_id, raw in payloads.items():
        n = (len(raw) - 128) // 64 + 1 if len(raw) >= 128 else 0
        for w in range(n):
            want[(doc_id, w)] = (
                w * 64,
                hashlib.md5(raw[w * 64 : w * 64 + 128]).hexdigest(),
            )
    assert got == want


def test_media_features_feed_ann_search(spark, sf_dir):
    """Integration: multimodal feature extraction → ANN. Media blobs
    decode (deterministic fake codec) to fixed-dim feature vectors via
    mapInPandas, which then drive the exact cosine top-k — every
    medium must retrieve ITSELF at rank 1 with similarity 1.0 (same
    bytes → same features → cosine 1). The multimodal surface is a
    producer for the similarity stack, not an island."""
    from udacitycapstonedataengineer_spark.operators.multimodal import (
        resize_images,
        synthesize_media,
    )
    from udacitycapstonedataengineer_spark.operators.similarity import (
        brute_force_topk,
    )
    from udacitycapstonedataengineer_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(30)
    resized = resize_images(synthesize_media(docs))  # fixed 16x16 grid
    # binary pixel grid -> native double vector (hex fold, no UDF)
    feats = resized.select(
        F.col("doc_id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, width * height - 1), "
            "i -> cast(conv(substr(hex(pixels), i * 2 + 1, 2), 16, 10) "
            "AS DOUBLE))"
        ).alias("embedding"),
    )
    # self-matches are excluded by design, so plant an exact DUPLICATE
    # of each query vector under vec_id+10000: identical bytes must
    # come back as the rank-1 neighbor at cosine 1.0
    queries = [r["vec_id"] for r in feats.orderBy("vec_id").limit(2).collect()]
    dupes = feats.filter(F.col("vec_id").isin(queries)).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    top = brute_force_topk(
        feats.unionByName(dupes), F.col("vec_id").isin(queries), k=1
    )
    rows = top.collect()
    assert len(rows) == 2
    for r in rows:
        assert r["cand_id"] == r["query_id"] + 10000, r
        assert abs(r["cosine"] - 1.0) < 1e-12, r
