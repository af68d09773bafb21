"""Multimodal plumbing: binary media column, mapInPandas decode stub,
frame-sample fan-out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphlab_spark.operators import multimodal as MM

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return MM.attach_fake_media(docs).localCheckpoint()


def test_media_schema_and_determinism(spark, media):
    row = media.filter(F.col("doc_id") == 3).first()
    assert row.media_type == "image" if 3 % 3 == 0 else True
    assert isinstance(row.media, (bytes, bytearray))
    again = MM.attach_fake_media(
        spark.read.parquet(f"{SF}/documents.parquet")
    ).filter(F.col("doc_id") == 3).first()
    assert bytes(row.media) == bytes(again.media)


def test_decode_meta_formulas(spark, media):
    meta = {r.doc_id: r for r in MM.decode_media(media).collect()}
    for doc_id in [0, 1, 2, 7]:
        m = meta[doc_id]
        n_bytes = 32 * (doc_id % 7 + 1)
        assert m.n_bytes == n_bytes
        assert m.width == 64 + n_bytes % 192
        assert m.height == 64 + n_bytes % 128
        if m.media_type == "image":
            assert m.n_frames == 1
        else:
            assert m.n_frames == 1 + n_bytes % 24


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM.real_decode(b"bytes", "image")


def test_frame_sample_counts(spark, media):
    meta = MM.decode_media(media)
    frames = MM.frame_sample(meta, every=4)
    expect = meta.select(
        F.sum(F.floor((F.col("n_frames") - 1) / 4) + 1).alias("n")
    ).first().n
    assert frames.count() == expect


def test_resize_plan_properties(spark):
    from graphlab_spark.operators.multimodal import attach_fake_media, decode_media, resize_plan

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    out = resize_plan(decode_media(attach_fake_media(docs)), 224, 224).collect()
    assert out
    for r in out:
        assert 1 <= r.out_w <= 224 and 1 <= r.out_h <= 224
        # the longer side lands on (near) the target — aspect preserved
        assert max(r.out_w, r.out_h) >= 220


def test_extract_features_deterministic_shape(spark):
    from graphlab_spark.operators.multimodal import FEATURE_DIM, attach_fake_media, extract_features

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    media = attach_fake_media(docs)
    a = {r.doc_id: tuple(r.features) for r in extract_features(media).collect()}
    b = {r.doc_id: tuple(r.features) for r in extract_features(media).collect()}
    assert a == b and len(a) == 100
    for v in a.values():
        assert len(v) == FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in v)
