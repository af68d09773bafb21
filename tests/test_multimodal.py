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


def test_png_jpeg_header_codec_roundtrip():
    """build → parse roundtrip over a grid of dims; PNG IDAT actually
    decompresses to the right scanline count (valid container, not just
    a magic prefix)."""
    import struct
    import zlib

    from graphlab_spark.operators.multimodal import build_jpeg, build_png, parse_image_header

    for w, h in [(1, 1), (16, 76), (112, 16), (640, 480), (97, 61)]:
        assert parse_image_header(build_png(w, h)) == ("png", w, h)
        assert parse_image_header(build_jpeg(w, h)) == ("jpeg", w, h)
    png = build_png(5, 3)
    (idat_len,) = struct.unpack(">I", png[33:37])
    raw = zlib.decompress(png[41 : 41 + idat_len])
    assert len(raw) == 3 * (1 + 3 * 5)  # h scanlines of filter byte + RGB row


def test_parse_image_header_rejects_malformed():
    import pytest

    from graphlab_spark.operators.multimodal import build_jpeg, build_png, parse_image_header

    with pytest.raises(ValueError):
        parse_image_header(b"plainly not an image")
    with pytest.raises(ValueError):
        parse_image_header(build_png(8, 8)[:10])  # truncated IHDR
    corrupted = bytearray(build_png(8, 8))
    corrupted[20] ^= 0xFF  # flip a dim byte → IHDR CRC mismatch
    with pytest.raises(ValueError):
        parse_image_header(bytes(corrupted))
    with pytest.raises(ValueError):
        parse_image_header(build_jpeg(8, 8)[:10])  # truncated before SOF


def test_decode_image_headers_real_and_quarantine(spark):
    """Real planted bytes decode to the planted dims; corrupt plants and
    non-image payloads land in the quarantine column, never a crash."""
    from graphlab_spark.operators.multimodal import attach_real_media, decode_image_headers

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    got = {r.doc_id: r for r in decode_image_headers(attach_real_media(docs)).collect()}
    assert len(got) == 200
    for d, r in got.items():
        if d % 3 != 0:
            assert r.error == "unsupported" and r.fmt is None and r.width is None
        elif d % 51 == 0:
            assert r.error == "corrupt" and r.width is None
        else:
            assert r.error is None
            assert r.fmt == ("png" if d % 2 == 0 else "jpeg")
            assert r.width == 16 + (d * 7) % 97
            assert r.height == 16 + (d * 5) % 61
    # both failure classes actually occur in the sample
    assert any(r.error == "corrupt" for r in got.values())
    assert any(r.error == "unsupported" for r in got.values())


def test_wav_build_parse_roundtrip():
    from graphlab_spark.operators.multimodal import build_wav, parse_wav_header

    blob = build_wav(16000, 250, channels=2)
    assert parse_wav_header(blob) == (2, 16000, 16, 250)
    blob = build_wav(8000, 1, channels=1)
    assert parse_wav_header(blob) == (1, 8000, 16, 1)


def test_wav_parser_rejects_malformed():
    import pytest as _pytest

    from graphlab_spark.operators.multimodal import build_wav, parse_wav_header

    good = build_wav(8000, 10)
    for bad in (b"", b"RIFF", good[:8], good[:30], b"RIFX" + good[4:],
                good[:-4]):  # truncated data chunk
        with _pytest.raises(ValueError):
            parse_wav_header(bad)
    # non-PCM format code rejected
    import struct
    nonpcm = bytearray(good)
    struct.pack_into("<H", nonpcm, 20, 3)  # fmt tag offset: 12+8
    with _pytest.raises(ValueError):
        parse_wav_header(bytes(nonpcm))


def test_decode_audio_headers_planted(spark):
    from graphlab_spark.operators import multimodal as MM
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    got = {
        r.doc_id: r
        for r in MM.decode_audio_headers(MM.attach_real_media(docs)).collect()
    }
    assert len(got) == 200
    for d, r in got.items():
        if d % 3 == 1 and d % 53 != 0:
            assert r.fmt == "wav" and r.error is None
            assert r.channels == 1 + d % 2
            assert r.sample_rate == 8000 * (1 + (d % 5) % 3)
            assert r.n_samples == 100 + (d * 13) % 997
        elif d % 3 == 1:
            assert r.error == "corrupt" and r.fmt is None
        else:
            assert r.error == "unsupported" and r.fmt is None


def test_wav_zero_block_align_rejected():
    import struct

    import pytest as _pytest

    from graphlab_spark.operators.multimodal import build_wav, parse_wav_header

    blob = bytearray(build_wav(8000, 4))
    struct.pack_into("<H", blob, 12 + 8 + 12, 0)  # blockAlign := 0
    with _pytest.raises(ValueError):
        parse_wav_header(bytes(blob))


def test_mp4_build_parse_roundtrip_and_malformed():
    import pytest as _pytest

    from graphlab_spark.operators.multimodal import build_mp4, parse_mp4_header

    blob = build_mp4(3000, 8123)
    assert parse_mp4_header(blob) == (3000, 8123)
    for bad in (b"", blob[:10], blob[:40], blob[:-4], b"\x00" * 20):
        with _pytest.raises(ValueError):
            parse_mp4_header(bad)


def test_decode_video_headers_planted(spark):
    from graphlab_spark.operators import multimodal as MM
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 250
    )
    got = {
        r.doc_id: r
        for r in MM.decode_video_headers(MM.attach_real_media(docs)).collect()
    }
    assert len(got) == 250
    saw_corrupt = False
    for d, r in got.items():
        if d % 3 == 2 and d % 59 != 0:
            assert r.fmt == "mp4" and r.error is None
            assert r.timescale == 1000 * (1 + (d % 7) % 3)
            assert r.duration == 500 + (d * 17) % 9001
        elif d % 3 == 2:
            assert r.error == "corrupt" and r.fmt is None
            saw_corrupt = True
        else:
            assert r.error == "unsupported" and r.fmt is None
    assert saw_corrupt  # the plant (59, 236) is inside doc_id < 250
