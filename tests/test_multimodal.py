"""Multimodal column plumbing: schemas, Arrow batch shape, determinism.

The decode seams are stubs (no image/audio libs in this container); what
these tests pin down is the Spark-side contract a real codec would slot
into: binary column handling, mapInPandas signatures, output schemas,
row multiplicity, and byte-exact determinism of the synthetic corpus.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    return mm.attach_fake_media(docs, payload_bytes=256).persist()


def _expected_payload(doc_id: int, payload_bytes: int = 256) -> bytes:
    magic = {
        0: b"\xff\xd8\xff\xe0",
        1: b"\x89PNG\r\n",
        2: b"RIFF\x00\x00",
    }[doc_id % 3]
    ks = hashlib.sha256(str(doc_id).encode()).hexdigest()
    ks = (ks * (payload_bytes // 32 + 1))[:payload_bytes]
    return magic + ks.encode()


def test_attach_fake_media_deterministic_bytes(media):
    # column-expression payload == independent Python reconstruction
    for r in media.orderBy("doc_id").limit(9).collect():
        assert bytes(r.media) == _expected_payload(r.doc_id), r.doc_id
    assert _shape(media.schema) == _shape(mm.MEDIA_SCHEMA)


def _shape(schema):
    # nullability differs when built from non-null spark.range ids
    return [(f.name, f.dataType) for f in schema.fields]


def test_media_stats_jvm_only(media):
    stats = {r.doc_id: r for r in mm.media_stats(media).collect()}
    for did, r in stats.items():
        exp = _expected_payload(did)
        assert r.n_bytes == len(exp)
        assert r.sha256 == hashlib.sha256(exp).hexdigest()
        assert r.kind == ["image/jpeg", "image/png", "audio/wav"][did % 3]
    # metadata scan must not drop into Python: no *InPandas/PythonUDF node
    plan = mm.media_stats(media)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "InPandas" not in plan


def test_extract_features_unit_vectors(media):
    feats = mm.extract_features(media, dim=16).collect()
    assert len(feats) == 24
    for r in feats:
        assert len(r.features) == 16
        assert abs(sum(x * x for x in r.features) - 1.0) < 1e-3
    # deterministic across runs
    again = {r.doc_id: r.features for r in mm.extract_features(media, dim=16).collect()}
    for r in feats:
        assert again[r.doc_id] == r.features


def test_resize_images_only_touches_images(media):
    out = {r.doc_id: r for r in mm.resize_images(media, 64, 64).collect()}
    src = {r.doc_id: r for r in media.collect()}
    for did, r in out.items():
        if src[did].mime.startswith("image/"):
            assert (r.width, r.height) == (64, 64)
            assert bytes(r.media)[:4] == bytes(src[did].media)[:4]  # magic kept
            assert bytes(r.media) != bytes(src[did].media)
        else:  # audio passes through untouched
            assert bytes(r.media) == bytes(src[did].media)
            assert (r.width, r.height) == (src[did].width, src[did].height)
    assert _shape(mm.resize_images(media).schema) == _shape(mm.MEDIA_SCHEMA)


def test_sample_frames_multiplicity(media):
    fr = mm.sample_frames(media, n_frames=4)
    assert fr.count() == 24 * 4
    one = fr.filter("doc_id = 3").orderBy("frame_idx").collect()
    assert [r.frame_idx for r in one] == [0, 1, 2, 3]
    payload = _expected_payload(3)
    step = len(payload) // 4
    assert bytes(one[1].frame_bytes) == payload[step : 2 * step]


# ------------------------------------------------------------------ real BMP


def test_bmp_codec_roundtrip_and_layout():
    """decode(encode(px)) == px, including padded odd widths; the
    byte layout is the real Windows V3 one (bottom-up, BGR, 4-byte
    row padding) — checked against a hand-built reference byte
    string, not just self-consistency."""
    import struct

    import numpy as np

    for w, h in [(16, 16), (17, 9), (1, 1), (5, 3), (40, 32)]:
        px = mm.fake_bmp_pixels(123, w, h)
        payload = mm.encode_bmp(px)
        assert payload[:2] == b"BM"
        assert np.array_equal(mm.decode_bmp(payload), px), (w, h)

    # independent per-byte reference for a tiny 2x2 image
    px = np.array(
        [[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]],
        dtype=np.uint8,
    )
    payload = mm.encode_bmp(px)
    stride = 8  # 2*3 rounded up to 4 bytes
    assert struct.unpack_from("<I", payload, 10)[0] == 54
    assert struct.unpack_from("<ii", payload, 18) == (2, 2)
    body = payload[54:]
    # bottom row first, BGR per pixel, two pad bytes per row
    assert body == bytes(
        [9, 8, 7, 12, 11, 10, 0, 0, 3, 2, 1, 6, 5, 4, 0, 0]
    )
    assert len(body) == stride * 2


def test_bmp_resize_is_byte_exact_vs_reference_loop(spark):
    """resize_images over real BMPs: output bytes equal an independent
    per-pixel nearest-neighbor loop + re-encode, byte for byte."""
    import numpy as np

    docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    media = mm.attach_fake_bmp(docs).persist()
    out = {
        r.doc_id: bytes(r.media)
        for r in mm.resize_images(media, 20, 14).collect()
    }
    for r in media.collect():
        src = mm.decode_bmp(bytes(r.media))
        h, w, _ = src.shape
        ref = np.zeros((14, 20, 3), dtype=np.uint8)
        for yd in range(14):
            for xd in range(20):
                ref[yd, xd] = src[(yd * h) // 14, (xd * w) // 20]
        assert out[r.doc_id] == mm.encode_bmp(ref), r.doc_id
    meta = {
        (r.doc_id, r.width, r.height, r.mime)
        for r in mm.resize_images(media, 20, 14).collect()
    }
    assert all(m[1:] == (20, 14, "image/bmp") for m in meta)
    media.unpersist()


def test_image_features_match_naive_pixel_stats(spark):
    """image_features over the real codec == naive per-pixel stats
    computed straight from the generator formula (never decoding)."""
    docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    feats = {
        r.doc_id: list(r.features)
        for r in mm.image_features(mm.attach_fake_bmp(docs)).collect()
    }
    for i in range(12):
        w, h = 16 + (i % 4) * 8, 16 + (i % 3) * 8
        n = w * h
        sums, sqs = [0, 0, 0], [0, 0, 0]
        for y in range(h):
            for x in range(w):
                for c, v in enumerate(
                    (
                        (7 * i + 3 * x + 5 * y) % 256,
                        (11 * i + x + 2 * y) % 256,
                        (13 * i + 4 * x + y) % 256,
                    )
                ):
                    sums[c] += v
                    sqs[c] += v * v
        want = (
            [sums[c] / (n * 255) for c in range(3)]
            + [
                (n * sqs[c] - sums[c] ** 2) / (n * n * 255 * 255)
                for c in range(3)
            ]
            + [w / 256, h / 256]
        )
        assert feats[i] == want, i


def test_extract_features_takes_real_path_for_bmp(spark):
    """The generic extract_features operator routes BMP payloads
    through the real decoder (first 8 dims = the exact moments,
    zero-padded), while non-decodable formats keep the stub."""
    docs = spark.range(0, 6).select(F.col("id").alias("doc_id"))
    bmp = mm.attach_fake_bmp(docs)
    feats = {
        r.doc_id: list(r.features)
        for r in mm.extract_features(bmp, dim=16).collect()
    }
    real = {
        r.doc_id: list(r.features)
        for r in mm.image_features(bmp).collect()
    }
    for i, v in feats.items():
        assert v[:8] == pytest.approx(real[i], rel=1e-6)
        assert v[8:] == [0.0] * 8
