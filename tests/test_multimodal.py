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
