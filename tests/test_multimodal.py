"""Multimodal column operators: binary payload schema, Arrow-batched
mapInPandas decode, resize/frame-sample planning (operators/multimodal.py).
The reference carries only image URLs (ArticlesSpider.py:96-105); this is
the LLM-pipeline extension surface."""

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from bbc_news_data_pipeline_spark.operators.multimodal import (
    _fake_decode_meta,
    _real_decode_meta,
    attach_media,
    decode_media_meta,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media_meta(spark):
    docs = spark.createDataFrame(
        [(i, f"document number {i} with some payload text " * (i + 1)) for i in range(12)],
        "doc_id long, text string",
    )
    media = attach_media(docs)
    return media, decode_media_meta(media).cache()


def test_payload_is_binary_with_mime(spark, media_meta):
    media, _ = media_meta
    schema = {f.name: f.dataType for f in media.schema["media"].dataType.fields}
    assert isinstance(schema["bytes"], BinaryType)
    rows = {r.doc_id: r.media for r in media.collect()}
    assert bytes(rows[0]["bytes"]).decode("utf-8").startswith("document number 0")
    assert rows[0]["mime"] == "image/jpeg"
    assert rows[1]["mime"] == "audio/wav"
    assert rows[2]["mime"] == "video/mp4"


def test_decode_matches_reference_fake(spark, media_meta):
    _, meta = media_meta
    rows = {r.doc_id: r for r in meta.collect()}
    assert set(rows) == set(range(12))
    for i, r in rows.items():
        payload = (f"document number {i} with some payload text " * (i + 1)).encode()
        expect = _fake_decode_meta(payload, r.mime)
        assert r.n_bytes == expect["n_bytes"] == len(payload)
        assert r.width == expect["width"] and r.height == expect["height"]
        assert r.n_frames == expect["n_frames"]
        assert r.sample_rate == expect["sample_rate"]
    # per-mime nullability contract
    assert all(r.width is not None for r in rows.values() if r.mime != "audio/wav")
    assert all(r.width is None for r in rows.values() if r.mime == "audio/wav")
    assert all(r.n_frames is not None for r in rows.values() if r.mime == "video/mp4")
    assert all(r.sample_rate is not None for r in rows.values() if r.mime == "audio/wav")


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        _real_decode_meta(b"\xff\xd8\xff", "image/jpeg")


def test_fake_decode_deterministic_md5_derivation():
    payload = b"hello media"
    h = hashlib.md5(payload).hexdigest()
    meta = _fake_decode_meta(payload, "video/mp4")
    assert meta["width"] == 64 + int(h[0:7], 16) % 960
    assert meta["n_frames"] == 1 + int(h[14:18], 16) % 120


def test_resize_plan_clamps_and_preserves_aspect(spark, media_meta):
    _, meta = media_meta
    plan = resize_images(meta, max_w=256, max_h=256)
    for r in plan.collect():
        assert r.target_w <= 256 and r.target_h <= 256
        if r.width <= 256 and r.height <= 256:
            assert (r.target_w, r.target_h) == (r.width, r.height)
        else:  # ceil keeps dims within 1px of true aspect
            assert abs(r.target_w * r.height - r.target_h * r.width) <= r.width + r.height


def test_frame_sample_fanout(spark, media_meta):
    _, meta = media_meta
    frames = sample_frames(meta, every_nth=10)
    by_doc = {}
    for r in frames.collect():
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    videos = {r.doc_id: r.n_frames for r in meta.filter(F.col("mime") == "video/mp4").collect()}
    assert set(by_doc) == set(videos)
    for doc_id, idxs in by_doc.items():
        assert sorted(idxs) == list(range(0, videos[doc_id], 10))
