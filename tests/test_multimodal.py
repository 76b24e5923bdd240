"""Multimodal operator tests: container format, decode plumbing, Arrow
batch shapes, the row-multiplying frame sampler, and the real-format stub
gate (mirrors the reference's fixture-style operator tests,
/root/reference/tests/test_transformer.py:257-309)."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from jira_scraper_etl_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id").limit(60)
    return MM.attach_media(d).cache()


def test_container_layout(media):
    row = media.where(F.col("doc_id") == 5).first()  # 5 % 3 == 2 → video
    buf = bytes(row.content)
    assert buf[:4] == MM.MAGIC
    assert buf[4] == MM.VERSION
    assert buf[5] == MM.TYPE_CODES["video"]
    n_frames = buf[6]
    assert n_frames == 4 + 5 % 8
    assert len(buf) == 8 + n_frames * MM.FRAME_BYTES
    # frame 0 bytes are exactly md5("5:0")
    assert buf[8:24] == hashlib.md5(b"5:0").digest()


def test_decode_media_roundtrip(media):
    out = MM.decode_media(media)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[0].media_type == "image" and rows[0].n_frames == 1
    assert rows[1].media_type == "audio" and rows[1].n_frames == 3
    assert rows[2].media_type == "video" and rows[2].n_frames == 4 + 2 % 8
    for r in rows.values():
        assert r.content_len == 8 + r.n_frames * MM.FRAME_BYTES
        assert r.payload_len == r.content_len - 8


def test_media_features_match_numpy(media):
    import numpy as np

    feats = {r.doc_id: r for r in MM.media_features(media).collect()}
    raw = {r.doc_id: bytes(r.content) for r in media.collect()}
    for doc_id, buf in raw.items():
        payload = np.frombuffer(buf, dtype=np.uint8)[8:]
        r = feats[doc_id]
        assert r.n_bytes == payload.size
        assert r.byte_sum == int(payload.sum())
        assert r.h0 + r.h1 + r.h2 + r.h3 == r.n_bytes


def test_sample_frames_rows_and_bytes(media):
    out = MM.sample_frames(media, every=2).collect()
    assert out, "expected sampled video frames"
    for r in out:
        assert r.frame_idx % 2 == 0
        expected = hashlib.md5(f"{r.doc_id}:{r.frame_idx}".encode()).hexdigest()
        assert r.frame_hex == expected
    # only videos contribute
    assert all(r.doc_id % 3 == 2 for r in out)


def test_resize_plan_image_only(media):
    out = MM.resize_plan(media, 32, 32).collect()
    assert all(r.doc_id % 3 == 0 for r in out)
    for r in out:
        assert r.src_w == 8 * (2 + r.doc_id % 7)
        assert abs(r.scale_x - 32.0 / r.src_w) < 1e-12


def test_real_format_decode_is_stubbed():
    with pytest.raises(NotImplementedError, match="STUB"):
        MM._parse_header(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
    with pytest.raises(ValueError):
        MM._parse_header(b"NOPE" + b"\x00" * 16)
