"""Multimodal binary-column plumbing (decode is stubbed; schema/batching
are real — see operators/multimodal.py)."""

import hashlib

import pytest

from pytorch_ie_spark.corpus import fixture_documents
from pytorch_ie_spark.operators.multimodal import (
    decode_media,
    documents_as_media,
    extract_features,
    sample_frames,
)


def test_media_schema_and_features(spark):
    docs = fixture_documents(spark)
    media = documents_as_media(docs, "image")
    feats = extract_features(media, dim=8).collect()
    assert len(feats) == 8
    by_id = {r["media_id"]: r for r in feats}
    doc2 = [d for d in docs.collect() if d["doc_id"] == "train_doc2"][0]
    raw = doc2["text"].encode()
    row = by_id["train_doc2"]
    assert row["content_sha256"] == hashlib.sha256(raw).hexdigest()
    assert row["n_bytes"] == len(raw)
    assert len(row["features"]) == 8
    assert all(0.0 <= v < 1.0 for v in row["features"])


def test_features_deterministic(spark):
    docs = fixture_documents(spark)
    media = documents_as_media(docs)
    a = sorted(map(tuple, extract_features(media).select("media_id", "content_sha256").collect()))
    b = sorted(map(tuple, extract_features(media).select("media_id", "content_sha256").collect()))
    assert a == b


def test_decode_stub_raises(spark):
    with pytest.raises(NotImplementedError):
        decode_media(b"fake", "image")


def test_frame_sampling(spark):
    docs = fixture_documents(spark)
    media = documents_as_media(docs, "video")
    frames = sample_frames(media, every_n_bytes=8, max_frames=3)
    rows = frames.where(frames.media_id == "train_doc2").collect()
    # 20-byte doc, every 8 bytes, max 3 -> offsets 0, 8, 16
    assert sorted(r["byte_offset"] for r in rows) == [0, 8, 16]


def test_resize_media_downsamples_and_updates_meta(spark, sf_dir):
    from pytorch_ie_spark.operators.multimodal import (
        documents_as_media,
        resize_media,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = documents_as_media(docs)
    out = resize_media(media, target_width=32).collect()
    orig = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in out:
        raw = orig[r["media_id"]]
        small = bytes(r["payload"])
        assert len(small) <= 32 or len(small) == len(raw)
        assert r["meta_width"] == len(small)
        if len(raw) > 32:
            step = -(-len(raw) // 32)
            assert small == raw[::step]  # deterministic downsample
        else:
            assert small == raw
