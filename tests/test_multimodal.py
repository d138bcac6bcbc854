"""Multimodal column plumbing: chunking, hashing, metadata probe, feature
extraction batch shape — real Spark paths with stubbed codecs (B6)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from pyspark.sql import functions as F

from tts_etl_pipeline_spark.audio import synth
from tts_etl_pipeline_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("a.wav", "audio", synth.to_wav_bytes(synth.tone(440.0, 1500))),
        ("b.wav", "audio", synth.to_wav_bytes(synth.speech_like(2500, seed=9))),
        ("img.png", "image", b"\x89PNG fake image payload " * 100),
        ("clip.mp4", "video", b"\x00\x00ftyp fake video payload " * 5000),
    ]
    return spark.createDataFrame(rows, "media_id string, modality string, content binary")


def test_chunking_small_payloads_single_chunk(spark, media_df):
    out = MM.chunk_media(media_df).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert all(len(v) == 1 for v in by_id.values())
    for r in out:
        assert r["n_chunks"] == 1 and r["chunk_idx"] == 0
        assert r["content_hash"] == hashlib.sha256(bytes(r["content"])).hexdigest()
        assert r["byte_length"] == len(bytes(r["content"]))


def test_chunking_splits_oversized(spark, media_df):
    out = MM.chunk_media(media_df, max_chunk_bytes=1000).collect()
    vid = sorted(
        (r for r in out if r["media_id"] == "clip.mp4"), key=lambda r: r["chunk_idx"]
    )
    total = sum(len(bytes(r["content"])) for r in vid)
    assert len(vid) > 1
    assert vid[0]["n_chunks"] == len(vid)
    assert total == vid[0]["byte_length"]
    # reassembly fidelity
    joined = b"".join(bytes(r["content"]) for r in vid)
    assert hashlib.sha256(joined).hexdigest() == vid[0]["content_hash"]


def test_audio_meta_probe(spark, media_df):
    out = {r["media_id"]: r for r in MM.chunk_media(media_df).collect()}
    meta = out["a.wav"]["meta"]
    assert meta["frame_rate"] == 16_000
    assert abs(meta["duration_ms"] - 1500) <= 1
    assert meta["codec"] == "pcm"
    assert out["img.png"]["meta"]["codec"] is None  # stubbed codec -> no probe


def test_feature_extraction_shapes_and_determinism(spark, media_df):
    chunked = MM.chunk_media(media_df)
    f1 = {r["media_id"]: r for r in MM.extract_features(chunked, dim=32).collect()}
    f2 = {r["media_id"]: r for r in MM.extract_features(chunked, dim=32).collect()}
    assert set(f1) == {"a.wav", "b.wav", "img.png", "clip.mp4"}
    for mid, r in f1.items():
        assert r["feat_dim"] == 32 and len(r["feature"]) == 32
        assert f2[mid]["feature"] == r["feature"]  # deterministic
    # audio rows carry REAL decoded stats in the head slots
    a = np.array(f1["a.wav"]["feature"])
    x = synth.tone(440.0, 1500)
    assert a[2] == pytest.approx(float(np.sqrt(np.mean(np.square(x)))), rel=1e-2)


def test_codec_stubs_raise(spark):
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"xx")
    with pytest.raises(NotImplementedError):
        MM.resize_image(b"xx", 224, 224)
    with pytest.raises(NotImplementedError):
        MM.sample_video_frames(b"xx")
