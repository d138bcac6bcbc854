"""Multimodal column plumbing: chunking, hashing, metadata probe, feature
extraction batch shape (B6). Real Spark paths throughout; codecs are real
for WAV/BMP/y4m and stubbed for compressed formats (PNG/JPEG/H.264)."""

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
    # compressed formats beyond PNG stay stubbed (no PIL/opencv/ffmpeg here)
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\xff\xd8\xff\xe0 jpeg not decodable")
    with pytest.raises(NotImplementedError):
        MM.resize_image(b"\xff\xd8\xff\xe0 jpeg not decodable", 224, 224)
    with pytest.raises(NotImplementedError):
        MM.sample_video_frames(b"\x00\x00ftyp h264 not decodable")
    # PNG variants outside the real path stay explicit too: 16-bit depth
    img = _test_img(w=4, h=3)
    png16 = _encode_png(img, depth=16)
    with pytest.raises(NotImplementedError):
        MM.decode_png(png16)


# --------------------------------------------------------------------------
# real dependency-free codecs: BMP images, y4m video
# --------------------------------------------------------------------------
def _test_img(w=31, h=17, seed=3):  # odd width exercises BMP row padding
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _y4m_bytes(w=32, h=16, n_frames=30, fps=10):
    rng = np.random.default_rng(5)
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420jpeg\n".encode()
    body = b""
    for _ in range(n_frames):
        luma = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
        chroma = rng.integers(0, 256, size=2 * (w // 2) * (h // 2), dtype=np.uint8).tobytes()
        body += b"FRAME\n" + luma + chroma
    return head + body


def _encode_png(img, filters=None, depth=8, color=None):
    """Minimal PNG writer for decoder tests: applies the spec's scanline
    filters FORWARD (sub/up/average/paeth deltas), so decode_png must run
    the reconstruction to get the pixels back. img: HxW (gray), HxWx3 (RGB)
    or HxWx4 (RGBA) uint8; filters: per-row filter ids (cycled)."""
    import struct
    import zlib

    if img.ndim == 2:
        img = img[..., None]
    h, w, ch = img.shape
    color = {1: 0, 3: 2, 4: 6}[ch] if color is None else color
    filters = filters if filters is not None else [0]
    bpp = ch
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        cur = img[y].reshape(-1).astype(np.int32)
        out = np.zeros_like(cur)
        for i in range(len(cur)):
            a = int(cur[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out[i] = (cur[i] - pred) & 0xFF
        raw.append(f)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_bmp_roundtrip_exact():
    img = _test_img()
    assert np.array_equal(MM.decode_image(MM.encode_bmp(img)), img)


def test_png_decode_all_filters_exact():
    """Every scanline filter (None/Sub/Up/Average/Paeth) reconstructs the
    exact pixels, through the public decode_image dispatch."""
    img = _test_img(w=13, h=11, seed=7)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        got = MM.decode_image(_encode_png(img, filters=filters))
        assert np.array_equal(got, img), f"filters={filters}"


def test_png_decode_gray_and_rgba():
    rng = np.random.default_rng(9)
    gray = rng.integers(0, 256, size=(6, 10), dtype=np.uint8)
    got = MM.decode_png(_encode_png(gray, filters=[0, 2, 4]))
    assert np.array_equal(got, np.repeat(gray[..., None], 3, axis=2))
    rgba = rng.integers(0, 256, size=(5, 7, 4), dtype=np.uint8)
    got = MM.decode_png(_encode_png(rgba, filters=[1, 3, 4]))
    assert np.array_equal(got, rgba[..., :3])  # alpha dropped


def test_png_resize_and_probe(spark):
    img = _test_img(w=16, h=16)
    png = _encode_png(img, filters=[4])
    # resize consumes PNG input, emits BMP (the writer format)
    out = MM.decode_image(MM.resize_image(png, 4, 4))
    assert out.shape == (4, 4, 3)
    df = spark.createDataFrame(
        [("pic.png", "image", png)],
        "media_id string, modality string, content binary",
    )
    meta = {r["media_id"]: r["meta"] for r in MM.chunk_media(df).collect()}
    assert meta["pic.png"]["width"] == 16 and meta["pic.png"]["height"] == 16
    assert meta["pic.png"]["codec"] == "png"
    feats = {
        r["media_id"]: np.array(r["feature"])
        for r in MM.extract_features(MM.chunk_media(df), dim=16).collect()
    }
    luma = img.astype(np.float64).mean(axis=2) / 255.0
    assert feats["pic.png"][0] == pytest.approx(float(luma.mean()), rel=1e-5)


def test_bmp_resize_nearest_neighbor():
    img = _test_img()
    out = MM.decode_image(MM.resize_image(MM.encode_bmp(img), 8, 5))
    assert out.shape == (5, 8, 3)
    # downsample by integer factor on a solid-color image is lossless
    solid = np.full((16, 16, 3), 99, dtype=np.uint8)
    out2 = MM.decode_image(MM.resize_image(MM.encode_bmp(solid), 4, 4))
    assert np.array_equal(out2, np.full((4, 4, 3), 99, dtype=np.uint8))


def test_y4m_frame_sampling():
    content = _y4m_bytes(n_frames=30, fps=10)  # 3 s of video
    frames = MM.sample_video_frames(content, every_ms=1000)
    assert [ts for ts, _ in frames] == [0, 1000, 2000]
    assert all(f.shape == (16, 32) for _, f in frames)
    # every_ms smaller than the frame interval -> every frame sampled
    assert len(MM.sample_video_frames(content, every_ms=1)) == 30


def test_real_codec_meta_probe(spark):
    rows = [
        ("pic.bmp", "image", bytes(MM.encode_bmp(_test_img(w=31, h=17)))),
        ("mov.y4m", "video", bytes(_y4m_bytes(w=32, h=16, n_frames=30, fps=10))),
    ]
    df = spark.createDataFrame(rows, "media_id string, modality string, content binary")
    out = {r["media_id"]: r["meta"] for r in MM.chunk_media(df).collect()}
    assert out["pic.bmp"]["width"] == 31 and out["pic.bmp"]["height"] == 17
    assert out["pic.bmp"]["codec"] == "bmp"
    assert out["mov.y4m"]["width"] == 32 and out["mov.y4m"]["height"] == 16
    assert out["mov.y4m"]["frame_rate"] == 10
    assert out["mov.y4m"]["duration_ms"] == 3000
    assert out["mov.y4m"]["codec"] == "y4m"


def test_real_codec_features(spark):
    img = _test_img()
    rows = [
        ("pic.bmp", "image", bytes(MM.encode_bmp(img))),
        ("mov.y4m", "video", bytes(_y4m_bytes())),
    ]
    df = spark.createDataFrame(rows, "media_id string, modality string, content binary")
    feats = {
        r["media_id"]: np.array(r["feature"])
        for r in MM.extract_features(MM.chunk_media(df), dim=16).collect()
    }
    luma = img.astype(np.float64).mean(axis=2) / 255.0
    assert feats["pic.bmp"][0] == pytest.approx(float(luma.mean()), rel=1e-5)
    assert feats["pic.bmp"][1] == pytest.approx(float(luma.std()), rel=1e-5)
    assert feats["mov.y4m"][2] == 3.0  # 3 sampled frames of the 3 s clip
