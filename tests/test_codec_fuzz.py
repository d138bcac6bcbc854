"""Property-based fuzzing of the dependency-free codecs: GIF LZW and the
container round-trip, G.711 round-trip, IMA-ADPCM decode bounds, t-digest
invariants. Hypothesis drives sizes/contents; every property is a strict
invariant (no tolerances except the documented lossy ones)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    n_colors=st.integers(1, 256),
    seed=st.integers(0, 2**31 - 1),
    interlaced=st.booleans(),
)
def test_gif_roundtrip_fuzz(h, w, n_colors, seed, interlaced):
    from tts_etl_pipeline_spark.functions.gif import decode_gif, encode_gif, gif_meta

    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    img = palette[rng.integers(0, n_colors, size=(h, w))]
    blob = encode_gif(img, interlaced=interlaced)
    assert (decode_gif(blob) == img).all()
    meta = gif_meta(blob)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (w, h, 1)


@settings(max_examples=20, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=400),
    min_code=st.integers(2, 8),
)
def test_lzw_encode_decode_identity_on_index_streams(data, min_code):
    from tts_etl_pipeline_spark.functions.gif import lzw_decode, lzw_encode

    # clamp bytes into the code space for this min_code_size
    idx = np.frombuffer(data, dtype=np.uint8) % (1 << min_code)
    blob = lzw_encode(idx, min_code)
    out = lzw_decode(blob, min_code)
    assert bytes(out) == idx.astype(np.uint8).tobytes()


@settings(max_examples=20, deadline=None)
@given(vals=st.lists(st.integers(-32768, 32767), min_size=1, max_size=500))
def test_g711_roundtrip_fuzz(vals):
    from tts_etl_pipeline_spark.audio import codecs as C

    x = np.array(vals, dtype=np.int64)
    for dec, enc in ((C.decode_mulaw, C.encode_mulaw), (C.decode_alaw, C.encode_alaw)):
        once = dec(enc(x))
        twice = dec(enc(once.astype(np.int64)))
        # idempotent after one trip (codewords are fixed points)
        assert (once == twice).all()


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 3000),
    block=st.sampled_from([16, 64, 256, 1024]),
)
def test_ima_adpcm_decode_bounds_fuzz(seed, n, block):
    from tts_etl_pipeline_spark.audio import codecs as C

    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32767, size=n)
    blob = C.encode_ima_adpcm(x, block_align=block)
    y = C.decode_ima_adpcm(blob, block_align=block)
    # decoded stream stays in int16 range, starts at each block's predictor
    assert y.dtype == np.int16
    assert len(y) >= n
    assert int(y[0]) == int(np.int16(x[0]))


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(2, 4000),
    splits=st.integers(1, 8),
)
def test_tdigest_invariants_fuzz(seed, n, splits):
    from tts_etl_pipeline_spark.functions.tdigest import TDigest

    rng = np.random.default_rng(seed)
    vals = rng.normal(0, 100, size=n)
    parts = [TDigest(50.0) for _ in range(splits)]
    for i, chunk in enumerate(np.array_split(vals, splits)):
        parts[i].add_batch(chunk)
    d = parts[0]
    for p in parts[1:]:
        d = d.merge(p)
    assert abs(d.n - n) < 1e-9
    qs = [d.quantile(q) for q in (0.0, 0.25, 0.5, 0.75, 1.0)]
    assert qs == sorted(qs)  # monotone in q
    assert vals.min() <= qs[0] and qs[-1] <= vals.max()
