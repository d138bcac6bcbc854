"""Non-PCM WAV codecs (audio/codecs.py): G.711 mu-law/A-law exactness on
codewords, IMA ADPCM round-trip SNR, and the decode_wav_bytes fallback."""

from __future__ import annotations

import numpy as np

from tts_etl_pipeline_spark.audio import codecs as C


def test_g711_tables_match_spec_anchor_values():
    # ITU G.711 anchors: mu-law 0xFF decodes to 0, 0x7F to -0 side zero;
    # extreme magnitudes at codeword 0x00/0x80
    assert C.MULAW_DECODE[0xFF] == 0
    assert C.MULAW_DECODE[0x7F] == 0
    assert C.MULAW_DECODE[0x00] == -32124
    assert C.MULAW_DECODE[0x80] == 32124
    # A-law (g711.c convention: post-inversion sign bit set = positive)
    assert C.ALAW_DECODE[0xD5] == 8
    assert C.ALAW_DECODE[0x55] == -8
    assert C.ALAW_DECODE[0xAA] == 32256
    assert C.ALAW_DECODE[0x2A] == -32256


def test_g711_codeword_roundtrip_exact():
    all_bytes = np.arange(256, dtype=np.uint8)
    for dec, enc in ((C.decode_mulaw, C.encode_mulaw), (C.decode_alaw, C.encode_alaw)):
        vals = dec(all_bytes.tobytes())
        back = np.frombuffer(enc(vals), dtype=np.uint8)
        assert (dec(back.tobytes()) == vals).all()  # value-exact round trip


def test_g711_encode_is_nearest_codeword():
    rng = np.random.default_rng(7)
    x = rng.integers(-32768, 32767, size=2000)
    for dec, enc in ((C.decode_mulaw, C.encode_mulaw), (C.decode_alaw, C.encode_alaw)):
        got = dec(enc(x))
        table = np.sort(np.unique(dec(np.arange(256, dtype=np.uint8).tobytes())))
        # error bounded by the local quantization cell width
        for xi, gi in zip(x[:200], got[:200]):
            j = np.searchsorted(table, xi)
            lo = table[max(0, j - 1)]
            hi = table[min(len(table) - 1, j)]
            assert abs(int(gi) - int(xi)) <= max(abs(int(xi) - lo), abs(hi - int(xi)))


def test_ima_adpcm_roundtrip_snr():
    t = np.arange(16000)
    x = (10000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int64)
    blob = C.encode_ima_adpcm(x, block_align=256)
    y = C.decode_ima_adpcm(blob, block_align=256)[: len(x)].astype(np.int64)
    err = x - y
    snr = 10 * np.log10(np.sum(x * x) / max(1, np.sum(err * err)))
    assert snr > 25.0, snr  # lossy 4-bit codec; ~30 dB typical on a sine


def test_decode_wav_bytes_falls_back_to_nonpcm():
    from tts_etl_pipeline_spark.audio.decode import decode_wav_bytes

    t = np.arange(8000)
    x = (12000 * np.sin(2 * np.pi * 220 * t / 8000)).astype(np.int64)
    for tag, payload, ba, bits in (
        (C.WAVE_FORMAT_MULAW, C.encode_mulaw(x), 1, 8),
        (C.WAVE_FORMAT_ALAW, C.encode_alaw(x), 1, 8),
        (C.WAVE_FORMAT_IMA_ADPCM, C.encode_ima_adpcm(x, 256), 256, 4),
    ):
        wav = C.wrap_wav(tag, 8000, payload, ba, bits)
        out, rate, channels = decode_wav_bytes(wav)
        assert rate == 8000 and channels == 1
        n = min(len(out), len(x))
        ref = x[:n] / 32767.0
        err = out[:n] - ref
        snr = 10 * np.log10(np.sum(ref * ref) / max(1e-12, np.sum(err * err)))
        assert snr > 25.0, (tag, snr)
    # PCM still rides the stdlib path
    import io
    import wave as stdwave

    buf = io.BytesIO()
    with stdwave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(x.astype("<i2").tobytes())
    out, rate, channels = decode_wav_bytes(buf.getvalue())
    assert rate == 8000 and np.allclose(out, x / 32767.0, atol=1e-4)
