"""Deterministic synthetic audio fixtures (FIXTURES.md §B.1).

Builds WAV-shaped test signals — speech-band tones with silence gaps,
clipping plateaus, bass/treble-heavy spans — with a fixed seed so
segmentation (T1), rms (P4), clipping (P6) and music_ratio (P7) all have
non-trivial, reproducible cases. Also renders int16 WAV bytes (stdlib wave)
to exercise the binaryFile decode path end-to-end.
"""

from __future__ import annotations

import io
import wave

import numpy as np

RATE = 16_000


def tone(freq: float, dur_ms: int, amp: float = 0.3, rate: int = RATE) -> np.ndarray:
    t = np.arange(int(rate * dur_ms / 1000)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def silence(dur_ms: int, rate: int = RATE) -> np.ndarray:
    return np.zeros(int(rate * dur_ms / 1000), dtype=np.float32)


def noise(dur_ms: int, amp: float, seed: int, rate: int = RATE) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (amp * rng.standard_normal(int(rate * dur_ms / 1000))).astype(np.float32)


def speech_like(dur_ms: int, seed: int, amp: float = 0.3, rate: int = RATE) -> np.ndarray:
    """Energy concentrated in the 100-7500 Hz speech band."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(rate * dur_ms / 1000)) / rate
    sig = np.zeros_like(t)
    for _ in range(4):
        f = rng.uniform(200, 3000)
        sig = sig + np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    sig = sig / np.max(np.abs(sig)) * amp
    return sig.astype(np.float32)


def clipped(dur_ms: int, rate: int = RATE) -> np.ndarray:
    """A plateau driven past full scale then hard-clipped to +-1."""
    x = tone(440.0, dur_ms, amp=3.0, rate=rate)
    return np.clip(x, -1.0, 1.0)


def music_like(dur_ms: int, seed: int, rate: int = RATE) -> np.ndarray:
    """Bass (<80 Hz) + treble (>8 kHz) heavy — trips the music-ratio gate."""
    t = np.arange(int(rate * dur_ms / 1000)) / rate
    bass = 0.4 * np.sin(2 * np.pi * 50.0 * t)
    treble = 0.3 * np.sin(2 * np.pi * 7900.0 * t)  # near Nyquist at 16k
    return (bass + treble).astype(np.float32)


def standard_fixture_files(rate: int = RATE) -> list[tuple[str, np.ndarray]]:
    """The canonical fixture set used by unit and E2E tests."""
    return [
        # 3 speech bursts separated by >300ms silences -> 3 segments
        (
            "clean_three_bursts.wav",
            np.concatenate(
                [
                    speech_like(4000, seed=1),
                    silence(500),
                    speech_like(5000, seed=2),
                    silence(600),
                    speech_like(3500, seed=3),
                ]
            ),
        ),
        # one long 40s burst -> pass-1 split at 15s boundaries
        ("long_monologue.wav", speech_like(40_000, seed=4)),
        # short blips (<3s) that merge across a short gap
        (
            "merge_candidates.wav",
            np.concatenate(
                [
                    speech_like(2000, seed=5),
                    silence(400),
                    speech_like(2500, seed=6),
                ]
            ),
        ),
        # all silence -> zero segments
        ("silent.wav", silence(8000)),
        # quiet speech below the RMS gate
        ("too_quiet.wav", speech_like(5000, seed=7, amp=0.004)),
        # clipped audio above the clipping gate
        ("clipped.wav", np.concatenate([clipped(4000), silence(400), clipped(1000)])),
        # music-band energy above the music-ratio gate
        ("musicy.wav", music_like(6000, seed=8)),
    ]


def to_wav_bytes(samples: np.ndarray, rate: int = RATE, channels: int = 1) -> bytes:
    """Render float [-1,1] samples as a PCM16 WAV container."""
    ints = np.clip(samples, -1.0, 1.0)
    ints = (ints * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


def write_fixture_dir(path: str, rate: int = RATE) -> list[str]:
    """Materialize the fixture set as .wav files; returns written paths."""
    import os

    os.makedirs(path, exist_ok=True)
    out = []
    for name, samples in standard_fixture_files(rate):
        p = os.path.join(path, name)
        with open(p, "wb") as f:
            f.write(to_wav_bytes(samples, rate))
        out.append(p)
    return out
