"""Unit tests for the pure-numpy DSP kernels against inline oracles
(SURVEY.md §5.2: DSP metrics vs numpy; segmentation vs hand-computed cases)."""

from __future__ import annotations

import numpy as np
import pytest

from tts_etl_pipeline_spark.audio import kernels, params, synth


class TestRms:
    def test_full_scale_square_wave(self):
        x = np.ones(1000, dtype=np.float32)
        assert kernels.rms_int_scale(x) == pytest.approx(32767.0)

    def test_sine_rms(self):
        x = synth.tone(440.0, 1000, amp=0.5)
        assert kernels.rms_int_scale(x) == pytest.approx(
            0.5 * 32767.0 / np.sqrt(2), rel=1e-3
        )

    def test_empty(self):
        assert kernels.rms_int_scale(np.array([], dtype=np.float32)) == 0.0


class TestClipping:
    def test_no_clipping(self):
        assert kernels.clipping_percent(synth.tone(440.0, 500, amp=0.5)) == 0.0

    def test_all_clipped(self):
        x = np.ones(100, dtype=np.float32)
        assert kernels.clipping_percent(x) == 100.0

    def test_half_clipped(self):
        x = np.concatenate([np.ones(50), np.zeros(50)]).astype(np.float32)
        assert kernels.clipping_percent(x) == 50.0

    def test_threshold_is_098(self):
        x = np.full(100, 0.979, dtype=np.float32)
        assert kernels.clipping_percent(x) == 0.0
        x = np.full(100, 0.981, dtype=np.float32)
        assert kernels.clipping_percent(x) == 100.0


class TestMusicRatio:
    def test_speech_band_is_low(self):
        x = synth.speech_like(2000, seed=11)
        r = kernels.music_ratio(x, synth.RATE)
        assert 0.0 <= r < 0.5

    def test_bass_treble_is_high(self):
        x = synth.music_like(2000, seed=12)
        r = kernels.music_ratio(x, synth.RATE)
        assert r > params.MUSIC_ENERGY_RATIO

    def test_empty_is_sentinel(self):
        assert kernels.music_ratio(np.array([], dtype=np.float32), 16000) == -1.0


class TestDetectNonsilent:
    def test_all_silence(self):
        assert kernels.detect_nonsilent(synth.silence(5000), synth.RATE) == []

    def test_all_speech(self):
        iv = kernels.detect_nonsilent(synth.speech_like(5000, seed=1), synth.RATE)
        assert len(iv) == 1
        s, e = iv[0]
        assert s == 0 and abs(e - 5000) <= 1

    def test_two_bursts(self):
        x = np.concatenate(
            [synth.speech_like(2000, seed=1), synth.silence(500), synth.speech_like(1500, seed=2)]
        )
        iv = kernels.detect_nonsilent(x, synth.RATE)
        assert len(iv) == 2
        (s1, e1), (s2, e2) = iv
        # window-RMS silence detection bleeds ~10ms at burst boundaries,
        # same as pydub's per-window dBFS test
        assert s1 == 0 and abs(e1 - 2000) <= 10
        assert abs(s2 - 2500) <= 10 and abs(e2 - 4000) <= 10

    def test_short_gap_not_a_split(self):
        # 200ms of silence < MIN_SILENCE_LEN_MS=300 must NOT split
        x = np.concatenate(
            [synth.speech_like(2000, seed=1), synth.silence(200), synth.speech_like(1500, seed=2)]
        )
        assert len(kernels.detect_nonsilent(x, synth.RATE)) == 1


class TestSegmentIntervals:
    def test_empty(self):
        assert kernels.segment_intervals([], 10_000) == []

    def test_exactly_min_duration_kept(self):
        out = kernels.segment_intervals([(0, 3000)], 3000)
        assert [(s, e) for s, e, *_ in out] == [(0, 3000)]

    def test_below_min_dropped(self):
        assert kernels.segment_intervals([(0, 2999)], 3000) == []

    def test_pass1_split_at_15s(self):
        # 40s single interval -> 15+15+10
        out = kernels.segment_intervals([(0, 40_000)], 40_000)
        assert [(s, e) for s, e, *_ in out] == [
            (0, 15_000),
            (15_000, 30_000),
            (30_000, 40_000),
        ]

    def test_merge_across_silence(self):
        # 2s + 2.5s bursts with a gap: merged span 0..4900 <= 15s -> one seg
        out = kernels.segment_intervals([(0, 2000), (2400, 4900)], 5000)
        assert [(s, e) for s, e, *_ in out] == [(0, 4900)]

    def test_no_merge_past_budget(self):
        # absorbing the second interval would exceed 15s from seg_start
        out = kernels.segment_intervals([(0, 10_000), (11_000, 18_000)], 20_000)
        assert [(s, e) for s, e, *_ in out] == [(0, 10_000), (11_000, 18_000)]

    def test_padding_clamped_at_edges(self):
        out = kernels.segment_intervals([(0, 3000)], 3100)
        (s, e, ps, pe) = out[0]
        assert (s, e) == (0, 3000)  # unpadded stored bounds
        assert ps == 0  # clamped at file start
        assert pe == 3100  # clamped at file end (3000+200 > 3100)

    def test_short_tail_piece_dropped(self):
        # 15s + 2s tail: pass 1 makes (0,15000),(15000,17000); pass 2 can't
        # merge (17000-0 > 15000); tail is 2s < 3s -> dropped (bug B3 parity)
        out = kernels.segment_intervals([(0, 17_000)], 17_000)
        assert [(s, e) for s, e, *_ in out] == [(0, 15_000)]


class TestResampleDownmix:
    def test_downmix_stereo(self):
        x = np.array([1.0, 0.0, 0.5, 0.5, -1.0, 1.0], dtype=np.float32)
        out = kernels.downmix_mono(x, 2)
        assert np.allclose(out, [0.5, 0.5, 0.0])

    def test_resample_halves_length(self):
        x = synth.tone(100.0, 1000, rate=32_000)
        out = kernels.resample_linear(x, 32_000, 16_000)
        assert abs(out.size - 16_000) <= 1

    def test_peak_normalize(self):
        x = synth.tone(440.0, 500, amp=0.25)
        out = kernels.peak_normalize(x)
        assert np.max(np.abs(out)) == pytest.approx(10 ** (-0.1 / 20), rel=1e-4)

    def test_normalize_silence_unchanged(self):
        x = synth.silence(100)
        assert np.array_equal(kernels.peak_normalize(x), x)


class TestMusicRatioPydubParity:
    """music_ratio_pydub re-implements the reference's exact pydub chain
    (pa.py:191-210; single-pole RC filters + audioop integer RMS). The FFT
    band-RMS variant stays the fast gate default — these tests pin that
    BOTH variants classify every synth fixture identically at the
    MUSIC_ENERGY_RATIO=2.0 gate threshold, so the speed/fidelity choice
    cannot silently change gate outcomes."""

    def test_classification_agreement_with_fft_variant(self):
        from tts_etl_pipeline_spark.audio.params import MUSIC_ENERGY_RATIO

        cases = [
            synth.speech_like(2000, seed=3),
            synth.music_like(2000, seed=12),
            synth.tone(440.0, 1500),
            synth.speech_like(1500, seed=44),
        ]
        for x in cases:
            fft = kernels.music_ratio(x, synth.RATE)
            pdb = kernels.music_ratio_pydub(x, synth.RATE)
            assert (fft > MUSIC_ENERGY_RATIO) == (pdb > MUSIC_ENERGY_RATIO)

    def test_music_rejected_speech_passes(self):
        assert kernels.music_ratio_pydub(synth.music_like(2000, seed=12), synth.RATE) > 2.0
        assert kernels.music_ratio_pydub(synth.speech_like(2000, seed=3), synth.RATE) < 2.0

    def test_empty_returns_sentinel(self):
        assert kernels.music_ratio_pydub(np.array([], dtype=np.float32), 16000) == -1.0

    def test_silence_ratio_uses_integer_floors(self):
        # pure silence: every RMS is 0, both floors engage -> ratio 0/1 = 0
        assert kernels.music_ratio_pydub(synth.silence(500), synth.RATE) == 0.0

    def test_one_pole_filters_frequency_response(self):
        # DC survives the low-pass and dies in the high-pass
        dc = np.full(4000, 1000, dtype=np.int64)
        lp = kernels._one_pole_low_pass(dc, 100.0, 16000)
        hp = kernels._one_pole_high_pass(dc, 100.0, 16000)
        assert abs(int(lp[-1]) - 1000) <= 1
        assert abs(int(hp[-1])) <= 1
        # a 6 kHz tone passes a 8 kHz-cutoff high-pass far better than 100 Hz
        t = np.arange(8000) / 16000.0
        tone = (10000 * np.sin(2 * np.pi * 6000 * t)).astype(np.int64)
        hi = kernels._audioop_rms(kernels._one_pole_high_pass(tone, 100.0, 16000))
        lo = kernels._audioop_rms(kernels._one_pole_low_pass(tone, 100.0, 16000))
        assert hi > 10 * lo
